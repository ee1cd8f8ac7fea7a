"""Effect-graph composition: spatial -> EQ ordering, warnings, passthrough.

Re-implements the composition semantics of
/root/reference/Airwave/AudioEffectGraph.swift:65-248 and the control-thread
adapter EqualizerRuntimeEffect.swift:10-107:

  - fixed order: spatial THEN equalizer
  - EQ preparation failures are NON-FATAL warnings (line-numbered); spatial
    continues (:103-137)
  - update_equalizer keeps the EQ in the callback path so the unity ramp can
    play out after removal (:147-151)
  - passthrough memcpy when nothing runs; mono input duplicated to right
    (:223-245) — both with zero added latency, exactly like the reference
    (only the spatial path carries the block-adapter latency).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Set

import numpy as np

from airwave_tpu.config import DEFAULT_CONFIG, AirwaveConfig
from airwave_tpu.graph.eq_processor import ParametricEqualizerProcessor
from airwave_tpu.io.apo import EqualizerDefinition
from airwave_tpu.ops import biquad_design as bd
from airwave_tpu.oracle.eq_oracle import EqCascadeOracle
from airwave_tpu.utils import errors

SPATIAL = "spatial"
EQUALIZER = "equalizer"


@dataclasses.dataclass(frozen=True)
class AudioEffectWarning:
    filter_line: Optional[int]
    reason: str

    def __str__(self) -> str:
        if self.filter_line is not None:
            return f"Equalizer line {self.filter_line}: {self.reason}"
        return f"Equalizer configuration: {self.reason}"


@dataclasses.dataclass(frozen=True)
class AudioEffectPreparationResult:
    runnable_effects: frozenset
    equalizer_warning: Optional[AudioEffectWarning] = None

    @property
    def no_effect_can_run(self) -> bool:
        return len(self.runnable_effects) == 0


def _warning_from_error(
    definition: Optional[EqualizerDefinition], err: Exception
) -> AudioEffectWarning:
    """Map preparation errors to line-numbered warnings
    (ref EqualizerRuntimeEffect.swift:80-100)."""
    if isinstance(err, errors.EqInvalidFilter) and definition is not None:
        enabled = definition.enabled_filters
        line = (
            enabled[err.index].source_line if err.index < len(enabled) else None
        )
        return AudioEffectWarning(line, str(err.error))
    if isinstance(err, errors.EqInvalidSampleRate):
        return AudioEffectWarning(None, "Output sample rate is invalid.")
    return AudioEffectWarning(None, str(err))


class EqualizerEffect:
    """Owns per-sample-rate host EQ processors (ref EqualizerRuntimeEffect).

    One independent processor per stream row: filter histories and crossfade
    progress are per-stream state (the reference is single-stream; with a
    batch, sharing one processor would leak z-state and ramp position across
    streams). Target publication fans out to every row."""

    def __init__(self, config: AirwaveConfig = DEFAULT_CONFIG,
                 batch: int = 1) -> None:
        self.config = config
        self.batch = batch
        self.processors: list = []
        self._sample_rate: Optional[float] = None

    @property
    def processor(self) -> Optional[ParametricEqualizerProcessor]:
        """First row's processor (single-stream convenience)."""
        return self.processors[0] if self.processors else None

    def _publish_all(self, definition: Optional[EqualizerDefinition]) -> None:
        """Design the cascade ONCE (the expensive f64 filter design), then
        give every stream row its own oracle over the shared coefficients —
        z-history and ramp position stay per-stream."""
        preamp, coeffs = bd.design_cascade(definition, self._sample_rate)
        for processor in self.processors:
            # Control-thread housekeeping at publication time: free the
            # retirement slot so a ramp queued behind an in-flight one can
            # start as soon as it finishes (the reference's control thread
            # drains retired states off the render path).
            processor.drain_retired_states()
            processor.publish(
                EqCascadeOracle(coeffs, preamp, self._sample_rate)
            )

    def prepare(
        self, definition: Optional[EqualizerDefinition], sample_rate: float
    ) -> None:
        # Reuse processors when the sample rate matches (swift :16-24).
        if not self.processors or self._sample_rate != sample_rate:
            self._sample_rate = sample_rate
            self.processors = [
                ParametricEqualizerProcessor(
                    sample_rate,
                    self.config.max_frames_per_callback,
                    self.config,
                )
                for _ in range(self.batch)
            ]
        self._publish_all(definition)

    def set_target(self, definition: Optional[EqualizerDefinition]) -> None:
        if not self.processors:
            raise errors.EqualizerPreparationError("equalizer not prepared")
        try:
            self._publish_all(definition)
        except errors.EqualizerPreparationError:
            # Invalid live preset: fall back to a unity target (swift :29-33).
            self._publish_all(None)
            raise

    def process(self, left: np.ndarray, right: Optional[np.ndarray],
                stream: int = 0):
        assert self.processors, "equalizer not prepared"
        assert stream < len(self.processors), (
            f"stream {stream} >= prepared batch {len(self.processors)}; "
            "construct EqualizerEffect(batch=...) to match the graph batch"
        )
        return self.processors[stream].process(left, right)


class DeviceEqualizerEffect:
    """Batched live EQ: ONE jitted dual-cascade device step per callback.

    The host EqualizerEffect runs B independent f64 processors — exact, but
    a Python loop over streams; at serving batch sizes the documented live
    composition would crawl. This effect routes the whole [B, 2, n] block
    through ops/eq_block (the same kernel the StreamPool uses) under the
    EqualizerRuntime publication/crossfade protocol. Targets are observed at
    callback starts, matching the reference's render-thread observation
    points (ParametricEqualizerProcessor.swift:263-265); ramp values are
    per-sample exact. Parity with the host path is pinned by
    tests/test_graph.py::test_device_equalizer_matches_host_rows.

    Variable callback sizes: the cascade is designed once per target; the
    block-size-specific EqParams (Toeplitz + state-space matrices) are
    materialized lazily per (target, n) and cached.
    """

    def __init__(self, config: AirwaveConfig = DEFAULT_CONFIG,
                 batch: int = 1) -> None:
        self.config = config
        self.batch = int(batch)
        self.runtime = None  # EqualizerRuntime, built per sample rate
        self._state = None   # eq_block.EqState [B, 2, D]
        self._params_cache = {}

    def prepare(
        self, definition: Optional[EqualizerDefinition], sample_rate: float
    ) -> None:
        from airwave_tpu.graph.eq_runtime import EqualizerRuntime
        from airwave_tpu.ops import eq_block

        if self.runtime is None or self.runtime.sample_rate != sample_rate:
            self.runtime = EqualizerRuntime(
                sample_rate, self.config.block_size,
                self.config.eq_state_dim, self.config,
            )
            self._state = eq_block.make_eq_state(
                self.batch, 2, self.config.eq_state_dim
            )
            self._params_cache.clear()
        self.runtime.set_target(definition)

    def set_target(self, definition: Optional[EqualizerDefinition]) -> None:
        if self.runtime is None:
            raise errors.EqualizerPreparationError("equalizer not prepared")
        self.runtime.drain_retired_states()  # control-thread housekeeping
        try:
            self.runtime.set_target(definition)
        except errors.EqualizerPreparationError:
            self.runtime.set_target(None)  # unity fallback (swift :29-33)
            raise

    def _params_for(self, prepared, n: int):
        from airwave_tpu.ops import eq_block

        key = (id(prepared), n)
        hit = self._params_cache.get(key)
        if hit is not None and hit[0] is prepared:
            return hit[1]
        if n == self.runtime.block_size:
            params = prepared.params
        else:
            preamp, coeffs = prepared.design
            params = eq_block.make_eq_params(
                coeffs, preamp, n, self.config.eq_state_dim
            )
        self._params_cache[key] = (prepared, params)
        if len(self._params_cache) > 64:
            self._params_cache.pop(next(iter(self._params_cache)))
        return params

    def process_batch(self, y: np.ndarray) -> np.ndarray:
        """y [B, 2, n] -> [B, 2, n] in one device step."""
        import jax.numpy as jnp

        from airwave_tpu.ops import eq_block

        runtime = self.runtime
        assert runtime is not None, "equalizer not prepared"
        B, _C, n = y.shape
        assert B == self.batch, (B, self.batch)
        eq_state, _pf, _pt, _ = runtime.begin_block(self._state)
        p_from = self._params_for(
            runtime.transition_from
            if runtime.transition_from is not None else runtime.active, n
        )
        p_to = self._params_for(runtime.active, n)
        crossfading = (
            runtime.is_transitioning or runtime.pending_target is not None
        )
        eq_state, out = _device_eq_step(
            p_from, p_to, eq_state, jnp.asarray(y, jnp.float32),
            runtime.transition_length, crossfading,
        )
        self._state = eq_state
        runtime.after_block(n)
        return np.asarray(out)


@functools.lru_cache(maxsize=1)
def _device_eq_step_jit():
    import jax

    from airwave_tpu.ops import eq_block

    return jax.jit(
        eq_block.eq_step,
        static_argnames=("transition_length", "crossfade_active"),
    )


def _device_eq_step(p_from, p_to, state, x, transition_length, crossfading):
    return _device_eq_step_jit()(
        p_from, p_to, state, x,
        transition_length=transition_length,
        crossfade_active=crossfading,
    )


class AudioEffectGraph:
    """Composes a spatial effect and an equalizer effect.

    `spatial` must expose `is_ready: bool` and
    `process(x: [B, C, n]) -> [B, 2, n]`.

    EQ lowering: batch == 1 keeps the host f64 fidelity processor; batch > 1
    defaults to the batched device EQ (one jitted step per callback instead
    of a B-long Python loop). Pass `equalizer=` to override either way.
    """

    def __init__(
        self,
        spatial,
        equalizer=None,
        config: AirwaveConfig = DEFAULT_CONFIG,
        batch: int = 1,
    ) -> None:
        self.spatial = spatial
        if equalizer is None:
            equalizer = (
                DeviceEqualizerEffect(config, batch=batch)
                if batch > 1 else EqualizerEffect(config, batch=batch)
            )
        self.equalizer = equalizer
        self.config = config
        self._equalizer_active = False

    def prepare(
        self,
        output_sample_rate: float,
        equalizer_definition: Optional[EqualizerDefinition],
    ) -> AudioEffectPreparationResult:
        runnable: Set[str] = set()
        if self.spatial.is_ready:
            runnable.add(SPATIAL)
        try:
            self.equalizer.prepare(equalizer_definition, output_sample_rate)
            self._equalizer_active = equalizer_definition is not None
            if equalizer_definition is not None:
                runnable.add(EQUALIZER)
            return AudioEffectPreparationResult(frozenset(runnable), None)
        except Exception as err:  # noqa: BLE001 — mirrored non-fatal contract
            self._equalizer_active = False
            return AudioEffectPreparationResult(
                frozenset(runnable), _warning_from_error(equalizer_definition, err)
            )

    def update_equalizer(
        self, definition: Optional[EqualizerDefinition]
    ) -> AudioEffectPreparationResult:
        runnable: Set[str] = set()
        if self.spatial.is_ready:
            runnable.add(SPATIAL)
        try:
            self.equalizer.set_target(definition)
            self._equalizer_active = True  # keep for the unity ramp
            if definition is not None:
                runnable.add(EQUALIZER)
            return AudioEffectPreparationResult(frozenset(runnable), None)
        except Exception as err:  # noqa: BLE001
            # Keep the EQ in the callback for the unity ramp (swift
            # :147-151) — but only if it was ever prepared. set_target on a
            # never-prepared equalizer raises without installing any
            # target; arming the active flag then would send process()
            # into an assert on the missing processors/runtime.
            prepared = bool(
                getattr(self.equalizer, "processors", None)
                or getattr(self.equalizer, "runtime", None)
            )
            self._equalizer_active = prepared
            return AudioEffectPreparationResult(
                frozenset(runnable), _warning_from_error(definition, err)
            )

    @property
    def equalizer_active(self) -> bool:
        return self._equalizer_active

    def process(self, x: np.ndarray) -> np.ndarray:
        """x [B, C, n] -> y [B, 2, n]."""
        x = np.asarray(x, np.float32)
        B, C, n = x.shape
        if n == 0:
            return np.zeros((B, 2, 0), np.float32)
        assert n <= self.config.max_frames_per_callback

        if self.spatial.is_ready:
            y = self.spatial.process(x)
            if self._equalizer_active:
                y = self._run_equalizer(y)
            return y

        # Passthrough with mono duplication (zero latency).
        if C >= 2:
            y = x[:, :2, :].copy()
        else:
            y = np.concatenate([x, x], axis=1)
        if self._equalizer_active:
            y = self._run_equalizer(y)
        return y

    def _run_equalizer(self, y: np.ndarray) -> np.ndarray:
        if hasattr(self.equalizer, "process_batch"):
            return self.equalizer.process_batch(y)
        out = np.empty_like(y)
        for b in range(y.shape[0]):
            out[b, 0], out[b, 1] = self.equalizer.process(
                y[b, 0], y[b, 1], stream=b
            )
        return out
