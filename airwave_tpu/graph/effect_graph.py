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
from typing import Optional, Set

import numpy as np

from airwave_tpu.config import DEFAULT_CONFIG, AirwaveConfig
from airwave_tpu.graph.eq_processor import ParametricEqualizerProcessor
from airwave_tpu.io.apo import EqualizerDefinition
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
        for processor in self.processors:
            processor.set_target(definition)

    def set_target(self, definition: Optional[EqualizerDefinition]) -> None:
        if not self.processors:
            raise errors.EqualizerPreparationError("equalizer not prepared")
        try:
            for processor in self.processors:
                processor.set_target(definition)
        except errors.EqualizerPreparationError:
            # Invalid live preset: fall back to a unity target (swift :29-33).
            for processor in self.processors:
                processor.set_target(None)
            raise

    def process(self, left: np.ndarray, right: Optional[np.ndarray],
                stream: int = 0):
        assert self.processors, "equalizer not prepared"
        assert stream < len(self.processors), (
            f"stream {stream} >= prepared batch {len(self.processors)}; "
            "construct EqualizerEffect(batch=...) to match the graph batch"
        )
        return self.processors[stream].process(left, right)


class AudioEffectGraph:
    """Composes a spatial effect and an equalizer effect.

    `spatial` must expose `is_ready: bool` and
    `process(x: [B, C, n]) -> [B, 2, n]`.
    """

    def __init__(
        self,
        spatial,
        equalizer: Optional[EqualizerEffect] = None,
        config: AirwaveConfig = DEFAULT_CONFIG,
        batch: int = 1,
    ) -> None:
        self.spatial = spatial
        self.equalizer = equalizer or EqualizerEffect(config, batch=batch)
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
            self._equalizer_active = True
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
        out = np.empty_like(y)
        for b in range(y.shape[0]):
            out[b, 0], out[b, 1] = self.equalizer.process(
                y[b, 0], y[b, 1], stream=b
            )
        return out
