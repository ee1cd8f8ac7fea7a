"""Flagship model: batched virtual-speaker binaural render chain.

One jitted step reproduces the reference's realtime render stack
(SURVEY.md §3.1; /root/reference/Airwave/AudioEffectGraph.swift:179-246 ->
HRIRManager.processAudio -> ConvolutionEngine x(2 speakers x 2 ears) ->
ParametricEqualizerProcessor) for B streams at once:

    (carry, x[B, S, T]) -> (carry', y[B, 2, T])

with carry = {FDL, eq dual-state, crossfade counters}. The fixed
spatial->EQ ordering, stereo passthrough, and unity-EQ retention semantics
follow the reference graph; enable flags are static so each graph topology
compiles once.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from airwave_tpu.config import DEFAULT_CONFIG, AirwaveConfig
from airwave_tpu.graph.eq_runtime import EqualizerRuntime
from airwave_tpu.graph.renderer import RendererState
from airwave_tpu.io.apo import EqualizerDefinition
from airwave_tpu.ops import eq_block, upols


class ChainState(NamedTuple):
    conv: upols.ConvState
    eq: eq_block.EqState


def chain_step_fn(
    conv_params: upols.ConvParams,
    eq_from: eq_block.EqParams,
    eq_to: eq_block.EqParams,
    state: ChainState,
    x: jax.Array,
    transition_length: int,
    spatial_enabled: bool,
    eq_enabled: bool,
    eq_crossfading: bool = True,
    xfade_ramp: Optional[jax.Array] = None,
):
    """x [B, S, T] -> (state', y [B, 2, T]). Spatial THEN eq (fixed order).

    `xfade_ramp` [T] (with conv_params = upols.xfade_conv_params(old, new))
    runs one block of a glitch-free HRIR hot-swap: the dual-ear bank's
    halves blend per sample BEFORE the EQ, so the EQ state is driven by
    the blended signal exactly as a physical time-varying filter would.

    The bake path's EQ-into-synthesis fold was measured on THIS step too
    (upols.conv_step posts=...) and REJECTED: the dual projection outputs
    re-constrain XLA's layout assignment so the FDL slot write stops being
    in-place (a 2.25 ms/block full-line copy appears) and the MAC dot
    slows 1.28 -> 1.66 ms/block — 6.6 vs 4.0 ms/block end-to-end
    (BENCH_NOTES.md round-2 addendum). The fold stays multi-block-only
    (chain_step_multi_fn), where the paged delay line has no slot write."""
    conv_state, eq_state = state
    if spatial_enabled:
        conv_state, y = upols.conv_step(conv_params, conv_state, x)
        if xfade_ramp is not None:
            y = upols.xfade_blend(y, xfade_ramp)
    else:
        # Passthrough: stereo input forwarded, mono duplicated
        # (ref AudioEffectGraph.swift:223-245).
        if x.shape[1] >= 2:
            y = x[:, :2, :]
        else:
            y = jnp.concatenate([x, x], axis=1)
    if eq_enabled:
        eq_state, y = eq_block.eq_step(
            eq_from, eq_to, eq_state, y, transition_length, eq_crossfading
        )
    return ChainState(conv_state, eq_state), y


chain_step = functools.partial(
    jax.jit,
    static_argnames=(
        "transition_length",
        "spatial_enabled",
        "eq_enabled",
        "eq_crossfading",
    ),
    donate_argnums=(3,),
)(chain_step_fn)


def chain_step_multi_fn(
    conv_params: upols.ConvParams,
    eq_from: eq_block.EqParams,
    eq_to: eq_block.EqParams,
    state: ChainState,
    x: jax.Array,
    transition_length: int,
    eq_enabled: bool,
    eq_crossfading: bool = False,
    acc_chunk: int | None = None,
):
    """Throughput (bake) variant: x [B, S, M, T] -> (state', y [B, M, 2, T]).

    The spatial stage renders all M blocks against one delay-line read
    (upols.conv_step_paged — conv_params must be built with lookahead=M and
    state.conv with make_conv_state_paged); the stateful EQ then runs the M
    outputs in order, so the result is block-for-block identical to M
    chain_step_fn calls. Surrounding scans should unroll by the page count
    (see conv_step_paged).

    Steady state (eq_crossfading=False) takes the folded fast path: the
    EQ's Toeplitz FIR and state-drive matrices fold into the convolution's
    synthesis-DFT weights (upols.paged_project), so the spatial output
    never materializes and the per-block FIR matmuls disappear; only the
    EQ's tiny sequential state recurrence remains
    (eq_block.eq_apply_folded). Measured on-chip: same math, one fewer
    full-size MXU pass per block (BENCH_NOTES.md round-2 addendum)."""
    conv_state, eq_state = state
    if eq_enabled and not eq_crossfading:
        conv_state, eq_state, y = eq_block.eq_folded_paged_round(
            conv_params, eq_to, conv_state, eq_state, x, acc_chunk
        )
        return ChainState(conv_state, eq_state), y
    conv_state, y = upols.conv_step_paged(conv_params, conv_state, x,
                                          acc_chunk)
    if eq_enabled:
        # Unrolled (M is small and static): lets XLA fuse across blocks
        # instead of paying lax.scan's per-iteration stacking.
        outs = []
        for m in range(x.shape[2]):
            eq_state, ym = eq_block.eq_step(
                eq_from, eq_to, eq_state, y[:, m], transition_length,
                eq_crossfading,
            )
            outs.append(ym)
        y = jnp.stack(outs, axis=1)
    return ChainState(conv_state, eq_state), y


class BinauralEngine:
    """Host wrapper: owns device state, preset hot-swap, and the EQ runtime.

    The analog of the reference's AudioEffectGraph + HRIRManager render path,
    batched. Renderer swaps replace device params and reset conv state
    (the reference builds fresh engines per activation, HRIRManager.swift:406-415);
    EQ retargets crossfade via the EqualizerRuntime protocol.
    """

    def __init__(
        self,
        batch: int,
        sample_rate: float,
        block_size: int = 512,
        renderer: Optional[RendererState] = None,
        config: AirwaveConfig = DEFAULT_CONFIG,
    ) -> None:
        self.batch = int(batch)
        self.sample_rate = float(sample_rate)
        self.block_size = int(block_size)
        self.config = config
        self.eq_runtime = EqualizerRuntime(
            sample_rate, block_size, config.eq_state_dim, config
        )
        self._eq_active = False
        self.renderer: Optional[RendererState] = None
        self._state: Optional[ChainState] = None
        # Active device bank (may be the renderer's params zero-padded to
        # the carry's partition count after a crossfaded shorter-HRIR
        # swap), plus the hot-swap crossfade in flight: the dual-ear bank
        # and the per-block ramp segments still to play.
        self._conv_params: Optional[upols.ConvParams] = None
        self._xfade_params: Optional[upols.ConvParams] = None
        self._xfade_segments: list = []
        if renderer is not None:
            self.set_renderer(renderer)
        else:
            self._alloc_state(num_speakers=2, partitions=1)

    # --- control path ---------------------------------------------------------

    def _alloc_state(self, num_speakers: int, partitions: int) -> None:
        self._state = ChainState(
            conv=upols.make_conv_state(
                self.batch, num_speakers, partitions, self.block_size
            ),
            eq=(
                self._state.eq
                if self._state is not None
                else eq_block.make_eq_state(
                    self.batch, 2, self.config.eq_state_dim
                )
            ),
        )

    def set_renderer(self, renderer: Optional[RendererState],
                     crossfade: bool = True) -> bool:
        """Hot-swap the HRIR renderer.

        With `crossfade=True` (default) a same-shape swap is GLITCH-FREE:
        the delay line stores bank-independent input spectra, so the full
        conv history (the reverb tail) is preserved exactly and the next
        ~20 ms of output blends old->new per sample (the ideal
        time-varying filter — upols.xfade_conv_params). A shorter new
        bank is zero-padded onto the current carry shape automatically.
        Returns True when the swap crossfaded; False when history reset
        (crossfade=False, no prior renderer, or an incompatible shape —
        the reference's fresh-engines semantics,
        HRIRManager.swift:406-415). A second swap mid-fade is
        newest-wins: the fade restarts toward the newest bank FROM the
        blend the output currently hears (the interrupted fade's banks
        lerped at the boundary ramp position), so even swap bursts are
        click-free."""
        old = self.renderer
        old_params = self._conv_params
        self.renderer = renderer
        if renderer is None:
            self._conv_params = None
            self._xfade_params = None
            self._xfade_segments = []
            return False
        if (crossfade and old is not None and old_params is not None
                and self._state is not None
                and old.num_speakers == renderer.num_speakers
                and renderer.partition_count
                <= old_params.partition_count):
            cur_p = old_params.partition_count
            # Fade FROM whatever the output currently hears. Mid-fade (a
            # second swap interrupting a pending crossfade) that is the
            # previous fade's blend FROZEN at the ramp position the next
            # sample would have used — banks are linear in the output,
            # so the lerped bank reproduces the heard blend exactly and
            # the restart is click-free. (Fading from the pure new half
            # instead would step the output filter by (1-r)*(new-old) at
            # the block boundary — an audible click, the glitch this
            # feature exists to remove.)
            if self._xfade_params is not None and self._xfade_segments:
                r0 = float(self._xfade_segments[0][0])
                E = old_params.num_ears
                prev_old = self._xfade_params._replace(
                    Gflip2=self._xfade_params.Gflip2[:, :E]
                )
                old_params = upols.lerp_bank(prev_old, old_params, r0)
            self._conv_params = upols.pad_conv_params(
                renderer.conv_params, cur_p
            )
            self._xfade_params = upols.xfade_conv_params(
                old_params, self._conv_params
            )
            T = self.block_size
            fade = max(1, int(round(
                self.sample_rate
                * self.config.crossfade_duration_seconds)))
            full = upols.xfade_ramp(fade, fade + (-fade) % T)
            self._xfade_segments = [
                jnp.asarray(full[i:i + T])
                for i in range(0, len(full), T)
            ]
            return True
        self._conv_params = renderer.conv_params
        self._xfade_params = None
        self._xfade_segments = []
        if (old is None or self._state is None
                or (old.num_speakers, old_params.partition_count)
                != (renderer.num_speakers, renderer.partition_count)):
            self._alloc_state(renderer.num_speakers,
                              renderer.partition_count)
        else:
            self._state = ChainState(
                conv=upols.conv_reset(self._state.conv), eq=self._state.eq
            )
        return False

    @property
    def spatial_ready(self) -> bool:
        return self.renderer is not None

    def set_equalizer(self, definition: Optional[EqualizerDefinition]) -> None:
        """Live retarget; keeps the EQ in the chain for the unity ramp when
        removed (ref AudioEffectGraph.swift:147-151)."""
        self.eq_runtime.set_target(definition)
        self._eq_active = True

    def prepare_equalizer(self, definition: Optional[EqualizerDefinition]) -> None:
        """Full (re)prepare; a nil definition bypasses the EQ for a new
        pipeline (ref AudioEffectGraph.swift:94-114)."""
        self.eq_runtime.set_target(definition)
        self._eq_active = definition is not None

    def reset(self) -> None:
        if self._state is not None:
            self._state = ChainState(
                conv=upols.conv_reset(self._state.conv),
                eq=self._state.eq,
            )
        # A zeroed history has nothing to blend: jump to the fade target.
        self._xfade_params = None
        self._xfade_segments = []
        self.eq_runtime.reset()

    # --- render path ------------------------------------------------------------

    def process_block(self, x: np.ndarray) -> np.ndarray:
        """x [B, S, T] float32 -> y [B, 2, T] float32 (one fixed block)."""
        assert x.shape[0] == self.batch and x.shape[2] == self.block_size
        spatial = self.spatial_ready
        if spatial:
            assert x.shape[1] == self.renderer.num_speakers, (
                x.shape,
                self.renderer.num_speakers,
            )

        # The engine is its own control thread: drain the retirement
        # handoff per block, or the single-slot backpressure wedges every
        # retarget after the second completed transition (see
        # stream_pool._begin_eq_round).
        self.eq_runtime.drain_retired_states()
        eq_state, p_from, p_to, _ = self.eq_runtime.begin_block(self._state.eq)
        state = ChainState(self._state.conv, eq_state)
        xfade_ramp = None
        if spatial and self._xfade_segments:
            conv_params = self._xfade_params
            xfade_ramp = self._xfade_segments.pop(0)
            if not self._xfade_segments:
                self._xfade_params = None
        elif spatial:
            conv_params = self._conv_params
        else:
            conv_params = _dummy_conv_params(self.block_size)
        crossfading = (
            self.eq_runtime.is_transitioning
            or self.eq_runtime.pending_target is not None
        )
        state, y = chain_step(
            conv_params,
            p_from,
            p_to,
            state,
            jnp.asarray(x, jnp.float32),
            self.eq_runtime.transition_length,
            spatial,
            self._eq_active,
            crossfading,
            xfade_ramp=xfade_ramp,
        )
        self._state = state
        self.eq_runtime.after_block(self.block_size)
        return np.asarray(y)

    @property
    def state(self) -> ChainState:
        return self._state


@functools.lru_cache(maxsize=4)
def _dummy_conv_params(block_size: int) -> upols.ConvParams:
    """Placeholder params for the passthrough topology (never read)."""
    hrir = np.zeros((1, 2, 1), np.float32)
    return upols.make_conv_params(hrir, block_size)
