"""Host-side equalizer runtime: target publication + crossfade state machine.

Re-implements the observable behavior of
/root/reference/Airwave/ParametricEqualizerProcessor.swift:121-407 for the
TPU engine. The reference interleaves a lock-free control/render-thread
protocol with per-sample crossfade math; here the per-sample math lives in
the device step (ops/eq_block.eq_step — dual cascade + exact ramp blend) and
this class reproduces the control protocol at block granularity:

  - `set_target` publishes a prepared cascade (newest wins while a ramp is in
    flight, :328-339)
  - a publication "lock" seam lets tests simulate control/render contention:
    while held, the render path keeps the prior target (:317-326)
  - finished transitions retire the outgoing cascade into a single-slot
    handoff; if the slot is full the next transition is deferred until the
    control thread drains it (:246-251, 377-407)
  - `reset` is deferred to the next block boundary (:341-352)

Timing granularity: the reference observes publications at callback starts;
we observe at block starts (the only points where host control runs in a
jitted-step architecture). Ramp *values* are exact; a queued target that
completes mid-block starts at the next block boundary (<= one block of skew,
same order as the reference's callback-boundary skew).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

from airwave_tpu.config import DEFAULT_CONFIG, AirwaveConfig
from airwave_tpu.io.apo import EqualizerDefinition
from airwave_tpu.ops import biquad_design as bd
from airwave_tpu.ops import eq_block

_IDLE = int(eq_block.COUNTER_IDLE)


class PreparedEq(NamedTuple):
    """A prepared cascade target (analog of ParametricEqualizerState).

    `design` keeps the (preamp, coeffs) cascade design so consumers that run
    at other block sizes (the live graph's variable callback sizes) can
    materialize size-specific EqParams without redesigning the filters."""

    params: eq_block.EqParams
    definition: Optional[EqualizerDefinition]
    sample_rate: float
    design: tuple = ((), ())


class EqualizerRuntime:
    def __init__(
        self,
        sample_rate: float,
        block_size: int = 512,
        state_dim: int = 128,
        config: AirwaveConfig = DEFAULT_CONFIG,
    ) -> None:
        if not (math.isfinite(sample_rate) and sample_rate > 0):
            from airwave_tpu.utils.errors import EqInvalidSampleRate

            raise EqInvalidSampleRate()
        self.sample_rate = float(sample_rate)
        self.block_size = int(block_size)
        self.state_dim = int(state_dim)
        self.transition_length = config.transition_length(sample_rate)

        unity_design = bd.design_cascade(None, sample_rate)
        self.unity = PreparedEq(
            eq_block.unity_eq_params(block_size, state_dim), None, sample_rate,
            unity_design,
        )
        # Render-side view.
        self.active: PreparedEq = self.unity          # == params_to when idle
        self.transition_from: Optional[PreparedEq] = None
        self.pending_target: Optional[PreparedEq] = None
        self.observed_target: Optional[PreparedEq] = None
        self._samples_into_transition = _IDLE

        # Control<->render slots.
        self._published: Optional[PreparedEq] = None
        self._audio_thread_target: Optional[PreparedEq] = None
        self._retired: Optional[PreparedEq] = None
        self._pending_retirement: Optional[PreparedEq] = None
        self._reset_requested = False
        self._publication_locked = False

    # --- control-thread API -------------------------------------------------

    def prepare(self, definition: Optional[EqualizerDefinition]) -> PreparedEq:
        preamp, coeffs = bd.design_cascade(definition, self.sample_rate)
        params = eq_block.make_eq_params(
            coeffs, preamp, self.block_size, self.state_dim
        )
        return PreparedEq(params, definition, self.sample_rate,
                          (preamp, coeffs))

    def publish(self, prepared: PreparedEq) -> None:
        if prepared.sample_rate != self.sample_rate:
            from airwave_tpu.utils.errors import EqInvalidSampleRate

            raise EqInvalidSampleRate()
        self._published = prepared

    def set_target(self, definition: Optional[EqualizerDefinition]) -> None:
        self.publish(self.prepare(definition))

    def reset(self) -> None:
        self._reset_requested = True

    def drain_retired_states(self) -> None:
        self._retired = None

    def hold_publication_lock_for_testing(self, held: bool) -> None:
        self._publication_locked = held

    @property
    def is_transitioning(self) -> bool:
        return self.transition_from is not None

    # --- checkpoint / resume --------------------------------------------------

    def snapshot(self) -> dict:
        """Capture the render-side crossfade machine: which cascade is
        active, which (if any) it is ramping from, the queued newest-wins
        target, and the ramp clock. Control-plane transients (an
        unobserved publication, retirement slots) are deliberately NOT
        captured — like in-flight audio, they re-establish on the next
        control action. Definitions are stored, not params: `prepare` is
        deterministic, so restore rebuilds bit-identical cascades."""
        def pack(p: Optional[PreparedEq]):
            # The design (preamp, coeffs) is packed too: a PreparedEq built
            # directly (definition=None, custom params via publish()) has no
            # definition to re-derive from, and must NOT silently restore as
            # unity.
            if p is None:
                return None
            if (p.definition is None and p is not self.unity
                    and p.design == ((), ())):
                raise ValueError(
                    "cannot snapshot a definition-less PreparedEq with no "
                    "design — construct targets via prepare() or carry the "
                    "(preamp, coeffs) design"
                )
            return ("prepared", p.definition, p.design)

        return {
            "active": pack(self.active),
            "transition_from": pack(self.transition_from),
            "pending": pack(self.pending_target),
            "samples_into_transition": self._samples_into_transition,
            "reset_requested": self._reset_requested,
        }

    def restore(self, snap: dict) -> None:
        def mk(item) -> Optional[PreparedEq]:
            if item is None:
                return None
            _, definition, *rest = item
            if definition is not None:
                return self.prepare(definition)
            design = rest[0] if rest else self.unity.design
            if tuple(design) == tuple(self.unity.design):
                return self.unity
            # Definition-less custom cascade (published directly): rebuild
            # its params from the packed design.
            preamp, coeffs = design
            params = eq_block.make_eq_params(
                coeffs, preamp, self.block_size, self.state_dim
            )
            return PreparedEq(params, None, self.sample_rate,
                              (preamp, coeffs))

        self.active = mk(snap["active"]) or self.unity
        self.transition_from = mk(snap["transition_from"])
        self.pending_target = mk(snap["pending"])
        self._samples_into_transition = int(snap["samples_into_transition"])
        self._reset_requested = bool(snap["reset_requested"])
        # Fresh control plane: nothing published/observed/retired yet.
        self.observed_target = None
        self._published = None
        self._audio_thread_target = None
        self._retired = None
        self._pending_retirement = None

    # --- render-side protocol (called by the engine per block) ---------------

    def begin_block(self, eq_state: eq_block.EqState):
        """Run the control protocol; returns (eq_state', params_from, params_to,
        reset_mask_applied: bool).

        On a grouped StreamPool each profile group's runtime owns its OWN
        per-group EqState (the tuple design), so this protocol always
        operates on the whole state it is handed — no lane masking."""
        self._observe_published_target()
        self._flush_pending_retirement()

        reset_now = False
        if self._reset_requested:
            self._reset_requested = False
            reset_now = True
            eq_state = eq_block.eq_reset(eq_state)

        # Finish a transition that completed in previous blocks.
        if (
            self.transition_from is not None
            and self._samples_into_transition >= self.transition_length
        ):
            eq_state = self._finish_transition(eq_state)

        # Start a newly-observed transition if allowed.
        if (
            self.pending_target is not None
            and self.transition_from is None
            and self._pending_retirement is None
        ):
            pending, self.pending_target = self.pending_target, None
            if pending is not self.active:
                eq_state = self._begin_transition(eq_state, pending)

        params_from = (
            self.transition_from.params
            if self.transition_from is not None
            else self.active.params
        )
        return eq_state, params_from, self.active.params, reset_now

    def after_block(self, frames: int) -> None:
        if self._samples_into_transition < _IDLE:
            self._samples_into_transition = min(
                self._samples_into_transition + frames, _IDLE
            )

    # --- internals ------------------------------------------------------------

    def _observe_published_target(self) -> None:
        if not self._publication_locked and self._published is not None:
            self._audio_thread_target = self._published

        target = self._audio_thread_target
        if target is None or target is self.observed_target:
            return
        self.observed_target = target
        if self.transition_from is not None:
            if target is not self.active:
                self.pending_target = target  # newest wins
        elif self._pending_retirement is not None:
            self.pending_target = target
        elif target is not self.active:
            self.pending_target = target  # started in begin_block

    def _begin_transition(self, eq_state, target: PreparedEq):
        self.transition_from = self.active
        self.active = target
        self._samples_into_transition = 0
        return eq_block.eq_begin_transition(eq_state)

    def _finish_transition(self, eq_state):
        outgoing = self.transition_from
        self.transition_from = None
        self._samples_into_transition = _IDLE
        self._retire(outgoing)
        # Idle the lanes' ramp counters: a lane that paused mid-ramp jumps
        # to the target now that the wall-clock ramp is over (it must not
        # resume blending if a later block still runs the crossfading path
        # for a queued target).
        return eq_block.eq_finish_transition(eq_state)

    def _retire(self, state: PreparedEq) -> None:
        if self._pending_retirement is not None:
            return
        if self._retired is None:
            self._retired = state
        else:
            self._pending_retirement = state

    def _flush_pending_retirement(self) -> None:
        if self._pending_retirement is None:
            return
        if self._retired is None:
            self._retired = self._pending_retirement
            self._pending_retirement = None
