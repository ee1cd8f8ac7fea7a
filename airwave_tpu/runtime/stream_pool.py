"""StreamPool: the multi-stream serving engine.

The production-scale composition the north star targets (BASELINE.json:
"thousands of concurrent streams"): ragged per-stream ingest through the
native C++ assembler, dense masked device steps, per-stream drain with the
reference's underflow contract. One pool shares one (HRIR, EQ) preset set and
sample rate across its slots; per-stream lifecycle is attach/push/pump/pull/
detach. Streams advance ONLY when a full block of their own input exists
(ref RealtimeAudioProcessor.swift:112-115) — the masked shift-register conv
keeps inactive carries untouched.

EQ semantics: retargets are pool-wide (one preset set per pool). Streams
actively rendering during the 20 ms ramp crossfade per-sample exactly; a
stream that is idle across the entire ramp hears the new target directly when
it resumes (its own carry never blended — the ramp is a wall-clock event, and
an idle stream has no samples to blend).
"""

from __future__ import annotations

import functools
from collections import deque
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from airwave_tpu.config import DEFAULT_CONFIG, AirwaveConfig
from airwave_tpu.graph.eq_runtime import EqualizerRuntime
from airwave_tpu.graph.renderer import RendererState
from airwave_tpu.io.apo import EqualizerDefinition
from airwave_tpu.native import RaggedAssembler
from airwave_tpu.ops import eq_block, upols


class PoolState(NamedTuple):
    conv: upols.ConvState
    eq: eq_block.EqState


@functools.partial(
    jax.jit,
    static_argnames=("transition_length", "eq_enabled", "eq_crossfading"),
    donate_argnums=(3,),
)
def _pool_step(conv_params, eq_from, eq_to, state, x, active,
               transition_length, eq_enabled, eq_crossfading):
    # NOTE: the bake path's EQ-into-synthesis fold was measured on this
    # step too and REJECTED (fused 10.5 vs plain 8.5 ms/block at B=8192 —
    # the dual projections re-constrain layouts; BENCH_NOTES.md round-2
    # addendum). The fold is multi-block-only.
    conv_state, eq_state = state
    mask = active.astype(bool)
    conv_state, y = upols.conv_step_rolled(conv_params, conv_state, x, mask)
    if eq_enabled:
        new_eq, y = eq_block.eq_step(
            eq_from, eq_to, eq_state, y, transition_length, eq_crossfading
        )
        eq_state = eq_block.EqState(
            s_from=jnp.where(mask[:, None, None], new_eq.s_from,
                             eq_state.s_from),
            s_to=jnp.where(mask[:, None, None], new_eq.s_to, eq_state.s_to),
            counter=jnp.where(mask, new_eq.counter, eq_state.counter),
        )
    return PoolState(conv_state, eq_state), y


class StreamPool:
    def __init__(
        self,
        max_streams: int,
        sample_rate: float,
        renderer: RendererState,
        eq_definition: Optional[EqualizerDefinition] = None,
        block_size: int = 512,
        ring_blocks: int = 16,
        config: AirwaveConfig = DEFAULT_CONFIG,
    ) -> None:
        self.max_streams = int(max_streams)
        self.sample_rate = float(sample_rate)
        self.block_size = int(block_size)
        self.renderer = renderer
        self.config = config
        speakers = renderer.num_speakers

        self.assembler = RaggedAssembler(
            max_streams, speakers, block_size,
            capacity=block_size * ring_blocks,
        )
        self._out = RaggedAssembler(
            max_streams, 2, block_size, capacity=block_size * ring_blocks
        )
        self.eq_runtime = EqualizerRuntime(
            sample_rate, block_size, config.eq_state_dim, config
        )
        self._eq_enabled = eq_definition is not None
        if eq_definition is not None:
            self.eq_runtime.set_target(eq_definition)

        self._state = PoolState(
            conv=upols.make_conv_state(
                self.max_streams, speakers, renderer.partition_count,
                block_size,
            ),
            eq=eq_block.make_eq_state(self.max_streams, 2,
                                      config.eq_state_dim),
        )
        self._attached: Dict[int, bool] = {}
        self._free = list(range(max_streams - 1, -1, -1))
        # Safety net for unlocked concurrent pull/pump races: rendered
        # blocks whose output ring filled between the harvest-time space
        # check and delivery stash here IN ORDER and re-flush on pull. In
        # lock-serialized use (the render server) this stays empty — pump
        # simply does not harvest a stream whose output ring lacks a free
        # block, so backpressure reaches the producer through the INPUT
        # ring (push raises OverflowError) instead of surfacing after the
        # carry has already advanced past the rendered block.
        self._pending_out: Dict[int, deque] = {}
        self.rounds = 0
        self.blocks_rendered = 0
        self.render_errors = 0

    # --- stream lifecycle -----------------------------------------------------------

    def attach(self) -> int:
        if not self._free:
            raise RuntimeError("pool is full")
        stream = self._free.pop()
        self._attached[stream] = True
        self.assembler.reset_stream(stream)
        self._out.reset_stream(stream)
        self._reset_state_rows(stream)
        return stream

    def detach(self, stream: int) -> None:
        if self._attached.pop(stream, None):
            self._free.append(stream)
            self._pending_out.pop(stream, None)
            self.assembler.reset_stream(stream)
            self._out.reset_stream(stream)

    def _reset_state_rows(self, stream: int) -> None:
        mask = np.zeros(self.max_streams, bool)
        mask[stream] = True
        m = jnp.asarray(mask)
        self._state = PoolState(
            conv=upols.conv_reset(self._state.conv, m),
            eq=eq_block.eq_reset(self._state.eq, m),
        )

    # --- control ----------------------------------------------------------------------

    def set_equalizer(self, definition: Optional[EqualizerDefinition]) -> None:
        """Retarget the pool EQ. `None` on an EQ-less pool stays a no-op
        (symmetric with the constructor); `None` on an active pool crossfades
        to unity and keeps the EQ in the step for the ramp (the reference
        keeps the EQ in the callback after removal for exactly this,
        AudioEffectGraph.swift:147-151)."""
        if definition is None and not self._eq_enabled:
            return
        self.eq_runtime.set_target(definition)
        self._eq_enabled = True

    def set_renderer(self, renderer: RendererState) -> None:
        """Pool-wide HRIR hot-swap: conv history restarts for every stream
        (the reference builds fresh engines per activation). A speaker- or
        partition-count change reallocates the conv carry."""
        old = self.renderer
        self.renderer = renderer
        same_shape = (
            old.num_speakers == renderer.num_speakers
            and old.partition_count == renderer.partition_count
        )
        if same_shape:
            self._state = PoolState(
                conv=upols.conv_reset(self._state.conv), eq=self._state.eq
            )
            return
        if old.num_speakers != renderer.num_speakers:
            raise ValueError(
                "renderer speaker count must match the pool's input layout"
            )
        self._state = PoolState(
            conv=upols.make_conv_state(
                self.max_streams, renderer.num_speakers,
                renderer.partition_count, self.block_size,
            ),
            eq=self._state.eq,
        )

    # --- data plane -------------------------------------------------------------------

    def push(self, stream: int, chunk: np.ndarray) -> None:
        """chunk: [speakers, n] (or [1, n] mono, duplicated)."""
        chunk = np.asarray(chunk, np.float32)
        if chunk.ndim == 1:
            chunk = chunk[None]
        speakers = self.renderer.num_speakers
        if chunk.shape[0] == 1 and speakers > 1:
            chunk = np.repeat(chunk, speakers, axis=0)
        self.assembler.push(stream, chunk)

    def pump(self, max_rounds: int = 64) -> int:
        """Render while any stream has a full block. Returns rounds run."""
        rounds = 0
        while rounds < max_rounds and self.assembler.ready_count() > 0:
            # Only harvest streams whose output ring can take the rendered
            # block — a slow reader's stream stays un-harvested (and its
            # producer eventually sees input-ring backpressure) instead of
            # overflowing after the carry has advanced.
            allow = self._out.out_free_all() >= self.block_size
            indices, blocks = self.assembler.harvest_allowed(
                self.max_streams, allow
            )
            if len(indices) == 0:
                break
            x = np.zeros(
                (self.max_streams, self.renderer.num_speakers,
                 self.block_size),
                np.float32,
            )
            active = np.zeros(self.max_streams, np.float32)
            x[indices] = blocks
            active[indices] = 1.0

            eq_state, p_from, p_to, _ = self.eq_runtime.begin_block(
                self._state.eq
            )
            crossfading = (
                self.eq_runtime.is_transitioning
                or self.eq_runtime.pending_target is not None
            )
            try:
                state, y = _pool_step(
                    self.renderer.conv_params, p_from, p_to,
                    PoolState(self._state.conv, eq_state),
                    jnp.asarray(x), jnp.asarray(active),
                    transition_length=self.eq_runtime.transition_length,
                    eq_enabled=self._eq_enabled,
                    eq_crossfading=crossfading,
                )
            except Exception:
                # The step donates the carry, so after a device failure
                # the old buffers may already be consumed — rebuild fresh
                # per-stream state (the reference's recovery is likewise a
                # fresh pipeline; ConvolutionEngine history resets). The
                # blocks harvested for THIS round are lost to the failure
                # and surface as underflow zeros at pull time; the pool
                # itself stays usable for the next round.
                self._state = PoolState(
                    conv=upols.make_conv_state(
                        self.max_streams, self.renderer.num_speakers,
                        self.renderer.partition_count, self.block_size,
                    ),
                    eq=eq_block.make_eq_state(
                        self.max_streams, 2, self.config.eq_state_dim
                    ),
                )
                self.render_errors += 1
                raise
            self._state = state
            self.eq_runtime.after_block(self.block_size)

            self._deliver(indices, np.asarray(y)[indices])
            self.rounds += 1
            self.blocks_rendered += len(indices)
            rounds += 1
        return rounds

    def _deliver(self, indices: np.ndarray, blocks: np.ndarray) -> None:
        """Queue rendered blocks. Harvest gating guarantees space at
        harvest time, so the single atomic scatter is the whole fast path;
        an unlocked pull racing the round can still shrink a ring between
        check and write, in which case the affected blocks stash in order
        (scatter is all-or-nothing, so nothing double-delivers)."""
        if not self._pending_out:
            try:
                self._out.scatter(indices, blocks)
                return
            except OverflowError:
                pass
        for j, stream in enumerate(int(s) for s in indices):
            queue = self._pending_out.get(stream)
            if queue is None and self._out.try_push_out(stream, blocks[j]):
                continue
            if queue is None:
                queue = self._pending_out.setdefault(stream, deque())
            queue.append(np.array(blocks[j]))

    def _flush_pending(self, stream: int) -> None:
        queue = self._pending_out.get(stream)
        while queue and self._out.try_push_out(stream, queue[0]):
            queue.popleft()
        if queue is not None and not queue:
            self._pending_out.pop(stream, None)

    def pull(self, stream: int, frames: int) -> np.ndarray:
        """Drain rendered stereo; zero-fills on underflow (latency contract)."""
        pieces = []
        left = frames
        while left > 0:
            self._flush_pending(stream)
            avail = self._out.out_available(stream)
            if avail <= 0:
                break
            take = min(left, avail)
            pieces.append(self._out.pop(stream, take))
            left -= take
            if stream not in self._pending_out:
                break
        if left > 0 or not pieces:
            pieces.append(self._out.pop(stream, left))  # zero-fills
        return pieces[0] if len(pieces) == 1 else np.concatenate(pieces, 1)

    def available(self, stream: int) -> int:
        return self._out.out_available(stream) + sum(
            b.shape[1] for b in self._pending_out.get(stream, ())
        )
