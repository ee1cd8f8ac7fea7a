"""StreamPool: the multi-stream serving engine.

The production-scale composition the north star targets (BASELINE.json:
"thousands of concurrent streams"): ragged per-stream ingest through the
native C++ assembler, dense masked device steps, per-stream drain with the
reference's underflow contract. One pool shares one (HRIR, EQ) preset set and
sample rate across its slots; per-stream lifecycle is attach/push/pump/pull/
detach. Streams advance ONLY when a full block of their own input exists
(ref RealtimeAudioProcessor.swift:112-115) — the shared-cursor ring step
preserves inactive carries exactly (masked slot write + per-lane alignment
debt repaid by a roll at rejoin; see pool_step_body and BENCH_NOTES.md
round-3).

Two serving tiers share this class:
  - blocks_per_step=1 (default): zero added latency, the shared-cursor
    ring FDL step (the reference adapter's one-block contract).
  - blocks_per_step=M: the THROUGHPUT tier — each round renders M blocks
    per lane on the bake path's paged delay line with the EQ folded into
    the synthesis DFT (upols.conv_step_paged_raw + eq_apply_folded), at
    the cost of up to M blocks of latency. Idle lanes are preserved by
    recycling their oldest page; alignment debt is page-granular and
    repaid by upols.conv_roll_lanes_paged at rejoin.

EQ semantics: retargets are pool-wide (one preset set per pool) unless the
pool is GROUPED. Streams actively rendering during the 20 ms ramp crossfade
per-sample exactly; a stream that is idle across the entire ramp hears the
new target directly when it resumes (its own carry never blended — the ramp
is a wall-clock event, and an idle stream has no samples to blend). The
wall clock is the pump-round clock; when it ends, lanes that paused
mid-ramp JUMP to the target (their counters idle at transition end —
eq_block.eq_finish_transition), so a group's ramp semantics never depend
on other groups' ramps keeping the crossfading step alive. A lane
attaching mid-ramp likewise hears the active target directly.

PROFILE GROUPS (multi-tenant serving, beyond the reference's one-profile-at-
a-time model): `StreamPool(profiles=[PoolProfile(renderer, eq), ...])`
serves G distinct (HRIR, EQ) profiles out of ONE pool and ONE device step
per round. The lane space splits into G contiguous equal segments (attach
takes `group=`) and EACH GROUP CARRIES ITS OWN LANE STATE (a tuple of
per-group ConvState/EqState): the round stages the harvest once, then runs
G independent ungrouped chains on free leading-axis slices and concatenates
the outputs — one dispatch, and every dot keeps the measured-optimal
single-bank shape. Three one-array formulations (group as a dot k-batch
dim; static minor-axis delay-line slices; one all-groups dot + selects)
were measured on-chip and all pay ~0.5-2 ms/block of relayout the tuple
design avoids (BENCH_NOTES round-3 late: 4.27 vs 5.98-7.54 ms at
B=8192/G=4; ungrouped 4.09). Per-group live retargets
(set_equalizer(.., group=g) crossfades only that group's lanes;
set_renderer(.., group=g) restarts only that group's conv history). All
profiles must share speaker count and block size; partition counts (HRIR
lengths) MAY differ per group — each group's delay line is its own.
"""

from __future__ import annotations

import functools
import os
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

# Device-step lowering. "ring" (default): all lanes share one FDL write
# cursor; a round's slot write is ONE in-place dynamic_update_slice (1/P2
# of the line), inactive lanes' slot preserved by a cheap masked
# read-back, and lanes that sat rounds out are re-aligned by a bucketed
# per-lane roll before they next step (upols.conv_roll_lanes). "rolled"
# keeps round 2's masked shift-register step (a full delay-line rewrite
# per block, measured ~2.2x slower at B=8192) for re-measurement.
_POOL_STEP = os.environ.get("AIRWAVE_POOL_STEP", "ring").lower()
if _POOL_STEP not in ("ring", "rolled"):
    raise ValueError(
        f"AIRWAVE_POOL_STEP={_POOL_STEP!r}: expected ring or rolled"
    )


class PoolState(NamedTuple):
    conv: upols.ConvState
    eq: eq_block.EqState


class PoolProfile(NamedTuple):
    """One tenant profile of a grouped pool: a prepared renderer plus an
    optional EQ preset (None = unity). All profiles of one pool must share
    (speaker count, block size, partition count, lookahead)."""

    renderer: RendererState
    eq_definition: Optional[EqualizerDefinition] = None


def pool_step_body(conv_params, eq_from, eq_to, state, blocks, idx,
                   transition_length, eq_enabled, eq_crossfading,
                   variant=_POOL_STEP, xfade_ramp=None, xfade_mask=None):
    """One pool round: scatter the harvested rows into the dense batch on
    device, step the masked chain, gather the harvested rows back.

    blocks [kb, S, T] / idx [kb] int32 are the harvest bucket (pad rows
    carry idx == max_streams and are dropped by the scatter); only the
    harvested output rows travel back to the host, so per-round transfer
    scales with the harvest, not the pool size.

    Variants "paged" / "paged_all" are the multi-block throughput tier
    (StreamPool(blocks_per_step=M)): blocks is [kb, S, M, T] and the round
    runs the M-block lookahead chain (paged delay line + folded EQ) —
    see _pool_round_paged.

    `xfade_ramp` [round frames] + `xfade_mask` [B] bool run a glitch-free
    HRIR hot-swap round (StreamPool.set_renderer): conv_params is the
    dual-ear bank (upols.xfade_conv_params — ear axis doubled, ears [0,2)
    OLD / [2,4) NEW) over the UNCHANGED delay line, and masked lanes blend
    old->new per sample before the EQ (unmasked lanes take the pure new
    half). On a grouped pool only the swapped groups' params are dual;
    single-bank groups ignore the ramp.

    NOTE: the bake path's EQ-into-synthesis fold was measured on the
    SINGLE-block step too and REJECTED (fused 10.5 vs plain 8.5 ms/block
    at B=8192 — the dual projections re-constrain layouts; BENCH_NOTES.md
    round-2 addendum). The fold is multi-block-only.
    """
    if type(conv_params) is tuple:  # G-tuple of per-group ConvParams
        return _pool_round_grouped(
            conv_params, eq_from, eq_to, state, blocks, idx,
            transition_length, eq_enabled, eq_crossfading, variant,
            xfade_ramp, xfade_mask,
        )
    if variant in ("paged", "paged_all", "paged_id"):
        return _pool_round_paged(
            conv_params, eq_from, eq_to, state, blocks, idx,
            transition_length, eq_enabled, eq_crossfading, variant,
            xfade_ramp, xfade_mask,
        )
    conv_state, eq_state = state
    B = conv_state.fdl.shape[-1]
    S, T = blocks.shape[1], blocks.shape[-1]
    if variant in ("ring_all", "ring_id"):
        # ring_all: every ATTACHED lane is in this harvest (pump checks),
        # so only free lanes are "inactive" — their slot/EQ
        # garbage is harmless (attach resets the lane) and the masking
        # machinery (slot read-back + wheres) is skipped entirely.
        # ring_id: additionally k == max_streams, and harvest order is
        # ascending, so idx IS arange(B) (pump verifies) — the harvest
        # rows ARE the dense batch and the input scatter + output gather
        # (two full-batch layout passes XLA cannot elide for a dynamic
        # idx) are skipped too: the saturated steady state pays zero
        # staging.
        identity = variant == "ring_id"
        if identity:
            assert blocks.shape[0] == B, (blocks.shape, B)
            x = blocks
        else:
            x = jnp.zeros((B, S, T), jnp.float32).at[idx].set(
                blocks, mode="drop")
        conv_state, y = upols.conv_step(conv_params, conv_state, x)
        if xfade_ramp is not None:
            y = upols.xfade_blend(y, xfade_ramp, xfade_mask)
        if eq_enabled:
            eq_state, y = eq_block.eq_step(
                eq_from, eq_to, eq_state, y, transition_length,
                eq_crossfading,
            )
        y_rows = y if identity else jnp.take(
            y, jnp.minimum(idx, B - 1), axis=0)
        return PoolState(conv_state, eq_state), y_rows
    x = jnp.zeros((B, S, T), jnp.float32).at[idx].set(blocks, mode="drop")
    mask = jnp.zeros((B,), jnp.bool_).at[idx].set(True, mode="drop")
    if variant == "rolled":
        conv_state, y = upols.conv_step_rolled(
            conv_params, conv_state, x, mask
        )
    else:
        conv_state, y = upols.conv_step(conv_params, conv_state, x, mask)
    if xfade_ramp is not None:
        y = upols.xfade_blend(y, xfade_ramp, xfade_mask)
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
    y_rows = jnp.take(y, jnp.minimum(idx, B - 1), axis=0)
    return PoolState(conv_state, eq_state), y_rows


def _pool_round_paged(conv_params, eq_from, eq_to, state, blocks, idx,
                      transition_length, eq_enabled, eq_crossfading,
                      variant, xfade_ramp=None, xfade_mask=None):
    """One multi-block pool round (the blocks_per_step=M throughput tier):
    blocks [kb, S, M, T] -> y_rows [kb, M, E, T].

    The spatial stage is the bake path's paged lookahead step (one
    delay-line read per M blocks, zero rewrite traffic); in steady state
    (eq_crossfading=False) the EQ's Toeplitz FIR and state-drive matrices
    fold into the synthesis-DFT weights exactly as in
    models/binaural.chain_step_multi_fn, so the spatial output never
    materializes. "paged_all" skips the lane masking when every attached
    lane is in the harvest (the common serving round); "paged" preserves
    idle lanes by recycling their oldest page (upols.conv_step_paged_raw
    active_mask) — the pool repays the resulting page-granular rotation
    debt with a roll at rejoin, mirroring the single-block ring design;
    "paged_id" is the saturated steady state (k == max_streams, idx ==
    arange — pump verifies): the harvest rows ARE the dense batch, so the
    input scatter and output gather are skipped entirely."""
    conv_state, eq_state = state
    B = conv_state.pages[0].shape[-1]
    S, T = blocks.shape[1], blocks.shape[-1]
    M = blocks.shape[2]
    identity = variant == "paged_id"
    if identity:
        assert blocks.shape[0] == B, (blocks.shape, B)
        x = blocks
    else:
        x = jnp.zeros((B, S, M, T), jnp.float32).at[idx].set(
            blocks, mode="drop")
    mask = None
    if variant == "paged":
        mask = jnp.zeros((B,), jnp.bool_).at[idx].set(True, mode="drop")
    # A hot-swap round blends the dual bank's halves BEFORE the EQ (the
    # blended signal drives the EQ state, as a physical time-varying
    # filter would), so the EQ-into-synthesis fold — which never
    # materializes the spatial output — is bypassed for that one round.
    if eq_enabled and not eq_crossfading and xfade_ramp is None:
        conv_state, new_eq, y = eq_block.eq_folded_paged_round(
            conv_params, eq_to, conv_state, eq_state, x, active_mask=mask
        )
    else:
        conv_state, y = upols.conv_step_paged(
            conv_params, conv_state, x, active_mask=mask
        )
        if xfade_ramp is not None:
            y = upols.xfade_blend(y, xfade_ramp, xfade_mask)
        new_eq = eq_state
        if eq_enabled:
            outs = []
            for m in range(M):
                new_eq, ym = eq_block.eq_step(
                    eq_from, eq_to, new_eq, y[:, m], transition_length,
                    eq_crossfading,
                )
                outs.append(ym)
            y = jnp.stack(outs, axis=1)
    if eq_enabled:
        if mask is None:
            eq_state = new_eq
        else:
            eq_state = eq_block.EqState(
                s_from=jnp.where(mask[:, None, None], new_eq.s_from,
                                 eq_state.s_from),
                s_to=jnp.where(mask[:, None, None], new_eq.s_to,
                               eq_state.s_to),
                counter=jnp.where(mask, new_eq.counter, eq_state.counter),
            )
    # [kb, M, E, T]
    y_rows = y if identity else jnp.take(y, jnp.minimum(idx, B - 1), axis=0)
    return PoolState(conv_state, eq_state), y_rows


def _pool_round_grouped(conv_params, eq_from, eq_to, state, blocks, idx,
                        transition_length, eq_enabled, eq_crossfading,
                        variant, xfade_ramp=None, xfade_mask=None):
    """One round of a PROFILE-GROUPED pool: G independent per-group chains
    over each group's OWN lane state (conv_params / eq_from / eq_to /
    state.conv / state.eq are G-tuples; lane b belongs to group
    b // (B/G), a contiguous equal segment).

    The harvest is staged ONCE at the full lane space (scatter + mask),
    then each group takes a free leading-axis slice and runs the exact
    single-bank step the ungrouped pool runs — same FLOPs, same traffic,
    one dispatch, and XLA overlaps the groups' async work. This replaced
    three one-shared-array formulations that each paid a measured
    relayout of the delay line or the frequency-domain mix
    (BENCH_NOTES round-3 late)."""
    conv_states, eq_states = state.conv, state.eq
    G = len(conv_params)
    paged = variant in ("paged", "paged_all", "paged_id")
    Bg = (conv_states[0].pages[0] if paged else conv_states[0].fdl).shape[-1]
    B = G * Bg
    identity = variant in ("ring_id", "paged_id")
    if identity:
        assert blocks.shape[0] == B, (blocks.shape, B)
        x = blocks
    else:
        x = jnp.zeros((B,) + blocks.shape[1:], jnp.float32).at[idx].set(
            blocks, mode="drop")
    mask = None
    if variant in ("ring", "rolled", "paged"):
        mask = jnp.zeros((B,), jnp.bool_).at[idx].set(True, mode="drop")
    new_conv, new_eq, outs = [], [], []
    for g in range(G):
        xg = jax.lax.slice_in_dim(x, g * Bg, (g + 1) * Bg, axis=0)
        mg = (None if mask is None
              else jax.lax.slice_in_dim(mask, g * Bg, (g + 1) * Bg, axis=0))
        # A group mid hot-swap carries the dual-ear bank (ears doubled,
        # see pool_step_body): blend its halves before the EQ. Single-bank
        # groups run untouched — dual-ness is a static shape, so the
        # per-group branch is trace-time.
        dual = xfade_ramp is not None and conv_params[g].num_ears == 4
        mxf = (None if not dual or xfade_mask is None
               else jax.lax.slice_in_dim(xfade_mask, g * Bg, (g + 1) * Bg,
                                         axis=0))
        es = eq_states[g]
        if paged:
            if eq_enabled and not eq_crossfading and not dual:
                cs, es, y = eq_block.eq_folded_paged_round(
                    conv_params[g], eq_to[g], conv_states[g], eq_states[g],
                    xg, active_mask=mg,
                )
            else:
                cs, y = upols.conv_step_paged(
                    conv_params[g], conv_states[g], xg, active_mask=mg
                )
                if dual:
                    y = upols.xfade_blend(y, xfade_ramp, mxf)
                if eq_enabled:
                    outs_m = []
                    for m in range(y.shape[1]):
                        es, ym = eq_block.eq_step(
                            eq_from[g], eq_to[g], es, y[:, m],
                            transition_length, eq_crossfading,
                        )
                        outs_m.append(ym)
                    y = jnp.stack(outs_m, axis=1)
        else:
            step = (upols.conv_step_rolled if variant == "rolled"
                    else upols.conv_step)
            cs, y = step(conv_params[g], conv_states[g], xg, mg)
            if dual:
                y = upols.xfade_blend(y, xfade_ramp, mxf)
            if eq_enabled:
                es, y = eq_block.eq_step(
                    eq_from[g], eq_to[g], es, y, transition_length,
                    eq_crossfading,
                )
        if eq_enabled and mg is not None:
            es = eq_block.EqState(
                s_from=jnp.where(mg[:, None, None], es.s_from,
                                 eq_states[g].s_from),
                s_to=jnp.where(mg[:, None, None], es.s_to,
                               eq_states[g].s_to),
                counter=jnp.where(mg, es.counter, eq_states[g].counter),
            )
        new_conv.append(cs)
        new_eq.append(es)
        outs.append(y)
    y = jnp.concatenate(outs, axis=0)
    y_rows = y if identity else jnp.take(y, jnp.minimum(idx, B - 1), axis=0)
    return PoolState(tuple(new_conv), tuple(new_eq)), y_rows


_pool_step = functools.partial(
    jax.jit,
    static_argnames=("transition_length", "eq_enabled", "eq_crossfading",
                     "variant"),
    donate_argnums=(3,),
)(pool_step_body)


@functools.partial(jax.jit, donate_argnums=(0,))
def _roll_lanes(conv_state, lane_idx, shift):
    return upols.conv_roll_lanes(conv_state, lane_idx, shift)


@functools.partial(jax.jit, donate_argnums=(0,))
def _roll_lanes_paged(conv_state, lane_idx, shift):
    return upols.conv_roll_lanes_paged(conv_state, lane_idx, shift)


class StreamPool:
    def __init__(
        self,
        max_streams: int,
        sample_rate: float,
        renderer: Optional[RendererState] = None,
        eq_definition: Optional[EqualizerDefinition] = None,
        block_size: int = 512,
        ring_blocks: int = 16,
        config: AirwaveConfig = DEFAULT_CONFIG,
        mesh=None,
        blocks_per_step: int = 1,
        profiles=None,
    ) -> None:
        """`mesh`: an optional 1-D `jax.sharding.Mesh` whose single axis is
        named "streams". The pool's lane state (FDL, EQ state)
        shards over it, so one pool serves a whole slice: every jitted
        round runs SPMD with chip-local lane math (the scatter/gather of
        the harvested rows is the only cross-chip traffic, proportional to
        the harvest). max_streams must divide evenly by the mesh size.
        Host rings stay process-local — multi-HOST serving wants one pool
        per host process (DCN carries client payloads, never lane state).

        `blocks_per_step=M > 1` is the THROUGHPUT serving tier: each pump
        round renders M blocks per harvested lane on the bake path's paged
        delay line with the EQ folded into the synthesis DFT (one line
        read per M blocks, zero rewrite traffic — BENCH_NOTES.md). A lane
        advances only when M full blocks of its input exist, so output
        latency grows to up to M blocks (85 ms at M=8/48 kHz) — latency-
        tolerant workloads only; the default M=1 keeps the reference
        adapter's one-block contract. Requires a renderer prepared with
        `lookahead=M` (prepare_renderer) so the partition tail carries the
        M-1 zero partitions the lookahead math needs.

        `profiles`: a sequence of PoolProfile (mutually exclusive with
        renderer/eq_definition) turns this into a GROUPED multi-tenant
        pool: G profiles, lane space split into G contiguous equal
        segments, one grouped device step per round (module docstring)."""
        self.max_streams = int(max_streams)
        self.sample_rate = float(sample_rate)
        self.block_size = int(block_size)
        self.blocks_per_step = int(blocks_per_step)
        self.config = config
        self.mesh = mesh
        if self.blocks_per_step < 1:
            raise ValueError(f"blocks_per_step must be >= 1, got "
                             f"{blocks_per_step}")
        if profiles is not None:
            if renderer is not None or eq_definition is not None:
                raise ValueError(
                    "pass either renderer/eq_definition or profiles, not "
                    "both"
                )
            profiles = [p if isinstance(p, PoolProfile) else PoolProfile(*p)
                        for p in profiles]
            if not profiles:
                raise ValueError("profiles must be non-empty")
        else:
            if renderer is None:
                raise TypeError("renderer is required (or pass profiles=)")
            profiles = [PoolProfile(renderer, eq_definition)]
        self.groups = len(profiles)
        if self.max_streams % self.groups:
            raise ValueError(
                f"max_streams ({self.max_streams}) must divide by the "
                f"profile-group count ({self.groups})"
            )
        self.group_size = self.max_streams // self.groups
        self.renderers = [p.renderer for p in profiles]
        self.renderer = self.renderers[0]
        first = self.renderers[0]
        for g, r in enumerate(self.renderers):
            self._check_renderer_lookahead(r)
            if (r.num_speakers != first.num_speakers
                    or r.block_size != first.block_size):
                raise ValueError(
                    f"grouped profiles must share (speakers, block): group "
                    f"0 has ({first.num_speakers}, {first.block_size}), "
                    f"group {g} has ({r.num_speakers}, {r.block_size}) — "
                    f"partition counts (HRIR lengths) may differ, each "
                    f"group carries its own delay line"
                )
        # The carry's per-group partition count. After a crossfaded
        # shorter-HRIR hot-swap the ACTIVE bank is the renderer's params
        # zero-padded onto this (unchanged) carry shape, so it may exceed
        # the renderer's own partition_count.
        self._bank_partitions = [r.partition_count for r in self.renderers]
        # In-flight hot-swap crossfade: the dual-ear bank(s)
        # (upols.xfade_conv_params; a {group: params} dict on a grouped
        # pool) plus the host-side per-lane pending mask — a pending lane
        # blends old->new on its NEXT rendered round, then clears.
        self._xfade_params = None
        self._xfade_pending = np.zeros(max_streams, bool)
        # Lanes attached since the last device-state reset flush. attach()
        # is O(1) host bookkeeping; the zeroing of a fresh lane's carry
        # rows batches into ONE masked device op at the next pump round
        # (or any state read) — a 1,000-client connect ramp costs one
        # reset pass per round, not one full-tensor op per attach.
        self._reset_pending = np.zeros(max_streams, bool)
        self._xfade_ramp = None
        self._rebuild_conv_params()
        if mesh is not None:
            if tuple(mesh.axis_names) != ("streams",):
                raise ValueError(
                    "pool mesh must be 1-D with axis name 'streams'"
                )
            if self.group_size % mesh.size:
                raise ValueError(
                    f"per-group lane count ({self.group_size}) must divide "
                    f"by the mesh size ({mesh.size}) — each group's lane "
                    f"state shards independently"
                )
        speakers = self.renderer.num_speakers

        # Rings must hold at least two full steps so a lane can buffer the
        # next round while one is in flight.
        capacity = block_size * max(int(ring_blocks),
                                    2 * self.blocks_per_step)
        self.assembler = RaggedAssembler(
            max_streams, speakers, block_size, capacity=capacity,
        )
        self._out = RaggedAssembler(
            max_streams, 2, block_size, capacity=capacity
        )
        self.eq_runtimes = [
            EqualizerRuntime(sample_rate, block_size, config.eq_state_dim,
                             config)
            for _ in profiles
        ]
        # Compatibility alias: the single-profile pool's EQ machine.
        self.eq_runtime = self.eq_runtimes[0]
        self._eq_enabled = any(p.eq_definition is not None for p in profiles)
        for rt, p in zip(self.eq_runtimes, profiles):
            if p.eq_definition is not None:
                rt.set_target(p.eq_definition)
        self._state = self._place(self._fresh_state())
        self._attached: Dict[int, bool] = {}
        self._attached_mask = np.zeros(max_streams, bool)
        self._identity_idx = np.arange(max_streams, dtype=np.int32)
        q = self.group_size
        self._free_by_group = [
            list(range((g + 1) * q - 1, g * q - 1, -1))
            for g in range(self.groups)
        ]
        # Shared-cursor ring bookkeeping: debt[b] counts cursor advances a
        # lane sat out since it last stepped; a harvested lane with
        # debt % P2 != 0 is rolled back into alignment first (see
        # upols.conv_roll_lanes). Host-side only — never device state.
        self._debt = np.zeros(max_streams, np.int64)
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

    def _rebuild_conv_params(self) -> None:
        """Device conv params for the round step: the single renderer's, or
        a G-tuple of per-group banks (each group's chain runs single-bank —
        see _pool_round_grouped). Also refreshes the per-lane debt modulus
        (groups may have different partition counts, hence cycles).

        Each bank is zero-padded to the CARRY's partition count
        (_bank_partitions — a no-op except after a crossfaded
        shorter-HRIR hot-swap, where the padded tail lets the new bank
        run on the preserved delay line)."""
        if self.groups == 1:
            self._conv_params = upols.pad_conv_params(
                self.renderers[0].conv_params, self._bank_partitions[0]
            )
        else:
            self._conv_params = tuple(
                upols.pad_conv_params(r.conv_params,
                                      self._bank_partitions[g])
                for g, r in enumerate(self.renderers)
            )
        # Per-lane alignment-debt modulus: one full rotation of the lane's
        # own carry is the identity — P2 cursor advances for the ring FDL,
        # n_pages rounds for the paged line. The CARRY's partition count,
        # not the renderer's.
        M = self.blocks_per_step
        cycles = np.empty(self.max_streams, np.int64)
        for g in range(self.groups):
            p = self._bank_partitions[g]
            cycles[g * self.group_size:(g + 1) * self.group_size] = (
                p // M if M > 1 else p
            )
        self._lane_cycles = cycles

    def group_of(self, stream: int) -> int:
        """Profile group owning a lane (contiguous equal segments)."""
        return int(stream) // self.group_size

    @property
    def _free(self):
        """Flat free-lane view (leak checks, diagnostics)."""
        return [s for fl in self._free_by_group for s in fl]

    @property
    def step_frames(self) -> int:
        """Frames a lane advances per pump round (blocks_per_step * block) —
        the ingest granularity of the multi-block tier; serving frontends
        pad EOF tails to this boundary."""
        return self.blocks_per_step * self.block_size

    def _check_renderer_lookahead(self, renderer: RendererState) -> None:
        if self.blocks_per_step == 1:
            return
        lookahead = getattr(renderer, "lookahead", 1)
        if lookahead != self.blocks_per_step:
            raise ValueError(
                f"blocks_per_step={self.blocks_per_step} needs a renderer "
                f"prepared with lookahead={self.blocks_per_step} "
                f"(got lookahead={lookahead}; see prepare_renderer)"
            )
        if renderer.partition_count % self.blocks_per_step:
            raise ValueError(
                f"renderer partition count {renderer.partition_count} is "
                f"not divisible by blocks_per_step={self.blocks_per_step}"
            )

    def _fresh_group_conv(self, g: int):
        """Fresh (zeroed) conv carry for one group's lane segment, at the
        ACTIVE bank's partition count (which may exceed the renderer's own
        after a crossfaded shorter-HRIR swap — _bank_partitions)."""
        r = self.renderers[g]
        lanes = self.group_size if self.groups > 1 else self.max_streams
        if self.blocks_per_step > 1:
            return upols.make_conv_state_paged(
                lanes, r.num_speakers, self._bank_partitions[g],
                self.block_size, self.blocks_per_step,
            )
        return upols.make_conv_state(
            lanes, r.num_speakers, self._bank_partitions[g],
            self.block_size,
        )

    def _fresh_state(self) -> PoolState:
        if self.groups == 1:
            return PoolState(
                conv=self._fresh_group_conv(0),
                eq=eq_block.make_eq_state(self.max_streams, 2,
                                          self.config.eq_state_dim),
            )
        return PoolState(
            conv=tuple(self._fresh_group_conv(g)
                       for g in range(self.groups)),
            eq=tuple(
                eq_block.make_eq_state(self.group_size, 2,
                                       self.config.eq_state_dim)
                for _ in range(self.groups)
            ),
        )

    def _place_group_conv(self, conv):
        """Shard one group's conv carry over the pool mesh (no-op without
        one)."""
        if self.mesh is None:
            return conv
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        def ns(spec):
            return NamedSharding(self.mesh, spec)

        if self.blocks_per_step > 1:
            return upols.PagedConvState(
                pages=tuple(
                    jax.device_put(
                        pg, ns(P(None, None, None, None, "streams"))
                    )
                    for pg in conv.pages
                ),
            )
        return upols.ConvState(
            fdl=jax.device_put(
                conv.fdl, ns(P(None, None, None, None, "streams"))
            ),
            write_pos=jax.device_put(conv.write_pos, ns(P())),
        )

    def _place(self, state: PoolState) -> PoolState:
        """Shard lane state over the pool mesh (no-op without one). On a
        grouped pool each group's state shards independently over the same
        mesh (its lane axis divides the mesh size — checked at init)."""
        if self.mesh is None:
            return state
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        def ns(spec):
            return NamedSharding(self.mesh, spec)

        def place_eq(eq):
            return eq_block.EqState(
                s_from=jax.device_put(eq.s_from, ns(P("streams"))),
                s_to=jax.device_put(eq.s_to, ns(P("streams"))),
                counter=jax.device_put(eq.counter, ns(P("streams"))),
            )

        if self.groups == 1:
            return PoolState(conv=self._place_group_conv(state.conv),
                             eq=place_eq(state.eq))
        return PoolState(
            conv=tuple(self._place_group_conv(c) for c in state.conv),
            eq=tuple(place_eq(e) for e in state.eq),
        )

    # --- stream lifecycle -----------------------------------------------------------

    def attach(self, group: int = 0) -> int:
        """Claim a free lane (in `group`'s segment for a grouped pool)."""
        if not (0 <= group < self.groups):
            raise ValueError(
                f"group {group} out of range for {self.groups} profiles"
            )
        if not self._free_by_group[group]:
            raise RuntimeError(
                "pool is full" if self.groups == 1
                else f"profile group {group} is full"
            )
        stream = self._free_by_group[group].pop()
        self._attached[stream] = True
        self._attached_mask[stream] = True
        self.assembler.reset_stream(stream)
        self._out.reset_stream(stream)
        # The device-row zeroing is DEFERRED and batched: see
        # _flush_attach_resets (pump flushes before every round, so the
        # lane's previous-tenant garbage can never reach a render).
        self._reset_pending[stream] = True
        # A zeroed lane is rotation-invariant: valid at any shared-cursor
        # position, so a fresh stream joins with no alignment debt. It
        # also owes no hot-swap fade: a fresh history hears the active
        # (new) bank directly.
        self._debt[stream] = 0
        self._xfade_pending[stream] = False
        return stream

    def detach(self, stream: int) -> None:
        if self._attached.pop(stream, None):
            self._attached_mask[stream] = False
            self._xfade_pending[stream] = False
            self._free_by_group[self.group_of(stream)].append(stream)
            self._pending_out.pop(stream, None)
            self.assembler.reset_stream(stream)
            self._out.reset_stream(stream)

    def _flush_attach_resets(self) -> None:
        """Zero the carry rows of every lane attached since the last
        flush, as ONE masked device op per affected group. Runs before
        every pump round and before any whole-state read (snapshot,
        set_renderer), so deferred garbage can never reach a render, a
        checkpoint, or a fade decision — while a connect ramp of K
        attaches costs one batched pass, not K full-tensor ops."""
        if not self._reset_pending.any():
            return
        reset = (upols.conv_reset_paged if self.blocks_per_step > 1
                 else upols.conv_reset)

        def reset_rows(conv, eq_state, m):
            eq = eq_block.eq_reset(eq_state, m)
            # A fresh lane hears the ACTIVE target directly (the reference
            # prepares new EqualizerState at the current target — no ramp
            # replay): idle its counter so any in-flight pool ramp blends
            # to weight 1.0 on the 'to' cascade for this lane.
            eq = eq._replace(
                counter=jnp.where(m, eq_block.COUNTER_IDLE, eq.counter)
            )
            return reset(conv, m), eq

        # COPY the masks: jnp.asarray may zero-copy an aligned numpy
        # buffer on CPU backends, and _reset_pending is cleared right
        # after these (async) dispatches.
        if self.groups == 1:
            m = jnp.asarray(self._reset_pending.copy())
            conv, eq = reset_rows(self._state.conv, self._state.eq, m)
            self._state = PoolState(conv=conv, eq=eq)
        else:
            conv = list(self._state.conv)
            eq = list(self._state.eq)
            for g in range(self.groups):
                seg = self._reset_pending[g * self.group_size:
                                          (g + 1) * self.group_size]
                if not seg.any():
                    continue
                conv[g], eq[g] = reset_rows(conv[g], eq[g],
                                            jnp.asarray(seg.copy()))
            self._state = PoolState(conv=tuple(conv), eq=tuple(eq))
        self._reset_pending[:] = False

    # --- control ----------------------------------------------------------------------

    def set_equalizer(self, definition: Optional[EqualizerDefinition],
                      group: Optional[int] = None) -> None:
        """Retarget the pool EQ. `None` on an EQ-less pool stays a no-op
        (symmetric with the constructor); `None` on an active pool crossfades
        to unity and keeps the EQ in the step for the ramp (the reference
        keeps the EQ in the callback after removal for exactly this,
        AudioEffectGraph.swift:147-151).

        On a grouped pool, `group=g` retargets only that profile group's
        lanes (their 20 ms crossfade runs on their segment alone); the
        default `group=None` retargets every group."""
        if group is not None and not (0 <= group < self.groups):
            raise ValueError(
                f"group {group} out of range for {self.groups} profiles"
            )
        if definition is None and not self._eq_enabled:
            return
        targets = self.eq_runtimes if group is None else (
            self.eq_runtimes[group],
        )
        for rt in targets:
            rt.set_target(definition)
        self._eq_enabled = True

    def set_renderer(self, renderer: RendererState,
                     group: Optional[int] = None,
                     crossfade: bool = True) -> bool:
        """HRIR hot-swap. Returns True when the swap CROSSFADED (history
        preserved), False when it reset.

        With `crossfade=True` (default) a swap whose new bank fits the
        group's carry (same speakers; partition count <= the carry's, a
        shorter bank zero-pads) is GLITCH-FREE: the delay line stores
        bank-independent input spectra, so every lane keeps its full conv
        history (the reverb tail) exactly, and each pending lane's next
        rendered round runs the dual-ear bank, blending old->new per
        sample over min(20 ms, one round) before the EQ — the ideal
        time-varying filter, which the reference cannot do (its engines
        couple history to the filter and rebuild per activation,
        HRIRManager.swift:406-415). Lanes render their fade round
        whenever they are next harvested (paused lanes fade at rejoin);
        lanes attached after the swap hear the new bank directly. A
        second swap while fades are pending is newest-wins: pending lanes
        re-arm toward the newest bank (a lane that never rendered the
        earlier fade starts its blend from the newer old-half — a one-
        round cosmetic, not a state error, since the carry is
        bank-independent). Alignment debt is untouched — the carry never
        moves.

        A shape-incompatible swap (more partitions than the carry, or
        crossfade=False) keeps the reset semantics: conv history restarts
        for the affected streams and a partition-count change reallocates
        the group's carry (a zeroed lane is rotation-invariant and
        rejoins with no alignment work).

        The dual-bank round is a new jit shape; call
        `prewarm(include_hotswap=True)` at startup to keep the first
        swap's rounds compile-free."""
        self._check_renderer_lookahead(renderer)
        # Deferred attach zeroing must land before fade marking / carry
        # surgery: a pending lane's garbage rows must never be preserved
        # by a crossfade or ride into a reallocated carry.
        self._flush_attach_resets()
        if self.groups > 1:
            if group is None:
                raise ValueError(
                    "a grouped pool needs set_renderer(..., group=g)"
                )
            if not (0 <= group < self.groups):
                raise ValueError(
                    f"group {group} out of range for {self.groups} profiles"
                )
            cur = self.renderers[0]
            if (renderer.num_speakers != cur.num_speakers
                    or renderer.block_size != cur.block_size):
                raise ValueError(
                    f"grouped swap must keep the pool's (speakers, block) "
                    f"= ({cur.num_speakers}, {cur.block_size})"
                )
            g = group
        else:
            if group not in (None, 0):
                raise ValueError(
                    f"group {group} out of range for a single-profile pool"
                )
            g = 0
            if renderer.num_speakers != self.renderers[0].num_speakers:
                raise ValueError(
                    "renderer speaker count must match the pool's input "
                    "layout"
                )
        old = self.renderers[g]
        lo, hi = g * self.group_size, (g + 1) * self.group_size
        can_fade = (
            crossfade
            and renderer.num_speakers == old.num_speakers
            and renderer.partition_count <= self._bank_partitions[g]
        )
        self.renderers[g] = renderer
        if g == 0:
            self.renderer = renderer
        if can_fade:
            old_active = (self._conv_params[g] if self.groups > 1
                          else self._conv_params)
            self._rebuild_conv_params()  # pads onto the unchanged carry
            new_active = (self._conv_params[g] if self.groups > 1
                          else self._conv_params)
            dual = upols.xfade_conv_params(old_active, new_active)
            if self.groups > 1:
                if not isinstance(self._xfade_params, dict):
                    self._xfade_params = {}
                self._xfade_params[g] = dual
            else:
                self._xfade_params = dual
            self._xfade_pending[lo:hi] = self._attached_mask[lo:hi]
            if self._xfade_ramp is None:
                L = self.step_frames
                fade = max(1, int(round(
                    self.sample_rate
                    * self.config.crossfade_duration_seconds)))
                self._xfade_ramp = jnp.asarray(
                    upols.xfade_ramp(min(fade, L), L)
                )
            return True
        # Reset path: fresh history, carry re-sized to the new bank.
        self._bank_partitions[g] = renderer.partition_count
        self._clear_xfade(g)
        self._rebuild_conv_params()
        if self.groups > 1:
            conv = tuple(
                self._place_group_conv(self._fresh_group_conv(g))
                if i == g else c
                for i, c in enumerate(self._state.conv)
            )
            self._state = PoolState(conv=conv, eq=self._state.eq)
        else:
            cur_carry_p = (
                len(self._state.conv.pages) * self.blocks_per_step
                if self.blocks_per_step > 1
                else self._state.conv.fdl.shape[2]
            )
            if (old.num_speakers == renderer.num_speakers
                    and renderer.partition_count == cur_carry_p):
                # Same carry shape: zero in place instead of reallocating.
                reset = (upols.conv_reset_paged if self.blocks_per_step > 1
                         else upols.conv_reset)
                self._state = PoolState(
                    conv=reset(self._state.conv), eq=self._state.eq
                )
            else:
                self._state = PoolState(
                    conv=self._place(self._fresh_state()).conv,
                    eq=self._state.eq,
                )
        self._debt[lo:hi] = 0
        return False

    def _clear_xfade(self, group: Optional[int] = None) -> None:
        """Drop in-flight hot-swap fades (for `group`, or all)."""
        if group is None or self.groups == 1:
            self._xfade_params = None
            self._xfade_pending[:] = False
            return
        self._xfade_pending[group * self.group_size:
                            (group + 1) * self.group_size] = False
        if isinstance(self._xfade_params, dict):
            self._xfade_params.pop(group, None)
            if not self._xfade_params:
                self._xfade_params = None

    # --- checkpoint / resume ----------------------------------------------------------

    def snapshot(self, materialize: bool = True) -> dict:
        """Host-side checkpoint of every slot's DSP carry.

        Captures the device carry AND the host state that interprets it
        (per-lane alignment debt, attached set, the EQ crossfade machine's
        active/from/pending targets and ramp clock) — with the
        shared-cursor ring design the carry alone is not self-describing,
        and mid-ramp EQ counters are meaningless without the cascades they
        blend. Ring CONTENTS
        (undrained input/output audio) are transient by design and not
        captured, matching the reference's reset-on-reconfigure stance for
        in-flight audio. Feed to `restore` on a pool with identical
        max_streams/renderer shape for bit-identical resume.

        materialize=False keeps "state" as DEVICE COPIES (one cheap
        on-device pass, no host readback) instead of numpy — for callers
        that must not block serving on a multi-GB device->host fetch (a
        live RenderServer checkpoints under its pump lock): copy under
        the lock, np.asarray/save outside it. The copies are safe against
        the step's carry donation (they are distinct buffers)."""
        self._flush_attach_resets()  # a checkpoint never carries garbage
        snap = {
            "state": jax.tree_util.tree_map(
                (np.asarray if materialize else jnp.copy), self._state
            ),
            "debt": self._debt.copy(),
            "attached": sorted(self._attached),
            "eq_runtime": self.eq_runtime.snapshot(),
            "eq_enabled": self._eq_enabled,
            "groups": self.groups,
        }
        if self.groups > 1:
            snap["eq_runtimes"] = [rt.snapshot() for rt in self.eq_runtimes]
        return snap

    def state_like(self, max_streams: int) -> dict:
        """ShapeDtypeStruct template of this pool's carry (plus debt) at a
        DIFFERENT lane count — what a snapshot written by a pool of
        `max_streams` lanes but otherwise identical construction looks
        like. `utils/checkpoint.load_pool_snapshot(..., lanes=N)` uses it
        to validate such a snapshot before `restore(..., resize=True)`
        maps its lanes in. Allocates nothing (structs only)."""
        if max_streams % self.groups:
            raise ValueError(
                f"max_streams ({max_streams}) must divide by the "
                f"{self.groups} profile groups"
            )
        lanes = (max_streams // self.groups if self.groups > 1
                 else max_streams)

        def conv_like(conv):
            if self.blocks_per_step > 1:
                return upols.PagedConvState(pages=tuple(
                    jax.ShapeDtypeStruct(p.shape[:-1] + (lanes,), p.dtype)
                    for p in conv.pages
                ))
            return upols.ConvState(
                fdl=jax.ShapeDtypeStruct(
                    conv.fdl.shape[:-1] + (lanes,), conv.fdl.dtype
                ),
                write_pos=jax.ShapeDtypeStruct(
                    conv.write_pos.shape, conv.write_pos.dtype
                ),
            )

        def eq_like(eq):
            return eq_block.EqState(
                s_from=jax.ShapeDtypeStruct(
                    (lanes,) + eq.s_from.shape[1:], eq.s_from.dtype),
                s_to=jax.ShapeDtypeStruct(
                    (lanes,) + eq.s_to.shape[1:], eq.s_to.dtype),
                counter=jax.ShapeDtypeStruct(
                    (lanes,) + eq.counter.shape[1:], eq.counter.dtype),
            )

        if self.groups == 1:
            state = PoolState(conv=conv_like(self._state.conv),
                              eq=eq_like(self._state.eq))
        else:
            state = PoolState(
                conv=tuple(conv_like(c) for c in self._state.conv),
                eq=tuple(eq_like(e) for e in self._state.eq),
            )
        return {
            "state": state,
            "debt": jax.ShapeDtypeStruct((max_streams,), np.int64),
        }

    def _resize_snapshot_lanes(self, snap: dict, state, debt):
        """Map a snapshot written at another max_streams onto THIS pool's
        lane space: per profile group, attached lanes compact to the head
        of the group's new segment in ascending old-id order (one device
        gather per leaf; free slots gather row 0 as finite filler and are
        marked reset-pending, so the next flush zeroes them before any
        render/checkpoint/fade). Returns (state', debt', attached',
        lane_map {old id -> new id})."""
        old_max = int(debt.shape[0])
        if old_max % self.groups:
            raise ValueError(
                f"snapshot lane count {old_max} does not divide by the "
                f"pool's {self.groups} profile groups"
            )
        old_q = old_max // self.groups
        new_q = self.group_size
        attached_old = sorted(int(s) for s in snap["attached"])
        if any(not (0 <= s < old_max) for s in attached_old):
            raise ValueError(
                f"snapshot attached streams out of range for its own "
                f"lane count {old_max}: {attached_old}"
            )
        per_group = [
            [s for s in attached_old if g * old_q <= s < (g + 1) * old_q]
            for g in range(self.groups)
        ]
        for g, lanes_g in enumerate(per_group):
            if len(lanes_g) > new_q:
                raise ValueError(
                    f"cannot resize: snapshot group {g} has "
                    f"{len(lanes_g)} attached lanes, resized pool fits "
                    f"{new_q} per group — detach streams or size the "
                    f"pool to hold them"
                )
        lane_map: dict = {}
        idx_groups = []
        for g, lanes_g in enumerate(per_group):
            idx = np.zeros(new_q, np.int32)
            idx[:len(lanes_g)] = [s - g * old_q for s in lanes_g]
            idx_groups.append(jnp.asarray(idx))
            for r, s_old in enumerate(lanes_g):
                lane_map[s_old] = g * new_q + r

        def remap_conv(conv, idx):
            take_last = lambda a: jnp.take(a, idx, axis=a.ndim - 1)  # noqa: E731
            if self.blocks_per_step > 1:
                return upols.PagedConvState(
                    pages=tuple(take_last(p) for p in conv.pages)
                )
            return upols.ConvState(fdl=take_last(conv.fdl),
                                   write_pos=conv.write_pos)

        def remap_eq(eq, idx):
            return eq_block.EqState(
                s_from=jnp.take(eq.s_from, idx, axis=0),
                s_to=jnp.take(eq.s_to, idx, axis=0),
                counter=jnp.take(eq.counter, idx, axis=0),
            )

        if self.groups == 1:
            state = PoolState(conv=remap_conv(state.conv, idx_groups[0]),
                              eq=remap_eq(state.eq, idx_groups[0]))
        else:
            state = PoolState(
                conv=tuple(remap_conv(c, idx_groups[g])
                           for g, c in enumerate(state.conv)),
                eq=tuple(remap_eq(e, idx_groups[g])
                         for g, e in enumerate(state.eq)),
            )
        new_debt = np.zeros(self.max_streams, np.int64)
        for s_old, s_new in lane_map.items():
            new_debt[s_new] = debt[s_old]
        return state, new_debt, sorted(lane_map.values()), lane_map

    def restore(self, snap: dict, resize: bool = False) -> Optional[dict]:
        """Load a `snapshot()` back in. With `resize=True` the snapshot
        may come from a pool of a DIFFERENT max_streams (same renderer
        shapes / groups / blocks_per_step): attached lanes keep their
        exact DSP history and are compacted into this pool's lane space
        (per-group, ascending old-id order), and the return value is the
        {old lane id -> new lane id} map — remap any external per-lane
        bookkeeping (serving resume tokens) through it. Errors if a
        group's attached lanes outnumber its resized segment. Returns
        None when no remap happened."""
        # Validate EVERYTHING before mutating anything, so a bad snapshot
        # cannot leave the pool half-restored. Group count first: a
        # grouped snapshot's state is a different pytree structure and
        # the count names the real mismatch.
        snap_groups = int(snap.get("groups", 1))
        if snap_groups != self.groups:
            raise ValueError(
                f"snapshot has {snap_groups} profile groups, pool has "
                f"{self.groups}"
            )
        ref = self._state
        state = jax.tree_util.tree_map(jnp.asarray, snap["state"])
        debt = np.asarray(snap["debt"], np.int64)
        lane_map = None
        if resize and debt.shape[0] != self.max_streams:
            state, debt, attached, lane_map = self._resize_snapshot_lanes(
                snap, state, debt
            )
        else:
            attached = [int(s) for s in snap["attached"]]
        got = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), state)
        want = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), ref)
        if got != want:
            raise ValueError(
                f"snapshot shape/dtype mismatch: {got} vs pool {want}"
            )
        if debt.shape != (self.max_streams,):
            raise ValueError(
                f"snapshot debt length {debt.shape} vs pool "
                f"({self.max_streams},)"
            )
        if any(not (0 <= s < self.max_streams) for s in attached):
            raise ValueError(
                f"snapshot attached streams out of range for "
                f"max_streams={self.max_streams}: {attached}"
            )

        self._state = self._place(state)
        self._debt[:] = debt
        # The restored carry is authoritative: any attach-reset still
        # pending against the PREVIOUS state must not zero restored rows.
        # After a resize, free slots hold gather filler (old row 0), so
        # they ARE pending — the next flush zeroes them before any use.
        self._reset_pending[:] = False
        # An in-flight hot-swap fade is not checkpointed: the carry is
        # bank-independent, so restored lanes are exact under the active
        # bank — pending lanes simply complete their fade as a jump (one
        # round of cosmetic blend forgone, never a state error).
        self._clear_xfade()
        self._attached = {s: True for s in attached}
        self._attached_mask[:] = False
        self._attached_mask[attached] = True
        if lane_map is not None:
            self._reset_pending[:] = ~self._attached_mask
        q = self.group_size
        self._free_by_group = [
            [s for s in range((g + 1) * q - 1, g * q - 1, -1)
             if s not in self._attached]
            for g in range(self.groups)
        ]
        self._pending_out.clear()
        for s in range(self.max_streams):
            self.assembler.reset_stream(s)
            self._out.reset_stream(s)
        if self.groups > 1 and "eq_runtimes" in snap:
            for rt, rt_snap in zip(self.eq_runtimes, snap["eq_runtimes"]):
                rt.restore(rt_snap)
            self._eq_enabled = bool(snap.get("eq_enabled",
                                             self._eq_enabled))
        elif "eq_runtime" in snap:
            self.eq_runtime.restore(snap["eq_runtime"])
            self._eq_enabled = bool(snap.get("eq_enabled",
                                             self._eq_enabled))
        return lane_map

    # --- data plane -------------------------------------------------------------------

    def push(self, stream: int, chunk: np.ndarray) -> None:
        """chunk: [speakers, n], [layout_channels, n] (unmapped layout
        channels — e.g. 7.1.4 heights through a height-less HRIR map —
        are dropped, reference semantics), or [1, n] mono, duplicated.
        A grouped pool resolves layout channels through the stream's own
        profile group's renderer."""
        chunk = np.asarray(chunk, np.float32)
        if chunk.ndim == 1:
            chunk = chunk[None]
        renderer = self.renderers[self.group_of(stream)]
        speakers = renderer.num_speakers
        if chunk.shape[0] == 1 and speakers > 1:
            chunk = np.repeat(chunk, speakers, axis=0)
        else:
            chunk = renderer.select_input(chunk)
        self.assembler.push(stream, chunk)

    def _bucket(self, k: int) -> int:
        b = 1
        while b < k:
            b <<= 1
        return min(b, self.max_streams)

    def prewarm(self, up_to: Optional[int] = None,
                include_hotswap: bool = False) -> None:
        """Compile-and-warm every device-step shape serving can hit.

        Serving stalls on a mid-flight jit compile are fatal to latency
        (a cold kb=256 pool-step compile measured 454 s over this
        environment's tunnel): a newly-seen harvest-bucket size, the
        all-attached fast variant, the crossfade variant on the first EQ
        retarget, or the first debt roll would each trigger one. Each
        variant EXECUTES once on a freshly-allocated throwaway state
        (donated, then freed) — `.lower().compile()` was considered but
        does not populate jit's dispatch cache, so the pump would compile
        again anyway; real execution warms exactly what serving hits. The
        pool's own state, cursor, and debt are untouched. Idempotent;
        repeat calls are cheap once warm. Re-run after `set_renderer`
        swaps to a different partition/speaker shape. Run prewarm before
        traffic, not during: on tunneled devices the executions are the
        slow/wedge-prone part and belong in startup.

        include_hotswap=True also warms the crossfaded HRIR hot-swap
        rounds (the dual-ear bank shape — only shapes key the jit cache,
        so self-crossfade params stand in for any future same-shape
        swap; on a grouped pool the single uniform all-dual shape pump
        uses for every fade round). Without it the first `set_renderer`
        crossfade after startup pays one compile per bucket it hits.
        """
        limit = self.max_streams if up_to is None else min(
            int(up_to), self.max_streams
        )
        buckets, k = [], 1
        while True:
            buckets.append(min(k, limit))
            if k >= limit:
                break
            k <<= 1
        buckets = sorted(set(buckets))
        speakers = self.renderer.num_speakers
        if self.groups == 1:
            eq_p = self.eq_runtime.active.params
        else:
            eq_p = tuple(rt.active.params for rt in self.eq_runtimes)
        crossfades = (False, True) if self._eq_enabled else (False,)
        paged = self.blocks_per_step > 1
        if paged:
            step_variants = ("paged", "paged_all")
        else:
            step_variants = (
                ("ring", "ring_all") if _POOL_STEP == "ring"
                else (_POOL_STEP,)
            )

        def throwaway():  # donated per call; the pool's own state untouched
            return self._place(self._fresh_state())

        block_shape = (
            (speakers, self.blocks_per_step, self.block_size)
            if paged else (speakers, self.block_size)
        )
        for kb in buckets:
            blocks = jnp.zeros((kb,) + block_shape, jnp.float32)
            idx = jnp.full((kb,), self.max_streams, jnp.int32)
            variants = step_variants
            if kb == self.max_streams:
                # The saturated identity-harvest fast variant only exists
                # at the full-pool bucket.
                variants = step_variants + (
                    ("paged_id",) if paged else
                    (("ring_id",) if _POOL_STEP == "ring" else ())
                )
            param_sets = [(self._conv_params, None, None)]
            if include_hotswap:
                ramp = jnp.zeros((self.step_frames,), jnp.float32)
                mask = jnp.zeros((self.max_streams,), jnp.bool_)
                if self.groups == 1:
                    dual = upols.xfade_conv_params(self._conv_params,
                                                   self._conv_params)
                    param_sets.append((dual, ramp, mask))
                else:
                    # Grouped fade rounds run ONE uniform shape — every
                    # group dual (pump substitutes a self-crossfade for
                    # groups without a pending swap), so concurrent
                    # per-group swaps never key an unwarmed pattern.
                    param_sets.append((tuple(
                        upols.xfade_conv_params(p, p)
                        for p in self._conv_params
                    ), ramp, mask))
            for crossfading in crossfades:
                for variant in variants:
                    for cp, ramp, mask in param_sets:
                        _pool_step(
                            cp, eq_p, eq_p, throwaway(),
                            blocks, idx,
                            transition_length=(
                                self.eq_runtime.transition_length),
                            eq_enabled=self._eq_enabled,
                            eq_crossfading=crossfading,
                            variant=variant,
                            xfade_ramp=ramp,
                            xfade_mask=mask,
                        )
            roll = (_roll_lanes_paged if paged
                    else (_roll_lanes if _POOL_STEP == "ring" else None))
            if roll is not None:
                shift = jnp.zeros((kb,), jnp.int32)
                if self.groups == 1:
                    roll(throwaway().conv, idx, shift)
                elif kb <= self._bucket(self.group_size):
                    # Grouped rolls run per group on its own carry.
                    for conv in throwaway().conv:
                        roll(conv, idx, shift)

    def push_many(self, streams, chunks: np.ndarray) -> None:
        """Batch ingest: chunks [k, C, n] onto k streams in ONE native
        call (all-or-nothing on ring space). C may be the resolved
        speaker count or the full layout channel count (unmapped
        channels drop, as in push). A grouped pool maps layout channels
        per stream through its own group's renderer (one batched gather)."""
        chunks = np.asarray(chunks, np.float32)
        speakers = self.renderer.num_speakers
        if chunks.shape[1] == 1 and speakers > 1:
            chunks = np.repeat(chunks, speakers, axis=1)
        elif chunks.shape[1] != speakers and self.groups > 1:
            # Vectorized per-group layout mapping (the batch API must not
            # fall back to per-stream host loops): one gather with each
            # row's index set picked by its stream's group.
            g = np.asarray(streams, np.int64) // self.group_size
            for gu in np.unique(g):
                r = self.renderers[int(gu)]
                if chunks.shape[1] != r.layout_channels:
                    raise ValueError(
                        f"chunk channel count {chunks.shape[1]} matches "
                        f"neither the speaker count ({speakers}) nor "
                        f"group {int(gu)}'s layout ({r.layout_channels})"
                    )
            table = np.asarray(
                [r.input_indices for r in self.renderers], np.int64
            )  # [G, speakers]
            chunks = chunks[np.arange(len(g))[:, None], table[g]]
        elif (chunks.shape[1] == self.renderer.layout_channels
              and chunks.shape[1] != speakers):
            chunks = chunks[:, list(self.renderer.input_indices)]
        self.assembler.push_many(streams, chunks)

    def pull_many(self, streams, frames: int) -> np.ndarray:
        """Batch drain: [k, 2, frames], zero-filled per stream on
        underflow. Falls back to per-stream pulls while any stashed
        blocks exist (the unlocked-race safety net keeps its ordering)."""
        if not self._pending_out:
            return self._out.pop_many(streams, frames)
        return np.stack([self.pull(int(s), frames) for s in streams])

    def _begin_eq_round(self, eq_state):
        """Run every group's EQ control protocol for one round; returns
        (eq_state', params_from, params_to, crossfading). On a grouped
        pool eq_state / params are G-tuples — each group's machine runs
        its own protocol on its own lane state (the crossfade flag stays
        ONE static jit arg — a group not mid-ramp blends from == to,
        which the per-lane clipped counters make exact, so per-group
        flags would only multiply compiled variants)."""
        # The pool is its own control thread: drain the retirement handoff
        # every round (ref: the control-thread housekeeping in
        # AudioEffectGraph / effect_graph.py:190). Without this the
        # single-slot retirement backpressure wedges after TWO completed
        # transitions — the third and every later retarget stays deferred
        # forever and the step pays dual-cascade cost permanently (found
        # by the grouped randomized differential; latent in the
        # single-profile pool too).
        for rt in self.eq_runtimes:
            rt.drain_retired_states()
        if self.groups == 1:
            rt = self.eq_runtimes[0]
            eq_state, p_from, p_to, _ = rt.begin_block(eq_state)
            crossfading = (rt.is_transitioning
                           or rt.pending_target is not None)
            return eq_state, p_from, p_to, crossfading
        states, froms, tos = [], [], []
        crossfading = False
        for g, rt in enumerate(self.eq_runtimes):
            es, pf, pt, _ = rt.begin_block(eq_state[g])
            states.append(es)
            froms.append(pf)
            tos.append(pt)
            crossfading = (crossfading or rt.is_transitioning
                           or rt.pending_target is not None)
        return tuple(states), tuple(froms), tuple(tos), crossfading

    def pump(self, max_rounds: int = 64, on_deliver=None) -> int:
        """Render while any stream has a full block. Returns rounds run.

        `on_deliver`, if given, is invoked (host-side, no arguments) right
        after each round's output lands in the output rings — the hook a
        serving frontend uses to wake its delivery path per round instead
        of per pump() call (a sustained pump() can run up to `max_rounds`
        rounds before returning).

        Per round, only the harvested rows cross the host<->device
        boundary (blocks + indices up, rendered rows down — the dense
        batch is scattered/gathered on device), and delivery of round r's
        output is deferred until round r+1 has been dispatched so the
        readback overlaps the next round's compute (the DeviceFeeder
        double-buffering pattern, inlined). The output-ring gating
        accounts for the one in-flight undelivered block, so backpressure
        semantics are identical to unpipelined delivery.
        """
        rounds = 0
        pending = None  # (indices, device y_rows) awaiting delivery
        inflight = np.zeros(self.max_streams, bool)
        M = self.blocks_per_step
        step_frames = self.step_frames
        cycles = self._lane_cycles
        paged = M > 1
        roll_fn = _roll_lanes_paged if paged else _roll_lanes
        try:
            while rounds < max_rounds and self.assembler.ready_count() > 0:
                # Batched zeroing of lanes attached since the last round
                # (attach defers its device work here).
                self._flush_attach_resets()
                # Only harvest streams whose output ring can take the
                # rendered step — a slow reader's stream stays
                # un-harvested (and its producer eventually sees
                # input-ring backpressure) instead of overflowing after
                # the carry has advanced. An undelivered in-flight step
                # counts against the free space.
                free = self._out.out_free_all()
                allow = (
                    free - inflight * step_frames
                ) >= step_frames
                indices, blocks = self.assembler.harvest_allowed(
                    self.max_streams, allow, frames=step_frames
                )
                if len(indices) == 0:
                    break

                rejoin = indices[self._debt[indices] % cycles[indices] != 0]
                if rejoin.size and (paged or _POOL_STEP == "ring"):
                    if self.groups == 1:
                        kb = self._bucket(len(rejoin))
                        lane = np.full(kb, self.max_streams, np.int32)
                        shift = np.zeros(kb, np.int32)
                        lane[: len(rejoin)] = rejoin
                        shift[: len(rejoin)] = (
                            self._debt[rejoin] % cycles[rejoin]
                        )
                        self._state = PoolState(
                            conv=roll_fn(self._state.conv,
                                         jnp.asarray(lane),
                                         jnp.asarray(shift)),
                            eq=self._state.eq,
                        )
                    else:
                        # Per-group rolls on each group's own carry
                        # (sentinel-padded to the group bucket; local
                        # lane numbering).
                        conv = list(self._state.conv)
                        rg = rejoin // self.group_size
                        for g in np.unique(rg):
                            sel = rejoin[rg == g]
                            kb = self._bucket(len(sel))
                            lane = np.full(kb, self.group_size, np.int32)
                            shift = np.zeros(kb, np.int32)
                            lane[: len(sel)] = sel - g * self.group_size
                            shift[: len(sel)] = (
                                self._debt[sel] % cycles[sel]
                            )
                            conv[g] = roll_fn(conv[g], jnp.asarray(lane),
                                              jnp.asarray(shift))
                        self._state = PoolState(
                            conv=tuple(conv), eq=self._state.eq
                        )

                k = len(indices)
                kb = self._bucket(k)
                idx_up = np.full(kb, self.max_streams, np.int32)
                idx_up[:k] = indices
                if paged:
                    # [k, S, M*T] -> [k, S, M, T] (ring pop is frame-major
                    # per channel, so the reshape is free).
                    blocks = blocks.reshape(
                        k, blocks.shape[1], M, self.block_size
                    )
                if kb != k:
                    pad = np.zeros(
                        (kb - k,) + blocks.shape[1:], blocks.dtype
                    )
                    blocks = np.concatenate([blocks, pad], axis=0)

                eq_state, p_from, p_to, crossfading = self._begin_eq_round(
                    self._state.eq
                )
                if paged:
                    variant = ("paged_all" if k == len(self._attached)
                               else "paged")
                else:
                    variant = _POOL_STEP
                    if variant == "ring" and k == len(self._attached):
                        # Common serving case: every attached lane stepped
                        # — the masking machinery is unnecessary (free
                        # lanes' garbage is reset at attach).
                        variant = "ring_all"
                if (variant in ("ring_all", "paged_all")
                        and k == self.max_streams
                        and np.array_equal(indices, self._identity_idx)):
                    # Saturated steady state: every lane harvested, in
                    # ascending order — the rows ARE the dense batch, so
                    # the step skips the input scatter + output gather
                    # (two full-batch layout passes).
                    variant = variant[:-3] + "id"
                # Hot-swap crossfade round: if any harvested lane still
                # owes its fade, run the dual-ear bank(s) and blend
                # per lane (pending lanes old->new over the ramp; already-
                # faded lanes take the pure new half). One round per lane,
                # whenever that lane is next harvested.
                conv_params = self._conv_params
                xfade_ramp = xfade_mask = None
                if (self._xfade_params is not None
                        and self._xfade_pending[indices].any()):
                    if self.groups == 1:
                        conv_params = self._xfade_params
                    else:
                        # UNIFORM all-dual shape: groups without a swap
                        # run a self-crossfade (identical output for any
                        # mask). Mixing dual and steady groups would key
                        # a jit shape per PATTERN of concurrently-fading
                        # groups (2^G combinations) — prewarm could never
                        # cover a second group's swap landing while the
                        # first still has pending lanes, and the round
                        # would compile mid-traffic. One shape, warmed
                        # once; the extra dual MAC columns for
                        # non-swapping groups cost one fade round only.
                        conv_params = tuple(
                            self._xfade_params[gi]
                            if gi in self._xfade_params
                            else upols.xfade_conv_params(p, p)
                            for gi, p in enumerate(self._conv_params)
                        )
                    xfade_ramp = self._xfade_ramp
                    # COPY: jnp.asarray may zero-copy an aligned numpy
                    # buffer on CPU backends, and _xfade_pending is
                    # mutated right after this (async) dispatch.
                    xfade_mask = jnp.asarray(self._xfade_pending.copy())
                state, y_rows = _pool_step(
                    conv_params, p_from, p_to,
                    PoolState(self._state.conv, eq_state),
                    jnp.asarray(blocks), jnp.asarray(idx_up),
                    transition_length=self.eq_runtime.transition_length,
                    eq_enabled=self._eq_enabled,
                    eq_crossfading=crossfading,
                    variant=variant,
                    xfade_ramp=xfade_ramp,
                    xfade_mask=xfade_mask,
                )
                if xfade_ramp is not None:
                    self._xfade_pending[indices] = False
                    live = self._xfade_pending & self._attached_mask
                    if self.groups == 1:
                        if not live.any():
                            self._xfade_params = None
                    else:
                        for gi in list(self._xfade_params):
                            seg = live[gi * self.group_size:
                                       (gi + 1) * self.group_size]
                            if not seg.any():
                                self._xfade_params.pop(gi)
                        if not self._xfade_params:
                            self._xfade_params = None
                self._state = state
                for rt in self.eq_runtimes:
                    rt.after_block(step_frames)
                self._debt[self._debt_targets(indices)] += 1
                self._debt[indices] = 0

                if pending is not None:
                    prev_idx, prev_rows = pending
                    self._deliver(prev_idx, prev_rows)
                    inflight[prev_idx] = False
                    if on_deliver is not None:
                        on_deliver()
                pending = (indices, y_rows)
                inflight[indices] = True
                self.rounds += 1
                self.blocks_rendered += k * M
                rounds += 1
            if pending is not None:
                prev_idx, prev_rows = pending
                pending = None
                self._deliver(prev_idx, prev_rows)
                if on_deliver is not None:
                    on_deliver()
        except Exception:
            # The step donates the carry, so after a device failure the
            # old buffers may already be consumed — rebuild fresh
            # per-stream state (the reference's recovery is likewise a
            # fresh pipeline; ConvolutionEngine history resets). Blocks
            # harvested for in-flight rounds are lost to the failure and
            # surface as underflow zeros at pull time; the pool itself
            # stays usable for the next round.
            self._state = self._place(self._fresh_state())
            self._debt[:] = 0
            self._reset_pending[:] = False  # fresh state is already zero
            self._clear_xfade()  # zeroed histories have nothing to blend
            self.render_errors += 1
            raise
        return rounds

    def _debt_targets(self, harvested: np.ndarray) -> np.ndarray:
        """Attached lanes that sat this round out (their alignment debt
        grows by one cursor advance)."""
        mask = self._attached_mask.copy()
        mask[harvested] = False
        return mask

    def _deliver(self, indices: np.ndarray, rows) -> None:
        """Queue rendered output (fetching the device rows here, where
        delivery overlaps the next round's dispatch). Harvest gating
        guarantees space at harvest time, so the single atomic scatter is
        the whole fast path; an unlocked pull racing the round can still
        shrink a ring between check and write, in which case the affected
        blocks stash in order (scatter is all-or-nothing, so nothing
        double-delivers)."""
        blocks = np.asarray(rows)[: len(indices)]
        if self.blocks_per_step > 1:
            # [k, M, E, T] -> [k, E, M*T] (ring frames are channel planes).
            k, M, E, T = blocks.shape
            blocks = np.ascontiguousarray(
                blocks.swapaxes(1, 2)
            ).reshape(k, E, M * T)
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

    def stats(self) -> dict:
        """Operational snapshot (host-side counters only — reading it
        never touches the device or blocks the pump): occupancy, work
        done, error counts, per-group attachment, and the EQ machines'
        transition states. The serving frontend merges this into its own
        stats line (RenderServer.stats)."""
        per_group = None
        if self.groups > 1:
            q = self.group_size
            per_group = [
                int(self._attached_mask[g * q:(g + 1) * q].sum())
                for g in range(self.groups)
            ]
        return {
            "max_streams": self.max_streams,
            "attached": len(self._attached),
            "attached_per_group": per_group,
            "groups": self.groups,
            "blocks_per_step": self.blocks_per_step,
            "rounds": self.rounds,
            "blocks_rendered": self.blocks_rendered,
            "render_errors": self.render_errors,
            "stashed_streams": len(self._pending_out),
            "lanes_in_debt": int(
                (self._debt[self._attached_mask]
                 % self._lane_cycles[self._attached_mask] != 0).sum()
            ),
            "eq_transitioning": [rt.is_transitioning
                                 for rt in self.eq_runtimes],
            "hotswap_fading": int(
                (self._xfade_pending & self._attached_mask).sum()
            ),
        }
