"""HBM planning for the paged (M-block lookahead) bake chain.

Long-IR configs can exceed HBM: the paged delay line alone is
P2/M pages x [Kp, S, 2, M, B] floats (config-5 at B=16384 is ~14 GB on a
16 GB chip), and the unchunked paged MAC additionally keeps every page's
Ykm term alive at once (~7 GB of temporaries at 13 pages — see
ops/upols._PAGED_ACC_CHUNK). Rather than dying on a shape that slightly
overflows, callers consult `plan_paged_bake` for an ordered ladder of
(lookahead, acc_chunk) attempts: the preferred full-speed configuration
first, then accumulation chunking (measured ~2% slower, bounds live Ykm
terms), then smaller lookaheads (less lookahead batching, ~linearly less
live-page/temp pressure). The reference's analog concern is its pow2
partition bucketing for shape stability (ConvolutionEngine.swift:96);
here the shapes are exact and the *memory* is what gets planned.

Estimates are deliberately coarse (within ~2x): they order the ladder and
provide a pre-flight skip for hopeless configurations; the authoritative
signal is the runtime OOM the caller catches between attempts.
"""

from __future__ import annotations

import math
from typing import List, NamedTuple, Optional

F32 = 4


class PagedBakeEstimate(NamedTuple):
    fdl_bytes: int        # all delay-line pages
    live_term_bytes: int  # Ykm accumulation terms alive at once
    working_bytes: int    # frames + analysis output + projection slack
    total_bytes: int


class PlanAttempt(NamedTuple):
    lookahead: int
    acc_chunk: int   # 0 = unchunked
    reason: str
    # Cap on the surrounding scan's unroll factor (0 = the page count,
    # the speed default). The unrolled body keeps one folded-projection
    # output alive per unrolled step (~B*M*E*(T+N) floats each — a
    # measured 2.7 GB at config-5 B=16384 M=2), so memory-tight shapes
    # trade a per-group page-rotation copy (~fdl/unroll extra traffic)
    # for bounded live outputs.
    max_unroll: int = 0
    # Process the stream batch as this many sequential groups (1 = whole
    # batch). The terminal rung: a workload whose CARRY alone crowds out
    # the program (config-5 at B=16384 measured arguments 12.35 GB +
    # program >= 3.7 GB vs 15.75 GB HBM — ~2% over at every smaller
    # rung) still completes, at the per-group batch's throughput.
    batch_split: int = 1


def _padded_bins(block: int) -> int:
    k = block + 1
    return k + (-k) % 8


def paged_partitions(hrir_taps: int, block: int, lookahead: int) -> int:
    """Partition count of the paged line (exact mode): the half-window bank
    (real partitions + 1 — ops/upols._half_window_bank) plus M-1 zero tail
    slots, rounded up to whole pages (ops/upols make_conv_params lookahead
    handling)."""
    real = max(1, math.ceil(hrir_taps / block)) + 1
    need = real + lookahead - 1
    return need + (-need) % lookahead


def estimate_paged_bake(batch: int, speakers: int, hrir_taps: int,
                        block: int, lookahead: int,
                        acc_chunk: int = 0, ears: int = 2
                        ) -> PagedBakeEstimate:
    kp = _padded_bins(block)
    p2 = paged_partitions(hrir_taps, block, lookahead)
    n_pages = p2 // lookahead
    page = kp * speakers * 2 * lookahead * batch * F32
    fdl = n_pages * page
    term = kp * batch * lookahead * ears * 2 * F32
    # Unchunked, XLA's rematerializer empirically bounds concurrently-live
    # Ykm terms to ~8 even at 13 pages (config-5 measured 12 GB peak incl.
    # the 7.1 GB line); the naive all-pages count would prune shapes that
    # actually fit.
    live = (min(n_pages, 8) if acc_chunk <= 0
            else min(acc_chunk + 1, n_pages))
    live_terms = live * term
    # frames + new-page DFT output + folded projection output, ~2 pages.
    working = 2 * page + 2 * batch * speakers * lookahead * block * F32
    return PagedBakeEstimate(fdl, live_terms, working,
                             fdl + live_terms + working)


def plan_paged_bake(batch: int, speakers: int, hrir_taps: int, block: int,
                    lookahead: int, hbm_bytes: Optional[float] = None,
                    headroom: float = 0.92) -> List[PlanAttempt]:
    """Ordered (lookahead, acc_chunk) attempts for a paged bake.

    With `hbm_bytes` given, attempts whose estimate exceeds
    `headroom * hbm_bytes` are skipped when a cheaper attempt is predicted
    to fit — except the final fallback, which is always kept so the
    runtime OOM stays the authoritative judge.
    """
    candidates = [
        PlanAttempt(lookahead, 0, "full speed"),
        PlanAttempt(lookahead, 2,
                    "acc chunking bounds live Ykm terms (~2% slower)"),
        # Half-batch split BEFORE any reduced-lookahead rung: sequential
        # half-batch groups at full lookahead keep near-full per-stream
        # throughput (config-5 B=16384 measured 20,255x on this rung,
        # round 3), while the reduced-M rungs pay superlinearly for the
        # lost lookahead batching (M=2/chunk=1/unroll<=4 measured 2,772x
        # = 63 ms/block on the same shape, round 4 — a 7x regression the
        # old ordering actually shipped).
        PlanAttempt(lookahead, 2,
                    "half-batch split (two sequential groups)", 0, 2),
    ]
    m = lookahead
    while m > 2:
        m //= 2
        candidates.append(PlanAttempt(m, 2, f"reduced lookahead M={m}"))
    if lookahead > 2:
        # Tightest squeeze: pairwise lookahead with fully serialized
        # accumulation (live Ykm terms bounded to 2).
        candidates.append(PlanAttempt(2, 1, "minimum-memory M=2, chunk=1"))
        # Cap the scan unroll so only a few per-step projection outputs
        # stay live (costs a page-rotation copy per unrolled group).
        candidates.append(PlanAttempt(
            2, 1, "minimum-memory M=2, chunk=1, unroll<=4", 4))
    # Terminal rung: quarter the resident batch at full lookahead —
    # completes whenever a quarter-batch workload fits, still at the
    # full-speed step's per-stream throughput.
    candidates.append(PlanAttempt(
        lookahead, 2, "quarter-batch split (four sequential groups)", 0, 4))

    if hbm_bytes is None:
        return candidates
    budget = headroom * float(hbm_bytes)
    fits = [
        c for c in candidates
        if estimate_paged_bake(batch // c.batch_split, speakers, hrir_taps,
                               block, c.lookahead,
                               c.acc_chunk).total_bytes <= budget
    ]
    # If NO attempt is predicted to fit, the coarse estimates have nothing
    # to choose between — keep the whole ladder and let the runtime OOM
    # judge (the estimator doesn't model max_unroll, and skipping straight
    # to the half-batch terminal rung would silently halve throughput on a
    # shape that actually fits a faster rung).
    kept = fits if fits else list(candidates)
    # Always keep the final fallback: estimates are coarse by design.
    if kept[-1] != candidates[-1]:
        kept = kept + [candidates[-1]]
    return kept


def estimate_pool_lane_bytes(speakers: int, hrir_taps: int, block: int,
                             lookahead: int = 1, ears: int = 2,
                             eq_state_dim: int = 128) -> int:
    """Coarse per-lane HBM cost of a StreamPool slot: the carried state
    (delay line, EQ cascades) plus the lane's share of a round's
    working set (frames in, analysis slot, Ykm, stereo out; doubled for
    dispatch overlap slack). Same ~2x fidelity contract as
    estimate_paged_bake — sizing guidance, not an allocator."""
    kp = _padded_bins(block)
    if lookahead > 1:
        est = estimate_paged_bake(1, speakers, hrir_taps, block, lookahead,
                                  ears=ears)
        carry = est.fdl_bytes
        working = est.live_term_bytes + est.working_bytes
    else:
        p2 = max(1, math.ceil(hrir_taps / block)) + 1
        carry = kp * speakers * p2 * 2 * F32
        working = 2 * (
            speakers * block * F32          # harvested frames up
            + kp * speakers * 2 * F32       # analysis slot (+ read-back)
            + kp * ears * 2 * F32           # Ykm columns
            + ears * block * F32            # rendered rows down
        )
    eq = 2 * 2 * eq_state_dim * F32 + F32  # s_from + s_to [2, N] + counter
    return int(carry + working + eq)


def pool_capacity(speakers: int, hrir_taps, block: int,
                  lookahead: int = 1, groups: int = 1,
                  hbm_bytes: Optional[float] = None,
                  headroom: float = 0.85, ears: int = 2,
                  eq_state_dim: int = 128, mesh_devices: int = 1,
                  calibration: Optional[dict] = None) -> dict:
    """Recommend max_streams for a pool on a given HBM budget.

    `hrir_taps` may be one int (every group the same bank length) or a
    per-group sequence (heterogeneous grouped pools: each group carries
    its own delay line, so a short tenant pays only its own partitions).

    Returns a dict with the per-lane cost (mean across groups when
    heterogeneous), the (group-shared) parameter footprint, and
    `max_streams` = the largest lane count whose per-device share (lanes
    plus the REPLICATED params — every device holds the full filter
    banks/weights) fits `headroom * hbm_bytes`, rounded down to a
    multiple of groups * mesh_devices (grouped pools need equal segments;
    each group's state shards over the mesh). Serving throughput guidance
    lives in docs/serving.md ("provision max_streams near expected
    concurrency" — every round steps ALL lanes).

    `calibration`: an `xla_pool_round_memory` result for this workload
    shape. When given, the hand per-lane/params model (~2x fidelity) is
    replaced by XLA's exact buffer-assignment numbers — per-lane cost and
    fixed bytes from the compiled round itself — tightening the
    recommendation to allocator truth (validated est/measured <= 1.3,
    scripts/measure_pool_hbm.py)."""
    if hbm_bytes is None:
        hbm_bytes = device_hbm_bytes()
    kp = _padded_bins(block)
    k = block + 1
    taps_list = (list(hrir_taps) if hasattr(hrir_taps, "__len__")
                 else [int(hrir_taps)] * max(1, groups))
    if len(taps_list) != max(1, groups):
        raise ValueError(
            f"hrir_taps has {len(taps_list)} entries for groups={groups}"
        )
    if lookahead > 1:
        p2s = [paged_partitions(t, block, lookahead) for t in taps_list]
    else:
        # Half-window bank: real partitions + 1 (ops/upols
        # _half_window_bank), matching estimate_pool_lane_bytes.
        p2s = [max(1, math.ceil(t / block)) + 1 for t in taps_list]
    n = eq_state_dim
    params = (
        sum(speakers * ears * 2 * p2 * k * 2 * F32 for p2 in p2s)  # banks
        # wf is the HALF-window analysis [T, K, 2]; wi [K, 2, T].
        + block * k * 2 * F32 + k * 2 * block * F32        # DFT weights
        + 2 * groups * (block * block + 2 * block * n + n * n) * F32  # EQ
    )
    lanes = [estimate_pool_lane_bytes(speakers, t, block, lookahead,
                                      ears, eq_state_dim)
             for t in taps_list]
    lane = sum(lanes) / len(lanes)  # equal segments: mean per-lane cost
    calibrated = False
    if calibration is not None:
        # XLA buffer-assignment truth for this workload shape: per-lane
        # cost straight from the compiled round's peak (covers carry +
        # the round's real working set), fixed bytes from its argument
        # accounting. Per-lane heterogeneity collapses into the mean,
        # same as the hand model's equal-segment treatment.
        lane = float(calibration["per_lane_bytes"])
        params = float(calibration["fixed_bytes"])
        lanes = [lane] * len(taps_list)
        calibrated = True
    devices = max(1, int(mesh_devices))
    # Params are REPLICATED (every device holds the full banks/weights),
    # so they come out of each device's budget, not the pooled one.
    per_device_budget = headroom * float(hbm_bytes)
    lanes_per_device = max(0, int((per_device_budget - params) // lane))
    granularity = max(1, groups) * devices
    raw = lanes_per_device * devices
    max_streams = (raw // granularity) * granularity
    out = {
        "per_lane_bytes": int(lane),
        "per_group_lane_bytes": [int(b) for b in lanes],
        "params_bytes": int(params),
        "budget_bytes": int(per_device_budget * devices),
        "partitions": p2s if len(set(p2s)) > 1 else p2s[0],
        "max_streams": max_streams,
        "granularity": granularity,
        "calibrated": calibrated,
    }
    if calibrated and "steady" in calibration.get("rounds", {}):
        # max_streams covers the LARGEST round (at M=8 the hot-swap
        # dual-bank round measures ~2.3x the steady one, TPU-compiled);
        # a pool that will never hot-swap can size to the steady round.
        steady = calibration["rounds"]["steady"]["per_lane_bytes"]
        per_dev = max(0, int((per_device_budget
                              - calibration["rounds"]["steady"]
                              ["fixed_bytes"]) // steady))
        out["max_streams_steady"] = (per_dev * devices
                                     // granularity) * granularity
    return out


def xla_pool_round_memory(pool, rounds=("steady", "eq_xfade", "hotswap")):
    """EXACT per-round memory footprint of a StreamPool's device step from
    XLA's own buffer assignment, replacing the hand working-set model's
    ~2-3x slack (round-4 validation measured est/carry 2.98 at M=8).

    AOT-only: the full-harvest-bucket round is `.lower().compile()`d from
    ShapeDtypeStructs and `memory_analysis()` is read — nothing executes
    and no round-sized buffer is allocated, so this works over tunneled
    devices (compile RPCs are reliable there even when execution is not)
    and sizes the round for whatever backend is active.

    `rounds` selects which step variants bound the peak (capacity must
    cover the LARGEST round a serving pool can hit, not just steady
    state): "steady" (masked ring/paged round), "eq_xfade" (EQ retarget
    crossfade — dual EQ pass), "hotswap" (crossfaded HRIR swap — dual-ear
    bank MAC, the largest params + output terms).

    Returns per-round {peak, argument/output/alias/temp, fixed, per_lane}
    plus the max per_lane_bytes / fixed_bytes across rounds, where
    `fixed` = batch-invariant argument bytes (filter banks, DFT weights,
    EQ matrices) and `per_lane` = (peak - fixed) / max_streams. Per-lane
    cost is linear in the batch (verified: identical per-lane at B=256
    and B=512), so one probe pool calibrates any target batch.
    """
    import jax
    import numpy as np

    from airwave_tpu.ops import upols
    from airwave_tpu.runtime import stream_pool as sp

    def abstr(tree):
        return jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree
        )

    def tree_bytes(tree) -> int:
        return sum(int(np.prod(a.shape)) * a.dtype.itemsize
                   for a in jax.tree_util.tree_leaves(tree))

    B = pool.max_streams
    M = pool.blocks_per_step
    S = pool.renderer.num_speakers
    T = pool.block_size
    variant = "paged" if M > 1 else "ring"
    state = abstr(pool._state)
    blocks = jax.ShapeDtypeStruct(
        (B, S, M, T) if M > 1 else (B, S, T), np.float32
    )
    idx = jax.ShapeDtypeStruct((B,), np.int32)
    if pool.groups == 1:
        eq_p = abstr(pool.eq_runtime.active.params)
        base_params = pool._conv_params
        dual_params = upols.xfade_conv_params(base_params, base_params)
    else:
        eq_p = tuple(abstr(rt.active.params) for rt in pool.eq_runtimes)
        base_params = pool._conv_params
        dual_params = tuple(upols.xfade_conv_params(p, p)
                            for p in base_params)
    carry = tree_bytes(pool._state)
    harvest = tree_bytes([blocks, idx])
    jitted = jax.jit(
        sp.pool_step_body,
        static_argnames=("transition_length", "eq_enabled",
                         "eq_crossfading", "variant"),
        donate_argnums=(3,),
    )
    ramp = jax.ShapeDtypeStruct((M * T,), np.float32)
    mask = jax.ShapeDtypeStruct((B,), np.bool_)
    configs = {
        "steady": dict(params=base_params, crossfading=False, xfade=False),
        "eq_xfade": dict(params=base_params, crossfading=True, xfade=False),
        "hotswap": dict(params=dual_params, crossfading=False, xfade=True),
    }
    out_rounds = {}
    for name in rounds:
        cfg = configs[name]
        if cfg["crossfading"] and not pool._eq_enabled:
            continue  # no EQ -> no retarget round exists
        kwargs = {}
        if cfg["xfade"]:
            kwargs = dict(xfade_ramp=ramp, xfade_mask=mask)
        comp = jitted.lower(
            abstr(cfg["params"]), eq_p, eq_p, state, blocks, idx,
            transition_length=pool.eq_runtime.transition_length,
            eq_enabled=pool._eq_enabled,
            eq_crossfading=cfg["crossfading"],
            variant=variant,
            **kwargs,
        ).compile()
        ma = comp.memory_analysis()
        # Allocator-true peak: argument buffers + the WHOLE temp
        # allocation + non-donated outputs. The runtime allocates the
        # temp assignment wholesale per execution (measured: kernel-RSS
        # high-water delta per CPU round == temp_size exactly), so the
        # optimistic `peak_memory_in_bytes` (live-range reuse across the
        # temp/arg boundary) undercounts what the allocator really holds.
        # Donated outputs (the new carry) alias the old and cost nothing.
        peak = int(ma.argument_size_in_bytes + ma.temp_size_in_bytes
                   + max(0, ma.output_size_in_bytes
                         - ma.alias_size_in_bytes))
        fixed = int(ma.argument_size_in_bytes) - carry - harvest
        out_rounds[name] = {
            "peak_bytes": peak,
            "argument_bytes": int(ma.argument_size_in_bytes),
            "output_bytes": int(ma.output_size_in_bytes),
            "alias_bytes": int(ma.alias_size_in_bytes),
            "temp_bytes": int(ma.temp_size_in_bytes),
            "fixed_bytes": fixed,
            "per_lane_bytes": int(math.ceil((peak - fixed) / B)),
        }
    per_lane = max(r["per_lane_bytes"] for r in out_rounds.values())
    fixed = max(r["fixed_bytes"] for r in out_rounds.values())
    dev = None
    try:
        dev = str(jax.devices()[0].platform)
    except Exception:
        pass
    return {
        "per_lane_bytes": per_lane,
        "fixed_bytes": fixed,
        "carry_bytes_exact": carry,
        "probe_batch": B,
        "rounds": out_rounds,
        "backend": dev,
    }


def device_hbm_bytes(default: float = 16e9) -> float:
    """Best-effort HBM capacity of the default device."""
    try:
        import jax

        stats = jax.devices()[0].memory_stats()
        if stats:
            return float(stats.get("bytes_limit", default))
    except Exception:
        pass
    return default
