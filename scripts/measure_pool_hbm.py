#!/usr/bin/env python
"""Validate plan_capacity's per-lane HBM math against a LIVE pool.

Builds a real StreamPool at --batch lanes, runs one full round, reads the
device allocator's peak bytes (jax memory_stats), and prints both the
measured per-lane cost and the planner's estimate with their ratio. The
planner's contract is ~2x fidelity (utils/memory_planner docstring); this
script is the measurement that keeps that claim honest after carry-format
changes (VERDICT r3 #5: "plan_capacity output validated against a
measured HBM footprint at HEAD").

    python scripts/measure_pool_hbm.py --batch 2048
    python scripts/measure_pool_hbm.py --batch 1024 --blocks-per-step 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--blocks-per-step", type=int, default=1)
    ap.add_argument("--hrir-seconds", type=float, default=0.09)
    ap.add_argument("--speakers", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from airwave_tpu.assets import channel_maps as cm
    from airwave_tpu.graph.renderer import prepare_renderer
    from airwave_tpu.io.wav import WAVData
    from airwave_tpu.runtime.stream_pool import StreamPool
    from airwave_tpu.utils.memory_planner import pool_capacity

    dev = jax.devices()[0]

    def stats(key):
        s = dev.memory_stats() or {}
        return int(s.get(key, 0))

    sr = 48_000.0
    taps = int(round(args.hrir_seconds * sr))
    rng = np.random.default_rng(0)
    n_in = 14 if args.speakers == 2 else 2 * args.speakers
    audio = (rng.standard_normal((n_in, taps)) * 0.05).astype(np.float32)
    layout = cm.STEREO if args.speakers == 2 else cm.SURROUND_7_1
    base = stats("bytes_in_use")
    renderer = prepare_renderer(WAVData(sr, audio), layout, sr, args.block,
                                lookahead=args.blocks_per_step)
    pool = StreamPool(args.batch, sr, renderer, block_size=args.block,
                      blocks_per_step=args.blocks_per_step)
    # Attach EVERY lane and run full-bucket rounds: the planner sizes the
    # full-harvest round (its working set scales with the bucket), so the
    # measurement must hit that bucket, not a kb=8 one.
    lanes = [pool.attach() for _ in range(args.batch)]
    step = args.blocks_per_step * args.block
    ch = renderer.num_speakers  # push full-width frames for any layout
    chunk = (rng.standard_normal((ch, step)) * 0.3).astype(np.float32)
    for _ in range(2):
        for lane in lanes:
            pool.push(lane, chunk)
        pool.pump()
    # Fetch a checksum so the round really executed (tunnel rule: never
    # trust completion without a readback).
    _ = float(np.abs(pool.pull(lanes[0], pool.available(lanes[0]))).sum())
    peak = stats("peak_bytes_in_use")
    in_use = stats("bytes_in_use")

    # This environment's backends expose no allocator stats (CPU
    # memory_stats() is None; the tunneled axon device likewise), so on
    # CPU fall back to the kernel's RSS high-water mark: reset VmHWM
    # (write "5" to /proc/self/clear_refs), run two more warm full-bucket
    # rounds, and read the delta — XLA CPU buffers live on the process
    # heap, so the round's temps+outputs show up as touched pages.
    rss_peak_delta = 0
    if not peak and args.cpu and os.path.exists("/proc/self/clear_refs"):
        def vm(field):
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith(field + ":"):
                        return int(line.split()[1]) * 1024
            return 0

        try:
            with open("/proc/self/clear_refs", "w") as f:
                f.write("5")
            rss0 = vm("VmRSS")
            for _ in range(2):
                for lane in lanes:
                    pool.push(lane, chunk)
                pool.pump()
            _ = float(np.abs(
                pool.pull(lanes[0], pool.available(lanes[0]))).sum())
            rss_peak_delta = max(0, vm("VmHWM") - rss0)
        except OSError:
            rss_peak_delta = 0

    plan = pool_capacity(args.speakers, taps, args.block,
                         lookahead=args.blocks_per_step,
                         hbm_bytes=16 * 2**30)
    est_total = plan["per_lane_bytes"] * args.batch + plan["params_bytes"]
    measured = max(peak - base, in_use - base)

    # Exact carry/params accounting from the live arrays' shapes — the
    # allocator-independent validation (the tunneled axon device returns
    # memory_stats() = None, so peak bytes are unobservable there; the
    # carry IS the planner's dominant, shape-derived term).
    carry = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                for a in jax.tree_util.tree_leaves(pool._state))
    params = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                 for r in pool.renderers
                 for a in jax.tree_util.tree_leaves(r.conv_params))
    est_carry_share = plan["per_lane_bytes"] * args.batch
    out = {
        "metric": "pool HBM footprint vs planner estimate",
        "batch": args.batch,
        "blocks_per_step": args.blocks_per_step,
        "carry_bytes_exact": carry,
        "params_bytes_exact": params,
        "per_lane_carry_exact": carry // args.batch,
        "per_lane_estimated": plan["per_lane_bytes"],
        "params_bytes_estimated": plan["params_bytes"],
        # The estimate covers carry + a round's working set (Ykm terms,
        # DFT outputs), so the exact carry is a LOWER bound it must
        # clear; the full ~2x-fidelity verdict needs allocator peaks.
        "estimate_covers_carry": bool(est_carry_share >= carry),
        "est_over_carry": round(est_carry_share / carry, 3) if carry
        else None,
        "device": str(dev),
    }
    if measured:  # allocator stats available (e.g. local CPU/TPU)
        out["measured_bytes"] = measured
        out["est_over_measured"] = round(est_total / measured, 3)
        out["within_2x"] = bool(0.5 <= est_total / measured <= 2.0)

    # Calibrated estimate (XLA buffer assignment — VERDICT r4 #3): the
    # steady round's compiled peak must sit within 1.3x of the allocator
    # truth (the executed rounds here ARE steady rounds, so compare
    # steady-to-steady; hotswap/eq rounds only raise the plan's bound).
    from airwave_tpu.utils.memory_planner import xla_pool_round_memory

    cal = xla_pool_round_memory(pool, rounds=("steady",))
    steady = cal["rounds"]["steady"]
    cal_total = steady["fixed_bytes"] \
        + steady["per_lane_bytes"] * args.batch
    out["calibrated_total_bytes"] = int(cal_total)
    out["calibrated_per_lane"] = steady["per_lane_bytes"]
    out["calibrated_covers_carry"] = bool(
        steady["per_lane_bytes"] * args.batch >= carry
    )
    if not measured and rss_peak_delta:
        # Kernel-RSS ground truth (CPU): steady live bytes (carry +
        # params + the round's harvest upload) plus the measured
        # high-water delta of the rounds themselves (temps, outputs).
        harvest = args.batch * (ch * step * 4 + 4)
        measured = carry + params + harvest + rss_peak_delta
        out["measured_bytes_rss"] = int(measured)
        out["rss_peak_delta"] = int(rss_peak_delta)
    if measured:
        ratio = cal_total / measured
        out["calibrated_over_measured"] = round(ratio, 3)
        out["calibrated_within_1p3"] = bool(1 / 1.3 <= ratio <= 1.3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
