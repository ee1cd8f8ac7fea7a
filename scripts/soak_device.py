#!/usr/bin/env python3
"""Sustained ON-DEVICE serving soak: the StreamPool's real jitted round
driven continuously for minutes of wall-clock on the default JAX device.

The wall-clock soak gate (`pytest -m soak`) exercises the full serving
stack — sockets, rings, churn — on CPU; this script is its device-side
complement: it holds the POOL ROUND (runtime/stream_pool.pool_step_body,
the exact computation `StreamPool.pump` dispatches) at steady state on
real hardware for `--seconds` and checks what only a long run can show:

  * numerical health over millions of blocks — every fetched checksum
    finite, and no monotonic drift of the output statistic (recurrent
    carries that slowly blow up look fine in a 3-call bench);
  * timing stability — per-call ms/block percentiles and tail ratio
    (thermal throttling / background contention would show here);
  * sustained-throughput accounting — the realtime multiple over the
    WHOLE window (including host dispatch gaps), not a best-of-N.

Sync-proof like bench.py: every call's checksum is fetched to host
before its timer stops (on this platform `block_until_ready` can return
before execution — CLAUDE.md). Prints one JSON line; exit 1 on any
health failure. Mirrors the reference's committed perf-harness
discipline (AirwaveTests/RealtimeAudioProcessorTests.swift:128-166 runs
10 s of audio per config; this runs minutes).

Usage:
  python scripts/soak_device.py [--seconds 300] [--batch 8192]
         [--pool-blocks M] [--pool-groups G] [--hrir-seconds S[,S2,..]]
         [--blocks-per-call 256] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BLOCK = 512
SAMPLE_RATE = 48_000


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seconds", type=float, default=300.0,
                        help="soak window (wall-clock) after warmup")
    parser.add_argument("--batch", type=int, default=8192)
    parser.add_argument("--blocks-per-call", type=int, default=256,
                        help="blocks per jitted call (one timing sample)")
    parser.add_argument("--pool-blocks", type=int, default=1,
                        help="multi-block throughput tier (StreamPool "
                             "blocks_per_step=M)")
    parser.add_argument("--pool-groups", type=int, default=1,
                        help="grouped multi-profile pool (G tenants)")
    parser.add_argument("--hrir-seconds", default=None,
                        help="HRIR length in seconds; with --pool-groups "
                             "G a comma list gives per-group lengths")
    parser.add_argument("--speakers", type=int, default=2)
    parser.add_argument("--cpu", action="store_true",
                        help="CPU smoke (tiny shapes recommended)")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import bench

    hrir_seconds = None
    if args.hrir_seconds is not None:
        parts = [float(s) for s in str(args.hrir_seconds).split(",")]
        if len(parts) == 1:
            hrir_seconds = parts[0]
        else:
            if args.pool_groups != len(parts):
                parser.error(f"--hrir-seconds lists {len(parts)} lengths "
                             f"but --pool-groups is {args.pool_groups}")
            hrir_seconds = parts

    bench._enable_compile_cache()
    dev = jax.devices()[0]
    conv_params, eq_params, state, x = bench.build_pool(
        args.batch, hrir_seconds=hrir_seconds, speakers=args.speakers,
        blocks_per_step=args.pool_blocks, groups=args.pool_groups,
    )
    M = int(args.pool_blocks)
    idx = np.arange(args.batch, dtype=np.int32)
    conv0 = state.conv[0] if type(state.conv) is tuple else state.conv
    n_pages = len(conv0.pages) if M > 1 else 1
    variant, steps, unroll, blocks_per_call = bench.plan_pool_schedule(
        M, args.blocks_per_call, n_pages, identity=True
    )
    run = bench.make_pool_runner(variant, steps, unroll)

    # Warmup: compile + one settled call (first-call checksum includes
    # the zero-state transient).
    state, acc = run(conv_params, eq_params, state, x, idx)
    np.asarray(acc)
    state, acc = run(conv_params, eq_params, state, x, idx)
    baseline = float(np.abs(np.asarray(acc)).mean())

    call_ms = []
    sums = []
    failures = []
    t_start = time.perf_counter()
    deadline = t_start + args.seconds
    while time.perf_counter() < deadline:
        t0 = time.perf_counter()
        state, acc = run(conv_params, eq_params, state, x, idx)
        host = np.asarray(acc)  # sync point: timer stops after the fetch
        dt = time.perf_counter() - t0
        call_ms.append(1e3 * dt / blocks_per_call)
        if not np.all(np.isfinite(host)):
            failures.append("non-finite checksum")
            break
        sums.append(float(np.abs(host).mean()))
    window = time.perf_counter() - t_start

    calls = len(call_ms)
    if calls == 0:
        print(json.dumps({"metric": "on-device serving soak",
                          "pass": False, "error": "no calls completed"}))
        return 1

    ms = np.asarray(call_ms)
    # Drift check: with stationary random input and fixed filters, the
    # per-call output statistic must be stationary too. Compare the last
    # quarter's mean against the settled baseline; a recurrence that
    # accumulates error would trend away monotonically.
    tail_mean = float(np.mean(sums[-max(1, calls // 4):])) if sums else 0.0
    drift_ratio = tail_mean / baseline if baseline else float("inf")
    if not (0.5 < drift_ratio < 2.0):
        failures.append(f"output drift: tail/baseline = {drift_ratio:.3g}")

    blocks_total = calls * blocks_per_call
    audio_seconds = args.batch * blocks_total * BLOCK / SAMPLE_RATE
    result = {
        "metric": "on-device serving soak",
        "pass": not failures,
        "seconds": round(window, 1),
        "calls": calls,
        "blocks": blocks_total,
        "batch_streams": args.batch,
        "variant": variant,
        "sustained_x_realtime": round(audio_seconds / window, 1),
        "ms_per_block_mean": round(float(ms.mean()), 4),
        "ms_per_block_p50": round(float(np.percentile(ms, 50)), 4),
        "ms_per_block_p99": round(float(np.percentile(ms, 99)), 4),
        "ms_per_block_max": round(float(ms.max()), 4),
        "tail_ratio_p99_over_p50": round(
            float(np.percentile(ms, 99) / np.percentile(ms, 50)), 3),
        "output_drift_ratio": round(drift_ratio, 4),
        "device": str(dev),
    }
    if args.pool_groups > 1:
        result["profile_groups"] = args.pool_groups
    if M > 1:
        result["blocks_per_step"] = M
    if hrir_seconds is not None:
        result["hrir_seconds"] = hrir_seconds
    if failures:
        result["failures"] = failures
    print(json.dumps(result))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
