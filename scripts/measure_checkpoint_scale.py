#!/usr/bin/env python
"""Serving-checkpoint cost at production scale (VERDICT r4 #5).

A B=16,384 M=8 pool's snapshot is a multi-GB npz. What matters
operationally is not the total wall time (the save runs on the serve
shell's control thread) but the PUMP STALL: `RenderServer.save_checkpoint`
holds the pump lock only for `pool.snapshot(materialize=False)` — a
device-side jnp.copy of the carry — while the device->host readback,
serialization, and the fsync'd atomic write all happen outside the lock
against the copied (immutable) buffers.

This script measures every phase at a given scale and prints one JSON
line: lock-held snapshot ms (= the pump stall), materialize (readback)
ms, atomic write ms, file GiB, load ms, restore ms, and a
bit-exactness check of a save->load->restore round trip.

    python scripts/measure_checkpoint_scale.py --batch 16384 \
        --blocks-per-step 8 [--cpu] [--out /tmp/pool_ckpt]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batch", type=int, default=16_384)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--blocks-per-step", type=int, default=8)
    ap.add_argument("--hrir-seconds", type=float, default=0.09)
    ap.add_argument("--rounds", type=int, default=1,
                    help="warm pump rounds before the measurement (puts "
                         "real data in the carry)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="/tmp/pool_ckpt_scale")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from airwave_tpu.assets import channel_maps as cm
    from airwave_tpu.graph.renderer import prepare_renderer
    from airwave_tpu.io.wav import WAVData
    from airwave_tpu.runtime.stream_pool import StreamPool
    from airwave_tpu.utils.checkpoint import (checkpoint_path,
                                              load_pool_snapshot,
                                              save_pool_snapshot)

    sr = 48_000.0
    taps = int(round(args.hrir_seconds * sr))
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((14, taps)) * 0.05).astype(np.float32)
    M = args.blocks_per_step
    renderer = prepare_renderer(WAVData(sr, audio), cm.STEREO, sr,
                                args.block, lookahead=M)
    pool = StreamPool(args.batch, sr, renderer, block_size=args.block,
                      blocks_per_step=M)
    # Real data in a few lanes (full-batch rounds at B=16k are slow on
    # CPU and unnecessary: snapshot cost is shape-, not value-, bound).
    lanes = [pool.attach() for _ in range(8)]
    chunk = (rng.standard_normal((2, M * args.block)) * 0.3
             ).astype(np.float32)
    for _ in range(args.rounds):
        for lane in lanes:
            pool.push(lane, chunk)
        pool.pump()
        for lane in lanes:
            pool.pull(lane, pool.available(lane))

    # Phase 1 — the pump stall: the under-lock device-side carry copy.
    t0 = time.perf_counter()
    snap = pool.snapshot(materialize=False)
    jax.block_until_ready(snap["state"])
    t1 = time.perf_counter()
    # Phase 2 — device->host readback of the copy (outside the lock).
    snap["state"] = jax.tree_util.tree_map(np.asarray, snap["state"])
    t2 = time.perf_counter()
    # Phase 3 — the fsync'd atomic npz write (outside the lock).
    save_pool_snapshot(args.out, snap)
    t3 = time.perf_counter()
    size = os.path.getsize(checkpoint_path(args.out))
    # Phase 4 — load + restore into a fresh identically-shaped pool.
    pool2 = StreamPool(args.batch, sr, renderer, block_size=args.block,
                       blocks_per_step=M)
    t4 = time.perf_counter()
    loaded = load_pool_snapshot(args.out, pool2)
    t5 = time.perf_counter()
    pool2.restore(loaded)
    jax.block_until_ready(pool2._state)
    t6 = time.perf_counter()
    # Bit-exactness of the round trip.
    a = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, pool._state))
    b = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, pool2._state))
    exact = all(np.array_equal(x, y) for x, y in zip(a, b))

    carry = sum(int(np.prod(x.shape)) * x.dtype.itemsize for x in a)
    print(json.dumps({
        "metric": "pool checkpoint cost at scale",
        "batch": args.batch,
        "blocks_per_step": M,
        "carry_gib": round(carry / 2**30, 3),
        "file_gib": round(size / 2**30, 3),
        "pump_stall_ms": round((t1 - t0) * 1e3, 1),
        "materialize_ms": round((t2 - t1) * 1e3, 1),
        "write_ms": round((t3 - t2) * 1e3, 1),
        "save_total_ms": round((t3 - t0) * 1e3, 1),
        "load_ms": round((t5 - t4) * 1e3, 1),
        "restore_ms": round((t6 - t5) * 1e3, 1),
        "roundtrip_exact": bool(exact),
        "device": str(jax.devices()[0]),
    }))
    os.remove(checkpoint_path(args.out))
    return 0 if exact else 1


if __name__ == "__main__":
    sys.exit(main())
