"""Per-fusion device-time profile of the render chain (bench configurations).

Runs the same sync-proof runner as bench.py under jax.profiler, then parses
the captured xplane protobuf and prints device time per HLO fusion, sorted.
Works over the tunneled TPU platform (trace RPCs are reliable there even when
wall-clock timing needs the fetch-a-checksum pattern — CLAUDE.md gotchas).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_chain.py \
      [--batch 8192] [--blocks-per-step 8] [--hrir-seconds 1.0] [--blocks 16]
      [--pool]   # serving-pool round instead of the bake chain; the same
                 # --blocks-per-step selects its tier (default 1; the
                 # multi-block throughput tier at M>1 — fixture, schedule
                 # and scan body are bench.measure_pool's own helpers)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(logdir: str, top: int = 40) -> list[tuple[str, float, int]]:
    """Aggregate (name, total_us, count) from the TPU device plane."""
    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    totals: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as fh:
            xspace.ParseFromString(fh.read())
        for plane in xspace.planes:
            lname = plane.name.lower()
            if "tpu" not in lname and "device" not in lname:
                continue
            if "host" in lname:
                continue
            meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                lline = line.name.lower()
                # XLA op lines carry the per-fusion events; skip step lines.
                if "step" in lline:
                    continue
                for ev in line.events:
                    name = meta.get(ev.metadata_id, str(ev.metadata_id))
                    totals[name] += ev.duration_ps / 1e6
                    counts[name] += 1
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    return [(name, us, counts[name]) for name, us in rows]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--blocks", type=int, default=16,
                    help="blocks per traced call")
    ap.add_argument("--blocks-per-step", type=int, default=None,
                    help="lookahead M (bake chain default 8; with --pool "
                         "it selects the serving tier, default 1)")
    ap.add_argument("--hrir-seconds", type=float, default=None)
    ap.add_argument("--speakers", type=int, default=2)
    ap.add_argument("--synthetic-hrir", action="store_true",
                    help="synthesized bank: every requested speaker "
                         "renders (see bench.py --synthetic-hrir)")
    ap.add_argument("--calls", type=int, default=2, help="traced calls")
    ap.add_argument("--pool", action="store_true",
                    help="profile the serving pool's ring step instead of "
                         "the bake chain")
    ap.add_argument("--pool-groups", type=int, default=1,
                    help="with --pool: profile the grouped multi-profile "
                         "round (bench --pool-groups)")
    ap.add_argument("--pool-blocks", type=int, default=None,
                    help="alias for --blocks-per-step in --pool mode "
                         "(StreamPool(blocks_per_step=M), paged_id round)")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    if args.pool_blocks is not None:
        if not args.pool:
            ap.error("--pool-blocks requires --pool")
        if (args.blocks_per_step is not None
                and args.blocks_per_step != args.pool_blocks):
            ap.error(f"--pool-blocks {args.pool_blocks} conflicts with "
                     f"--blocks-per-step {args.blocks_per_step}")
        args.blocks_per_step = args.pool_blocks
    if args.pool_groups < 1:
        ap.error("--pool-groups must be >= 1")
    if args.pool_groups > 1:
        if not args.pool:
            ap.error("--pool-groups requires --pool")
        if args.batch % args.pool_groups:
            ap.error(f"--batch {args.batch} must divide by --pool-groups "
                     f"{args.pool_groups}")
    if args.blocks_per_step is None:
        args.blocks_per_step = 1 if args.pool else 8

    import jax
    import numpy as np

    import bench

    if args.pool:
        import jax.numpy as jnp

        M = args.blocks_per_step
        # The exact fixture + schedule + scan body the bench measures
        # (bench.measure_pool) — shared helpers, no drift.
        conv_params, eq_params, state, x = bench.build_pool(
            args.batch, hrir_seconds=args.hrir_seconds,
            speakers=args.speakers, blocks_per_step=M,
            groups=args.pool_groups,
        )
        conv0 = (state.conv[0] if type(state.conv) is tuple
                 else state.conv)
        n_pages = len(conv0.pages) if M > 1 else 1
        blocks = args.blocks + (-args.blocks) % M
        variant, steps, unroll, blocks = bench.plan_pool_schedule(
            M, blocks, n_pages, identity=True
        )
        pool_run = bench.make_pool_runner(variant, steps, unroll)
        idx = jnp.arange(args.batch, dtype=jnp.int32)

        def run(conv_params, eq_params, state, x):
            return pool_run(conv_params, eq_params, state, x, idx)

        args.blocks = blocks  # per-block accounting below
    else:
        conv_params, eq_params, state, x = bench.build(
            args.batch, hrir_seconds=args.hrir_seconds,
            lookahead=args.blocks_per_step, speakers=args.speakers,
            synthetic=args.synthetic_hrir,
        )
        run = bench.make_runner(args.blocks,
                                blocks_per_step=args.blocks_per_step)

    # Compile + warm (outside the trace).
    state, acc = run(conv_params, eq_params, state, x)
    np.asarray(acc)

    logdir = args.logdir or tempfile.mkdtemp(prefix="airwave_trace_")
    jax.profiler.start_trace(logdir)
    for _ in range(args.calls):
        state, acc = run(conv_params, eq_params, state, x)
        np.asarray(acc)  # fetch inside the trace: force real execution
    jax.profiler.stop_trace()

    rows = parse_xplane(logdir, args.top)
    blocks_total = args.blocks * args.calls
    print(f"# device time per fusion over {args.calls} calls x "
          f"{args.blocks} blocks (B={args.batch}, M={args.blocks_per_step}, "
          f"hrir_seconds={args.hrir_seconds})")
    total_us = sum(us for _, us, _ in rows)
    for name, us, count in rows:
        per_block_ms = us / 1e3 / blocks_total
        print(f"{per_block_ms:9.4f} ms/block  {us/1e3:9.2f} ms total "
              f"x{count:<5d} {name[:110]}")
    print(json.dumps({
        "trace_dir": logdir,
        "sum_listed_ms_per_block": round(total_us / 1e3 / blocks_total, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
