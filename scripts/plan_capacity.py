#!/usr/bin/env python
"""Pool capacity planner: how many serving lanes fit a chip (or slice).

Sizing guidance for StreamPool deployments (docs/serving.md "Provision
max_streams near expected concurrency"): given the workload shape
(speakers, HRIR length, block, throughput tier, profile groups) and an
HBM budget, print the per-lane cost and the recommended max_streams.
Estimates are the memory planner's (~2x fidelity — guidance, not an
allocator); the authoritative signal stays the runtime OOM.

Runs without touching any device unless --probe-hbm is passed.

    python scripts/plan_capacity.py --speakers 2 --hrir-seconds 0.09
    python scripts/plan_capacity.py --hrir-seconds 1.0 --blocks-per-step 8 \
        --groups 4 --hbm-gb 16 --mesh-devices 8
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--speakers", type=int, default=2)
    ap.add_argument("--hrir-seconds", default="0.09",
                    help="HRIR length in seconds (0.09 = the bundled "
                         "4320-tap banks); a comma-separated list gives "
                         "per-group lengths for a heterogeneous grouped "
                         "pool (must match --groups)")
    ap.add_argument("--sample-rate", type=float, default=48_000.0)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--blocks-per-step", type=int, default=1,
                    help="throughput tier M (paged lookahead line)")
    ap.add_argument("--groups", type=int, default=1,
                    help="profile groups (grouped multi-tenant pool)")
    ap.add_argument("--hbm-gb", type=float, default=16.0,
                    help="per-device HBM budget in GiB")
    ap.add_argument("--probe-hbm", action="store_true",
                    help="read the HBM size from the default JAX device "
                         "instead of --hbm-gb (initializes the backend)")
    ap.add_argument("--mesh-devices", type=int, default=1,
                    help="devices in the pool's streams mesh")
    ap.add_argument("--headroom", type=float, default=0.85,
                    help="fraction of HBM to plan into (rest = XLA temps)")
    args = ap.parse_args()
    if args.groups < 1 or args.blocks_per_step < 1 or args.mesh_devices < 1:
        ap.error("--groups/--blocks-per-step/--mesh-devices must be >= 1")

    from airwave_tpu.utils.memory_planner import (device_hbm_bytes,
                                                  pool_capacity)

    hbm = device_hbm_bytes() if args.probe_hbm else args.hbm_gb * 2**30
    secs = [float(s) for s in str(args.hrir_seconds).split(",")]
    taps = [int(round(s * args.sample_rate)) for s in secs]
    if len(taps) == 1:
        taps = taps[0]
    elif len(taps) != args.groups:
        ap.error(f"--hrir-seconds lists {len(taps)} lengths but "
                 f"--groups is {args.groups}")
    plan = pool_capacity(
        args.speakers, taps, args.block, lookahead=args.blocks_per_step,
        groups=args.groups, hbm_bytes=hbm, headroom=args.headroom,
        mesh_devices=args.mesh_devices,
    )
    out = {
        "speakers": args.speakers,
        "hrir_taps": taps,
        "block": args.block,
        "blocks_per_step": args.blocks_per_step,
        "groups": args.groups,
        "mesh_devices": args.mesh_devices,
        "hbm_bytes_per_device": int(hbm),
        **plan,
        "per_lane_kib": round(plan["per_lane_bytes"] / 1024, 1),
        "note": ("size max_streams to expected concurrency — every round "
                 "steps ALL lanes (docs/serving.md); estimates are ~2x "
                 "fidelity"),
    }
    print(json.dumps(out))
    return 0 if plan["max_streams"] > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
