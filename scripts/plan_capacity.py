#!/usr/bin/env python
"""Pool capacity planner: how many serving lanes fit a chip (or slice).

Sizing guidance for StreamPool deployments (docs/serving.md "Provision
max_streams near expected concurrency"): given the workload shape
(speakers, HRIR length, block, throughput tier, profile groups) and an
HBM budget, print the per-lane cost and the recommended max_streams.
Estimates are the memory planner's (~2x fidelity — guidance, not an
allocator) unless --calibrate is passed: then the pool round is
AOT-compiled at a small probe batch and sized from XLA's own buffer
assignment (exact per-lane peak across steady/EQ-crossfade/hot-swap
rounds; validated est/measured <= 1.3 by scripts/measure_pool_hbm.py).
Calibration is compile-only — it works over tunneled devices where
execution is unreliable, and never allocates round-sized buffers.

Runs without touching any device unless --probe-hbm or --calibrate is
passed (--calibrate --cpu keeps even compilation off the device).

    python scripts/plan_capacity.py --speakers 2 --hrir-seconds 0.09
    python scripts/plan_capacity.py --hrir-seconds 1.0 --blocks-per-step 8 \
        --groups 4 --hbm-gb 16 --mesh-devices 8
    python scripts/plan_capacity.py --blocks-per-step 8 --calibrate --cpu
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _calibrate(args, taps) -> dict:
    """Build a probe pool at --probe-batch and read the round's exact
    footprint from XLA's buffer assignment (utils/memory_planner.
    xla_pool_round_memory — compile-only, nothing executes)."""
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from airwave_tpu.assets import channel_maps as cm
    from airwave_tpu.graph.renderer import prepare_renderer
    from airwave_tpu.io.wav import WAVData
    from airwave_tpu.runtime.stream_pool import PoolProfile, StreamPool
    from airwave_tpu.utils.memory_planner import xla_pool_round_memory

    sr = args.sample_rate
    rng = np.random.default_rng(0)
    n_in = 14 if args.speakers == 2 else 2 * args.speakers
    layout = cm.STEREO if args.speakers == 2 else cm.SURROUND_7_1
    taps_list = taps if isinstance(taps, list) else [taps] * args.groups

    def renderer(t):
        audio = (rng.standard_normal((n_in, t)) * 0.05).astype(np.float32)
        return prepare_renderer(WAVData(sr, audio), layout, sr, args.block,
                                lookahead=args.blocks_per_step)

    # Probe pools carry a generic EQ so the eq_xfade round compiles too
    # (EQ state is per-lane; the preamp-only definition builds the same
    # state shapes as any preset).
    from airwave_tpu.io.apo import EqualizerDefinition

    eq = EqualizerDefinition(preamp_db=-3.0)
    # Probe batch rounded up to a groups multiple (equal segments).
    g = max(1, args.groups)
    probe = max(g, (args.probe_batch + g - 1) // g * g)
    if args.groups > 1:
        pool = StreamPool(
            probe, sr, block_size=args.block,
            blocks_per_step=args.blocks_per_step,
            profiles=[PoolProfile(renderer(t), eq) for t in taps_list],
        )
    else:
        pool = StreamPool(probe, sr, renderer(taps_list[0]),
                          eq_definition=eq, block_size=args.block,
                          blocks_per_step=args.blocks_per_step)
    return xla_pool_round_memory(pool)


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
    ap.add_argument("--calibrate", action="store_true",
                    help="AOT-compile the pool round at --probe-batch and "
                         "size from XLA's buffer assignment instead of the "
                         "hand model (compile-only: works over tunneled "
                         "devices; est/measured validated <= 1.3 vs the "
                         "hand model's ~2-3x)")
    ap.add_argument("--probe-batch", type=int, default=256,
                    help="probe pool size for --calibrate (per-lane cost "
                         "is linear in batch, so small probes calibrate "
                         "any target)")
    ap.add_argument("--cpu", action="store_true",
                    help="calibrate against the CPU backend (default: the "
                         "active JAX backend)")
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
    calibration = None
    if args.calibrate:
        calibration = _calibrate(args, taps)
    plan = pool_capacity(
        args.speakers, taps, args.block, lookahead=args.blocks_per_step,
        groups=args.groups, hbm_bytes=hbm, headroom=args.headroom,
        mesh_devices=args.mesh_devices, calibration=calibration,
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
                 "steps ALL lanes (docs/serving.md); "
                 + ("sized from XLA buffer assignment (<=1.3x fidelity)"
                    if plan.get("calibrated") else
                    "estimates are ~2x fidelity (--calibrate tightens to "
                    "<=1.3x)")),
    }
    if calibration is not None:
        out["calibration"] = {
            "backend": calibration["backend"],
            "probe_batch": calibration["probe_batch"],
            "rounds": {k: v["per_lane_bytes"]
                       for k, v in calibration["rounds"].items()},
        }
    print(json.dumps(out))
    return 0 if plan["max_streams"] > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
