#!/usr/bin/env python3
"""On-device accuracy validation: full chain vs the float64 oracle.

Runs the flagship conv+EQ chain (real bundled HRIR shapes + a 10-filter
cascade) on the default JAX device and reports the relative RMS error
against the host float64 oracle — the BASELINE.md <=1e-5 contract, checked
on real hardware. Prints one JSON line; exit 1 if the contract fails.

Usage: python scripts/validate_accuracy.py [--cpu] [--batch B] [--blocks N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--blocks", type=int, default=24)
    parser.add_argument("--blocks-per-step", type=int, default=1,
                        help="validate the M-block lookahead (paged) chain")
    parser.add_argument("--pool", action="store_true",
                        help="validate the serving pool's ring step "
                             "(shared cursor + masked writes + debt rolls "
                             "under a ragged pause schedule)")
    parser.add_argument("--pool-groups", type=int, default=1,
                        help="with --pool: validate the grouped "
                             "multi-profile pool (G distinct HRIR banks + "
                             "EQ cascades, each lane vs its own group's "
                             "f64 oracle)")
    parser.add_argument("--contract", type=float, default=1e-5,
                        help="rel-RMS pass threshold. 1e-5 is the strict "
                             "tier (HIGHEST, the default); 1e-4 gates the "
                             "supported relaxed tier (run with "
                             "AIRWAVE_MATMUL_PRECISION=high — "
                             "docs/architecture.md 'Precision tiers')")
    parser.add_argument("--hrir-seconds", default=None,
                        help="HRIR length in seconds (default 0.09 = the "
                             "bundled 4320-sample shape); with --pool "
                             "--pool-groups G a comma list gives per-group "
                             "lengths (heterogeneous grouped pool)")
    args = parser.parse_args()
    if args.pool_groups < 1:
        parser.error("--pool-groups must be >= 1")
    if args.pool_groups > 1 and not args.pool:
        parser.error("--pool-groups requires --pool")
    if args.batch % args.pool_groups:
        parser.error("--batch must divide by --pool-groups")
    hrir_seconds = None
    if args.hrir_seconds is not None:
        parts = [float(s) for s in str(args.hrir_seconds).split(",")]
        if len(parts) == 1:
            hrir_seconds = [parts[0]] * args.pool_groups
        else:
            if not (args.pool and args.pool_groups > 1):
                parser.error("--hrir-seconds takes a comma list only with "
                             "--pool --pool-groups G")
            if len(parts) != args.pool_groups:
                parser.error(f"--hrir-seconds lists {len(parts)} lengths "
                             f"but --pool-groups is {args.pool_groups}")
            hrir_seconds = parts

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from airwave_tpu.io.apo import EqualizerDefinition, EqualizerFilter, FilterType
    from airwave_tpu.models.binaural import ChainState, chain_step_fn
    from airwave_tpu.ops import biquad_design as bd
    from airwave_tpu.ops import eq_block, upols
    from airwave_tpu.oracle.eq_oracle import EqCascadeOracle
    from airwave_tpu.oracle.upols_oracle import UPOLSOracle

    rng = np.random.default_rng(0)
    T, S = 512, 2
    G = args.pool_groups
    hrirs, eq_defs, designs = [], [], []
    for g in range(G):
        n_g = (4320 if hrir_seconds is None
               else int(hrir_seconds[g] * 48_000))
        h = (np.random.default_rng(g).standard_normal((S, 2, n_g))
             * 0.05).astype(np.float32)
        h[:, :, 0] += 0.8
        hrirs.append(h)
        filt = tuple(
            EqualizerFilter(i + 1, i + 1, True,
                            (FilterType.PEAKING, FilterType.LOW_SHELF,
                             FilterType.HIGH_SHELF)[i % 3],
                            100.0 * (i + 1) + 60.0 + 11.0 * g,
                            (-1.0) ** i * (2.0 + 0.25 * g), 0.9)
            for i in range(10)
        )
        eq_defs.append(EqualizerDefinition(-2.5 + 0.4 * g, filt))
        designs.append(bd.design_cascade(eq_defs[-1], 48_000.0))
    hrir = hrirs[0]
    preamp, coeffs = designs[0]
    eq_params = eq_block.make_eq_params(coeffs, preamp, T)
    B, N = args.batch, args.blocks
    # Multi-block paths consume whole M-block steps: round the block count
    # up (same policy as bench.py) instead of dying on an indivisible mix
    # of --blocks and --blocks-per-step.
    N += (-N) % args.blocks_per_step
    x = (rng.standard_normal((B, S, N * T)) * 0.3).astype(np.float32)

    if args.pool:
        # The serving path end-to-end on the device under a ragged pause
        # schedule: lanes pause at different rounds, so the masked ring
        # write, the ring_all fast variant, AND the debt-roll re-alignment
        # all execute on the target backend. With --blocks-per-step M this
        # validates the multi-block throughput tier instead (paged line +
        # folded EQ + page-granular debt rolls).
        from airwave_tpu.graph.renderer import RendererState
        from airwave_tpu.runtime.stream_pool import PoolProfile, StreamPool

        M = args.blocks_per_step
        step_t = M * T

        def mk_renderer(h):
            return RendererState(
                conv_params=upols.make_conv_params(h, T, pad_to_pow2=False,
                                                   lookahead=M),
                speakers=("FL", "FR"),
                sample_rate=48_000.0, block_size=T, lookahead=M,
            )

        if G > 1:
            pool = StreamPool(
                B, 48_000.0, block_size=T, ring_blocks=max(N + 2, 4),
                blocks_per_step=M,
                profiles=[PoolProfile(mk_renderer(hrirs[g]), eq_defs[g])
                          for g in range(G)],
            )
            streams = [pool.attach(g) for g in range(G)
                       for _ in range(B // G)]
        else:
            pool = StreamPool(B, 48_000.0, mk_renderer(hrir),
                              eq_definition=eq_defs[0],
                              block_size=T, ring_blocks=max(N + 2, 4),
                              blocks_per_step=M)
            streams = [pool.attach() for _ in range(B)]
        # Let the activation unity->target ramp finish on silence so the
        # steady state matches the oracle's immediate-target application.
        ramp_rounds = -(-960 // step_t) + 1
        for _ in range(ramp_rounds):
            for s in streams:
                pool.push(s, np.zeros((S, step_t), np.float32))
            pool.pump()
        for s in streams:
            pool.pull(s, ramp_rounds * step_t)
        fed = [0] * B
        n_chunks = N // M
        for rnd in range(4 * n_chunks):
            if all(f >= n_chunks for f in fed):
                break
            for j, s in enumerate(streams):
                # Ragged: lane j pauses on rounds where (rnd % (j+2)) == 0.
                if fed[j] < n_chunks and (j == 0 or rnd % (j + 2) != 0):
                    pool.push(
                        s, x[j, :, fed[j] * step_t:(fed[j] + 1) * step_t]
                    )
                    fed[j] += 1
            pool.pump()
        outs = None
        got = np.stack([pool.pull(s, N * T) for s in streams])
    elif args.blocks_per_step > 1:
        from airwave_tpu.models.binaural import chain_step_multi_fn

        M = args.blocks_per_step
        conv_params = upols.make_conv_params(hrir, T, pad_to_pow2=False,
                                             lookahead=M)
        state = ChainState(
            conv=upols.make_conv_state_paged(
                B, S, conv_params.partition_count, T, M
            ),
            eq=eq_block.make_eq_state(B),
        )
        import functools

        step = jax.jit(functools.partial(
            chain_step_multi_fn, transition_length=960,
            eq_enabled=True, eq_crossfading=False,
        ))
        outs = []
        for i in range(N // M):
            xm = x[:, :, i * M * T:(i + 1) * M * T].reshape(B, S, M, T)
            state, y = step(conv_params, eq_params, eq_params, state,
                            jnp.asarray(xm))
            y = np.asarray(y)  # [B, M, 2, T]
            outs.extend(y[:, m] for m in range(M))
    else:
        conv_params = upols.make_conv_params(hrir, T, pad_to_pow2=False)
        state = ChainState(
            conv=upols.make_conv_state(B, S, conv_params.partition_count, T),
            eq=eq_block.make_eq_state(B),
        )
        import functools

        step = jax.jit(functools.partial(
            chain_step_fn, transition_length=960, spatial_enabled=True,
            eq_enabled=True, eq_crossfading=False,
        ))
        outs = []
        for i in range(N):
            state, y = step(conv_params, eq_params, eq_params, state,
                            jnp.asarray(x[:, :, i * T:(i + 1) * T]))
            outs.append(np.asarray(y))
    if outs is not None:
        got = np.concatenate(outs, axis=-1)

    worst = 0.0
    for b in range(B):
        g = b // (B // G)  # lane's profile group (contiguous segments)
        ref = np.zeros((2, N * T))
        for s in range(S):
            for e in range(2):
                oracle = UPOLSOracle(hrirs[g][s, e], T)
                ref[e] += np.concatenate(
                    [oracle.process(x[b, s, i * T:(i + 1) * T])
                     for i in range(N)]
                )
        g_preamp, g_coeffs = designs[g]
        eq_oracle = EqCascadeOracle(g_coeffs, g_preamp, 48_000.0)
        rl, rr = eq_oracle.process(ref[0].astype(np.float32),
                                   ref[1].astype(np.float32))
        ref = np.stack([rl, rr])
        err = float(np.sqrt(np.mean((got[b] - ref) ** 2))
                    / np.sqrt(np.mean(ref ** 2)))
        worst = max(worst, err)

    import jax as _jax

    result = {
        "metric": "chain rel RMS vs float64 oracle",
        "value": worst,
        "target": args.contract,
        "pass": worst <= args.contract,
        "matmul_precision": os.environ.get(
            "AIRWAVE_MATMUL_PRECISION", "highest").lower(),
        "backend": _jax.default_backend(),
        "device": str(_jax.devices()[0]),
        "pool": bool(args.pool),
        "pool_groups": args.pool_groups,
        "blocks_per_step": args.blocks_per_step,
        "batch": B,
        "blocks": N,
    }
    if hrir_seconds is not None:
        result["hrir_seconds_per_group"] = hrir_seconds
    print(json.dumps(result))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
