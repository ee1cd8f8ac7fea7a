"""Memory planner + paged-MAC variant parity (incl. the env-flag lowerings)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from airwave_tpu.ops import upols
from airwave_tpu.utils import memory_planner as mp


def test_paged_partitions_matches_conv_params_shapes():
    rng = np.random.default_rng(0)
    for taps, block, m in ((4320, 512, 8), (48_000, 512, 8), (700, 64, 4),
                           (100, 64, 2)):
        hrir = rng.standard_normal((2, 2, taps)).astype(np.float32) * 0.1
        params = upols.make_conv_params(hrir, block, pad_to_pow2=False,
                                        lookahead=m)
        assert params.partition_count == mp.paged_partitions(taps, block, m)


def test_estimates_scale_and_chunking_bounds_live_terms():
    base = mp.estimate_paged_bake(8192, 2, 48_000, 512, 8)
    bigger_batch = mp.estimate_paged_bake(16_384, 2, 48_000, 512, 8)
    assert bigger_batch.total_bytes > 1.9 * base.total_bytes
    chunked = mp.estimate_paged_bake(8192, 2, 48_000, 512, 8, acc_chunk=2)
    assert chunked.live_term_bytes < base.live_term_bytes
    assert chunked.fdl_bytes == base.fdl_bytes
    # Config-5 at B=16384 is known to exceed a 16 GB chip unchunked.
    c5 = mp.estimate_paged_bake(16_384, 2, 48_000, 512, 8)
    assert c5.total_bytes > 16e9


def test_plan_ladder_ordering_and_pruning():
    # Generous HBM: full-speed first, ladder intact behind it.
    plan = mp.plan_paged_bake(8192, 2, 4320, 512, 8, hbm_bytes=1e12)
    assert plan[0] == mp.PlanAttempt(8, 0, "full speed")
    # Tight HBM: hopeless attempts pruned; batch-split rungs survive so
    # the workload always completes. The HALF-BATCH split must come
    # BEFORE any reduced-lookahead rung: measured at config-5 B=16384,
    # the split rung runs 20,255x while M=2/chunk=1 runs 2,772x.
    plan = mp.plan_paged_bake(16_384, 2, 48_000, 512, 8, hbm_bytes=16e9)
    assert plan, "ladder must never be empty"
    split_idx = min(i for i, a in enumerate(plan) if a.batch_split == 2)
    reduced = [i for i, a in enumerate(plan) if a.lookahead < 8]
    assert not reduced or split_idx < min(reduced), plan
    assert plan[-1].batch_split == 4  # terminal: quarter-batch
    assert all(a.lookahead <= 8 for a in plan)
    # No HBM estimate: the full ladder comes back for runtime-OOM walking.
    full = mp.plan_paged_bake(16_384, 2, 48_000, 512, 8)
    assert full[0].acc_chunk == 0
    assert any(a.acc_chunk == 1 for a in full)
    assert full[2].batch_split == 2
    assert full[-1].batch_split == 4


def test_acc_chunk_parameter_matches_unchunked():
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    T, B, S, M = 64, 3, 2, 4
    hrir = rng.standard_normal((S, 2, 700)).astype(np.float32) * 0.2
    params = upols.make_conv_params(hrir, T, pad_to_pow2=False, lookahead=M)
    s0 = upols.make_conv_state_paged(B, S, params.partition_count, T, M)
    s1 = upols.make_conv_state_paged(B, S, params.partition_count, T, M)
    for _ in range(4):
        x = jnp.asarray(rng.standard_normal((B, S, M, T)).astype(np.float32))
        s0, y0 = upols.conv_step_paged(params, s0, x, acc_chunk=0)
        s1, y1 = upols.conv_step_paged(params, s1, x, acc_chunk=2)
        a, b = np.asarray(y0), np.asarray(y1)
        rel = np.sqrt(np.mean((a - b) ** 2)) / np.sqrt(np.mean(b**2))
        assert rel < 1e-6, rel


_FLAG_PROBE = r"""
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from airwave_tpu.ops import upols
rng = np.random.default_rng(5)
T, B, S, M = 64, 3, 2, 4
hrir = rng.standard_normal((S, 2, 700)).astype(np.float32) * 0.2
params = upols.make_conv_params(hrir, T, pad_to_pow2=False, lookahead=M)
state = upols.make_conv_state_paged(B, S, params.partition_count, T, M)
outs = []
for _ in range(4):
    x = jnp.asarray(rng.standard_normal((B, S, M, T)).astype(np.float32))
    state, y = upols.conv_step_paged(params, state, x)
    outs.append(np.asarray(y))
np.save(OUT_PATH, np.stack(outs))
"""


@pytest.mark.parametrize("env", [
    {},
    {"AIRWAVE_PAGED_LAYOUT": "kcsmb"},
    {"AIRWAVE_PAGED_MAC_GROUPING": "1"},
    {"AIRWAVE_PAGED_ACC_CHUNK": "2"},
    {"AIRWAVE_PAGED_MAC_CONCAT": "1"},
    {"AIRWAVE_PAGED_MAC_CONCAT": "1", "AIRWAVE_PAGED_LAYOUT": "kcsmb"},
])
@pytest.mark.heavy
def test_env_flag_paged_variants_match_default(tmp_path, env):
    """The opt-in paged-MAC lowerings (kept for re-measurement) are
    module-level env flags, so their parity needs subprocess runs — this
    pins them against bit-rot (ADVICE round 2)."""
    out = tmp_path / ("out-" + ("-".join(env) or "default") + ".npy")
    code = f"OUT_PATH = {str(out)!r}\n" + _FLAG_PROBE
    run_env = dict(os.environ)
    run_env.pop("AIRWAVE_PAGED_LAYOUT", None)
    run_env.pop("AIRWAVE_PAGED_MAC_GROUPING", None)
    run_env.pop("AIRWAVE_PAGED_ACC_CHUNK", None)
    run_env.pop("AIRWAVE_PAGED_MAC_CONCAT", None)
    run_env.update(env)
    run_env["JAX_PLATFORMS"] = "cpu"
    subprocess.run([sys.executable, "-c", code], env=run_env, check=True,
                   cwd="/root/repo", timeout=300)
    got = np.load(out)
    baseline_path = tmp_path / "baseline.npy"
    if not baseline_path.exists():
        if env:  # compute the baseline once per test run
            base_code = f"OUT_PATH = {str(baseline_path)!r}\n" + _FLAG_PROBE
            base_env = dict(run_env)
            for k in env:
                base_env.pop(k, None)
            subprocess.run([sys.executable, "-c", base_code], env=base_env,
                           check=True, cwd="/root/repo", timeout=300)
        else:
            np.save(baseline_path, got)
    base = np.load(baseline_path)
    # Summation-order ulps land on near-zero samples; the contract metric
    # is relative RMS (same as the chain accuracy gate).
    rel = np.sqrt(np.mean((got - base) ** 2)) / np.sqrt(np.mean(base**2))
    assert rel < 1e-6, rel


def test_plan_keeps_full_ladder_when_nothing_is_predicted_to_fit():
    """When NO attempt passes the coarse pre-flight estimate, nothing is
    pruned: the runtime OOM stays the authoritative judge (the estimator
    doesn't model max_unroll, and skipping straight to the half-batch rung
    would silently halve throughput on a shape that actually fits)."""
    tiny_budget = mp.plan_paged_bake(16_384, 2, 48_000, 512, 8,
                                     hbm_bytes=1e9)
    full = mp.plan_paged_bake(16_384, 2, 48_000, 512, 8)
    assert tiny_budget == full


def test_pool_capacity_planner_sizes_and_granularity():
    from airwave_tpu.utils.memory_planner import (estimate_pool_lane_bytes,
                                                  pool_capacity)

    # Headline serving shape: the documented ~150 KB/stream at 9
    # partitions (README/serving guide) within the planner's 2x contract.
    lane = estimate_pool_lane_bytes(2, 4320, 512)
    assert 75_000 < lane < 300_000, lane

    plan = pool_capacity(2, 4320, 512, hbm_bytes=16 * 2**30)
    # 9 real partitions + the half-window bank's +1 coefficient: the FDL
    # the renderer actually carries (ops/upols._half_window_bank).
    assert plan["partitions"] == 10
    assert plan["max_streams"] > 8192  # a 16 GB chip fits the bench shape

    # Grouped + meshed: max_streams rounds to groups * mesh multiples and
    # the budget scales with the mesh.
    g = pool_capacity(2, 4320, 512, groups=3, mesh_devices=4,
                      hbm_bytes=16 * 2**30)
    assert g["granularity"] == 12
    assert g["max_streams"] % 12 == 0
    assert g["max_streams"] > plan["max_streams"]  # 4 devices > 1

    # The paged tier's lane cost dominates via the longer line + Ykm terms.
    long_ir = pool_capacity(2, 48_000, 512, lookahead=8,
                            hbm_bytes=16 * 2**30)
    assert long_ir["per_lane_bytes"] > 4 * lane
    assert 0 < long_ir["max_streams"] < plan["max_streams"]

    # A hopeless budget reports zero rather than a negative count.
    tiny = pool_capacity(2, 4320, 512, hbm_bytes=1 * 2**20)
    assert tiny["max_streams"] == 0

    # Heterogeneous groups: per-group bank lengths; a short tenant pays
    # only its own partitions, so capacity beats the all-long plan.
    het = pool_capacity(2, [4320, 1488], 512, groups=2,
                        hbm_bytes=16 * 2**30)
    assert het["partitions"] == [10, 4]
    assert het["per_group_lane_bytes"][1] < het["per_group_lane_bytes"][0]
    same = pool_capacity(2, 4320, 512, groups=2, hbm_bytes=16 * 2**30)
    assert het["max_streams"] > same["max_streams"]
    with pytest.raises(ValueError, match="entries"):
        pool_capacity(2, [4320, 1488, 99], 512, groups=2)


def test_pool_capacity_partitions_match_the_real_bank():
    """The planner's partition count IS the renderer's: pool_capacity must
    track make_conv_params' half-window bank (exact mode, the renderer
    default) so per-lane HBM sizing never undercounts the carried FDL."""
    from airwave_tpu.ops.upols import make_conv_params
    from airwave_tpu.utils.memory_planner import (paged_partitions,
                                                  pool_capacity)

    for taps in (300, 1488, 4320, 48_000):
        hrir = np.zeros((2, 2, taps), np.float32)
        real = make_conv_params(hrir, 512, pad_to_pow2=False).partition_count
        plan = pool_capacity(2, taps, 512, hbm_bytes=16 * 2**30)
        assert plan["partitions"] == real, (taps, plan["partitions"], real)

    for taps, m in ((4320, 4), (48_000, 8)):
        hrir = np.zeros((2, 2, taps), np.float32)
        real = make_conv_params(hrir, 512, pad_to_pow2=False,
                                lookahead=m).partition_count
        assert paged_partitions(taps, 512, m) == real, (taps, m)


def test_xla_calibrated_pool_capacity_tiny():
    """XLA buffer-assignment calibration (VERDICT r4 #3): on a tiny CPU
    pool, xla_pool_round_memory's per-lane cost must cover the exact
    carry, size every requested round, and flow through
    pool_capacity(calibration=) into a tighter (allocator-true)
    recommendation. Validation against kernel-RSS ground truth lives in
    scripts/measure_pool_hbm.py (measured 1.02x at M=1, 0.99x at M=8)."""
    import jax

    from airwave_tpu.assets import channel_maps as cm
    from airwave_tpu.graph.renderer import prepare_renderer
    from airwave_tpu.io.apo import EqualizerDefinition
    from airwave_tpu.io.wav import WAVData
    from airwave_tpu.runtime.stream_pool import StreamPool
    from airwave_tpu.utils.memory_planner import (pool_capacity,
                                                  xla_pool_round_memory)

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((14, 300)) * 0.05).astype(np.float32)
    renderer = prepare_renderer(WAVData(48_000.0, audio), cm.STEREO,
                                48_000.0, 64)
    pool = StreamPool(16, 48_000.0, renderer,
                      eq_definition=EqualizerDefinition(preamp_db=-3.0),
                      block_size=64)
    cal = xla_pool_round_memory(pool)
    assert set(cal["rounds"]) == {"steady", "eq_xfade", "hotswap"}
    carry = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                for a in jax.tree_util.tree_leaves(pool._state))
    assert cal["carry_bytes_exact"] == carry
    for r in cal["rounds"].values():
        # Per-lane covers the carried state plus a real working set.
        assert r["per_lane_bytes"] * 16 >= carry
        assert r["peak_bytes"] > r["fixed_bytes"] >= 0
    # The hot-swap round carries the dual-ear bank: strictly more fixed
    # bytes than steady state.
    assert (cal["rounds"]["hotswap"]["fixed_bytes"]
            > cal["rounds"]["steady"]["fixed_bytes"])

    plan = pool_capacity(2, 300, 64, hbm_bytes=1 * 2**30, calibration=cal)
    assert plan["calibrated"] is True
    assert plan["per_lane_bytes"] == cal["per_lane_bytes"]
    assert plan["max_streams"] > 0
    hand = pool_capacity(2, 300, 64, hbm_bytes=1 * 2**30)
    assert hand["calibrated"] is False
