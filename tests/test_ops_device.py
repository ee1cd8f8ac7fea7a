"""Device-op tests: JAX UPOLS conv + block state-space EQ vs the f64 oracles.

Ports the reference's golden DSP tests (ConvolutionEngineTests.swift,
ParametricEqualizerProcessorTests.swift crossfade fixtures) to the batched
TPU-first ops.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airwave_tpu.io.apo import EqualizerDefinition, EqualizerFilter, FilterType
from airwave_tpu.ops import biquad_design as bd
from airwave_tpu.ops import eq_block, upols
from airwave_tpu.oracle.eq_oracle import EqCascadeOracle
from airwave_tpu.oracle.upols_oracle import UPOLSOracle


def make_filter(ftype, frequency, gain, q, enabled=True):
    return EqualizerFilter(1, None, enabled, ftype, frequency, gain, q)


# --- UPOLS ---------------------------------------------------------------


def test_impulse_preserves_sample_order_block8():
    """Ref ConvolutionEngineTests.swift:12-20 (blockSize 8, identity HRIR)."""
    hrir = np.zeros((1, 1, 8), np.float32)
    hrir[0, 0, 0] = 1.0
    params = upols.make_conv_params(hrir, block_size=8)
    state = upols.make_conv_state(1, 1, params.partition_count, 8)
    x = np.array([[[0.25, -0.5, 1, 0.75, -1, 0.125, 0.5, -0.25]]], np.float32)
    _, y = upols.conv_step(params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y)[0, 0], x[0, 0], atol=1e-4)


def test_reset_clears_overlap_and_frequency_history():
    """Ref ConvolutionEngineTests.swift:22-34."""
    hrir = np.zeros((1, 1, 8), np.float32)
    hrir[0, 0, 0] = 1.0
    params = upols.make_conv_params(hrir, block_size=8)
    state = upols.make_conv_state(1, 1, params.partition_count, 8)
    x = np.zeros((1, 1, 8), np.float32)
    x[0, 0, 7] = 1.0
    state, _ = upols.conv_step(params, state, jnp.asarray(x))
    state = upols.conv_reset(state)
    _, y = upols.conv_step(params, state, jnp.zeros((1, 1, 8), jnp.float32))
    assert np.max(np.abs(np.asarray(y))) < 1e-4


def test_determinism_after_reset():
    hrir = np.linspace(1, 0, 20, dtype=np.float32).reshape(1, 1, 20)
    params = upols.make_conv_params(hrir, block_size=8)
    state0 = upols.make_conv_state(1, 1, params.partition_count, 8)
    x = jnp.asarray(
        np.arange(-0.75, 0.80, 0.2, dtype=np.float32)[:8].reshape(1, 1, 8)
    )
    s1, first = upols.conv_step(params, state0, x)
    s1 = upols.conv_reset(s1)
    _, second = upols.conv_step(params, s1, x)
    np.testing.assert_allclose(np.asarray(first), np.asarray(second), atol=1e-4)


def test_batched_multiblock_matches_oracle_through_partition_wrap():
    """Long HRIR, many blocks (> P2 so the circular FDL wraps), B=3 streams,
    S=2 speakers, both ears, vs the single-stream f64 oracle."""
    rng = np.random.default_rng(7)
    T = 64
    L = 300  # ceil(300/64) = 5 real partitions -> pow2 bucket 8 -> bank 9
    B, S, E = 3, 2, 2
    hrir = rng.standard_normal((S, E, L)).astype(np.float32) * 0.3
    params = upols.make_conv_params(hrir, block_size=T)
    assert params.partition_count == 9
    state = upols.make_conv_state(B, S, params.partition_count, T)

    n_blocks = 20  # > P2: exercises wraparound
    x = rng.standard_normal((B, S, n_blocks * T)).astype(np.float32)

    step = jax.jit(upols.conv_step)
    outs = []
    for i in range(n_blocks):
        state, y = step(params, state, jnp.asarray(x[:, :, i * T:(i + 1) * T]))
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=-1)  # [B, E, n*T]

    for b in range(B):
        for e in range(E):
            ref = np.zeros(n_blocks * T)
            for s in range(S):
                oracle = UPOLSOracle(hrir[s, e], block_size=T)
                blocks = [
                    oracle.process(x[b, s, i * T:(i + 1) * T])
                    for i in range(n_blocks)
                ]
                ref += np.concatenate(blocks)
            scale = max(np.sqrt(np.mean(ref**2)), 1e-9)
            err = np.sqrt(np.mean((got[b, e] - ref) ** 2)) / scale
            assert err < 1e-5, (b, e, err)


def test_per_stream_reset_mask():
    hrir = np.zeros((1, 1, 8), np.float32)
    hrir[0, 0, 0] = 1.0
    params = upols.make_conv_params(hrir, block_size=8)
    state = upols.make_conv_state(2, 1, params.partition_count, 8)
    x = np.ones((2, 1, 8), np.float32)
    state, _ = upols.conv_step(params, state, jnp.asarray(x))
    state = upols.conv_reset(state, stream_mask=jnp.array([True, False]))
    fdl = np.asarray(state.fdl)  # [Kp, S, P2, 2, B] — batch minor
    assert np.all(fdl[..., 0] == 0)
    assert np.any(fdl[..., 1] != 0)
    # A reset lane renders silence from then on; the kept lane does not.
    state, y = upols.conv_step(params, state,
                               jnp.zeros((2, 1, 8), jnp.float32))
    y = np.asarray(y)
    assert np.all(y[0] == 0)
    assert np.any(y[1] != 0)


# --- EQ block state-space -------------------------------------------------


def _eq_params_for(definition, sample_rate, T, state_dim=128):
    preamp, coeffs = bd.design_cascade(definition, sample_rate)
    return eq_block.make_eq_params(coeffs, preamp, T, state_dim), (preamp, coeffs)


def test_eq_steady_state_matches_oracle():
    rng = np.random.default_rng(3)
    T = 512
    definition = EqualizerDefinition(
        preamp_db=-2.56,
        filters=(
            make_filter(FilterType.LOW_SHELF, 105.0, -2.8, 0.70),
            make_filter(FilterType.PEAKING, 894.2, 2.0, 1.24),
            make_filter(FilterType.PEAKING, 6165.4, 2.3, 5.37),
            make_filter(FilterType.HIGH_SHELF, 10_000.0, -5.2, 0.70),
        ),
    )
    params, (preamp, coeffs) = _eq_params_for(definition, 48_000, T)
    B = 2
    state = eq_block.make_eq_state(B)
    x = rng.standard_normal((B, 2, 8 * T)).astype(np.float32) * 0.5

    step = jax.jit(eq_block.eq_step, static_argnames="transition_length")
    outs = []
    for i in range(8):
        state, y = step(params, params, state, jnp.asarray(x[:, :, i * T:(i + 1) * T]), 960)
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=-1)

    for b in range(B):
        oracle = EqCascadeOracle(coeffs, preamp, 48_000)
        ref_l, ref_r = oracle.process(x[b, 0], x[b, 1])
        ref = np.stack([ref_l, ref_r])
        err = np.sqrt(np.mean((got[b] - ref) ** 2)) / np.sqrt(np.mean(ref**2))
        assert err < 1e-5, (b, err)


def test_crossfade_exact_twenty_ms_ramp():
    """Ref ParametricEqualizerProcessorTests.swift:211-227 at block granularity:
    unity -> +6 dB preamp, L = 960 @ 48 kHz; first sample = 1 + (g-1)/960,
    sample 959 onward = g."""
    T = 512
    L = 960
    gain = 10.0 ** (6.0 / 20.0)
    unity = eq_block.unity_eq_params(T)
    target, _ = _eq_params_for(EqualizerDefinition(preamp_db=6.0), 48_000, T)

    state = eq_block.make_eq_state(1)
    state = eq_block.eq_begin_transition(state)
    x = jnp.ones((1, 2, T), jnp.float32)
    state, y1 = eq_block.eq_step(unity, target, state, x, L)
    state, y2 = eq_block.eq_step(unity, target, state, x, L)
    y = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)[0, 0]

    assert abs(y[0] - (1 + (gain - 1) / L)) < 1e-5
    assert abs(y[479] - (1 + (gain - 1) * 480 / L)) < 1e-5
    assert abs(y[959] - gain) < 1e-5
    assert abs(y[1023] - gain) < 1e-5
    assert np.all(np.isfinite(y))


def test_transition_back_to_unity_uses_same_ramp():
    """Ref ParametricEqualizerProcessorTests.swift:229-241."""
    T = 512
    L = 960
    gain = 10.0 ** (6.0 / 20.0)
    unity = eq_block.unity_eq_params(T)
    target, _ = _eq_params_for(EqualizerDefinition(preamp_db=6.0), 48_000, T)

    state = eq_block.make_eq_state(1)
    state = eq_block.eq_begin_transition(state)
    x = jnp.ones((1, 2, T), jnp.float32)
    for _ in range(2):
        state, _ = eq_block.eq_step(unity, target, state, x, L)
    # Retarget to unity: from <- target, to <- unity.
    state = eq_block.eq_begin_transition(state)
    state, y1 = eq_block.eq_step(target, unity, state, x, L)
    state, y2 = eq_block.eq_step(target, unity, state, x, L)
    y = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)[0, 0]
    # 2e-5 pointwise: the MXU matmul-DFT carries ~sqrt(N)*eps ~ 6e-6 relative
    # per transform (the 1e-5 chain contract is RMS and holds with margin).
    assert abs(y[0] - (gain - (gain - 1) / L)) < 2e-5
    assert abs(y[1023] - 1.0) < 2e-5


def test_per_stream_transitions_independent():
    T = 512
    L = 960
    gain = 10.0 ** (6.0 / 20.0)
    unity = eq_block.unity_eq_params(T)
    target, _ = _eq_params_for(EqualizerDefinition(preamp_db=6.0), 48_000, T)
    state = eq_block.make_eq_state(2)
    # Only stream 0 transitions; stream 1 stays on 'to' (counter idle).
    state = eq_block.eq_begin_transition(state, stream_mask=jnp.array([True, False]))
    x = jnp.ones((2, 2, T), jnp.float32)
    _, y = eq_block.eq_step(unity, target, state, x, L)
    y = np.asarray(y)
    # 2e-5 pointwise: matmul-DFT rounding (see above).
    assert abs(y[0, 0, 0] - (1 + (gain - 1) / L)) < 2e-5   # ramping
    assert abs(y[1, 0, 0] - gain) < 2e-5                   # already at target


def test_eq_reset_clears_histories():
    T = 512
    definition = EqualizerDefinition(
        filters=(make_filter(FilterType.PEAKING, 1_000, 6, 0.707),)
    )
    params, _ = _eq_params_for(definition, 48_000, T)
    state = eq_block.make_eq_state(1)
    x = jnp.ones((1, 2, T), jnp.float32)
    state, _ = eq_block.eq_step(params, params, state, x, 960)
    assert np.any(np.asarray(state.s_to) != 0)
    state = eq_block.eq_reset(state)
    _, y = eq_block.eq_step(params, params, state, jnp.zeros((1, 2, T)), 960)
    np.testing.assert_array_equal(np.asarray(y), 0)


def test_cca_cra_reference_curve_within_003db():
    """Ref ParametricEqualizerProcessorTests.swift:359-394 — the ±0.03 dB
    10-filter fixture curve, run through the device EQ in float32."""
    from tests.test_apo_parser import CCA_CRA
    from airwave_tpu.io import apo

    definition = apo.parse(CCA_CRA.encode(), "CCA CRA ParametricEq.txt")
    T = 512
    params, _ = _eq_params_for(definition, 48_000, T)
    sample_rate = 48_000.0
    frames = 48_128  # 94 blocks of 512
    discard = 24_064
    step = jax.jit(eq_block.eq_step, static_argnames="transition_length")

    for freq, expected_db in [(20.0, -5.3379478445), (1_000.0, -0.9694887656),
                              (10_000.0, -4.2646888095)]:
        n = np.arange(frames)
        x = np.sin(2 * np.pi * freq * n / sample_rate).astype(np.float32)
        xb = jnp.asarray(np.tile(x[None, None, :], (1, 2, 1)))
        state = eq_block.make_eq_state(1)
        outs = []
        for i in range(frames // T):
            state, y = step(params, params, state, xb[:, :, i * T:(i + 1) * T], 960)
            outs.append(np.asarray(y)[0, 0])
        out = np.concatenate(outs)
        in_rms = np.sqrt(np.mean(x[discard:].astype(np.float64) ** 2))
        out_rms = np.sqrt(np.mean(out[discard:].astype(np.float64) ** 2))
        measured = 20 * np.log10(out_rms / in_rms)
        assert np.all(np.isfinite(out))
        assert abs(measured - expected_db) < 0.03, (freq, measured, expected_db)


# --- M-block lookahead (paged delay line) --------------------------------


def test_conv_step_paged_matches_sequential_steps():
    """conv_step_paged renders M blocks per delay-line read with outputs
    equal (to f32 reassociation) to M sequential conv_step calls, across
    page-boundary wraps and partition counts that need tail padding."""
    rng = np.random.default_rng(0)
    B, S, T = 3, 2, 64
    for M, L in ((4, 5 * 64 + 13), (8, 5 * 64 + 13), (2, 3)):
        hrir = (rng.standard_normal((S, 2, L)) * 0.3).astype(np.float32)
        p1 = upols.make_conv_params(hrir, T, pad_to_pow2=False)
        pm = upols.make_conv_params(hrir, T, pad_to_pow2=False, lookahead=M)
        assert pm.partition_count % M == 0
        assert pm.partition_count >= p1.partition_count + M - 1
        s1 = upols.make_conv_state(B, S, p1.partition_count, T)
        sp = upols.make_conv_state_paged(B, S, pm.partition_count, T, M)
        singles, paged = [], []
        for _ in range(2 * (pm.partition_count // M) + 3):
            xs = (rng.standard_normal((M, B, S, T)) * 0.5).astype(np.float32)
            for m in range(M):
                s1, y = upols.conv_step(p1, s1, jnp.asarray(xs[m]))
                singles.append(np.asarray(y))
            sp, ym = upols.conv_step_paged(
                pm, sp, jnp.asarray(np.transpose(xs, (1, 2, 0, 3)))
            )
            ym = np.asarray(ym)
            paged.extend(ym[:, m] for m in range(M))
        a = np.concatenate(singles, -1)
        b = np.concatenate(paged, -1)
        err = np.sqrt(np.mean((a - b) ** 2)) / np.sqrt(np.mean(a**2))
        assert err < 1e-6, (M, L, err)


def test_chain_step_multi_matches_sequential_chain():
    """Full multi-block chain (conv + stateful EQ) == M sequential chain
    steps, block for block."""
    from airwave_tpu.models.binaural import (
        ChainState, chain_step_fn, chain_step_multi_fn,
    )

    rng = np.random.default_rng(1)
    B, S, T, M = 2, 2, 64, 4
    hrir = (rng.standard_normal((S, 2, 200)) * 0.3).astype(np.float32)
    p1 = upols.make_conv_params(hrir, T, pad_to_pow2=False)
    pm = upols.make_conv_params(hrir, T, pad_to_pow2=False, lookahead=M)
    preamp, coeffs = bd.design_cascade(
        EqualizerDefinition(
            -3.0, (make_filter(FilterType.PEAKING, 1000.0, 4.0, 1.1),)
        ),
        48_000.0,
    )
    eq_params = eq_block.make_eq_params(coeffs, preamp, T)

    s1 = ChainState(
        conv=upols.make_conv_state(B, S, p1.partition_count, T),
        eq=eq_block.make_eq_state(B),
    )
    sm = ChainState(
        conv=upols.make_conv_state_paged(B, S, pm.partition_count, T, M),
        eq=eq_block.make_eq_state(B),
    )
    singles, multi = [], []
    for _ in range(5):
        xs = (rng.standard_normal((M, B, S, T)) * 0.4).astype(np.float32)
        for m in range(M):
            s1, y = chain_step_fn(
                p1, eq_params, eq_params, s1, jnp.asarray(xs[m]),
                transition_length=960, spatial_enabled=True,
                eq_enabled=True, eq_crossfading=False,
            )
            singles.append(np.asarray(y))
        sm, ym = chain_step_multi_fn(
            pm, eq_params, eq_params, sm,
            jnp.asarray(np.transpose(xs, (1, 2, 0, 3))),
            transition_length=960, eq_enabled=True, eq_crossfading=False,
        )
        ym = np.asarray(ym)
        multi.extend(ym[:, m] for m in range(M))
    a = np.concatenate(singles, -1)
    b = np.concatenate(multi, -1)
    err = np.sqrt(np.mean((a - b) ** 2)) / np.sqrt(np.mean(a**2))
    assert err < 1e-6, err


def test_chain_step_multi_crossfading_matches_sequential_chain():
    """The multi path's crossfading branch (the per-block dual-cascade
    loop — the EQ fold only applies in steady state) matches M sequential
    chain steps mid-ramp, including the exact per-sample ramp positions
    across step boundaries."""
    from airwave_tpu.models.binaural import (
        ChainState, chain_step_fn, chain_step_multi_fn,
    )

    rng = np.random.default_rng(5)
    B, S, T, M = 2, 2, 64, 4
    hrir = (rng.standard_normal((S, 2, 150)) * 0.3).astype(np.float32)
    p1 = upols.make_conv_params(hrir, T, pad_to_pow2=False)
    pm = upols.make_conv_params(hrir, T, pad_to_pow2=False, lookahead=M)
    _, coeffs_a = bd.design_cascade(
        EqualizerDefinition(
            -3.0, (make_filter(FilterType.PEAKING, 1000.0, 4.0, 1.1),)
        ),
        48_000.0,
    )
    _, coeffs_b = bd.design_cascade(
        EqualizerDefinition(
            2.0, (make_filter(FilterType.HIGH_SHELF, 4000.0, -6.0, 0.8),)
        ),
        48_000.0,
    )
    eq_a = eq_block.make_eq_params(coeffs_a, 10 ** (-3.0 / 20.0), T)
    eq_b = eq_block.make_eq_params(coeffs_b, 10 ** (2.0 / 20.0), T)

    # Mid-ramp carries: counter starts at 0 (retarget just published).
    s1 = ChainState(
        conv=upols.make_conv_state(B, S, p1.partition_count, T),
        eq=eq_block.make_eq_state(B)._replace(
            counter=jnp.zeros((B,), jnp.int32)
        ),
    )
    sm = ChainState(
        conv=upols.make_conv_state_paged(B, S, pm.partition_count, T, M),
        eq=eq_block.make_eq_state(B)._replace(
            counter=jnp.zeros((B,), jnp.int32)
        ),
    )
    length = 3 * T  # ramp spans the first step and ends inside the second
    singles, multi = [], []
    for _ in range(3):
        xs = (rng.standard_normal((M, B, S, T)) * 0.4).astype(np.float32)
        for m in range(M):
            s1, y = chain_step_fn(
                p1, eq_a, eq_b, s1, jnp.asarray(xs[m]),
                transition_length=length, spatial_enabled=True,
                eq_enabled=True, eq_crossfading=True,
            )
            singles.append(np.asarray(y))
        sm, ym = chain_step_multi_fn(
            pm, eq_a, eq_b, sm, jnp.asarray(np.transpose(xs, (1, 2, 0, 3))),
            transition_length=length, eq_enabled=True, eq_crossfading=True,
        )
        ym = np.asarray(ym)
        multi.extend(ym[:, m] for m in range(M))
    a = np.concatenate(singles, -1)
    b = np.concatenate(multi, -1)
    err = np.sqrt(np.mean((a - b) ** 2)) / np.sqrt(np.mean(a**2))
    assert err < 1e-6, err


# --- denormal / subnormal flush parity ------------------------------------


def test_denormal_flush_behavior_device_vs_oracle():
    """VERDICT #8: pin the f32 device EQ's behavior on denormal-range
    signals against the f64 oracle's reference-exact 1e-30 flush
    (ref ParametricEqualizerProcessor.swift:94-97).

    The oracle flushes filter state below 1e-30 to exact zero — observable
    as the ring-out going EXACTLY silent. The f32 device path keeps ringing
    at sub-1e-30 magnitudes (f32 stays normal down to ~1e-38; TPU hardware
    flushes at f32-subnormal scale instead). The divergence is therefore
    nonzero but bounded at the flush threshold scale — inaudible by ~250
    dB — which is the documented contract (docs/parity.md)."""
    from airwave_tpu.oracle.eq_oracle import EqCascadeOracle

    preamp, coeffs = bd.design_cascade(
        EqualizerDefinition(
            0.0, (make_filter(FilterType.PEAKING, 2000.0, 8.0, 4.0),)
        ),
        48_000.0,
    )
    n = 2048
    x = np.zeros(n, np.float32)
    x[0] = 1e-26  # ring-out crosses the 1e-30 flush within the window

    oracle = EqCascadeOracle(coeffs, preamp, 48_000.0)
    ol, _ = oracle.process_exact(x, x)

    params = eq_block.make_eq_params(coeffs, preamp, n)
    state = eq_block.make_eq_state(1, 2, 128)
    xb = jnp.asarray(np.stack([x, x])[None])
    _, y = eq_block.eq_step(params, params, state, xb, 960,
                            crossfade_active=False)
    dev = np.asarray(y)[0, 0]

    # 1) The oracle's flush is observable: its ring-out ends in EXACT zeros.
    assert ol[0] != 0.0                      # the impulse itself passes
    tail = ol[n // 2:]
    assert np.all(tail == 0.0), "oracle flush must silence the ring-out"
    first_zero = int(np.argmax(ol == 0.0))
    assert 0 < first_zero < n // 2

    # 2) The device path diverges only below the flush scale.
    diff = np.abs(dev.astype(np.float64) - ol.astype(np.float64))
    assert float(diff.max()) < 1e-28, float(diff.max())
    # Where the oracle is exactly zero, the device may still carry
    # sub-flush energy — but nothing above the flush threshold's order.
    assert float(np.abs(dev[n // 2:]).max()) < 1e-29

    # 3) At audible levels the two paths agree to the chain contract.
    loud = (np.random.default_rng(0).standard_normal(n) * 0.3).astype(np.float32)
    oracle2 = EqCascadeOracle(coeffs, preamp, 48_000.0)
    rl, _ = oracle2.process_exact(loud, loud)
    state2 = eq_block.make_eq_state(1, 2, 128)
    _, y2 = eq_block.eq_step(params, params, state2,
                             jnp.asarray(np.stack([loud, loud])[None]),
                             960, crossfade_active=False)
    dl = np.asarray(y2)[0, 0]
    rel = np.sqrt(np.mean((dl - rl) ** 2)) / np.sqrt(np.mean(rl ** 2))
    assert rel < 1e-5, rel
