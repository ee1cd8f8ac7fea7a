"""Glitch-free crossfaded HRIR hot-swap (VERDICT r4 item 1).

The delay line stores bank-independent input spectra (u_t = W1 @ b_t), so a
same-shape renderer swap can keep the FULL conv history — the mathematically
ideal time-varying filter — and blend old/new outputs per sample over one
crossfade window. The reference CANNOT do this: its engines couple input
history to the filter and rebuild per activation
(/root/reference/Airwave/HRIRManager.swift:406-415), truncating the reverb
tail on every preset swap.

Differential contract, checked here against a direct np.convolve oracle:
for every output sample t after the swap,

    y(t) = (1 - r(t)) * (h_old * x)(t) + r(t) * (h_new * x)(t)

with the convolutions over the FULL input history (no truncation, no
discontinuity) and r the per-sample ramp rising (i+1)/fade over the fade
window (the EQ ramp's convention, eq_block.eq_step).
"""

from __future__ import annotations

import numpy as np
import pytest

from airwave_tpu.graph.renderer import RendererState
from airwave_tpu.models.binaural import BinauralEngine
from airwave_tpu.ops import upols

BLOCK = 64
SR = 4800.0  # fade = 0.020 * 4800 = 96 samples -> two 64-sample segments


def _renderer(hrir: np.ndarray, block: int = BLOCK,
              lookahead: int = 1) -> RendererState:
    return RendererState(
        conv_params=upols.make_conv_params(
            hrir, block, pad_to_pow2=False, lookahead=lookahead
        ),
        speakers=tuple(f"S{i}" for i in range(hrir.shape[0])),
        sample_rate=SR,
        block_size=block,
        lookahead=lookahead,
    )


def _full_conv(x: np.ndarray, hrir: np.ndarray) -> np.ndarray:
    """Oracle: y[e, t] = sum_s (x_s * h[s, e])(t), f64, full history."""
    S, E = hrir.shape[0], hrir.shape[1]
    n = x.shape[-1]
    y = np.zeros((E, n))
    for s in range(S):
        for e in range(E):
            y[e] += np.convolve(
                x[s].astype(np.float64), hrir[s, e].astype(np.float64)
            )[:n]
    return y


def _ramp(n: int, start: int, fade: int) -> np.ndarray:
    """Global blend weight per sample: 0 before `start`, rising (i+1)/fade
    from there (the engine/EQ ramp convention), clipped at 1."""
    r = np.zeros(n)
    i = np.arange(n - start)
    r[start:] = np.minimum((i + 1) / fade, 1.0)
    return r


def _rel_rms(y: np.ndarray, ref: np.ndarray) -> float:
    return float(np.sqrt(np.mean((y - ref) ** 2))
                 / np.sqrt(np.mean(ref ** 2)))


def test_engine_crossfade_matches_time_varying_oracle():
    """Swap mid-signal: full-history blend, no truncated tail. The new
    HRIR is SHORTER than the old (pad_conv_params grows it onto the
    carry shape)."""
    rng = np.random.default_rng(11)
    h_old = rng.standard_normal((2, 2, 150)).astype(np.float32) * 0.3
    h_new = rng.standard_normal((2, 2, 100)).astype(np.float32) * 0.3

    eng = BinauralEngine(batch=1, sample_rate=SR, block_size=BLOCK,
                         renderer=_renderer(h_old))
    n_blocks, swap_at = 9, 3
    x = rng.standard_normal((1, 2, n_blocks * BLOCK)).astype(np.float32)

    out = []
    for b in range(n_blocks):
        if b == swap_at:
            assert eng.set_renderer(_renderer(h_new)) is True
        xb = x[:, :, b * BLOCK:(b + 1) * BLOCK]
        out.append(eng.process_block(xb))
    y = np.concatenate(out, axis=-1)[0]

    y_old = _full_conv(x[0], h_old)
    y_new = _full_conv(x[0], h_new)
    r = _ramp(n_blocks * BLOCK, swap_at * BLOCK, fade=96)
    ref = (1.0 - r) * y_old + r * y_new
    assert _rel_rms(y, ref) < 1e-5


def test_engine_same_length_swap_and_no_crossfade_reset():
    """crossfade=False keeps the reference's fresh-history semantics:
    post-swap output is the new bank over ONLY the post-swap input."""
    rng = np.random.default_rng(12)
    h_old = rng.standard_normal((2, 2, 150)).astype(np.float32) * 0.3
    h_new = rng.standard_normal((2, 2, 150)).astype(np.float32) * 0.3

    eng = BinauralEngine(batch=1, sample_rate=SR, block_size=BLOCK,
                         renderer=_renderer(h_old))
    n_blocks, swap_at = 8, 4
    x = rng.standard_normal((1, 2, n_blocks * BLOCK)).astype(np.float32)
    out = []
    for b in range(n_blocks):
        if b == swap_at:
            assert eng.set_renderer(_renderer(h_new),
                                    crossfade=False) is False
        out.append(eng.process_block(x[:, :, b * BLOCK:(b + 1) * BLOCK]))
    y = np.concatenate(out, axis=-1)[0]

    # Pre-swap: old bank, full history.
    ref_pre = _full_conv(x[0], h_old)[:, :swap_at * BLOCK]
    assert _rel_rms(y[:, :swap_at * BLOCK], ref_pre) < 1e-5
    # Post-swap: new bank over the truncated (post-swap) history only.
    x_post = x[0, :, swap_at * BLOCK:]
    ref_post = _full_conv(x_post, h_new)
    assert _rel_rms(y[:, swap_at * BLOCK:], ref_post) < 1e-5


def test_engine_second_swap_mid_fade_is_newest_wins_and_click_free():
    """A swap during an in-flight fade restarts the fade toward the newest
    bank FROM the blend the output currently hears: the interrupted
    fade's banks lerped at the boundary ramp position (banks are linear
    in the output, so the lerped bank reproduces the heard mix exactly).
    Restarting from the pure intermediate bank instead would step the
    output filter by (1-r)*(B-A) at the block boundary — an audible
    click. The oracle here is the full composed trajectory, so the
    transition region itself is checked, not just the settled tail."""
    rng = np.random.default_rng(13)
    banks = [rng.standard_normal((2, 2, 130)).astype(np.float32) * 0.3
             for _ in range(3)]
    eng = BinauralEngine(batch=1, sample_rate=SR, block_size=BLOCK,
                         renderer=_renderer(banks[0]))
    n_blocks, swap1, swap2, fade = 10, 3, 4, 96
    x = rng.standard_normal((1, 2, n_blocks * BLOCK)).astype(np.float32)
    out = []
    for b in range(n_blocks):
        if b == swap1:
            assert eng.set_renderer(_renderer(banks[1])) is True
        if b == swap2:  # mid-fade (fade spans blocks 3-4)
            assert eng.set_renderer(_renderer(banks[2])) is True
        out.append(eng.process_block(x[:, :, b * BLOCK:(b + 1) * BLOCK]))
    y = np.concatenate(out, axis=-1)[0]

    y_a, y_b, y_c = (_full_conv(x[0], h) for h in banks)
    n = n_blocks * BLOCK
    # Fade A->B from swap1, interrupted BLOCK samples into the 96-sample
    # window; the restart freezes it at the ramp value the next sample
    # would have used, then fades that mix -> C.
    r1 = _ramp(n, swap1 * BLOCK, fade)
    r0 = (BLOCK + 1) / fade
    y_frozen = (1.0 - r0) * y_a + r0 * y_b
    r2 = _ramp(n, swap2 * BLOCK, fade)
    ref = (1.0 - r1) * y_a + r1 * y_b
    t2 = swap2 * BLOCK
    ref[:, t2:] = ((1.0 - r2) * y_frozen + r2 * y_c)[:, t2:]
    assert _rel_rms(y, ref) < 1e-5
    assert np.all(np.isfinite(y))


def test_engine_longer_hrir_falls_back_to_reset():
    """A new bank that needs MORE partitions than the carry cannot keep the
    history: the swap reports a reset (False) and reallocates."""
    rng = np.random.default_rng(14)
    h_old = rng.standard_normal((2, 2, 100)).astype(np.float32)
    h_new = rng.standard_normal((2, 2, 400)).astype(np.float32)
    eng = BinauralEngine(batch=1, sample_rate=SR, block_size=BLOCK,
                         renderer=_renderer(h_old))
    eng.process_block(np.ones((1, 2, BLOCK), np.float32))
    assert eng.set_renderer(_renderer(h_new)) is False
    y = eng.process_block(np.zeros((1, 2, BLOCK), np.float32))
    np.testing.assert_allclose(y, 0.0, atol=1e-6)  # history was dropped


# --- StreamPool tiers --------------------------------------------------------

from airwave_tpu.assets import channel_maps as cm  # noqa: E402
from airwave_tpu.graph.renderer import (  # noqa: E402
    build_hrir_time_domain, prepare_renderer,
)
from airwave_tpu.io.apo import EqualizerDefinition  # noqa: E402
from airwave_tpu.io.wav import WAVData  # noqa: E402
from airwave_tpu.runtime.stream_pool import PoolProfile, StreamPool  # noqa: E402

SR48 = 48_000.0


def _pool_renderer(seed: int, frames: int = 700, block: int = BLOCK,
                   lookahead: int = 1):
    rng = np.random.default_rng(seed)
    audio = (rng.standard_normal((14, frames)) * 0.2).astype(np.float32)
    wav = WAVData(SR48, audio)
    r = prepare_renderer(wav, cm.STEREO, SR48, block, lookahead=lookahead)
    h = build_hrir_time_domain(wav, cm.STEREO, SR48)
    return r, h


def _lane_ref(x: np.ndarray, h_old: np.ndarray, h_new: np.ndarray,
              fade_start: int, fade: int) -> np.ndarray:
    """Per-lane oracle: old/new full-history convolutions blended from
    the lane's own fade round (the lane's OUTPUT timeline — a paused lane
    fades at rejoin)."""
    n = x.shape[-1]
    r = _ramp(n, fade_start, fade)
    return (1.0 - r) * _full_conv(x, h_old) + r * _full_conv(x, h_new)


def test_pool_ring_crossfade_ragged_pause_matches_oracle():
    """Single-block serving tier: swap mid-traffic with one lane paused
    across the swap. Every lane keeps its full history; active lanes
    blend on the swap round, the paused lane blends at rejoin (after its
    debt roll), and a lane attached after the swap hears the new bank
    directly."""
    rng = np.random.default_rng(21)
    r_old, h_old = _pool_renderer(31)
    r_new, h_new = _pool_renderer(32)
    pool = StreamPool(4, SR48, r_old, block_size=BLOCK)
    lanes = [pool.attach() for _ in range(3)]
    sigs = [(rng.standard_normal((2, 12 * BLOCK)) * 0.3).astype(np.float32)
            for _ in range(4)]
    sched = {0: set(range(10)), 1: set(range(10)),
             2: {0, 1, 5, 6, 7, 8, 9}}  # lane 2 pauses across the swap
    fed = [0, 0, 0, 0]
    swap_iter = 4
    late = None
    for it in range(10):
        if it == swap_iter:
            assert pool.set_renderer(r_new) is True
            assert pool.stats()["hotswap_fading"] == 3
        if it == 6:
            late = pool.attach()
        for i, s in enumerate(lanes):
            if it in sched[i]:
                pool.push(s, sigs[i][:, fed[i] * BLOCK:(fed[i] + 1) * BLOCK])
                fed[i] += 1
        if late is not None and it >= 6:
            pool.push(late, sigs[3][:, fed[3] * BLOCK:(fed[3] + 1) * BLOCK])
            fed[3] += 1
        pool.pump()

    # fade = min(20 ms @ 48k = 960, one 64-sample round) = 64
    starts = {0: 4 * BLOCK, 1: 4 * BLOCK, 2: 2 * BLOCK}
    for i, s in enumerate(lanes):
        y = pool.pull(s, fed[i] * BLOCK)
        ref = _lane_ref(sigs[i][:, :fed[i] * BLOCK], h_old, h_new,
                        starts[i], BLOCK)
        assert _rel_rms(y, ref) < 1e-5, f"lane {i}"
    # The late lane never blends: pure new bank over its own history.
    y = pool.pull(late, fed[3] * BLOCK)
    ref = _full_conv(sigs[3][:, :fed[3] * BLOCK], h_new)
    assert _rel_rms(y, ref) < 1e-5
    # Everyone faded: the dual bank is retired.
    assert pool._xfade_params is None
    assert pool.stats()["hotswap_fading"] == 0


def test_pool_paged_crossfade_with_folded_eq_matches_oracle():
    """Multi-block throughput tier (M=4, EQ enabled): the hot-swap round
    bypasses the EQ-into-synthesis fold for exactly one round (the blend
    must drive the EQ), then returns to the folded steady state. Oracle:
    preamp gain applied to the blended full-history convolution."""
    rng = np.random.default_rng(22)
    M = 4
    r_old, h_old = _pool_renderer(33, lookahead=M)
    r_new, h_new = _pool_renderer(34, lookahead=M)
    eq = EqualizerDefinition(preamp_db=-6.0)
    pool = StreamPool(2, SR48, r_old, eq_definition=eq, block_size=BLOCK,
                      blocks_per_step=M, ring_blocks=64)
    lanes = [pool.attach() for _ in range(2)]
    n_rounds, swap_round = 12, 6
    L = M * BLOCK
    sigs = [(rng.standard_normal((2, n_rounds * L)) * 0.3).astype(np.float32)
            for _ in range(2)]
    for it in range(n_rounds):
        if it == swap_round:
            assert pool.set_renderer(r_new) is True
        for i, s in enumerate(lanes):
            pool.push(s, sigs[i][:, it * L:(it + 1) * L])
        pool.pump()
    gain = 10.0 ** (-6.0 / 20.0)
    fade = min(int(round(SR48 * 0.020)), L)  # 256 (round-clamped)
    for i, s in enumerate(lanes):
        y = pool.pull(s, n_rounds * L)
        ref = gain * _lane_ref(sigs[i], h_old, h_new, swap_round * L, fade)
        # Skip the pool's initial unity->preamp EQ ramp (960 samples at
        # 48 kHz); everything after is steady-state EQ.
        cut = 4 * L
        assert _rel_rms(y[:, cut:], ref[:, cut:]) < 1e-5, f"lane {i}"
    assert pool._xfade_params is None


def test_pool_grouped_crossfade_swaps_one_group_only():
    """Grouped multi-tenant pool: group 1 hot-swaps (dual bank, blend);
    group 0's lanes keep rendering their own bank untouched."""
    rng = np.random.default_rng(23)
    r_a, h_a = _pool_renderer(35)
    r_b, h_b = _pool_renderer(36)
    r_b2, h_b2 = _pool_renderer(37)
    pool = StreamPool(4, SR48, profiles=[PoolProfile(r_a), PoolProfile(r_b)],
                      block_size=BLOCK)
    s0 = pool.attach(group=0)
    s1 = pool.attach(group=1)
    sigs = [(rng.standard_normal((2, 8 * BLOCK)) * 0.3).astype(np.float32)
            for _ in range(2)]
    for it in range(8):
        if it == 3:
            assert pool.set_renderer(r_b2, group=1) is True
            assert pool.stats()["hotswap_fading"] == 1
        pool.push(s0, sigs[0][:, it * BLOCK:(it + 1) * BLOCK])
        pool.push(s1, sigs[1][:, it * BLOCK:(it + 1) * BLOCK])
        pool.pump()
    y0 = pool.pull(s0, 8 * BLOCK)
    y1 = pool.pull(s1, 8 * BLOCK)
    assert _rel_rms(y0, _full_conv(sigs[0], h_a)) < 1e-5
    ref1 = _lane_ref(sigs[1], h_b, h_b2, 3 * BLOCK, BLOCK)
    assert _rel_rms(y1, ref1) < 1e-5
    assert pool._xfade_params is None


def test_pool_grouped_concurrent_swaps_land_in_one_round_prewarmed():
    """BOTH groups' hot-swaps pending in the SAME pump round: the round
    runs ONE uniform all-dual shape (a group without a pending swap gets
    a self-crossfade — identical output), so prewarm(include_hotswap=
    True) covers every concurrent-swap pattern and the fade round never
    jit-compiles mid-traffic. Heterogeneous per-group bank lengths keep
    the per-group carry shapes distinct."""
    rng = np.random.default_rng(29)
    r_a, h_a = _pool_renderer(43, frames=700)
    r_b, h_b = _pool_renderer(44, frames=300)
    r_a2, h_a2 = _pool_renderer(45, frames=700)
    r_b2, h_b2 = _pool_renderer(46, frames=300)
    pool = StreamPool(4, SR48, profiles=[PoolProfile(r_a), PoolProfile(r_b)],
                      block_size=BLOCK)
    pool.prewarm(include_hotswap=True)
    from airwave_tpu.runtime.stream_pool import _pool_step

    s0 = pool.attach(group=0)
    s1 = pool.attach(group=1)
    sigs = [(rng.standard_normal((2, 8 * BLOCK)) * 0.3).astype(np.float32)
            for _ in range(2)]
    compiled = _pool_step._cache_size()
    for it in range(8):
        if it == 3:
            assert pool.set_renderer(r_a2, group=0) is True
            assert pool.set_renderer(r_b2, group=1) is True
            assert pool.stats()["hotswap_fading"] == 2
        pool.push(s0, sigs[0][:, it * BLOCK:(it + 1) * BLOCK])
        pool.push(s1, sigs[1][:, it * BLOCK:(it + 1) * BLOCK])
        pool.pump()
    y0 = pool.pull(s0, 8 * BLOCK)
    y1 = pool.pull(s1, 8 * BLOCK)
    assert _rel_rms(y0, _lane_ref(sigs[0], h_a, h_a2, 3 * BLOCK,
                                  BLOCK)) < 1e-5
    assert _rel_rms(y1, _lane_ref(sigs[1], h_b, h_b2, 3 * BLOCK,
                                  BLOCK)) < 1e-5
    assert pool._xfade_params is None
    assert _pool_step._cache_size() == compiled, (
        "concurrent grouped swaps keyed a jit shape prewarm did not cover"
    )


def test_pool_shorter_hrir_pads_longer_resets():
    """A shorter new bank crossfades onto the padded carry; a longer one
    reports a reset (False) and reallocates."""
    rng = np.random.default_rng(24)
    r_old, h_old = _pool_renderer(38, frames=700)
    r_short, h_short = _pool_renderer(39, frames=300)
    r_long, _ = _pool_renderer(40, frames=2000)
    pool = StreamPool(2, SR48, r_old, block_size=BLOCK)
    s = pool.attach()
    sig = (rng.standard_normal((2, 8 * BLOCK)) * 0.3).astype(np.float32)
    for it in range(8):
        if it == 3:
            assert pool.set_renderer(r_short) is True  # pads 5 -> 11 slots
        pool.push(s, sig[:, it * BLOCK:(it + 1) * BLOCK])
        pool.pump()
    y = pool.pull(s, 8 * BLOCK)
    ref = _lane_ref(sig, h_old, h_short, 3 * BLOCK, BLOCK)
    assert _rel_rms(y, ref) < 1e-5
    assert pool.set_renderer(r_long) is False  # grows: reset semantics
    assert pool._xfade_params is None


def test_pool_prewarm_include_hotswap_smoke():
    """prewarm(include_hotswap=True) compiles the dual-bank rounds; a
    subsequent swap + pump stays correct."""
    rng = np.random.default_rng(25)
    r_old, h_old = _pool_renderer(41)
    r_new, h_new = _pool_renderer(42)
    pool = StreamPool(2, SR48, r_old, block_size=BLOCK)
    pool.prewarm(include_hotswap=True)
    s = pool.attach()
    sig = (rng.standard_normal((2, 6 * BLOCK)) * 0.3).astype(np.float32)
    for it in range(6):
        if it == 2:
            assert pool.set_renderer(r_new) is True
        pool.push(s, sig[:, it * BLOCK:(it + 1) * BLOCK])
        pool.pump()
    y = pool.pull(s, 6 * BLOCK)
    ref = _lane_ref(sig, h_old, h_new, 2 * BLOCK, BLOCK)
    assert _rel_rms(y, ref) < 1e-5


def test_pad_conv_params_is_mathematically_identity():
    """Padded bank == unpadded bank on the same input (tail partitions
    convolve nothing)."""
    rng = np.random.default_rng(15)
    h = rng.standard_normal((2, 2, 100)).astype(np.float32)
    base = upols.make_conv_params(h, BLOCK, pad_to_pow2=False)
    padded = upols.pad_conv_params(base, base.partition_count + 3)
    assert padded.partition_count == base.partition_count + 3

    x = rng.standard_normal((1, 2, 4 * BLOCK)).astype(np.float32)
    st_a = upols.make_conv_state(1, 2, base.partition_count, BLOCK)
    st_b = upols.make_conv_state(1, 2, padded.partition_count, BLOCK)
    ya, yb = [], []
    for b in range(4):
        xb = x[:, :, b * BLOCK:(b + 1) * BLOCK]
        st_a, a = upols.conv_step(base, st_a, xb)
        st_b, bb = upols.conv_step(padded, st_b, xb)
        ya.append(np.asarray(a))
        yb.append(np.asarray(bb))
    # f32 step with a different partition-sum order: not bit-identical.
    assert _rel_rms(np.concatenate(ya, -1), np.concatenate(yb, -1)) < 1e-6
    with pytest.raises(ValueError, match="cannot shrink"):
        upols.pad_conv_params(base, base.partition_count - 1)
