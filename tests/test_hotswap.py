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


def test_engine_second_swap_mid_fade_is_newest_wins():
    """A swap during an in-flight fade restarts the fade toward the newest
    bank; once it completes, output is the newest bank over the FULL
    history."""
    rng = np.random.default_rng(13)
    banks = [rng.standard_normal((2, 2, 130)).astype(np.float32) * 0.3
             for _ in range(3)]
    eng = BinauralEngine(batch=1, sample_rate=SR, block_size=BLOCK,
                         renderer=_renderer(banks[0]))
    n_blocks = 10
    x = rng.standard_normal((1, 2, n_blocks * BLOCK)).astype(np.float32)
    out = []
    for b in range(n_blocks):
        if b == 3:
            assert eng.set_renderer(_renderer(banks[1])) is True
        if b == 4:  # mid-fade (fade spans blocks 3-4)
            assert eng.set_renderer(_renderer(banks[2])) is True
        out.append(eng.process_block(x[:, :, b * BLOCK:(b + 1) * BLOCK]))
    y = np.concatenate(out, axis=-1)[0]

    # From block 6 on, every fade has completed: pure bank-3, full history.
    ref = _full_conv(x[0], banks[2])[:, 6 * BLOCK:]
    assert _rel_rms(y[:, 6 * BLOCK:], ref) < 1e-5
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
