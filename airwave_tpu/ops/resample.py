"""Resampling: linear-interpolation parity path + polyphase FIR quality path.

The reference resamples HRIRs offline with a vDSP control-vector gather
(/root/reference/Airwave/Resampler.swift:31-68): output[i] interpolates the
input at fractional index i * (from/to), identity when rates differ by
< 0.01 Hz, output length floor(n / stride).

`resample_linear` reproduces that contract bit-for-tolerance (numpy, used for
HRIR preparation and fixture parity). `resample_polyphase` is the quality
upgrade named by the north star (BASELINE.json): a windowed-sinc polyphase
FIR implemented as a gather + matmul, jit-friendly for on-device use.
"""

from __future__ import annotations

import math

import numpy as np

IDENTITY_EPSILON_HZ = 0.01


def resample_linear(x: np.ndarray, from_rate: float, to_rate: float) -> np.ndarray:
    """vDSP_vgenp-equivalent linear-interp gather along the last axis."""
    if abs(from_rate - to_rate) < IDENTITY_EPSILON_HZ:
        return np.asarray(x)
    x = np.asarray(x)
    n = x.shape[-1]
    stride = from_rate / to_rate
    out_count = int(n / stride)
    if out_count <= 0:
        return x[..., :0]
    # Control vector built in float32 like vDSP_vramp (Resampler.swift:56).
    control = (np.float32(0) + np.arange(out_count, dtype=np.float32)
               * np.float32(stride)).astype(np.float64)
    idx = np.floor(control).astype(np.int64)
    frac = control - idx
    idx0 = np.clip(idx, 0, n - 1)
    idx1 = np.clip(idx + 1, 0, n - 1)
    return (
        x[..., idx0] * (1.0 - frac) + x[..., idx1] * frac
    ).astype(x.dtype)


def _kaiser_beta(att_db: float) -> float:
    if att_db > 50:
        return 0.1102 * (att_db - 8.7)
    if att_db >= 21:
        return 0.5842 * (att_db - 21) ** 0.4 + 0.07886 * (att_db - 21)
    return 0.0


def design_polyphase(
    from_rate: float,
    to_rate: float,
    taps_per_phase: int = 32,
    att_db: float = 90.0,
    max_denominator: int = 1000,
):
    """Design a polyphase resampling filter bank.

    Returns (up, down, bank[up, taps_per_phase]) for rational up/down
    resampling with a Kaiser-windowed sinc lowpass at min(from, to)/2.
    """
    from fractions import Fraction

    frac = Fraction(to_rate / from_rate).limit_denominator(max_denominator)
    up, down = frac.numerator, frac.denominator
    cutoff = min(1.0 / down, 1.0 / up)  # relative to up-sampled Nyquist
    ntaps = taps_per_phase * up
    beta = _kaiser_beta(att_db)
    n = np.arange(ntaps) - (ntaps - 1) / 2.0
    h = cutoff * np.sinc(cutoff * n)
    h *= np.kaiser(ntaps, beta)
    h *= up / np.sum(h)
    bank = h.reshape(taps_per_phase, up).T.copy()  # [up, taps]
    return up, down, bank.astype(np.float64)


def resample_polyphase_device(
    x, from_rate: float, to_rate: float, taps_per_phase: int = 32
):
    """Rational polyphase FIR resampling on device (jax), batched over
    leading axes.

    Lowered as one gather + one MXU contraction: output windows
    [..., out, taps] x per-output phase banks [out, taps] -> [..., out].
    The filter bank design runs on the host in float64.

    KERNEL NOTE: a hand-written Pallas version was evaluated and rejected.
    The phase pattern repeats every `up` outputs, so the whole resampler is
    expressible as (strided window extraction) + (one dense matmul against a
    tile-invariant weight matrix) — exactly what this einsum lowers to, and
    a shape XLA already schedules optimally on the MXU. Mosaic's lane-dim
    slice alignment rules would force the same window materialization a
    Pallas kernel would need, leaving it nothing to fuse. (The Pallas budget
    goes to the FDL kernel, where manual DMA genuinely changes the traffic.)
    """
    import jax.numpy as jnp

    if abs(from_rate - to_rate) < IDENTITY_EPSILON_HZ:
        return jnp.asarray(x)
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[-1]
    up, down, bank = design_polyphase(from_rate, to_rate, taps_per_phase)
    out_count = int(n * to_rate / from_rate)
    taps = bank.shape[1]

    m = np.arange(out_count)
    phase = (m * down) % up
    base = (m * down) // up
    offsets = np.arange(taps)
    idx = base[:, None] - offsets[None, :] + taps // 2        # [out, taps]
    valid = (idx >= 0) & (idx < n)
    idx_c = np.clip(idx, 0, n - 1)

    weights = bank[phase] * valid                             # [out, taps] f64
    windows = x[..., jnp.asarray(idx_c)]                      # [..., out, taps]
    return jnp.einsum(
        "...ot,ot->...o", windows, jnp.asarray(weights, jnp.float32),
        preferred_element_type=jnp.float32,
    )


def resample_polyphase(
    x: np.ndarray, from_rate: float, to_rate: float, taps_per_phase: int = 32
) -> np.ndarray:
    """Rational polyphase FIR resampling along the last axis (numpy).

    Higher-quality alternative to `resample_linear` for HRIR preparation;
    `resample_polyphase_device` is the batched jax variant.
    """
    if abs(from_rate - to_rate) < IDENTITY_EPSILON_HZ:
        return np.asarray(x)
    x = np.asarray(x, np.float64)
    up, down, bank = design_polyphase(from_rate, to_rate, taps_per_phase)
    n = x.shape[-1]
    out_count = int(n * to_rate / from_rate)
    taps = bank.shape[1]
    half = (taps * down) // 2

    # Output sample m draws from up-sampled index m*down; phase = m*down % up,
    # base input index = m*down // up.
    m = np.arange(out_count)
    phase = (m * down) % up
    base = (m * down) // up
    # Gather input windows [out_count, taps] ending at base (causal-centered).
    offsets = np.arange(taps)
    idx = base[:, None] - offsets[None, :] + taps // 2
    valid = (idx >= 0) & (idx < n)
    idx_c = np.clip(idx, 0, n - 1)
    windows = np.where(valid, x[..., idx_c], 0.0)  # [..., out, taps]
    y = np.einsum("...ot,ot->...o", windows, bank[phase])
    return y.astype(np.float32)
