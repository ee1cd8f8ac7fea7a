"""Real FFTs as MXU matmuls (float planes, no complex dtype anywhere).

XLA's TPU FFT lowering runs at a tiny fraction of peak (measured ~10 ms for
16k x 1024-point real FFT pairs on a v5e — ~80 Gflop/s on a ~200 Tflop chip)
and dominates the render chain. For the fixed, known block sizes of this
framework the DFT is just a matrix: lowering rfft/irfft to dense matmuls
against precomputed float32 weights puts the work on the systolic array and
returns (re, im) planes directly — which is exactly the storage format of
the delay line (ops/upols.py), so complex dtypes disappear from the hot path
entirely.

Accuracy: a 1024-point DFT as an f32 matmul carries ~sqrt(N) * eps ~ 2e-6
relative error — comfortably inside the 1e-5 chain contract (validated by
the oracle parity tests).

The synthesis weights support partial outputs: UPOLS only needs the SECOND
half of its inverse FFT (overlap-save discard) and the EQ FIR only the
FIRST half, which halves the irfft matmul work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Matmul precision for the numerics-bearing contractions. HIGHEST (bf16x6
# passes) holds the 1e-5 chain contract with ~50x margin; HIGH (bf16x3) is
# faster but FAILS it (4.2e-5 chain rel RMS on-chip); DEFAULT (single bf16
# pass) fails it outright (4.9e-3). See BENCH_NOTES.md for the measured
# ladder. Override via AIRWAVE_MATMUL_PRECISION.
import os as _os

PRECISION = {
    "highest": __import__("jax").lax.Precision.HIGHEST,
    "high": __import__("jax").lax.Precision.HIGH,
    "default": __import__("jax").lax.Precision.DEFAULT,
}[_os.environ.get("AIRWAVE_MATMUL_PRECISION", "highest").lower()]

# AIRWAVE_DFT_PRECISION overrides the DFT matmuls (analysis + synthesis)
# alone, leaving the delay-line MAC and EQ at AIRWAVE_MATMUL_PRECISION.
# Measured on-chip: HIGH here (everything else HIGHEST) gives 1.9e-5 chain
# rel RMS — over the 1e-5 contract, like the MAC-only-HIGH mix (1.3e-5) —
# so every signal-bearing matmul stays HIGHEST by default.
DFT_PRECISION = {
    "highest": __import__("jax").lax.Precision.HIGHEST,
    "high": __import__("jax").lax.Precision.HIGH,
    "default": __import__("jax").lax.Precision.DEFAULT,
    "": None,
}[_os.environ.get("AIRWAVE_DFT_PRECISION", "").lower()] or PRECISION



@functools.lru_cache(maxsize=16)
def _rfft_weights_np(n: int) -> np.ndarray:
    """[n, K, 2] f32 with X[k] = sum_t x[t] * (cos - i sin)(2 pi t k / n)."""
    k = n // 2 + 1
    t = np.arange(n)[:, None]
    freqs = np.arange(k)[None, :]
    angle = -2.0 * np.pi * t * freqs / n
    return np.stack([np.cos(angle), np.sin(angle)], axis=-1).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _irfft_weights_np(n: int, start: int, length: int) -> np.ndarray:
    """[K, 2, length] f32 synthesizing x[start:start+length] from packed-full
    rfft planes: x[t] = (1/n) * sum_k w_k * (re_k cos + (-im_k) sin)."""
    k = n // 2 + 1
    t = np.arange(start, start + length)[None, :]
    freqs = np.arange(k)[:, None]
    angle = 2.0 * np.pi * freqs * t / n
    scale = np.full((k, 1), 2.0 / n)
    scale[0] = 1.0 / n
    if n % 2 == 0:
        scale[-1] = 1.0 / n
    re = scale * np.cos(angle)
    im = -scale * np.sin(angle)
    return np.stack([re, im], axis=1).astype(np.float32)


def rfft_weights(n: int) -> jax.Array:
    return jnp.asarray(_rfft_weights_np(n))


def rfft_weights_half(n: int) -> jax.Array:
    """First n//2 rows of the n-point analysis weights: the half-window
    transform u = W1 @ b used by the UPOLS delay line (ops/upols). The
    shift theorem W[t + n/2, k] = (-1)^k W[t, k] means a full window's
    spectrum is u_prev + (-1)^k u_new — ops/upols folds that recombination
    into its filter bank so the per-block analysis matmul contracts half
    the samples."""
    return jnp.asarray(_rfft_weights_np(n)[: n // 2])


def irfft_weights(n: int, start: int, length: int) -> jax.Array:
    return jnp.asarray(_irfft_weights_np(n, start, length))


def rfft_mm(x: jax.Array, weights: jax.Array) -> jax.Array:
    """x [..., n] f32 -> packed planes [..., K, 2] via one MXU matmul.

    Precision.HIGHEST is required: TPU matmuls default to bf16 passes, which
    quantize the DFT weights to 8 mantissa bits and blow the 1e-5 chain
    contract (measured 4.9e-3 on-chip at default precision)."""
    return jnp.einsum("...t,tkc->...kc", x, weights,
                      preferred_element_type=jnp.float32,
                      precision=DFT_PRECISION)


def irfft_mm(planes: jax.Array, weights: jax.Array) -> jax.Array:
    """Planes [..., K, 2] -> samples [..., length] via one MXU matmul."""
    return jnp.einsum("...kc,kct->...t", planes, weights,
                      preferred_element_type=jnp.float32,
                      precision=DFT_PRECISION)


# --- Two-stage (Cooley-Tukey) matmul DFT ------------------------------------
#
# n = n1*n2 with t = n1*t2 + t1 and k = K2 + n2*k1. Two short-contraction
# matmuls + one elementwise twiddle replace the single [n x K] matmul:
# ~5-6x fewer FLOPs at the same (HIGHEST) precision, and the shorter
# summations round BETTER than the direct form. Used for the hot 2T-point
# transforms; falls back to the direct weights for odd sizes.


def _split_factors(n: int):
    log = n.bit_length() - 1
    if (1 << log) != n or n < 16:
        return None
    n1 = 1 << ((log + 1) // 2)
    n2 = n // n1
    return n1, n2


@functools.lru_cache(maxsize=16)
def _rfft2_weights_np(n: int):
    n1, n2 = _split_factors(n)
    k_count = n // 2 + 1
    # Stage 1: real DFT-n2 over t2 for each t1: W2[t2, K2, c].
    t2 = np.arange(n2)[:, None]
    K2 = np.arange(n2)[None, :]
    ang = -2.0 * np.pi * t2 * K2 / n2
    W2 = np.stack([np.cos(ang), np.sin(ang)], axis=-1).astype(np.float32)
    # Twiddle: Tw[t1, K2, c] = exp(-2 pi i K2 t1 / n).
    t1 = np.arange(n1)[:, None]
    ang = -2.0 * np.pi * t1 * np.arange(n2)[None, :] / n
    Tw = np.stack([np.cos(ang), np.sin(ang)], axis=-1).astype(np.float32)
    # Stage 2: complex DFT-n1 over t1 for k1 in [0, n1/2]:
    # W1[a(t1), h(k1), c, q] encoding (zr, zi) x (wr, wi) -> (re, im).
    h = np.arange(n1 // 2 + 1)[None, :]
    a = np.arange(n1)[:, None]
    ang = -2.0 * np.pi * a * h / n1
    wr, wi = np.cos(ang), np.sin(ang)
    W1 = np.zeros((n1, n1 // 2 + 1, 2, 2), np.float32)
    W1[:, :, 0, 0] = wr
    W1[:, :, 1, 0] = -wi
    W1[:, :, 0, 1] = wi
    W1[:, :, 1, 1] = wr
    return W2, Tw, W1, k_count


@functools.lru_cache(maxsize=16)
def _irfft2_weights_np(n: int, start: int, length: int):
    n1, n2 = _split_factors(n)
    assert start % n1 == 0 and length % n1 == 0, (start, length, n1)
    # Conjugate-extension index/sign (built in the caller via gather).
    k_count = n // 2 + 1
    ext_idx = np.minimum(np.arange(n), n - np.arange(n))  # |k| mirror
    ext_sign = np.where(np.arange(n) < k_count, 1.0, -1.0).astype(np.float32)
    # Stage A: complex DFT over k1 (full n1 bins): WA[k1, t1, c, q] with
    # w = exp(+2 pi i k1 t1 / n1).
    k1 = np.arange(n1)[:, None]
    t1 = np.arange(n1)[None, :]
    ang = 2.0 * np.pi * k1 * t1 / n1
    wr, wi = np.cos(ang), np.sin(ang)
    WA = np.zeros((n1, n1, 2, 2), np.float32)
    WA[:, :, 0, 0] = wr
    WA[:, :, 1, 0] = -wi
    WA[:, :, 0, 1] = wi
    WA[:, :, 1, 1] = wr
    # Twiddle: TwB[K2, t1, c] = exp(+2 pi i K2 t1 / n).
    K2 = np.arange(n2)[:, None]
    ang = 2.0 * np.pi * K2 * np.arange(n1)[None, :] / n
    TwB = np.stack([np.cos(ang), np.sin(ang)], axis=-1).astype(np.float32)
    # Stage B (real output, selected t2 range): WB[K2, c, t2] with
    # y += (1/n) * (Vr cos - Vi sin)(2 pi K2 t2 / n2).
    t2 = np.arange(start // n1, (start + length) // n1)[None, :]
    ang = 2.0 * np.pi * np.arange(n2)[:, None] * t2 / n2
    WB = np.stack([np.cos(ang) / n, -np.sin(ang) / n], axis=1).astype(
        np.float32
    )
    return ext_idx, ext_sign, WA, TwB, WB


def rfft2_weights(n: int):
    W2, Tw, W1, _k_count = _rfft2_weights_np(n)
    return (jnp.asarray(W2), jnp.asarray(Tw), jnp.asarray(W1))


def irfft2_weights(n: int, start: int, length: int):
    ext_idx, ext_sign, WA, TwB, WB = _irfft2_weights_np(n, start, length)
    return (jnp.asarray(ext_idx), jnp.asarray(ext_sign), jnp.asarray(WA),
            jnp.asarray(TwB), jnp.asarray(WB))


def rfft_mm2(x: jax.Array, weights) -> jax.Array:
    """Two-stage analysis: x [..., n] -> planes [..., K, 2]."""
    W2, Tw, W1 = weights
    n = x.shape[-1]
    n2, n1 = W2.shape[0], Tw.shape[0]
    k_count = n // 2 + 1
    xr = x.reshape(x.shape[:-1] + (n2, n1))
    Z = jnp.einsum("...ba,bkc->...akc", xr, W2,
                   preferred_element_type=jnp.float32, precision=PRECISION)
    zr = Z[..., 0] * Tw[..., 0] - Z[..., 1] * Tw[..., 1]
    zi = Z[..., 0] * Tw[..., 1] + Z[..., 1] * Tw[..., 0]
    Zt = jnp.stack([zr, zi], axis=-1)
    X = jnp.einsum("...akc,ahcq->...hkq", Zt, W1,
                   preferred_element_type=jnp.float32, precision=PRECISION)
    flat = X.reshape(X.shape[:-3] + (-1, 2))  # k1-major -> ascending k
    return flat[..., :k_count, :]


def irfft_mm2(planes: jax.Array, weights) -> jax.Array:
    """Two-stage synthesis of y[start:start+length] from planes [..., K, 2]."""
    ext_idx, ext_sign, WA, TwB, WB = weights
    n1 = WA.shape[0]
    n2 = TwB.shape[0]
    # Conjugate extension to the full spectrum, planes [..., n, 2].
    re = planes[..., 0][..., ext_idx]
    im = planes[..., 1][..., ext_idx] * ext_sign
    Xf = jnp.stack([re, im], axis=-1)
    Xk = Xf.reshape(Xf.shape[:-2] + (n1, n2, 2))  # [.., k1, K2, c]
    V = jnp.einsum("...kKc,ktcq->...Ktq", Xk, WA,
                   preferred_element_type=jnp.float32, precision=PRECISION)
    vr = V[..., 0] * TwB[..., 0] - V[..., 1] * TwB[..., 1]
    vi = V[..., 0] * TwB[..., 1] + V[..., 1] * TwB[..., 0]
    Vt = jnp.stack([vr, vi], axis=-1)            # [.., K2, t1, c]
    y = jnp.einsum("...Ktc,Kcs->...st", Vt, WB,
                   preferred_element_type=jnp.float32, precision=PRECISION)
    return y.reshape(y.shape[:-2] + (-1,))       # t2-major -> ascending t
