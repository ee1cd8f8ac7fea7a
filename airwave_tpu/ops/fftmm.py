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
# ~2x faster and still passes (see BENCH_NOTES.md); DEFAULT (single bf16
# pass) fails it outright. Override via AIRWAVE_MATMUL_PRECISION.
import os as _os

PRECISION = {
    "highest": __import__("jax").lax.Precision.HIGHEST,
    "high": __import__("jax").lax.Precision.HIGH,
    "default": __import__("jax").lax.Precision.DEFAULT,
}[_os.environ.get("AIRWAVE_MATMUL_PRECISION", "highest").lower()]



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


def irfft_weights(n: int, start: int, length: int) -> jax.Array:
    return jnp.asarray(_irfft_weights_np(n, start, length))


def rfft_mm(x: jax.Array, weights: jax.Array) -> jax.Array:
    """x [..., n] f32 -> packed planes [..., K, 2] via one MXU matmul.

    Precision.HIGHEST is required: TPU matmuls default to bf16 passes, which
    quantize the DFT weights to 8 mantissa bits and blow the 1e-5 chain
    contract (measured 4.9e-3 on-chip at default precision)."""
    return jnp.einsum("...t,tkc->...kc", x, weights,
                      preferred_element_type=jnp.float32,
                      precision=PRECISION)


def irfft_mm(planes: jax.Array, weights: jax.Array) -> jax.Array:
    """Planes [..., K, 2] -> samples [..., length] via one MXU matmul."""
    return jnp.einsum("...kc,kct->...t", planes, weights,
                      preferred_element_type=jnp.float32,
                      precision=PRECISION)


@functools.lru_cache(maxsize=16)
def _rfft_weights_packed_np(n: int) -> np.ndarray:
    """Packed-bin analysis weights [n, n//2, 2]: bin 0 = (DC, Nyquist) —
    the kernels' vDSP-style layout (kernels/upols_pallas.py)."""
    full = _rfft_weights_np(n)              # [n, K, 2]
    packed = full[:, : n // 2, :].copy()
    packed[:, 0, 1] = full[:, n // 2, 0]    # Nyquist real -> bin0 imag lane
    return packed


@functools.lru_cache(maxsize=16)
def _irfft_weights_packed_np(n: int, start: int, length: int) -> np.ndarray:
    """Packed-bin synthesis weights [n//2, 2, length]."""
    full = _irfft_weights_np(n, start, length)   # [K, 2, length]
    packed = full[: n // 2].copy()
    packed[0, 1, :] = full[n // 2, 0, :]         # bin0 imag = Nyquist real
    return packed


def rfft_weights_packed(n: int) -> jax.Array:
    return jnp.asarray(_rfft_weights_packed_np(n))


def irfft_weights_packed(n: int, start: int, length: int) -> jax.Array:
    return jnp.asarray(_irfft_weights_packed_np(n, start, length))
