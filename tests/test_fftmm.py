"""Matmul-DFT tests: direct and two-stage vs numpy FFT."""

import numpy as np
import pytest

from airwave_tpu.ops import fftmm


@pytest.mark.parametrize("n", [128, 1024])
def test_direct_rfft_and_irfft_match_numpy(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 2, n)).astype(np.float32)
    planes = np.asarray(fftmm.rfft_mm(x, fftmm.rfft_weights(n)))
    ref = np.fft.rfft(x)
    np.testing.assert_allclose(planes[..., 0], ref.real, atol=2e-3)
    np.testing.assert_allclose(planes[..., 1], ref.imag, atol=2e-3)

    got = np.asarray(fftmm.irfft_mm(
        planes, fftmm.irfft_weights(n, n // 2, n // 2)
    ))
    full = np.fft.irfft(ref, n=n)
    np.testing.assert_allclose(got, full[..., n // 2:], atol=2e-5)


@pytest.mark.parametrize("n", [128, 1024])
def test_two_stage_matches_numpy(n):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, n)).astype(np.float32)
    planes = np.asarray(fftmm.rfft_mm2(x, fftmm.rfft2_weights(n)))
    ref = np.fft.rfft(x)
    np.testing.assert_allclose(planes[..., 0], ref.real, atol=2e-3)
    np.testing.assert_allclose(planes[..., 1], ref.imag, atol=2e-3)

    got = np.asarray(fftmm.irfft_mm2(
        planes, fftmm.irfft2_weights(n, n // 2, n // 2)
    ))
    full = np.fft.irfft(ref, n=n)
    np.testing.assert_allclose(got, full[..., n // 2:], atol=2e-5)


def test_two_stage_first_half_synthesis():
    n = 256
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, n)).astype(np.float32)
    planes = np.asarray(fftmm.rfft_mm2(x, fftmm.rfft2_weights(n)))
    got = np.asarray(fftmm.irfft_mm2(
        planes, fftmm.irfft2_weights(n, 0, n // 2)
    ))
    full = np.fft.irfft(np.fft.rfft(x), n=n)
    np.testing.assert_allclose(got, full[..., : n // 2], atol=2e-5)

