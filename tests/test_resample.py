"""Resampler tests: linear parity contract + polyphase quality (host/device)."""

import numpy as np
import pytest

from airwave_tpu.ops import resample


def test_linear_identity_within_epsilon():
    x = np.arange(10, dtype=np.float32)
    np.testing.assert_array_equal(
        resample.resample_linear(x, 48_000.0, 48_000.005), x
    )


def test_linear_output_length_and_interpolation():
    x = np.array([0.0, 1.0, 2.0, 3.0], np.float32)
    y = resample.resample_linear(x, 48_000.0, 96_000.0)
    assert len(y) == 8  # floor(n / stride), stride = 0.5
    np.testing.assert_allclose(y[:4], [0.0, 0.5, 1.0, 1.5], atol=1e-6)


def test_linear_downsample():
    x = np.arange(8, dtype=np.float32)
    y = resample.resample_linear(x, 96_000.0, 48_000.0)
    np.testing.assert_allclose(y, [0, 2, 4, 6], atol=1e-6)


def _tone(freq, rate, n):
    return np.sin(2 * np.pi * freq * np.arange(n) / rate)


@pytest.mark.parametrize("impl", ["host", "device"])
def test_polyphase_tone_fidelity_44k_to_48k(impl):
    """A 1 kHz tone resampled 44.1k -> 48k must stay a clean 1 kHz tone
    (the quality bar the linear path cannot hit)."""
    n = 4410 * 2
    x = _tone(1_000.0, 44_100.0, n).astype(np.float32)
    if impl == "host":
        y = resample.resample_polyphase(x, 44_100.0, 48_000.0)
    else:
        y = np.asarray(
            resample.resample_polyphase_device(x, 44_100.0, 48_000.0)
        )
    expected = _tone(1_000.0, 48_000.0, len(y))
    margin = 200  # skip filter edges
    err = y[margin:-margin] - expected[margin:-margin]
    rel = np.sqrt(np.mean(err**2)) / np.sqrt(np.mean(expected**2))
    assert rel < 1e-3, rel

    # Spectral purity: energy outside the tone bin < -60 dB.
    seg = y[margin:-margin] * np.hanning(len(y) - 2 * margin)
    spec = np.abs(np.fft.rfft(seg))
    peak_bin = int(np.argmax(spec))
    spec[max(0, peak_bin - 8): peak_bin + 8] = 0
    assert np.max(spec) < 1e-3 * np.max(np.abs(np.fft.rfft(seg)))


def test_polyphase_device_matches_host_and_batches():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 2, 2205)).astype(np.float32) * 0.5
    host = np.stack([
        np.stack([
            resample.resample_polyphase(x[b, c], 44_100.0, 48_000.0)
            for c in range(2)
        ]) for b in range(3)
    ])
    device = np.asarray(
        resample.resample_polyphase_device(x, 44_100.0, 48_000.0)
    )
    assert device.shape == host.shape
    np.testing.assert_allclose(device, host, atol=2e-5)


def test_linear_vs_polyphase_quality_gap():
    """The polyphase path must beat linear interpolation on a high tone."""
    n = 44_100
    x = _tone(15_000.0, 44_100.0, n).astype(np.float32)
    lin = resample.resample_linear(x, 44_100.0, 48_000.0)
    poly = resample.resample_polyphase(x, 44_100.0, 48_000.0)
    expected = _tone(15_000.0, 48_000.0, min(len(lin), len(poly)))

    def rel_err(y):
        m = 300
        e = y[m:len(expected) - m] - expected[m:len(expected) - m]
        return np.sqrt(np.mean(e**2))

    assert rel_err(poly) < rel_err(lin) / 10
