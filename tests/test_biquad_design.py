"""Golden-value tests for biquad design and the f64 EQ oracle.

Golden constants are the reference's pinned fixtures
(/root/reference/AirwaveTests/ParametricEqualizerProcessorTests.swift:6-133).
"""

import math

import numpy as np
import pytest

from airwave_tpu.io.apo import EqualizerDefinition, EqualizerFilter, FilterType
from airwave_tpu.ops import biquad_design as bd
from airwave_tpu.oracle.eq_oracle import EqCascadeOracle
from airwave_tpu.utils import errors

GOLDEN_COEFFICIENTS = [
    (FilterType.PEAKING, 6, 1_000, 0.707, 44_100,
     [1.066059044304402, -1.848333006078428, 0.801193953602049,
      -1.848333006078428, 0.867252997906451]),
    (FilterType.PEAKING, 6, 1_000, 0.707, 48_000,
     [1.061051079218484, -1.861255902473044, 0.816265527066576,
      -1.861255902473044, 0.877316606285061]),
    (FilterType.PEAKING, 6, 1_000, 0.707, 96_000,
     [1.031556835547465, -1.932439513787206, 0.905029057291346,
      -1.932439513787206, 0.936585892838811]),
    (FilterType.LOW_SHELF, 4, 250, 0.8, 44_100,
     [1.005181131876713, -1.959818685223499, 0.956203632826288,
      -1.960107660288434, 0.961095789638066]),
    (FilterType.LOW_SHELF, 4, 250, 0.8, 48_000,
     [1.004757001839771, -1.963119655421762, 0.959686684133658,
      -1.963363967297150, 0.964199374098040]),
    (FilterType.LOW_SHELF, 4, 250, 0.8, 96_000,
     [1.002369381638864, -1.981663998355715, 0.979628621963737,
      -1.981725629447349, 0.981936372510967]),
    (FilterType.HIGH_SHELF, -5, 6_000, 0.8, 44_100,
     [0.659738038304301, -0.493423574823573, 0.211192786614601,
      -1.024348043481364, 0.401855293576692]),
    (FilterType.HIGH_SHELF, -5, 6_000, 0.8, 48_000,
     [0.651371052565336, -0.549995923363222, 0.224963798271964,
      -1.105037860095793, 0.431376787569872]),
    (FilterType.HIGH_SHELF, -5, 6_000, 0.8, 96_000,
     [0.605207918981539, -0.855707120775878, 0.345827037126246,
      -1.558782199620635, 0.654110034952544]),
]


def make_filter(ftype, frequency, gain, q, enabled=True):
    return EqualizerFilter(
        source_line=1, source_number=None, is_enabled=enabled,
        type=ftype, frequency_hz=frequency, gain_db=gain, q=q,
    )


def test_golden_coefficients_match_reference_at_supported_rates():
    for ftype, gain, freq, q, rate, expected in GOLDEN_COEFFICIENTS:
        c = bd.make_biquad(ftype, gain, freq, q, rate)
        actual = [c.b0, c.b1, c.b2, c.a1, c.a2]
        for a, e in zip(actual, expected):
            assert abs(a - e) < 1e-12


def test_golden_magnitudes_at_dc_center_and_nyquist():
    cases = [
        (FilterType.PEAKING, 6, 1_000, 0.707, 48_000, [0, 6, 0]),
        (FilterType.LOW_SHELF, 4, 250, 0.8, 48_000, [4, 2, 0]),
        (FilterType.HIGH_SHELF, -5, 6_000, 0.8, 48_000, [0, -2.5, -5]),
    ]
    for ftype, gain, freq, q, rate, expected in cases:
        c = bd.make_biquad(ftype, gain, freq, q, rate)
        for test_freq, exp_db in zip([0, freq, rate / 2 - 1], expected):
            assert abs(bd.magnitude_db(c, test_freq, rate) - exp_db) < 1e-9


def test_validation_taxonomy():
    with pytest.raises(errors.InvalidSampleRate):
        bd.make_biquad(FilterType.PEAKING, 1, 100, 1, 0)
    with pytest.raises(errors.InvalidFrequency):
        bd.make_biquad(FilterType.PEAKING, 1, 24_000, 1, 48_000)
    with pytest.raises(errors.InvalidFrequency):
        bd.make_biquad(FilterType.PEAKING, 1, 0, 1, 48_000)
    with pytest.raises(errors.InvalidQ):
        bd.make_biquad(FilterType.PEAKING, 1, 1_000, 0, 48_000)
    with pytest.raises(errors.NonFiniteInput):
        bd.make_biquad(FilterType.PEAKING, math.nan, 1_000, 1, 48_000)


def test_design_cascade_rejects_invalid_definitions():
    with pytest.raises(errors.EqInvalidSampleRate):
        bd.design_cascade(None, 0)
    too_many = EqualizerDefinition(
        filters=tuple(
            make_filter(FilterType.PEAKING, 500 + i, 1, 1) for i in range(65)
        )
    )
    with pytest.raises(errors.EqTooManyFilters):
        bd.design_cascade(too_many, 48_000)
    bad = EqualizerDefinition(
        filters=(make_filter(FilterType.PEAKING, 24_000, 1, 1),)
    )
    with pytest.raises(errors.EqInvalidFilter):
        bd.design_cascade(bad, 48_000)


def test_disabled_filters_excluded():
    definition = EqualizerDefinition(
        filters=(make_filter(FilterType.PEAKING, 1_000, 12, 0.7, enabled=False),)
    )
    preamp, coeffs = bd.design_cascade(definition, 48_000)
    assert preamp == 1.0 and coeffs == []
    oracle = EqCascadeOracle(coeffs, preamp, 48_000)
    left, right = oracle.process(np.array([1, 0], np.float32),
                                 np.array([1, 0], np.float32))
    np.testing.assert_array_equal(left, [1, 0])
    np.testing.assert_array_equal(right, [1, 0])


def test_known_impulse_response_preserves_cascade_order():
    """6-sample golden impulse of the 2-filter cascade
    (ref ParametricEqualizerProcessorTests.swift:109-133)."""
    definition = EqualizerDefinition(
        filters=(
            make_filter(FilterType.PEAKING, 1_000, 6, 0.707),
            make_filter(FilterType.PEAKING, 3_000, -3, 1.1),
        )
    )
    preamp, coeffs = bd.design_cascade(definition, 48_000)
    oracle = EqCascadeOracle(coeffs, preamp, 48_000)
    left, right = oracle.process(
        np.array([1, 0, 0, 0, 0, 0], np.float32), np.zeros(6, np.float32)
    )
    expected = [1.007962105198731, 0.026656172367575, 0.046848317472827,
                0.062845911221200, 0.072328817552935, 0.074696369241889]
    for a, e in zip(left, expected):
        assert abs(a - e) < 1e-6
    assert np.all(right == 0)


def test_block_ssm_matches_per_sample_oracle():
    """The block state-space lowering is exact vs the sequential recurrence."""
    rng = np.random.default_rng(0)
    definition = EqualizerDefinition(
        preamp_db=-3.0,
        filters=(
            make_filter(FilterType.PEAKING, 65.3, 1.0, 1.68),
            make_filter(FilterType.LOW_SHELF, 105.0, -2.8, 0.70),
            make_filter(FilterType.PEAKING, 3020.2, 2.5, 2.25),
            make_filter(FilterType.HIGH_SHELF, 10_000.0, -5.2, 0.70),
        ),
    )
    preamp, coeffs = bd.design_cascade(definition, 48_000)
    T = 64
    ssm = bd.block_ssm(coeffs, preamp, block_size=T, state_dim=16)
    n = 2 * len(coeffs)

    x = rng.standard_normal(3 * T)
    # Per-sample oracle over 3 blocks.
    oracle = EqCascadeOracle(coeffs, preamp, 48_000)
    y_ref, _ = oracle.process(x.astype(np.float32), x.astype(np.float32))

    # Block state-space over 3 blocks, float64.
    s = np.zeros(16, np.float64)
    y_blk = np.zeros_like(x)
    for b in range(3):
        xb = x[b * T:(b + 1) * T].astype(np.float32).astype(np.float64)
        fir = np.convolve(xb, ssm.h)[:T]
        y_blk[b * T:(b + 1) * T] = fir + ssm.O @ s
        s = ssm.A_T @ s + ssm.G @ xb
    assert np.max(np.abs(y_blk.astype(np.float32) - y_ref)) < 1e-6
    # Padded state region stays exactly zero.
    assert np.all(s[n:] == 0)


def test_subnormal_flush_observable_in_exact_oracle():
    definition = EqualizerDefinition(
        filters=(make_filter(FilterType.PEAKING, 1_000, 6, 0.707),)
    )
    preamp, coeffs = bd.design_cascade(definition, 48_000)
    oracle = EqCascadeOracle(coeffs, preamp, 48_000)
    tiny = np.float32(1.401298464324817e-45)  # Float.leastNonzeroMagnitude
    left, _ = oracle.process_exact(np.array([tiny, 0], np.float32),
                                   np.array([0, 0], np.float32))
    assert left[0] != 0
    assert left[1] == 0
