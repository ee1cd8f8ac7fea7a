"""Offline-tool tests: SOFA reader, HeSuVi converter, spatial synthesis.

Ports of /root/reference/tools/ss2-to-hesuvi/tests/test_convert.py (synthetic
in-memory SOFA fixtures: directional selection, spherical/cartesian parity,
receiver order from positions, tie-breaking, fractional-delay group-delay
preservation, loudness gain math, manifest reproducibility, CLI) and
tools/ss2-spatial-prototype/tests/test_spatial.py (determinism, min-phase
energy/third-octave preservation, decay targets).
"""

import json
import math
import os

import h5py
import numpy as np
import pytest

from airwave_tpu.io import wav as wav_io
from airwave_tpu.tools import convert, spatial
from airwave_tpu.tools.sofa import ConversionError, read_sofa_hrir


def write_sofa(
    path,
    azimuths_deg,
    ir_length=64,
    sample_rate=48_000.0,
    delays=None,
    source_type="spherical",
    receiver_order="lr",
    impulse_fn=None,
):
    """Synthetic SimpleFreeFieldHRIR SOFA fixture."""
    m = len(azimuths_deg)
    ir = np.zeros((m, 2, ir_length), np.float64)
    for i in range(m):
        if impulse_fn is not None:
            ir[i] = impulse_fn(i)
        else:
            ir[i, 0, 4] = 1.0 + i * 0.01   # left receiver impulse
            ir[i, 1, 6] = 0.5 + i * 0.01   # right receiver impulse
    with h5py.File(path, "w") as f:
        f.attrs["SOFAConventions"] = "SimpleFreeFieldHRIR"
        f.attrs["DataType"] = "FIR"
        f.attrs["DatabaseName"] = "synthetic"
        f.attrs["ListenerShortName"] = "test-listener"
        f.attrs["License"] = "CC0"
        f.create_dataset("Data.IR", data=ir)
        f.create_dataset("Data.SamplingRate", data=np.array([sample_rate]))
        f.create_dataset(
            "Data.Delay",
            data=np.zeros((1, 2)) if delays is None else np.asarray(delays),
        )
        if source_type == "spherical":
            positions = np.stack(
                [np.asarray(azimuths_deg, np.float64),
                 np.zeros(m), np.ones(m)], axis=1
            )
            units = "degree, degree, metre"
        else:
            az = np.deg2rad(np.asarray(azimuths_deg, np.float64))
            positions = np.stack(
                [np.cos(az), np.sin(az), np.zeros(m)], axis=1
            )
            units = "metre"
        sp = f.create_dataset("SourcePosition", data=positions)
        sp.attrs["Type"] = source_type
        sp.attrs["Units"] = units

        lp = f.create_dataset("ListenerPosition", data=np.zeros((1, 3)))
        lp.attrs["Type"] = "cartesian"
        lp.attrs["Units"] = "metre"
        f.create_dataset("ListenerView", data=np.array([[1.0, 0.0, 0.0]]))
        f.create_dataset("ListenerUp", data=np.array([[0.0, 0.0, 1.0]]))

        # +y is listener-left in this frame (view +x, up +z).
        left_pos = [0.0, 0.09, 0.0]
        right_pos = [0.0, -0.09, 0.0]
        rows = [left_pos, right_pos] if receiver_order == "lr" else \
               [right_pos, left_pos]
        rp = f.create_dataset("ReceiverPosition", data=np.array(rows))
        rp.attrs["Type"] = "cartesian"
        rp.attrs["Units"] = "metre"
    return str(path)


FULL_RING = [0.0, 30.0, -30.0, 90.0, -90.0, 135.0, -135.0, 180.0]


def test_reads_and_selects_all_targets(tmp_path):
    path = write_sofa(tmp_path / "a.sofa", FULL_RING)
    data = read_sofa_hrir(path)
    assert data.sample_rate == 48_000
    assert (data.left_receiver, data.right_receiver) == (0, 1)
    selections = convert.select_directions(data, max_error_deg=1.0)
    got = {s.speaker: data.source_azimuths[s.measurement_index]
           for s in selections.values()}
    want = {"FC": 0.0, "FL": 30.0, "FR": -30.0, "SL": 90.0,
            "SR": -90.0, "BL": 135.0, "BR": -135.0}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k])


def test_cartesian_and_spherical_sources_agree(tmp_path):
    a = read_sofa_hrir(write_sofa(tmp_path / "s.sofa", FULL_RING,
                                  source_type="spherical"))
    b = read_sofa_hrir(write_sofa(tmp_path / "c.sofa", FULL_RING,
                                  source_type="cartesian"))
    np.testing.assert_allclose(a.source_azimuths, b.source_azimuths, atol=1e-9)


def test_spherical_listener_view_matches_cartesian(tmp_path):
    """A spherical-Type ListenerView ([az, el, r] degrees) must rotate the
    frame exactly as its cartesian equivalent — not be read component-wise
    as a cartesian vector."""
    pa = write_sofa(tmp_path / "a.sofa", FULL_RING)
    with h5py.File(pa, "r+") as f:
        del f["ListenerView"]
        lv = f.create_dataset(
            "ListenerView", data=np.array([[90.0, 0.0, 0.0]])
        )  # facing +y; zero radius still encodes the direction
        lv.attrs["Type"] = "spherical"
        lv.attrs["Units"] = "degree, degree, metre"
        # ListenerUp shares ListenerView's coordinate system: +z is
        # elevation 90 in spherical degrees.
        del f["ListenerUp"]
        f.create_dataset("ListenerUp", data=np.array([[0.0, 90.0, 1.0]]))
    pb = write_sofa(tmp_path / "b.sofa", FULL_RING)
    with h5py.File(pb, "r+") as f:
        del f["ListenerView"]
        f.create_dataset("ListenerView", data=np.array([[0.0, 1.0, 0.0]]))
        # Receivers must straddle the new left axis (-x when facing +y).
        del f["ReceiverPosition"]
        rp = f.create_dataset(
            "ReceiverPosition",
            data=np.array([[-0.09, 0.0, 0.0], [0.09, 0.0, 0.0]]),
        )
        rp.attrs["Type"] = "cartesian"
        rp.attrs["Units"] = "metre"
    with h5py.File(pa, "r+") as f:
        del f["ReceiverPosition"]
        rp = f.create_dataset(
            "ReceiverPosition",
            data=np.array([[-0.09, 0.0, 0.0], [0.09, 0.0, 0.0]]),
        )
        rp.attrs["Type"] = "cartesian"
        rp.attrs["Units"] = "metre"
    a, b = read_sofa_hrir(pa), read_sofa_hrir(pb)
    np.testing.assert_allclose(a.source_azimuths, b.source_azimuths,
                               atol=1e-9)
    # Sanity: the 90-degree source is now dead ahead in the rotated frame.
    assert abs(a.source_azimuths[3]) < 1e-9
    assert (a.left_receiver, a.right_receiver) == (0, 1)


def test_missing_listener_view_defaults_forward(tmp_path):
    """ListenerView/ListenerUp are optional in AES69 (defaults +x / +z):
    omitting them must read identically to writing the defaults."""
    pa = write_sofa(tmp_path / "a.sofa", FULL_RING)
    pb = write_sofa(tmp_path / "b.sofa", FULL_RING)
    with h5py.File(pb, "r+") as f:
        del f["ListenerView"]
        del f["ListenerUp"]
    a, b = read_sofa_hrir(pa), read_sofa_hrir(pb)
    np.testing.assert_allclose(a.source_azimuths, b.source_azimuths,
                               atol=1e-12)
    assert (b.left_receiver, b.right_receiver) == (0, 1)


def test_missing_required_variable_is_conversion_error(tmp_path):
    """A missing required variable must surface as ConversionError (so the
    batch CLI prints FAIL and continues), not a bare KeyError."""
    from airwave_tpu.tools.sofa import ConversionError

    path = write_sofa(tmp_path / "a.sofa", FULL_RING)
    with h5py.File(path, "r+") as f:
        del f["SourcePosition"]
    with pytest.raises(ConversionError, match="SourcePosition"):
        read_sofa_hrir(path)


def test_receiver_order_identified_from_positions(tmp_path):
    data = read_sofa_hrir(write_sofa(tmp_path / "r.sofa", FULL_RING,
                                     receiver_order="rl"))
    assert (data.left_receiver, data.right_receiver) == (1, 0)


def test_selection_tie_breaks_to_lowest_index(tmp_path):
    # Two measurements equidistant from FC (0 deg): +10 and -10.
    path = write_sofa(tmp_path / "t.sofa", [10.0, -10.0, 30.0, -30.0,
                                            90.0, -90.0, 135.0, -135.0])
    data = read_sofa_hrir(path)
    selections = convert.select_directions(data, max_error_deg=15.0)
    assert selections["FC"].measurement_index == 0


def test_selection_fails_above_max_error(tmp_path):
    data = read_sofa_hrir(write_sofa(tmp_path / "m.sofa", [0.0, 45.0]))
    with pytest.raises(ConversionError):
        convert.select_directions(data, max_error_deg=5.0)


def test_fractional_delay_preserves_group_delay_and_energy():
    rng = np.random.default_rng(0)
    ir = rng.standard_normal(128)
    out = convert.materialize_delays([ir, ir], [3.0, 3.5])
    assert out.shape[1] == 2
    # Zero-fraction channel passes through the interpolator exactly; the
    # half-sample channel loses only a little near-Nyquist energy to the
    # windowed-sinc rolloff.
    energy0 = float(np.sum(out[:, 0] ** 2.0))
    energy1 = float(np.sum(out[:, 1] ** 2.0))
    assert abs(energy0 - np.sum(ir**2)) / np.sum(ir**2) < 1e-6
    assert abs(energy1 - np.sum(ir**2)) / np.sum(ir**2) < 0.1
    # Cross-correlation peak shifted by exactly 0.5 samples between them;
    # sub-sample resolution via frequency-domain zero-padding (sinc interp).
    n = out.shape[0]
    pad = 16
    a = np.fft.rfft(out[:, 0], n)
    b = np.fft.rfft(out[:, 1], n)
    xc = np.fft.irfft(a * np.conj(b), n * pad)
    lag_idx = int(np.argmax(np.roll(xc, n * pad // 2))) - n * pad // 2
    lag = lag_idx / pad
    assert abs(lag + 0.5) < 0.1, lag


def test_near_integer_delay_rounds_with_epsilon_not_up_a_sample():
    """A delay a hair below an integer (float noise — exactly what the
    1e-12 epsilon is for) must land on the integer, not one sample later:
    the fractional part must be computed against the padded integer."""
    rng = np.random.default_rng(1)
    ir = rng.standard_normal(128)
    # One channel fractional so every channel runs through the kernel.
    out = convert.materialize_delays([ir, ir], [5.0 - 5e-13, 3.5])
    n = out.shape[0]
    ref = convert.materialize_delays([ir, ir], [5.0, 3.5])[:n]
    # Identical to an exact 5-sample delay (both pass the same kernel).
    np.testing.assert_allclose(out[:, 0], ref[:, 0], atol=1e-9)


def test_integer_only_delays_skip_interpolation():
    ir = np.zeros(16)
    ir[0] = 1.0
    out = convert.materialize_delays([ir], [2.0])
    assert out[2, 0] == 1.0 and np.sum(np.abs(out)) == 1.0


def test_loudness_gain_math():
    rng = np.random.default_rng(1)
    bank = rng.standard_normal((256, 14)) * 0.1
    calibrated, source, gain = convert.calibrate_loudness(bank, 2.0)
    assert math.isclose(
        convert.front_stereo_binaural_energy(calibrated), 2.0, rel_tol=1e-5
    )
    assert math.isclose(gain, 2.0 / source, rel_tol=1e-12)


def test_convert_file_end_to_end_with_manifest(tmp_path):
    src = write_sofa(tmp_path / "set.sofa", FULL_RING,
                     delays=np.array([[2.0, 3.25]]))
    wav_path, manifest_path = convert.convert_file(src, str(tmp_path / "out"))
    loaded = wav_io.load(wav_path)
    assert loaded.channel_count == 14
    assert loaded.sample_rate == 48_000

    with open(manifest_path) as f:
        manifest = json.load(f)
    assert manifest["schema_version"] == 2
    assert manifest["output"]["channels"] == 14
    assert len(manifest["directions"]) == 7
    assert len(manifest["channel_map"]) == 14
    assert manifest["loudness_calibration"]["linear_gain"] > 0
    # Reproducible: converting again yields an identical WAV hash.
    wav2, manifest2 = convert.convert_file(src, str(tmp_path / "out2"))
    with open(manifest2) as f:
        again = json.load(f)
    assert again["output"]["sha256"] == manifest["output"]["sha256"]


def test_convert_cli_recurses_directories(tmp_path):
    os.makedirs(tmp_path / "in" / "sub", exist_ok=True)
    write_sofa(tmp_path / "in" / "a.sofa", FULL_RING)
    write_sofa(tmp_path / "in" / "sub" / "b.sofa", FULL_RING)
    rc = convert.main([str(tmp_path / "in"), "--output-dir",
                       str(tmp_path / "out")])
    assert rc == 0
    names = sorted(os.listdir(tmp_path / "out"))
    assert names == ["a.json", "a.wav", "b.json", "b.wav"]


def test_front_azimuth_configuration(tmp_path):
    path = write_sofa(tmp_path / "w.sofa", [0.0, 60.0, -60.0, 90.0, -90.0,
                                            135.0, -135.0])
    data = read_sofa_hrir(path)
    selections = convert.select_directions(
        data, 1.0, convert.target_azimuths(60.0)
    )
    assert abs(data.source_azimuths[selections["FL"].measurement_index] - 60.0) < 1e-9
    with pytest.raises(ConversionError):
        convert.target_azimuths(95.0)


# --- spatial prototype -------------------------------------------------------------


def make_bank(frames=4096, seed=7):
    from airwave_tpu.assets.bundled import synthesize_hrir

    return synthesize_hrir("room", length=frames, seed=seed).T.astype(np.float64)


def test_metrics_shape_and_determinism():
    bank = make_bank()
    m1 = spatial.bank_metrics(bank, 48_000)
    m2 = spatial.bank_metrics(bank, 48_000)
    assert m1 == m2
    fl = m1["directions"]["FL"]
    assert fl["left_right_level_db"] > 0  # left-side source louder left
    assert fl["peak_itd_samples_right_minus_left"] > 0
    assert set(fl["late_energy_ratios"]) == {"5", "10", "20", "50"}
    # Monotone decay of late ratios.
    ratios = [fl["late_energy_ratios"][k] for k in ("5", "10", "20", "50")]
    assert ratios == sorted(ratios, reverse=True)


def test_minimum_phase_preserves_magnitude_and_energy():
    rng = np.random.default_rng(3)
    ir = rng.standard_normal(256) * np.exp(-np.arange(256) / 60.0)
    mp = spatial.minimum_phase(ir)
    assert mp.shape == ir.shape
    ref_mag = spatial.third_octave_magnitude_db(ir, 48_000)
    got_mag = spatial.third_octave_magnitude_db(mp, 48_000)
    centers = np.asarray(spatial.THIRD_OCTAVE_CENTERS)
    audible = (centers >= 200) & (centers <= 12_000)
    assert float(np.max(np.abs((got_mag - ref_mag)[audible]))) < 1.0
    assert abs(np.sum(mp**2) / np.sum(ir**2) - 1.0) < 0.05
    # Energy concentrated early (minimum phase).
    assert np.sum(mp[:64] ** 2) > 0.8 * np.sum(mp**2)


@pytest.mark.heavy
def test_synthesize_variants_hit_decay_targets_and_validate():
    reference = make_bank(seed=7)
    ref_metrics = spatial.bank_metrics(reference, 48_000)
    base = make_bank(seed=8)

    full = spatial.synthesize_variant(base, ref_metrics, True, 1.0,
                                      frames=4096)
    dry = spatial.synthesize_variant(base, ref_metrics, True, 0.0,
                                     frames=4096)
    m_full = spatial.bank_metrics(full.astype(np.float64), 48_000)
    m_dry = spatial.bank_metrics(dry.astype(np.float64), 48_000)
    for speaker in ("FL", "FR", "FC"):
        want = ref_metrics["directions"][speaker]["late_energy_ratios"]["5"]
        got = m_full["directions"][speaker]["late_energy_ratios"]["5"]
        got_dry = m_dry["directions"][speaker]["late_energy_ratios"]["5"]
        assert got_dry < got
        assert abs(got - want) / want < 0.5
    # A variant synthesized from the reference bank itself must validate
    # cleanly; an unrelated base bank may legitimately differ tonally.
    self_variant = spatial.synthesize_variant(reference, ref_metrics, True,
                                              1.0, frames=4096)
    problems = spatial.validate_variant(self_variant, ref_metrics)
    assert problems == []
    # Determinism: same seed -> identical bank.
    again = spatial.synthesize_variant(base, ref_metrics, True, 1.0,
                                       frames=4096)
    np.testing.assert_array_equal(full, again)


@pytest.mark.heavy
def test_generate_cli_end_to_end(tmp_path):
    from airwave_tpu.tools import generate

    ref_bank = make_bank(seed=7)
    base_bank = make_bank(seed=8)
    ref_path = str(tmp_path / "ref.wav")
    base_path = str(tmp_path / "base.wav")
    wav_io.save(ref_path, ref_bank.T.astype(np.float32), 48_000)
    wav_io.save(base_path, base_bank.T.astype(np.float32), 48_000)

    manifest = generate.generate(ref_path, base_path, str(tmp_path / "out"))
    assert len(manifest["variants"]) == 4
    for variant in manifest["variants"]:
        assert os.path.exists(tmp_path / "out" / variant["path"])
    assert os.path.exists(tmp_path / "out" / "variants.json")


def test_analyze_cli(tmp_path, capsys):
    bank = make_bank()
    path = str(tmp_path / "b.wav")
    wav_io.save(path, bank.T.astype(np.float32), 48_000)
    assert spatial.main([path]) == 0
    out = json.loads(capsys.readouterr().out)
    assert set(out["directions"]) == set(spatial.DIRECTION_PAIRS)


# --- synthesis tier: allpass ambience, diffuse fitter, tonal projection ------


def test_allpass_section_is_allpass_and_vectorization_matches_scalar():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(2048)
    y = spatial.allpass_section(x, 37, 0.7)
    # Scalar reference recurrence.
    ref = np.zeros_like(x)
    for n in range(x.size):
        v = -0.7 * x[n]
        if n >= 37:
            v += x[n - 37] + 0.7 * ref[n - 37]
        ref[n] = v
    np.testing.assert_allclose(y, ref, atol=1e-12)
    # Unit-magnitude response: long-support energy is preserved.
    imp = np.zeros(1 << 15)
    imp[0] = 1.0
    t = spatial.allpass_cascade(imp, spatial.AMBIENCE_SECTION_DELAYS,
                                spatial.AMBIENCE_SECTION_COEFFS)
    assert abs(float(np.sum(t**2)) - 1.0) < 1e-6


def test_ambience_delays_deterministic_and_shared_sections():
    d1 = spatial.ambience_delays("seed-a", 2, 0)
    d2 = spatial.ambience_delays("seed-a", 2, 0)
    assert d1 == d2
    left = spatial.ambience_delays("seed-a", 2, 0)
    right = spatial.ambience_delays("seed-a", 2, 1)
    assert left[:2] == right[:2]          # shared sections identical
    assert left[2:] != right[2:]          # independent sections differ
    assert spatial.ambience_delays("seed-b", 2, 0) != d1  # seed matters


def test_fit_allpass_pair_hits_decay_targets():
    bank = make_bank(seed=7)
    metrics = spatial.bank_metrics(bank, 48_000)
    base = make_bank(seed=8)
    direct = spatial.aligned_minimum_phase_bank(
        spatial._pad_bank(base, 4096), 4096
    )
    values = metrics["directions"]["FL"]
    targets = [values["late_energy_ratios"][str(ms)]
               for ms in spatial.CHECKPOINTS_MS]
    fitted, info = spatial.fit_allpass_pair(
        direct[:, [0, 1]], targets,
        values["zero_lag_interaural_correlation"], 1.0, "t|FL",
    )
    assert info["fit_max_checkpoint_error"] < 0.01
    # Determinism: identical seed reproduces the fit bit-exactly.
    again, _ = spatial.fit_allpass_pair(
        direct[:, [0, 1]], targets,
        values["zero_lag_interaural_correlation"], 1.0, "t|FL",
    )
    np.testing.assert_array_equal(fitted, again)
    # Energy redistribution, not addition: the magnitude projection keeps
    # pair energy; only the final fractional envelope nudge moves it a bit.
    assert math.isclose(float(np.sum(fitted**2)), float(np.sum(direct[:, :2]**2)),
                        rel_tol=0.05)


def test_diffuse_pair_correlation_control():
    rng = np.random.default_rng(3)
    frames = 4096
    # Coincident impulses: the tails are then scaled copies of the two
    # excitations, so their zero-lag correlation reads the mix directly.
    pair = np.zeros((frames, 2))
    pair[100, 0] = 1.0
    pair[100, 1] = 0.8
    pair += rng.standard_normal((frames, 2)) * 1e-4
    targets = [0.3, 0.2, 0.1, 0.02]

    def tail_corr(correlation):
        out, _ = spatial.fit_diffuse_pair(pair, targets, correlation, 1.0,
                                          "corr-test")
        tail = out[400:]
        return float(
            np.dot(tail[:, 0], tail[:, 1])
            / (np.linalg.norm(tail[:, 0]) * np.linalg.norm(tail[:, 1]))
        )

    assert tail_corr(0.95) > tail_corr(0.05) + 0.3


def test_condition_to_reference_projects_tone_and_ild():
    ref_bank = make_bank(seed=7)
    metrics = spatial.bank_metrics(ref_bank, 48_000)
    base = spatial._pad_bank(make_bank(seed=8), 4096)

    before = spatial.max_reference_tone_error_db(base, metrics)
    conditioned = spatial.condition_to_reference(base, metrics, 1.0)
    after = spatial.max_reference_tone_error_db(conditioned, metrics)
    assert after < before
    m = spatial.bank_metrics(conditioned, 48_000)
    for speaker in spatial.DIRECTION_PAIRS:
        want = metrics["directions"][speaker]["left_right_level_db"]
        got = m["directions"][speaker]["left_right_level_db"]
        assert abs(got - want) < 0.25, speaker
    # strength 0 only matches levels; partial strength lands in between.
    half = spatial.condition_to_reference(base, metrics, 0.5)
    mid = spatial.max_reference_tone_error_db(half, metrics)
    assert after < mid < before + 1e-9


@pytest.mark.heavy
def test_generate_v2_v3_sets(tmp_path):
    from airwave_tpu.tools import generate

    ref_bank = make_bank(seed=7)
    base_bank = make_bank(seed=8)
    ref_path = str(tmp_path / "ref.wav")
    base_path = str(tmp_path / "base.wav")
    wav_io.save(ref_path, ref_bank.T.astype(np.float32), 48_000)
    wav_io.save(base_path, base_bank.T.astype(np.float32), 48_000)

    manifest = generate.generate(ref_path, base_path, str(tmp_path / "out"),
                                 sets=("v2", "v3"), frames=4096)
    names = [v["name"] for v in manifest["variants"]]
    assert names == ["V2_D_tone50", "V2_D_tone75", "V2_D_tone100",
                     "V3_phase_diffuse_tone100"]
    for variant in manifest["variants"]:
        assert os.path.exists(tmp_path / "out" / variant["path"])
        assert "max_reference_tone_error_db" in variant["validation"]
    # V2 ladder: stronger tone matching -> smaller reference tone error.
    errors = [v["validation"]["max_reference_tone_error_db"]
              for v in manifest["variants"][:3]]
    assert errors[2] < errors[0]
    # V2 keeps D's spatial topology fixed: same delays at every strength.
    delays = [v["parameters"]["FL"]["delays"]
              for v in manifest["variants"][:3]]
    assert delays[0] == delays[1] == delays[2]
    # V3 preserves the base's interaural timing (no min-phase alignment).
    v3 = manifest["variants"][3]
    assert v3["tail_model"] == "velvet"
    assert v3["minimum_phase"] is False
