"""Coordinator tests: device discovery + profile-driven preparation/routing
(ref DeviceProfileRuntimeCoordinatorTests, OutputDeviceDiscoveryCoordinatorTests)."""

import numpy as np

from airwave_tpu.assets.eq_library import EqualizerManager
from airwave_tpu.assets.hrir_library import HRIRManager
from airwave_tpu.assets.profiles import DeviceProfileManager
from airwave_tpu.assets.store import JSONStore
from airwave_tpu.graph.effect_graph import AudioEffectGraph
from airwave_tpu.graph.spatial_effect import SpatialEffect
from airwave_tpu.io import wav
from airwave_tpu.runtime.controller import AudioRuntimeController
from airwave_tpu.runtime.coordinators import (
    DeviceProfileRuntimeCoordinator,
    OutputDeviceDiscoveryCoordinator,
)
from airwave_tpu.runtime.fakes import ProbePlayerFake, RecordingTransport
from airwave_tpu.runtime.pipeline import StreamPipeline
from airwave_tpu.runtime.scheduler import ManualScheduler
from airwave_tpu.runtime.state import AudioRuntimeState, Status
from airwave_tpu.runtime.transport import OutputDeviceDescriptor

OUTPUT = OutputDeviceDescriptor(uid="dev-1", name="Speakers",
                                nominal_sample_rate=48_000.0)


def build_world(tmp_path):
    transport = RecordingTransport(OUTPUT)
    scheduler = ManualScheduler()
    state = AudioRuntimeState()

    profiles = DeviceProfileManager(JSONStore(str(tmp_path / "profiles.json")))
    eq = EqualizerManager(str(tmp_path / "eq"))
    hrir = HRIRManager(str(tmp_path / "hrir"))

    spatial = SpatialEffect(batch=1, sample_rate=48_000.0)
    graph = AudioEffectGraph(spatial)
    controller = AudioRuntimeController(
        transport=transport,
        pipeline_factory=lambda: StreamPipeline(transport, graph.process),
        effect_graph=graph,
        state=state,
        scheduler=scheduler,
        probe_player=ProbePlayerFake(),
    )
    coordinator = DeviceProfileRuntimeCoordinator(
        profiles, hrir, eq, controller, spatial
    )
    return locals()


def seed_presets(world, tmp_path):
    rng = np.random.default_rng(0)
    hrir_path = tmp_path / "set.wav"
    wav.save(str(hrir_path),
             (rng.standard_normal((14, 128)) * 0.1).astype(np.float32), 48_000)
    hrir_preset = world["hrir"].import_preset(str(hrir_path))
    eq_path = tmp_path / "p.txt"
    eq_path.write_text("Preamp: -3 dB\nFilter 1: ON PK Fc 100 Hz Gain 2 dB Q 1\n")
    eq_preset = world["eq"].import_preset(str(eq_path))
    return hrir_preset, eq_preset


def verify_capture(world):
    x = np.full((1, 2, 4096), 0.5, np.float32)
    world["transport"].drive_callback(x)


def test_discovery_pumps_inventory_into_profiles(tmp_path):
    w = build_world(tmp_path)
    discovery = OutputDeviceDiscoveryCoordinator(w["transport"], w["profiles"])
    discovery.launch()
    # Observation surfaces devices as available targets but does NOT
    # materialize profiles (ref: unsaved targets stay transient).
    assert [t.device_uid for t in w["profiles"].targets()
            if t.is_available] == ["dev-1"]
    assert w["profiles"].profile("dev-1") is None
    w["transport"].set_devices_for_test([
        OUTPUT, OutputDeviceDescriptor(uid="dev-2", name="Headset"),
    ])
    assert sorted(
        t.device_uid for t in w["profiles"].targets() if t.is_available
    ) == ["dev-1", "dev-2"]
    # First selection materializes the profile with the live metadata.
    w["profiles"].set_hrir_preset_id("dev-2", "some-preset")
    assert w["profiles"].profile("dev-2").name == "Headset"


def test_prepare_activates_profile_presets(tmp_path):
    w = build_world(tmp_path)
    hrir_preset, eq_preset = seed_presets(w, tmp_path)
    w["profiles"].set_hrir_preset_id(OUTPUT.uid, hrir_preset.id)
    w["profiles"].set_equalizer_preset_id(OUTPUT.uid, eq_preset.id)

    w["coordinator"].launch()
    verify_capture(w)
    assert w["state"].status == Status.PROCESSING
    assert w["spatial"].is_ready
    assert w["graph"].equalizer_active
    assert w["hrir"].active_preset_id == hrir_preset.id
    # Live render path produces binaural output through the activated preset.
    y = w["transport"].drive_callback(
        np.random.default_rng(1).standard_normal((1, 2, 512)).astype(np.float32) * 0.2
    )
    assert np.all(np.isfinite(y)) and y.shape == (1, 2, 512)


def test_prepare_without_profile_is_passthrough_ready(tmp_path):
    w = build_world(tmp_path)
    w["coordinator"].launch()
    verify_capture(w)
    assert w["state"].status == Status.PROCESSING
    assert not w["spatial"].is_ready
    assert not w["graph"].equalizer_active
    x = np.random.default_rng(0).standard_normal((1, 2, 64)).astype(np.float32)
    np.testing.assert_array_equal(w["transport"].drive_callback(x), x)


def test_equalizer_profile_change_uses_live_fast_path(tmp_path):
    w = build_world(tmp_path)
    hrir_preset, eq_preset = seed_presets(w, tmp_path)
    w["profiles"].set_hrir_preset_id(OUTPUT.uid, hrir_preset.id)
    w["coordinator"].launch()
    verify_capture(w)
    events_before = len(w["transport"].events)

    w["profiles"].set_equalizer_preset_id(OUTPUT.uid, eq_preset.id)
    assert len(w["transport"].events) == events_before  # no pipeline restart
    assert w["graph"].equalizer_active
    assert w["state"].status == Status.PROCESSING


def test_hrir_profile_change_triggers_full_reprepare(tmp_path):
    w = build_world(tmp_path)
    hrir_preset, _ = seed_presets(w, tmp_path)
    w["coordinator"].launch()
    verify_capture(w)
    events_before = len(w["transport"].events)

    w["profiles"].set_hrir_preset_id(OUTPUT.uid, hrir_preset.id)
    assert len(w["transport"].events) > events_before  # pipeline restarted
    assert w["hrir"].active_preset_id == hrir_preset.id
    assert w["spatial"].is_ready


def test_preparation_deferred_until_library_ready(tmp_path):
    w = build_world(tmp_path)
    hrir_preset, _ = seed_presets(w, tmp_path)
    w["profiles"].set_hrir_preset_id(OUTPUT.uid, hrir_preset.id)
    w["coordinator"].set_library_ready(False)
    w["coordinator"].launch()
    assert w["state"].status == Status.STARTING
    assert w["controller"].pipeline is None  # prepare held
    w["coordinator"].set_library_ready(True)
    assert w["controller"].pipeline is not None
    verify_capture(w)
    assert w["state"].status == Status.PROCESSING


def test_deleting_active_preset_clears_dangling_and_repreparares(tmp_path):
    w = build_world(tmp_path)
    hrir_preset, _ = seed_presets(w, tmp_path)
    w["profiles"].set_hrir_preset_id(OUTPUT.uid, hrir_preset.id)
    w["coordinator"].launch()
    verify_capture(w)
    assert w["spatial"].is_ready

    w["hrir"].delete_preset(hrir_preset.id)
    assert w["profiles"].hrir_preset_id(OUTPUT.uid) is None
    verify_capture(w)  # re-verify after restart
    assert w["state"].status == Status.PROCESSING
    assert not w["spatial"].is_ready  # fell back to passthrough


def test_config4_rate_mismatched_hrir_resampled_at_activation(tmp_path):
    """BASELINE config 4: a 44.1 kHz HRIR preset activated for a 48 kHz
    output gets resampled during preparation (ref HRIRManager.swift:389-399),
    and a mid-stream profile hot-swap keeps the pipeline processing."""
    w = build_world(tmp_path)
    rng = np.random.default_rng(3)
    audio_441 = (rng.standard_normal((14, 441)) * 0.2).astype(np.float32)
    path = tmp_path / "set441.wav"
    wav.save(str(path), audio_441, 44_100)
    preset = w["hrir"].import_preset(str(path))
    assert preset.sample_rate == 44_100

    w["profiles"].set_hrir_preset_id(OUTPUT.uid, preset.id)
    w["coordinator"].launch()
    verify_capture(w)
    assert w["state"].status == Status.PROCESSING
    renderer = w["hrir"].published_renderer
    assert renderer.sample_rate == 48_000.0
    # 441 taps at 44.1k -> 480 taps at 48k -> still 1 partition of 512,
    # but the resampled IR length is observable through the conv params.
    from airwave_tpu.ops.resample import resample_linear
    expected = resample_linear(audio_441[0], 44_100.0, 48_000.0)
    assert len(expected) == 480

    # Mid-stream hot-swap to a 48k preset; pipeline must keep processing.
    native = make_hrir_file_48k(tmp_path)
    preset2 = w["hrir"].import_preset(native)
    w["profiles"].set_hrir_preset_id(OUTPUT.uid, preset2.id)
    verify_capture(w)
    assert w["state"].status == Status.PROCESSING
    y = w["transport"].drive_callback(
        (rng.standard_normal((1, 2, 512)) * 0.2).astype(np.float32)
    )
    assert np.all(np.isfinite(y))


def make_hrir_file_48k(tmp_path):
    rng = np.random.default_rng(9)
    path = tmp_path / "set48.wav"
    wav.save(str(path),
             (rng.standard_normal((14, 256)) * 0.2).astype(np.float32),
             48_000)
    return str(path)
