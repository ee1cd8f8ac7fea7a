"""App-shell contracts: settings migration, onboarding, update model, launch
routing, presentation, and the render/demo CLI (ref ProductSurfaceTests /
UpdateStateModelTests patterns)."""

import json
import os

import numpy as np
import pytest

from airwave_tpu.assets.store import JSONStore
from airwave_tpu.runtime.state import (
    AudioRuntimeState,
    CaptureAccess,
    HealthCategory,
    RuntimeHealthIssue,
    Status,
)
from airwave_tpu.shell import presentation as pres
from airwave_tpu.shell import settings as shell_settings
from airwave_tpu.shell.app import main as app_main


def make_settings(tmp_path, name="settings.json"):
    return shell_settings.KeyValueSettings(JSONStore(str(tmp_path / name)))


def test_schema_v2_migration_runs_once_and_clears_legacy(tmp_path):
    settings = make_settings(tmp_path)
    for key in shell_settings.LEGACY_KEYS:
        settings.set(key, "legacy")
    login = shell_settings.NoopLaunchAtLogin()

    assert shell_settings.migrate_schema_v2(settings, login)
    assert login.enabled
    for key in shell_settings.LEGACY_KEYS:
        assert settings.get(key) is None
    assert settings.get(shell_settings.MARKER_KEY) is True

    login2 = shell_settings.NoopLaunchAtLogin()
    assert not shell_settings.migrate_schema_v2(settings, login2)
    assert not login2.enabled  # never re-runs


def test_onboarding_version_reset_and_flow(tmp_path):
    settings = make_settings(tmp_path)
    settings.set("Airwave.OnboardingV2.Version", 1)
    settings.set("Airwave.OnboardingV2.Completed", True)
    settings.set(shell_settings.LEGACY_CAPTURE_FAILURE_KEY, "stale")

    persistence = shell_settings.OnboardingPersistence(settings)
    assert persistence.checkpoint == shell_settings.OnboardingStep.WELCOME
    assert not persistence.is_complete  # version bump resets completion
    assert settings.get(shell_settings.LEGACY_CAPTURE_FAILURE_KEY) is None

    flow = shell_settings.OnboardingFlow(persistence)
    assert flow.advance() == shell_settings.OnboardingStep.SYSTEM_AUDIO
    assert flow.advance() == shell_settings.OnboardingStep.HRIR_PRESET
    assert flow.back() == shell_settings.OnboardingStep.SYSTEM_AUDIO
    flow.advance()
    flow.advance()
    assert flow.current == shell_settings.OnboardingStep.LIVE_HEALTH
    flow.advance()  # past the end completes
    assert persistence.is_complete

    # Persisted across a fresh instance at the same version.
    persistence2 = shell_settings.OnboardingPersistence(settings)
    assert persistence2.is_complete


def test_update_state_model_no_update_error_is_benign():
    model = pres.UpdateStateModel()
    model.began_checking()
    assert model.phase == pres.UpdatePhase.CHECKING
    model.finished(error_code=pres.NO_UPDATE_ERROR_CODE)
    assert model.phase == pres.UpdatePhase.CURRENT
    model.began_checking()
    model.found("2.1")
    assert model.phase == pres.UpdatePhase.AVAILABLE and model.version == "2.1"
    model.finished(error_code=None)  # success completion keeps the result
    assert model.phase == pres.UpdatePhase.AVAILABLE
    model.finished(error_code=42, message="network down")
    assert model.phase == pres.UpdatePhase.ERROR
    assert model.message == "network down"


def test_launch_routing_policy():
    route = pres.route_launch
    R, L = pres.LaunchRoute, pres.LaunchReason
    assert route(L.LOGIN_ITEM, False, False) == R.HEADLESS
    assert route(L.LOGIN_ITEM, True, False) == R.HEADLESS
    assert route(L.USER_OPEN, False, False) == R.SETUP
    assert route(L.USER_OPEN, False, True) == R.SETTINGS  # deferred
    assert route(L.USER_OPEN, True, False) == R.SETTINGS


def test_status_presentation_and_capture_guidance():
    state = AudioRuntimeState()
    state.publish(Status.PROCESSING)
    p = pres.present_status(state)
    assert p.title == "Processing" and p.severity == "ok"

    state.set_health_issue(
        HealthCategory.EQUALIZER,
        RuntimeHealthIssue(HealthCategory.EQUALIZER, "Equalizer line 3: bad"),
    )
    p = pres.present_status(state)
    assert p.severity == "warning"
    assert p.health_lines == ("Equalizer line 3: bad",)

    state.set_capture_access(CaptureAccess.DENIED)
    guidance = pres.capture_guidance(state)
    assert "privacy settings" in guidance

    state.publish(Status.NEEDS_PERMISSION)
    assert pres.present_status(state).severity == "error"


def test_render_cli_end_to_end(tmp_path, capsys):
    from airwave_tpu.assets.bundled import synthesize_hrir
    from airwave_tpu.io import wav

    hrir_path = str(tmp_path / "h.wav")
    wav.save(hrir_path, synthesize_hrir("neutral", 1024), 48_000)
    rng = np.random.default_rng(0)
    in_path = str(tmp_path / "in.wav")
    wav.save(in_path, (rng.standard_normal((2, 1500)) * 0.2).astype(np.float32),
             48_000)
    eq_path = tmp_path / "p.txt"
    eq_path.write_text("Preamp: -3 dB\nFilter 1: ON PK Fc 100 Hz Gain 2 dB Q 1\n")

    rc = app_main([
        "render", "--cpu", "--input", in_path, "--hrir", hrir_path,
        "--eq", str(eq_path), "--output-dir", str(tmp_path / "out"),
        "--block-size", "128",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    out_path = report["rendered"][0]
    rendered = wav.load(out_path)
    assert rendered.channel_count == 2
    assert rendered.frame_count == 1500
    assert np.any(rendered.audio != 0)
    assert np.all(np.isfinite(rendered.audio))


def test_demo_cli_reaches_processing(tmp_path, capsys):
    rc = app_main([
        "--data-dir", str(tmp_path / "data"),
        "demo", "--cpu", "--seconds", "0.2",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["status"] == "processing"
    assert report["spatial_ready"] is True
    assert report["output_peak"] > 0


def test_presets_cli(tmp_path, capsys):
    rc = app_main(["--data-dir", str(tmp_path / "d"), "presets", "seed"])
    assert rc == 0
    capsys.readouterr()
    rc = app_main(["--data-dir", str(tmp_path / "d"), "presets", "list"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Neutral" in out and "Vocal Booster" in out
