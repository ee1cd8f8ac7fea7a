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
    # Cross-phase leftovers clear: no stale version in the error state,
    # no stale error text after a later clean check.
    assert model.version is None
    model.began_checking()
    model.found_no_update()
    assert model.phase == pres.UpdatePhase.CURRENT
    assert model.message is None and model.version is None


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


def test_render_cli_714_input_drops_heights(tmp_path, capsys):
    """Config-6 through the CLI: a 12-channel 7.1.4 input renders via the
    height-less hesuvi14 map (tops dropped, reference activation
    semantics) on BOTH the graph path and the --throughput bake path, and
    the two agree past the EQ-less start."""
    from airwave_tpu.assets.bundled import synthesize_hrir
    from airwave_tpu.io import wav

    hrir_path = str(tmp_path / "h.wav")
    wav.save(hrir_path, synthesize_hrir("neutral", 1024), 48_000)
    rng = np.random.default_rng(4)
    in_path = str(tmp_path / "in12.wav")
    wav.save(in_path,
             (rng.standard_normal((12, 1024)) * 0.2).astype(np.float32),
             48_000)
    outs = {}
    for mode, extra in (("graph", []), ("throughput", ["--throughput"])):
        rc = app_main([
            "render", "--cpu", "--input", in_path, "--hrir", hrir_path,
            "--output-dir", str(tmp_path / f"out-{mode}"),
            "--block-size", "128", *extra,
        ])
        assert rc == 0
        report = json.loads(capsys.readouterr().out)
        assert report["layout"] == "7.1.4 Atmos"
        rendered = wav.load(report["rendered"][0])
        assert rendered.channel_count == 2
        assert np.any(rendered.audio != 0)
        assert np.all(np.isfinite(rendered.audio))
        outs[mode] = rendered.audio
    rel = np.sqrt(np.mean((outs["graph"] - outs["throughput"]) ** 2)) / (
        np.sqrt(np.mean(outs["throughput"] ** 2))
    )
    assert rel < 1e-5, rel


@pytest.mark.heavy
def test_serve_cli_builds_mesh_sharded_pool(tmp_path):
    """The serve CLI's --mesh-devices wiring: a pool built over N local
    devices serves a loopback client identically to the plain path."""
    import argparse
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    from airwave_tpu.assets.bundled import synthesize_hrir
    from airwave_tpu.io import wav
    from airwave_tpu.shell.app import build_serve_pool
    from airwave_tpu.shell.serve import RenderServer, render_via_server

    hrir_path = str(tmp_path / "h.wav")
    wav.save(hrir_path, synthesize_hrir("neutral", 1024), 48_000)
    args = argparse.Namespace(hrir=hrir_path, eq=None, layout="stereo",
                              sample_rate=48_000.0, max_streams=8,
                              mesh_devices=8)
    pool, layout = build_serve_pool(args)
    assert pool.mesh is not None and pool.mesh.size == 8
    srv = RenderServer(pool, port=0)
    srv.start()
    try:
        rng = np.random.default_rng(2)
        x = (rng.standard_normal((2, 3 * 512)) * 0.3).astype(np.float32)
        y = render_via_server(srv.address, x)
        assert y.shape == (2, 3 * 512)
        assert np.any(y != 0) and np.all(np.isfinite(y))
    finally:
        srv.stop()
    # Requesting more devices than visible fails loudly.
    args.mesh_devices = 10_000
    with pytest.raises(SystemExit):
        build_serve_pool(args)


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


# --- launch routing matrix, dedup, queueing, termination (VERDICT #9) -------


def test_launch_intent_classification_matrix():
    """Marker and trusted login-window sender both force the silent path;
    unknown event kinds produce no intent (ref ProductSurfaceTests:169-345)."""
    C, I, E = pres.classify_launch, pres.LaunchIntent, pres.LaunchEvent
    # Login-window sender: open AND reopen are both login-item launches.
    assert C(E("open", sender=pres.LOGIN_WINDOW_SENDER)) == I.LOGIN_ITEM_LAUNCH
    assert C(E("reopen", sender=pres.LOGIN_WINDOW_SENDER)) == I.LOGIN_ITEM_LAUNCH
    # Marker wins regardless of sender.
    assert C(E("open", sender="shell.terminal",
               login_item_marker=True)) == I.LOGIN_ITEM_LAUNCH
    # No marker, non-login sender: cold open / reopen by kind.
    assert C(E("open", sender="shell.terminal")) == I.USER_COLD_OPEN
    assert C(E("reopen", sender=None)) == I.USER_REOPEN
    # Unknown kinds produce no intent at all.
    assert C(E("open-documents", login_item_marker=True)) is None
    assert C(E("quit")) is None


def test_window_action_full_matrix():
    """Every intent x completion x deferral combination; menu-bar state is
    deliberately absent from the policy (routing is independent of it)."""
    A, I, W = pres.window_action, pres.LaunchIntent, pres.WindowAction
    for complete in (False, True):
        for deferred in (False, True):
            assert A(I.LOGIN_ITEM_LAUNCH, complete, deferred) == W.NONE
    for intent in (I.USER_COLD_OPEN, I.USER_REOPEN):
        assert A(intent, False, False) == W.SETUP
        assert A(intent, False, True) == W.SETTINGS   # deferred setup
        assert A(intent, True, False) == W.SETTINGS
        assert A(intent, True, True) == W.SETTINGS


def test_launch_coordinator_dedup_same_delivery_allows_later_events():
    """Same delivery token presents at most once — even when onboarding
    state changes between deliveries; a NEW token presents again."""
    coord = pres.LaunchWindowCoordinator()
    I, W = pres.LaunchIntent, pres.WindowAction
    assert coord.action(I.USER_COLD_OPEN, False, delivery_id="d1") == W.SETUP
    assert coord.action(I.USER_COLD_OPEN, False, delivery_id="d1") == W.NONE
    assert coord.action(I.USER_REOPEN, True, delivery_id="d2") == W.SETTINGS
    assert coord.action(I.USER_REOPEN, True, delivery_id="d2") == W.NONE
    # A later reopen (fresh token) presents against the CURRENT state.
    assert coord.action(I.USER_REOPEN, False, delivery_id="d3") == W.SETUP
    assert coord.action(I.USER_REOPEN, True, delivery_id="d3") == W.NONE


def test_launch_coordinator_queues_until_ready_and_login_item_stays_silent():
    coord = pres.LaunchWindowCoordinator()
    I, W = pres.LaunchIntent, pres.WindowAction
    assert coord.action(I.LOGIN_ITEM_LAUNCH, True, ready=False,
                        delivery_id="a") == W.NONE
    assert coord.action(I.USER_REOPEN, True, ready=False,
                        delivery_id="b") == W.NONE
    drained = coord.drain_pending_actions(setup_complete=True)
    assert drained == [
        pres.PendingLaunchAction(I.LOGIN_ITEM_LAUNCH, W.NONE),
        pres.PendingLaunchAction(I.USER_REOPEN, W.SETTINGS),
    ]
    # The queue drains once.
    assert coord.drain_pending_actions(setup_complete=True) == []
    # Queued intents resolve against the state AT DRAIN TIME.
    coord.action(I.USER_COLD_OPEN, True, ready=False, delivery_id="c")
    drained = coord.drain_pending_actions(setup_complete=False)
    assert drained == [pres.PendingLaunchAction(I.USER_COLD_OPEN, W.SETUP)]


def test_termination_policy_matrix():
    """Unprepared termination cancelled; update relaunch authorizes exactly
    one reply without requesting termination; explicit quit terminates once
    and allows the following reply."""
    calls = []
    app = pres.ApplicationLifecycle(terminate=lambda: calls.append(1))
    R = pres.TerminationReply
    # Unsolicited request: cancelled, nothing terminated.
    assert app.termination_reply() == R.CANCEL
    assert app.terminate_call_count == 0
    # Update relaunch: authorized once, no termination requested by us.
    app.begin_update_relaunch_termination()
    assert app.termination_reply() == R.NOW
    assert app.terminate_call_count == 0
    assert app.termination_reply() == R.CANCEL  # one-shot
    # Explicit quit: we request termination once and allow the reply.
    app.request_explicit_quit()
    assert app.terminate_call_count == 1 and calls == [1]
    assert app.termination_reply() == R.NOW
    assert app.termination_reply() == R.CANCEL


def test_onboarding_deferral_relaunch_and_version_bump_resume(tmp_path):
    """Deferred onboarding survives a relaunch (user opens route to
    settings); a version bump clears deferral AND completion so the next
    open routes back to setup (ref onboarding gates + v2 migration)."""
    settings = make_settings(tmp_path)
    persistence = shell_settings.OnboardingPersistence(settings)
    flow = shell_settings.OnboardingFlow(persistence)
    flow.advance()          # WELCOME -> SYSTEM_AUDIO
    flow.defer()
    assert persistence.is_deferred and not persistence.is_complete

    # Relaunch at the same version: deferral persists, checkpoint resumes.
    p2 = shell_settings.OnboardingPersistence(settings)
    assert p2.is_deferred
    assert p2.checkpoint == shell_settings.OnboardingStep.SYSTEM_AUDIO
    assert pres.route_launch(
        pres.LaunchReason.USER_OPEN, p2.is_complete, p2.is_deferred
    ) == pres.LaunchRoute.SETTINGS

    # Version bump: everything resets; user opens route to setup again.
    settings.set("Airwave.OnboardingV2.Version", 999)
    p3 = shell_settings.OnboardingPersistence(settings)
    assert not p3.is_deferred and not p3.is_complete
    assert p3.checkpoint == shell_settings.OnboardingStep.WELCOME
    assert pres.route_launch(
        pres.LaunchReason.USER_OPEN, p3.is_complete, p3.is_deferred
    ) == pres.LaunchRoute.SETUP


def test_completed_onboarding_survives_relaunch_but_not_version_bump(tmp_path):
    settings = make_settings(tmp_path)
    persistence = shell_settings.OnboardingPersistence(settings)
    shell_settings.OnboardingFlow(persistence).complete()
    assert shell_settings.OnboardingPersistence(settings).is_complete
    settings.set("Airwave.OnboardingV2.Version", 999)
    assert not shell_settings.OnboardingPersistence(settings).is_complete


def test_render_cli_throughput_mode_matches_graph_past_ramp(tmp_path, capsys):
    """--throughput routes through the device-resident lookahead bake;
    output matches the graph path exactly once the EQ activation ramp has
    played out (the documented difference)."""
    from airwave_tpu.assets.bundled import synthesize_hrir
    from airwave_tpu.io import wav

    hrir_path = str(tmp_path / "h.wav")
    wav.save(hrir_path, synthesize_hrir("neutral", 1024), 48_000)
    rng = np.random.default_rng(1)
    in_path = str(tmp_path / "in.wav")
    n = 4096
    wav.save(in_path, (rng.standard_normal((2, n)) * 0.2).astype(np.float32),
             48_000)
    eq_path = tmp_path / "p.txt"
    eq_path.write_text("Preamp: -3 dB\nFilter 1: ON PK Fc 100 Hz Gain 2 dB Q 1\n")

    outs = {}
    for name, extra in (("graph", []), ("throughput", ["--throughput"])):
        rc = app_main([
            "render", "--cpu", "--input", in_path, "--hrir", hrir_path,
            "--eq", str(eq_path), "--output-dir",
            str(tmp_path / f"out_{name}"), "--block-size", "128",
        ] + extra)
        assert rc == 0
        report = json.loads(capsys.readouterr().out)
        outs[name] = wav.load(report["rendered"][0]).audio
        if name == "throughput":
            assert report["profile"]["mode"] == "throughput"
    ramp = 960 + 128  # 20 ms transition + one block of skew
    a, b = outs["graph"][:, ramp:], outs["throughput"][:, ramp:]
    err = np.sqrt(np.mean((a - b) ** 2)) / np.sqrt(np.mean(a**2))
    assert err < 1e-5, err


def test_render_cli_throughput_eq_failure_is_nonfatal(tmp_path, capsys):
    """An EQ preset that parses but fails coefficient design (Fc above
    Nyquist) must stay a non-fatal warning on the throughput path too —
    spatial continues without the EQ, matching the graph path's contract
    (ref AudioEffectGraph.swift:103-137)."""
    from airwave_tpu.assets.bundled import synthesize_hrir
    from airwave_tpu.io import wav

    hrir_path = str(tmp_path / "h.wav")
    wav.save(hrir_path, synthesize_hrir("neutral", 1024), 48_000)
    rng = np.random.default_rng(2)
    in_path = str(tmp_path / "in.wav")
    wav.save(in_path,
             (rng.standard_normal((2, 1024)) * 0.2).astype(np.float32),
             48_000)
    eq_path = tmp_path / "bad.txt"
    eq_path.write_text(
        "Preamp: -3 dB\nFilter 1: ON PK Fc 40000 Hz Gain 2 dB Q 1\n"
    )

    rc = app_main([
        "render", "--cpu", "--throughput", "--input", in_path,
        "--hrir", hrir_path, "--eq", str(eq_path),
        "--output-dir", str(tmp_path / "out"), "--block-size", "128",
    ])
    assert rc == 0
    captured = capsys.readouterr()
    report = json.loads(captured.out)
    assert report["equalizer"] is False
    assert "warning" in captured.err
    audio = wav.load(report["rendered"][0]).audio
    assert np.isfinite(audio).all() and np.abs(audio).max() > 1e-4


def test_render_cli_multiple_inputs_with_eq(tmp_path, capsys):
    """Multi-input renders share one batched device step; with --eq the
    graph must be built at the input batch size (regression: batch=1 EQ
    against a batch=2 render crashed on the first block)."""
    from airwave_tpu.assets.bundled import synthesize_hrir
    from airwave_tpu.io import wav

    hrir_path = str(tmp_path / "h.wav")
    wav.save(hrir_path, synthesize_hrir("neutral", 1024), 48_000)
    rng = np.random.default_rng(6)
    paths = []
    for name in ("a", "b"):
        p = str(tmp_path / f"{name}.wav")
        wav.save(p, (rng.standard_normal((2, 700)) * 0.2).astype(np.float32),
                 48_000)
        paths.append(p)
    eq_path = tmp_path / "p.txt"
    eq_path.write_text("Preamp: -3 dB\nFilter 1: ON PK Fc 120 Hz Gain 2 dB Q 1\n")

    rc = app_main([
        "render", "--cpu", "--input", paths[0], "--input", paths[1],
        "--hrir", hrir_path, "--eq", str(eq_path),
        "--output-dir", str(tmp_path / "out"), "--block-size", "128",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert len(report["rendered"]) == 2 and report["equalizer"] is True
    for out_path in report["rendered"]:
        audio = wav.load(out_path).audio
        assert np.isfinite(audio).all() and np.abs(audio).max() > 1e-4


def test_render_cli_unparseable_eq_is_nonfatal(tmp_path, capsys):
    """A preset that fails to PARSE (not just design) warns and renders
    spatial-only — same non-fatal contract as design failures."""
    from airwave_tpu.assets.bundled import synthesize_hrir
    from airwave_tpu.io import wav

    hrir_path = str(tmp_path / "h.wav")
    wav.save(hrir_path, synthesize_hrir("neutral", 1024), 48_000)
    in_path = str(tmp_path / "in.wav")
    wav.save(in_path, np.ones((2, 512), np.float32) * 0.2, 48_000)
    eq_path = tmp_path / "broken.txt"
    eq_path.write_text("this is not an EqualizerAPO file\n")

    rc = app_main([
        "render", "--cpu", "--input", in_path, "--hrir", hrir_path,
        "--eq", str(eq_path), "--output-dir", str(tmp_path / "out"),
        "--block-size", "128",
    ])
    assert rc == 0
    captured = capsys.readouterr()
    assert "warning" in captured.err
    assert json.loads(captured.out)["equalizer"] is False


@pytest.mark.heavy
def test_serve_cli_builds_multiblock_pool(tmp_path):
    """--blocks-per-step wiring: the CLI prepares the renderer with the
    matching lookahead and the pool serves a loopback client through the
    throughput tier. Args come through the REAL argparse parser so the
    flag registration itself is covered."""
    from airwave_tpu.assets.bundled import synthesize_hrir
    from airwave_tpu.io import wav
    from airwave_tpu.shell.app import build_parser, build_serve_pool
    from airwave_tpu.shell.serve import RenderServer, render_via_server

    hrir_path = str(tmp_path / "h.wav")
    wav.save(hrir_path, synthesize_hrir("neutral", 1024), 48_000)
    args = build_parser().parse_args([
        "serve", "--hrir", hrir_path, "--max-streams", "4",
        "--blocks-per-step", "2",
    ])
    pool, _layout = build_serve_pool(args)
    assert pool.blocks_per_step == 2
    assert pool.renderer.lookahead == 2
    srv = RenderServer(pool, port=0)
    srv.start()
    try:
        rng = np.random.default_rng(3)
        x = (rng.standard_normal((2, 2 * 512 + 37)) * 0.3).astype(np.float32)
        y = render_via_server(srv.address, x)
        assert y.shape == x.shape
        assert np.any(y != 0) and np.all(np.isfinite(y))
    finally:
        srv.stop()
