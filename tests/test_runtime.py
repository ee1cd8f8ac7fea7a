"""Runtime layer tests: pipeline lifecycle + controller state machine.

Ports of /root/reference/AirwaveTests/AudioPipelineTests.swift (acquire/unwind
ordering, failure injection at every point, retryable teardown, purpose-driven
behavior, the no-route/volume-mutation contract) and
AudioRuntimeControllerTests.swift (verification->processing promotion, probe
timing, stale-generation rejection, retry ladder, permission suppression,
sleep/wake, stability window, live-EQ fast path) using recording fakes and
virtual time.
"""

import inspect

import numpy as np
import pytest

from airwave_tpu.runtime import transport as transport_mod
from airwave_tpu.runtime.controller import AudioRuntimeController
from airwave_tpu.runtime.fakes import (
    EffectGraphFake,
    ProbePlayerFake,
    ProfilePreparerFake,
    RecordingTransport,
)
from airwave_tpu.runtime.pipeline import StreamPipeline
from airwave_tpu.runtime.scheduler import ManualScheduler
from airwave_tpu.runtime.state import (
    AudioRuntimeState,
    HealthCategory,
    Status,
)
from airwave_tpu.runtime.transport import (
    ErrorKind,
    OutputDeviceDescriptor,
    StreamFormat,
    TapPurpose,
    TransportError,
)

OUTPUT = OutputDeviceDescriptor(uid="dev-1", name="Speakers",
                                nominal_sample_rate=48_000.0)


def doubler(x):
    return np.asarray(x)[:, :2, :] * 2.0


# --- pipeline ------------------------------------------------------------------


def test_pipeline_acquire_order_and_stop_order():
    t = RecordingTransport(OUTPUT)
    p = StreamPipeline(t, doubler)
    p.start(OUTPUT, TapPurpose.PROCESSING)
    assert t.events == ["create_tap", "create_aggregate", "create_io", "start_io"]
    assert p.is_running
    p.stop()
    assert t.events[4:] == ["stop_io", "destroy_io", "destroy_aggregate",
                            "destroy_tap"]
    assert t.all_released
    p.stop()  # idempotent
    assert t.events[8:] == []


@pytest.mark.parametrize("point,expected_after", [
    ("create_tap", []),
    ("create_aggregate", ["destroy_tap"]),
    ("create_io", ["destroy_aggregate", "destroy_tap"]),
    ("start_io", ["destroy_io", "destroy_aggregate", "destroy_tap"]),
])
def test_pipeline_unwinds_exactly_acquired_resources(point, expected_after):
    t = RecordingTransport(OUTPUT)
    t.failure_point = point
    p = StreamPipeline(t, doubler)
    with pytest.raises(TransportError):
        p.start(OUTPUT, TapPurpose.PROCESSING)
    assert t.all_released
    idx = t.events.index(point)
    assert t.events[idx + 1:] == expected_after
    assert not p.has_resources


def test_pipeline_rejects_unsupported_output_and_format_mismatch():
    t = RecordingTransport(OUTPUT)
    p = StreamPipeline(t, doubler)
    with pytest.raises(TransportError) as exc:
        p.start(OutputDeviceDescriptor(uid="agg", is_aggregate=True),
                TapPurpose.PROCESSING)
    assert exc.value.kind == ErrorKind.UNSUPPORTED_OUTPUT

    t2 = RecordingTransport(OUTPUT, tap_format=StreamFormat(44_100.0, 2))
    p2 = StreamPipeline(t2, doubler)
    with pytest.raises(TransportError) as exc:
        p2.start(OUTPUT, TapPurpose.PROCESSING)
    assert exc.value.kind == ErrorKind.FORMAT_MISMATCH
    assert t2.all_released


def test_pipeline_failed_teardown_preserves_chain_for_retry():
    t = RecordingTransport(OUTPUT)
    p = StreamPipeline(t, doubler)
    p.start(OUTPUT, TapPurpose.PROCESSING)
    t.teardown_failures_remaining["stop_io"] = 1
    with pytest.raises(TransportError):
        p.stop()
    assert p.has_resources  # chain preserved
    p.stop()  # retry succeeds
    assert t.all_released


def test_pipeline_purpose_driven_callback_behavior():
    t = RecordingTransport(OUTPUT)
    signals = []
    p = StreamPipeline(t, doubler)
    p.start(OUTPUT, TapPurpose.VERIFICATION,
            verification_handler=lambda peak, n: signals.append((peak, n)))
    x = np.full((1, 2, 64), 0.25, np.float32)
    out = t.drive_callback(x)
    np.testing.assert_array_equal(out, 0)  # silent render, source audible
    assert signals == [(0.25, 64)]
    p.stop()

    p2 = StreamPipeline(t, doubler)
    p2.start(OUTPUT, TapPurpose.PROCESSING)
    out = t.drive_callback(x)
    np.testing.assert_allclose(out, 0.5)
    p2.stop()


def test_transport_protocol_has_no_route_or_volume_mutation():
    """Source-scanning contract (ref AudioPipelineTests.swift:268-274)."""
    source = inspect.getsource(transport_mod)
    defs = [line for line in source.splitlines() if line.strip().startswith("def ")]
    for forbidden in ("set_default_output", "setDefaultOutput", "set_volume",
                      "setVolume", "set_mute", "route_change"):
        assert not any(forbidden in d for d in defs), forbidden


# --- controller -----------------------------------------------------------------


class Harness:
    def __init__(self, capture_access="granted", output=OUTPUT):
        self.transport = RecordingTransport(output, capture_access=capture_access)
        self.scheduler = ManualScheduler()
        self.state = AudioRuntimeState()
        self.probe = ProbePlayerFake()
        self.preparer = ProfilePreparerFake()
        self.graph = EffectGraphFake()
        self.statuses = []
        self.state.observe(lambda s: self.statuses.append(s.status))
        self.controller = AudioRuntimeController(
            transport=self.transport,
            pipeline_factory=lambda: StreamPipeline(self.transport, doubler),
            effect_graph=self.graph,
            state=self.state,
            scheduler=self.scheduler,
            probe_player=self.probe,
        )
        self.controller.set_profile_preparer(self.preparer)

    def drive_signal(self, amplitude=0.5, frames=4096):
        x = np.full((1, 2, frames), amplitude, np.float32)
        return self.transport.drive_callback(x)


def test_launch_verifies_then_promotes_to_processing():
    h = Harness()
    h.controller.launch()
    assert h.state.status == Status.STARTING
    assert h.controller.pipeline.purpose == TapPurpose.VERIFICATION
    # Probe plays after 0.1 s.
    assert not h.probe.playing
    h.scheduler.advance(0.15)
    assert h.probe.playing
    # Sustained signal -> promotion.
    h.drive_signal()
    assert h.state.status == Status.PROCESSING
    assert h.controller.pipeline.purpose == TapPurpose.PROCESSING
    assert not h.probe.playing
    assert h.controller.capture_verified


def test_quiet_signal_does_not_verify():
    h = Harness()
    h.controller.launch()
    h.drive_signal(amplitude=1e-5)
    assert h.state.status == Status.STARTING
    # Silence resets the sustained run: two half-length loud bursts with
    # silence between never verify.
    h.drive_signal(amplitude=0.5, frames=1024)
    h.drive_signal(amplitude=0.0, frames=64)
    h.drive_signal(amplitude=0.5, frames=1024)
    assert h.state.status == Status.STARTING
    h.drive_signal(amplitude=0.5, frames=1024)
    assert h.state.status == Status.PROCESSING


def test_verification_timeout_schedules_retry_ladder_then_passthrough():
    h = Harness()
    h.controller.launch()
    ladder = [1, 2, 4, 8, 15]
    for expected_delay in ladder:
        h.scheduler.advance(2.5)  # timeout fires
        assert h.state.status == Status.RECOVERING
        assert any(
            i.category == HealthCategory.CAPTURE for i in h.state.health_issues
        )
        h.scheduler.advance(expected_delay)  # retry fires, restarts verification
        assert h.state.status == Status.STARTING
    h.scheduler.advance(2.5)  # 6th timeout: ladder exhausted
    assert h.state.status == Status.NATIVE_PASSTHROUGH
    assert any(
        i.category == HealthCategory.RECOVERY for i in h.state.health_issues
    )


def test_stale_preparation_completion_is_dropped():
    h = Harness()
    h.preparer.auto_complete = False
    h.controller.launch()
    assert len(h.preparer.pending) == 1
    h.controller.reprepare_current_output()  # bumps generation; re-prepares
    assert len(h.preparer.pending) == 2
    stale = h.preparer.pending.pop(0)
    stale(None)  # stale completion must not start a pipeline
    assert h.controller.pipeline is None
    h.preparer.pending.pop(0)(None)  # current completion starts it
    assert h.controller.pipeline is not None


def test_permission_denied_never_auto_retries():
    h = Harness(capture_access="denied")
    h.controller.launch()
    assert h.state.status == Status.NEEDS_PERMISSION
    assert h.scheduler.pending == []  # no retry scheduled
    # Granting via the request path resumes.
    h.controller.request_capture_access()
    h.transport.capture_access = "granted"
    h.transport.access_requests.pop()(True)
    assert h.state.status == Status.STARTING


def test_unsupported_output_is_native_passthrough_without_retry():
    bad = OutputDeviceDescriptor(uid="virt", is_virtual=True)
    h = Harness(output=bad)
    h.controller.launch()
    assert h.state.status == Status.NATIVE_PASSTHROUGH
    assert h.scheduler.pending == []


def test_pipeline_start_failure_retries_and_stability_resets_ladder():
    h = Harness()
    h.transport.failure_point = "start_io"
    h.controller.launch()
    assert h.state.status == Status.RECOVERING
    assert h.controller._retry_index == 1
    h.transport.failure_point = None
    h.scheduler.advance(1.0)  # retry 1 succeeds -> verification
    h.drive_signal()
    assert h.state.status == Status.PROCESSING
    h.scheduler.advance(30.0)  # stability window
    assert h.controller._retry_index == 0


def test_device_loss_grace_period():
    h = Harness()
    h.controller.launch()
    h.drive_signal()
    assert h.state.status == Status.PROCESSING
    events_before = len(h.transport.events)
    # Momentary loss restored within 1 s: nothing happens.
    h.transport.set_default_output_for_test(None)
    h.scheduler.advance(0.5)
    h.transport.set_default_output_for_test(OUTPUT)
    h.scheduler.advance(2.0)
    assert h.state.status == Status.PROCESSING
    assert len(h.transport.events) == events_before
    # Sustained loss tears down and reports unavailable.
    h.transport.set_default_output_for_test(None)
    h.transport.default_output = None
    h.scheduler.advance(1.1)
    assert h.state.status == Status.UNAVAILABLE


def test_sleep_wake_cycle():
    h = Harness()
    h.controller.launch()
    h.drive_signal()
    assert h.state.status == Status.PROCESSING
    h.controller.will_sleep()
    assert h.state.status == Status.INACTIVE
    assert h.transport.all_released
    h.controller.did_wake()
    # Capture already verified: goes straight to processing.
    assert h.state.status == Status.PROCESSING


def test_cleanup_retry_loop_preserves_and_finishes_teardown():
    h = Harness()
    h.controller.launch()
    h.drive_signal()
    h.transport.teardown_failures_remaining["stop_io"] = 2
    h.controller.will_sleep()
    assert not h.transport.all_released  # teardown failed, chain preserved
    h.scheduler.advance(1.0)  # first cleanup retry fails (1 remaining)
    assert not h.transport.all_released
    h.scheduler.advance(1.0)  # second retry succeeds
    assert h.transport.all_released


def test_live_equalizer_fast_path_does_not_restart_pipeline():
    h = Harness()
    h.controller.launch()
    h.drive_signal()
    events_before = len(h.transport.events)
    h.controller.update_readiness("equalizerTarget")
    assert len(h.graph.update_calls) == 1
    assert len(h.transport.events) == events_before  # no restart
    assert h.state.status == Status.PROCESSING


def test_render_failure_reports_pipeline_issue_and_recovers():
    h = Harness()
    h.controller.launch()
    h.drive_signal()
    h.controller.render_failure("io error")
    assert h.state.status == Status.RECOVERING
    assert any(
        i.category == HealthCategory.PIPELINE for i in h.state.health_issues
    )
    h.scheduler.advance(1.0)
    assert h.state.status == Status.STARTING or h.state.status == Status.PROCESSING


def test_terminate_stops_everything():
    h = Harness()
    h.controller.launch()
    h.drive_signal()
    h.controller.terminate()
    assert h.state.status == Status.INACTIVE
    assert h.transport.all_released
    h.controller.did_wake()  # no resurrection after terminate
    assert h.state.status == Status.INACTIVE


def test_promotion_survives_late_verification_signals():
    """The verification chain's signal handler can fire after promotion
    (the policy reports verified forever once tripped): late signals must
    be stale, not restart the processing pipeline."""
    h = Harness()
    h.controller.launch()
    h.drive_signal()
    assert h.state.status == Status.PROCESSING
    promoted = h.controller.pipeline
    h.drive_signal()  # late signal through the (new) io callback
    assert h.controller.pipeline is promoted  # no churn
    assert h.state.status == Status.PROCESSING


def test_retry_now_while_processing_does_not_leak_a_pipeline():
    """retry_now -> reconcile -> start must stop the running pipeline
    before starting its replacement; exactly one chain stays live."""
    h = Harness()
    h.controller.launch()
    h.drive_signal()
    assert h.state.status == Status.PROCESSING
    h.controller.retry_now()
    # Exactly one live io/tap/aggregate chain (the fake precondition
    # would also trip on mis-ordered teardown).
    assert len(h.transport.callbacks) == 1
    assert h.controller.pipeline is not None


def test_duplicate_device_loss_notifications_keep_one_grace_timer():
    """A second loss notification replaces (not orphans) the grace timer:
    a device restored within the window must not be torn down by a stale
    timer later."""
    h = Harness()
    h.controller.launch()
    h.drive_signal()
    running = h.controller.pipeline
    h.transport.set_default_output_for_test(None)
    h.transport.set_default_output_for_test(None)  # duplicate notification
    h.transport.set_default_output_for_test(OUTPUT)  # restored in time
    h.scheduler.advance(5.0)  # past any grace window
    assert h.controller.pipeline is running  # no spurious restart
    assert h.state.status == Status.PROCESSING


def test_failed_verification_teardown_defers_promotion():
    """If the verification chain's teardown fails, promotion must NOT
    stack a processing pipeline on the live tap: the chain goes to the
    cleanup-retry loop and the retry ladder restarts capture."""
    h = Harness()
    h.controller.launch()
    h.transport.teardown_failures_remaining["stop_io"] = 1
    h.drive_signal()
    assert h.state.status == Status.RECOVERING
    assert h.controller.pipeline is None  # nothing stacked on the live tap
    # Cleanup retry (1 s) releases the stuck chain; the retry ladder then
    # brings capture back up as a processing pipeline (already verified).
    h.scheduler.advance(1.0)
    assert h.state.status == Status.PROCESSING
    assert h.controller.pipeline.purpose == TapPurpose.PROCESSING
    # Exactly one chain is live: the stuck verification chain was retried
    # to completion, not orphaned.
    assert len(h.transport.callbacks) == 1
