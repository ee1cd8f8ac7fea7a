"""Race-discipline soak tests: control-thread publication vs render loop.

The reference validates its lock-free protocols with real-thread contention
(ParametricEqualizerProcessorTests.swift:285-302) and enforces the rest by
construction. Here the render path is single-threaded by design (pure jitted
steps), so the race surface is host-side publication — exercised with real
threads under the GIL plus the explicit contention seam.

Also: the pure-logic taxonomy tests the reference keeps in
CoreAudioPlatformClientTests (error classification, capture-policy
thresholds).
"""

import threading
import time

import numpy as np

from airwave_tpu.config import DEFAULT_CONFIG
from airwave_tpu.graph.eq_processor import ParametricEqualizerProcessor
from airwave_tpu.io.apo import EqualizerDefinition
from airwave_tpu.runtime.controller import _classify
from airwave_tpu.runtime.state import HealthCategory, Status
from airwave_tpu.runtime.transport import (
    CaptureSignalPolicy,
    ErrorKind,
    TransportError,
)


def test_concurrent_publication_never_corrupts_render_output():
    """Control thread hammers set_target while the render loop processes;
    output must stay finite and every sample must lie between the min and max
    of the possible gain envelopes (unity .. +/-6 dB)."""
    processor = ParametricEqualizerProcessor(48_000)
    stop = threading.Event()
    publish_count = [0]

    def control():
        gains = [6.0, -6.0, 3.0, None]
        i = 0
        while not stop.is_set():
            target = gains[i % len(gains)]
            processor.set_target(
                EqualizerDefinition(preamp_db=target) if target is not None
                else None
            )
            publish_count[0] += 1
            i += 1
            time.sleep(0.0005)

    thread = threading.Thread(target=control)
    thread.start()
    try:
        lo = 10 ** (-6 / 20) - 1e-4
        hi = 10 ** (6 / 20) + 1e-4
        deadline = time.time() + 8.0
        while publish_count[0] < 10 and time.time() < deadline:
            left, right = processor.process(
                np.ones(128, np.float32), np.ones(128, np.float32)
            )
            assert np.all(np.isfinite(left)) and np.all(np.isfinite(right))
            assert np.all(left >= lo) and np.all(left <= hi)
            processor.drain_retired_states()
    finally:
        stop.set()
        thread.join()
    assert publish_count[0] >= 10  # the control thread really contended


def test_engine_survives_hrir_swaps_under_load():
    """Preset hot-swaps between blocks never produce non-finite output and
    always restart history cleanly (generation semantics)."""
    from airwave_tpu.assets import channel_maps as cm
    from airwave_tpu.graph.renderer import prepare_renderer
    from airwave_tpu.io.wav import WAVData
    from airwave_tpu.models.binaural import BinauralEngine

    rng = np.random.default_rng(0)
    block = 64
    renderers = [
        prepare_renderer(
            WAVData(48_000.0,
                    (rng.standard_normal((14, 60 + 100 * i)) * 0.2)
                    .astype(np.float32)),
            cm.STEREO, 48_000.0, block,
        )
        for i in range(3)
    ]
    engine = BinauralEngine(batch=2, sample_rate=48_000.0, block_size=block)
    for i in range(30):
        if i % 7 == 0:
            engine.set_renderer(renderers[(i // 7) % 3])
        if i % 11 == 0:
            engine.set_equalizer(EqualizerDefinition(preamp_db=float(i % 5)))
        x = (rng.standard_normal((2, 2, block)) * 0.3).astype(np.float32)
        y = engine.process_block(x)
        assert np.all(np.isfinite(y)), i


def test_error_classification_taxonomy():
    cases = {
        ErrorKind.PERMISSION_DENIED: (HealthCategory.PERMISSION, False,
                                      Status.NEEDS_PERMISSION),
        ErrorKind.UNSUPPORTED_OUTPUT: (HealthCategory.OUTPUT, False,
                                       Status.NATIVE_PASSTHROUGH),
        ErrorKind.TAP_CREATION_FAILED: (HealthCategory.CAPTURE, True,
                                        Status.RECOVERING),
        ErrorKind.FORMAT_MISMATCH: (HealthCategory.CAPTURE, True,
                                    Status.RECOVERING),
        ErrorKind.AGGREGATE_CREATION_FAILED: (HealthCategory.PIPELINE, True,
                                              Status.RECOVERING),
        ErrorKind.RENDER_FAILURE: (HealthCategory.PIPELINE, True,
                                   Status.RECOVERING),
        ErrorKind.DEVICE_LOST: (HealthCategory.OUTPUT, True,
                                Status.RECOVERING),
    }
    for kind, expected in cases.items():
        assert _classify(TransportError(kind)) == expected, kind


def test_capture_signal_policy_thresholds():
    policy = CaptureSignalPolicy()
    # Exactly at the amplitude threshold counts; just below resets.
    assert not policy.observe(DEFAULT_CONFIG.capture_min_amplitude, 2047)
    assert policy.observe(DEFAULT_CONFIG.capture_min_amplitude, 1)
    policy.reset()
    assert not policy.observe(DEFAULT_CONFIG.capture_min_amplitude, 2047)
    assert not policy.observe(9e-5, 64)  # below threshold resets the run
    assert not policy.observe(DEFAULT_CONFIG.capture_min_amplitude, 2047)
    assert policy.observe(1.0, 1)


def test_engine_eq_retargets_keep_working_past_two_transitions():
    """Regression (same root as the pool's): the live engine must drain
    the EQ retirement handoff per block, or the third and every later
    retarget is deferred forever."""
    from airwave_tpu.assets import channel_maps as cm
    from airwave_tpu.graph.renderer import prepare_renderer
    from airwave_tpu.io.wav import WAVData
    from airwave_tpu.models.binaural import BinauralEngine

    rng = np.random.default_rng(0)
    block = 64
    renderer = prepare_renderer(
        WAVData(48_000.0, (rng.standard_normal((14, 200)) * 0.2)
                .astype(np.float32)),
        cm.STEREO, 48_000.0, block,
    )
    engine = BinauralEngine(batch=2, sample_rate=48_000.0, block_size=block)
    engine.set_renderer(renderer)
    blocks_per_ramp = -(-960 // block) + 3
    for i in range(5):
        target = EqualizerDefinition(preamp_db=float(i + 1))
        engine.set_equalizer(target)
        for _ in range(blocks_per_ramp):
            x = (rng.standard_normal((2, 2, block)) * 0.3).astype(
                np.float32)
            engine.process_block(x)
        rt = engine.eq_runtime
        assert rt.active.definition == target, f"retarget {i} wedged"
        assert rt.pending_target is None and not rt.is_transitioning, i
