"""Frame adapter, spatial effect, and effect-graph composition tests.

Ports of /root/reference/AirwaveTests/RealtimeAudioProcessorTests.swift
(latency contract, mixed sizes, reset, mono dup) and
AudioEffectGraphTests.swift (ordering, passthrough, nonfatal warnings,
Nyquist rejection, unity-crossfade retention).
"""

import numpy as np
import pytest

from airwave_tpu.assets import channel_maps as cm
from airwave_tpu.graph.effect_graph import (
    EQUALIZER,
    SPATIAL,
    AudioEffectGraph,
    EqualizerEffect,
)
from airwave_tpu.graph.frame_adapter import FrameAdapter
from airwave_tpu.graph.renderer import prepare_renderer
from airwave_tpu.graph.spatial_effect import SpatialEffect
from airwave_tpu.io.apo import EqualizerDefinition, EqualizerFilter, FilterType
from airwave_tpu.io.wav import WAVData
from airwave_tpu.oracle.upols_oracle import UPOLSOracle


def identity_render(block):
    """Stand-in for identity-impulse conv engines (ref tests use stubs)."""
    return block[:, :2, :]


def make_identity_renderer(sample_rate=48_000.0, block_size=512):
    """RendererState with identity-impulse HRIRs for stereo."""
    audio = np.zeros((14, 8), np.float32)
    # hesuvi14: FL=(left 0, right 1), FR=(left 8, right 7). Identity direct
    # paths (FL->left ear, FR->right ear), silent cross paths.
    audio[0, 0] = 1.0
    audio[7, 0] = 1.0
    wav = WAVData(sample_rate=sample_rate, audio=audio)
    return prepare_renderer(wav, cm.STEREO, sample_rate, block_size)


def test_adapter_latency_contract_384_zeros_at_128():
    """128-frame callbacks against a 512 block: exactly 384 leading zeros then
    unity passthrough (ref RealtimeAudioProcessorTests.swift:68-78)."""
    adapter = FrameAdapter(identity_render, batch=1, in_channels=2,
                           block_size=512, max_frames_per_callback=4096)
    n_total = 2048
    x = np.arange(1, n_total + 1, dtype=np.float32)[None, None, :].repeat(2, 1)
    outs = []
    for i in range(0, n_total, 128):
        outs.append(adapter.process(x[:, :, i:i + 128]))
    y = np.concatenate(outs, axis=-1)[0, 0]
    assert np.all(y[:384] == 0)
    np.testing.assert_array_equal(y[384:], x[0, 0, : n_total - 384])


def test_adapter_mixed_callback_sizes_all_finite_and_aligned():
    adapter = FrameAdapter(identity_render, batch=2, in_channels=2,
                           block_size=512, max_frames_per_callback=4096)
    rng = np.random.default_rng(0)
    sizes = [1, 7, 128, 512, 1024, 333, 4096, 64, 2048]
    total = sum(sizes)
    x = rng.standard_normal((2, 2, total)).astype(np.float32)
    outs, off = [], 0
    for s in sizes:
        outs.append(adapter.process(x[:, :, off:off + s]))
        off += s
    y = np.concatenate(outs, axis=-1)
    assert y.shape == (2, 2, total)
    assert np.all(np.isfinite(y))
    # Underflow zero-fill may occur mid-stream (deliberate, ref
    # RealtimeAudioProcessor.swift:76); with exact passthrough rendering the
    # non-zero samples must be the input sequence, in order, unmodified.
    nonzero = y[0, 0][y[0, 0] != 0]
    np.testing.assert_array_equal(nonzero, x[0, 0, : len(nonzero)])
    assert len(nonzero) >= total - 512 - 333  # bounded cumulative underflow


def test_adapter_block_multiple_callbacks_have_zero_block_lag_after_first():
    adapter = FrameAdapter(identity_render, batch=1, in_channels=2,
                           block_size=512, max_frames_per_callback=4096)
    x = np.ones((1, 2, 512), np.float32)
    y = adapter.process(x)
    np.testing.assert_array_equal(y, x[:, :2])


def test_adapter_reset():
    adapter = FrameAdapter(identity_render, batch=1, in_channels=2,
                           block_size=512, max_frames_per_callback=4096)
    adapter.process(np.ones((1, 2, 300), np.float32))
    adapter.reset()
    y = adapter.process(np.zeros((1, 2, 512), np.float32))
    np.testing.assert_array_equal(y, 0)


def test_spatial_effect_identity_hrir_roundtrip_and_mono_dup():
    effect = SpatialEffect(batch=1, sample_rate=48_000)
    assert not effect.is_ready
    effect.set_renderer(make_identity_renderer())
    assert effect.is_ready

    x = np.random.default_rng(1).standard_normal((1, 2, 512)).astype(np.float32)
    y = effect.process(x)
    np.testing.assert_allclose(y, x, atol=1e-4)

    effect.reset()
    mono = np.ones((1, 1, 512), np.float32)
    y = effect.process(mono)
    np.testing.assert_allclose(y[:, 0], 1.0, atol=1e-4)
    np.testing.assert_allclose(y[:, 1], 1.0, atol=1e-4)


def test_spatial_effect_end_to_end_vs_oracle_with_real_shaped_hrir():
    rng = np.random.default_rng(5)
    sample_rate, block = 48_000.0, 512
    audio = (rng.standard_normal((14, 700)) * 0.2).astype(np.float32)
    wav = WAVData(sample_rate=sample_rate, audio=audio)
    renderer = prepare_renderer(wav, cm.STEREO, sample_rate, block)
    effect = SpatialEffect(batch=1, sample_rate=sample_rate, block_size=block)
    effect.set_renderer(renderer)

    n = 4 * block
    x = rng.standard_normal((1, 2, n)).astype(np.float32)
    y = effect.process(x)  # one call, multiple of block: zero extra lag

    fl, fr = cm.hesuvi_14_channel(cm.STEREO.channels).indices(cm.FL), \
             cm.hesuvi_14_channel(cm.STEREO.channels).indices(cm.FR)
    ref = np.zeros((2, n))
    for (speaker_in, (li, ri)) in ((0, fl), (1, fr)):
        for ear, ch in ((0, li), (1, ri)):
            o = UPOLSOracle(audio[ch], block)
            ref[ear] += np.concatenate(
                [o.process(x[0, speaker_in, i * block:(i + 1) * block])
                 for i in range(4)]
            )
    err = np.sqrt(np.mean((y[0] - ref) ** 2)) / np.sqrt(np.mean(ref ** 2))
    assert err < 1e-5


class FakeSpatial:
    """Spy spatial effect (ref AudioEffectGraphTests uses spy effects)."""

    def __init__(self, ready=True, gain=2.0):
        self.is_ready = ready
        self.gain = gain
        self.calls = 0

    def process(self, x):
        self.calls += 1
        return x[:, :2, :] * self.gain


def test_graph_orders_spatial_then_eq():
    graph = AudioEffectGraph(FakeSpatial(gain=2.0))
    definition = EqualizerDefinition(preamp_db=6.0)
    result = graph.prepare(48_000, definition)
    assert result.runnable_effects == {SPATIAL, EQUALIZER}
    assert result.equalizer_warning is None

    # Past the crossfade, output = input * 2 (spatial) * 2 (eq 6dB).
    x = np.ones((1, 2, 960), np.float32)
    graph.process(x)
    y = graph.process(x)
    gain = 10 ** (6 / 20)
    np.testing.assert_allclose(y, 2.0 * gain, rtol=1e-5)


def test_graph_passthrough_and_mono_duplication():
    graph = AudioEffectGraph(FakeSpatial(ready=False))
    result = graph.prepare(48_000, None)
    assert result.no_effect_can_run
    x = np.random.default_rng(0).standard_normal((1, 2, 64)).astype(np.float32)
    np.testing.assert_array_equal(graph.process(x), x)
    mono = np.ones((1, 1, 64), np.float32)
    y = graph.process(mono)
    np.testing.assert_array_equal(y[:, 0], y[:, 1])


def test_graph_eq_failure_is_nonfatal_line_numbered_warning():
    graph = AudioEffectGraph(FakeSpatial(ready=True))
    nyquist_bad = EqualizerDefinition(
        filters=(EqualizerFilter(7, None, True, FilterType.PEAKING, 24_000, 1, 1),)
    )
    result = graph.prepare(48_000, nyquist_bad)
    assert result.runnable_effects == {SPATIAL}
    assert result.equalizer_warning is not None
    assert result.equalizer_warning.filter_line == 7
    # Graph still processes via spatial only.
    y = graph.process(np.ones((1, 2, 8), np.float32))
    np.testing.assert_allclose(y, 2.0)


def test_graph_update_keeps_unity_crossfade_after_invalid_live_target():
    graph = AudioEffectGraph(FakeSpatial(ready=False))
    graph.prepare(48_000, EqualizerDefinition(preamp_db=6.0))
    graph.process(np.ones((1, 2, 960), np.float32))  # settle ramp

    bad = EqualizerDefinition(
        filters=(EqualizerFilter(3, None, True, FilterType.PEAKING, 30_000, 1, 1),)
    )
    result = graph.update_equalizer(bad)
    assert result.equalizer_warning is not None
    assert result.equalizer_warning.filter_line == 3
    assert graph.equalizer_active  # kept in path for the unity ramp
    # Fallback target is unity: output ramps back toward 1.
    y = graph.process(np.ones((1, 2, 960), np.float32))
    assert abs(y[0, 0, -1] - 1.0) < 1e-5


def test_graph_update_to_none_keeps_processor_for_unity_ramp():
    graph = AudioEffectGraph(FakeSpatial(ready=False))
    graph.prepare(48_000, EqualizerDefinition(preamp_db=6.0))
    graph.process(np.ones((1, 2, 960), np.float32))
    result = graph.update_equalizer(None)
    assert result.equalizer_warning is None
    assert graph.equalizer_active
    y = graph.process(np.ones((1, 2, 960), np.float32))
    gain = 10 ** (6 / 20)
    assert abs(y[0, 0, 0] - (gain - (gain - 1) / 960)) < 1e-4
    assert abs(y[0, 0, -1] - 1.0) < 1e-5


@pytest.mark.parametrize("batch", [1, 2])
def test_graph_update_before_prepare_does_not_arm_missing_eq(batch):
    """Regression: update_equalizer on a never-prepared graph must stay a
    non-fatal warning — the except path used to force equalizer_active=True
    (the unity-ramp retention), which armed an assert-crash in process()
    on the missing processors/runtime. Retention applies only when an EQ
    was ever prepared."""
    graph = AudioEffectGraph(FakeSpatial(ready=False), batch=batch)
    result = graph.update_equalizer(EqualizerDefinition(preamp_db=3.0))
    assert result.equalizer_warning is not None
    assert not graph.equalizer_active
    x = np.ones((batch, 2, 64), np.float32)
    np.testing.assert_array_equal(graph.process(x), x)  # passthrough, no crash


def test_graph_batched_eq_state_is_per_stream():
    """Regression: with B>1, EQ filter state and crossfade progress must be
    per-stream (a shared processor would advance stream 1's ramp while
    rendering stream 0 and leak z-state across streams)."""
    graph = AudioEffectGraph(FakeSpatial(ready=False), batch=2)
    graph.prepare(48_000, EqualizerDefinition(preamp_db=6.0))
    gain = 10 ** (6 / 20)
    x = np.ones((2, 2, 960), np.float32)
    y = graph.process(x)
    # Both streams see the SAME ramp: sample 0 at 1+(g-1)/960, sample 959 at g.
    for b in range(2):
        assert abs(y[b, 0, 0] - (1 + (gain - 1) / 960)) < 1e-5
        assert abs(y[b, 0, -1] - gain) < 1e-5
    # And identical inputs produce identical outputs across streams.
    np.testing.assert_array_equal(y[0], y[1])


def test_config3_surround71_downmix_matches_oracle():
    """BASELINE config 3: 7.1 input through the 14-channel HeSuVi map —
    per-speaker conv (LFE shares the FC pair) + stereo downmix — vs the
    f64 oracle."""
    rng = np.random.default_rng(11)
    sample_rate, block = 48_000.0, 128
    audio = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
    renderer = prepare_renderer(WAVData(sample_rate, audio), cm.SURROUND_7_1,
                                sample_rate, block)
    assert renderer.num_speakers == 8
    effect = SpatialEffect(batch=1, sample_rate=sample_rate, block_size=block)
    effect.set_renderer(renderer)

    n = 6 * block
    x = (rng.standard_normal((1, 8, n)) * 0.25).astype(np.float32)
    y = effect.process(x)

    channel_map = cm.hesuvi_14_channel(cm.SURROUND_7_1.channels)
    ref = np.zeros((2, n))
    for spk_idx, speaker in enumerate(cm.SURROUND_7_1.channels):
        li, ri = channel_map.indices(speaker)
        for ear, ch in ((0, li), (1, ri)):
            o = UPOLSOracle(audio[ch], block)
            ref[ear] += np.concatenate(
                [o.process(x[0, spk_idx, i * block:(i + 1) * block])
                 for i in range(6)]
            )
    err = np.sqrt(np.mean((y[0] - ref) ** 2)) / np.sqrt(np.mean(ref ** 2))
    assert err < 1e-5, err
    # FC and LFE share the (6, 13) HRIR pair (ref VirtualSpeaker.swift:280-283).
    assert channel_map.indices(cm.FC) == channel_map.indices(cm.LFE) == (6, 13)


def test_device_equalizer_matches_host_rows():
    """Host-vs-device differential: the batched device EQ must match B
    independent host f64 processors on the same callbacks — including a
    mid-stream retarget ramp and a mixed callback-size sequence."""
    from airwave_tpu.graph.effect_graph import (
        DeviceEqualizerEffect, EqualizerEffect,
    )

    rng = np.random.default_rng(5)
    B = 3
    host = EqualizerEffect(batch=B)
    device = DeviceEqualizerEffect(batch=B)
    first = EqualizerDefinition(
        preamp_db=-2.0,
        filters=(EqualizerFilter(1, None, True, FilterType.PEAKING,
                                 1000.0, 4.0, 1.1),),
    )
    second = EqualizerDefinition(
        preamp_db=1.0,
        filters=(EqualizerFilter(1, None, True, FilterType.HIGH_SHELF,
                                 4000.0, -3.0, 0.8),),
    )
    host.prepare(first, 48_000.0)
    device.prepare(first, 48_000.0)

    # Retarget lands after the initial ramp (960 frames at 48 kHz) has
    # completed on both paths — queued mid-ramp retargets carry the
    # documented <=1-block start skew, pinned separately below.
    sizes = (512, 512, 128, 512, 37, 512, 491)
    retarget_at = 3
    for i, n in enumerate(sizes):
        if i == retarget_at:
            host.set_target(second)
            device.set_target(second)
        x = (rng.standard_normal((B, 2, n)) * 0.4).astype(np.float32)
        got = device.process_batch(x)
        want = np.empty_like(x)
        for b in range(B):
            want[b, 0], want[b, 1] = host.process(x[b, 0], x[b, 1], stream=b)
        err = np.sqrt(np.mean((got - want) ** 2)) / max(
            np.sqrt(np.mean(want**2)), 1e-12
        )
        assert err < 1e-5, (i, n, err)


def test_graph_batched_runs_one_device_step_per_block(monkeypatch):
    """VERDICT #5 done-criterion: the live graph at B>1 routes EQ through
    ONE device step per callback, not a per-stream host loop."""
    from airwave_tpu.graph import effect_graph as eg

    graph = AudioEffectGraph(FakeSpatial(ready=False), batch=16)
    assert isinstance(graph.equalizer, eg.DeviceEqualizerEffect)
    graph.prepare(48_000, EqualizerDefinition(preamp_db=6.0))

    calls = {"n": 0}
    orig = eg.DeviceEqualizerEffect.process_batch

    def counting(self, y):
        calls["n"] += 1
        return orig(self, y)

    monkeypatch.setattr(eg.DeviceEqualizerEffect, "process_batch", counting)
    x = np.ones((16, 2, 512), np.float32)
    graph.process(x)
    graph.process(x)
    assert calls["n"] == 2  # one device step per callback, any batch size


def test_eq_retarget_skew_host_vs_block_granular():
    """Weak #5 differential, quantified: a target QUEUED behind an
    in-flight ramp starts mid-callback on the host (the reference's
    mid-callback continuation, ParametricEqualizerProcessor.swift:282-313)
    but only at the next block boundary on the block-granular device path.
    The skew is bounded by one block, and the paths reconverge exactly
    after both ramps finish."""
    from airwave_tpu.graph.effect_graph import (
        DeviceEqualizerEffect, EqualizerEffect,
    )

    block, length = 512, 960
    first = EqualizerDefinition(preamp_db=6.0)
    second = EqualizerDefinition(preamp_db=-6.0)
    host = EqualizerEffect(batch=1)
    device = DeviceEqualizerEffect(batch=1)
    host.prepare(None, 48_000.0)
    device.prepare(None, 48_000.0)
    # Settle any prepare-time unity ramp.
    warm = np.zeros((1, 2, 2 * length), np.float32)
    host.process(warm[0, 0], warm[0, 1], stream=0)
    device.process_batch(warm)

    # Start ramp 1, then queue ramp 2 behind it (newest wins while ramping).
    host.set_target(first)
    device.set_target(first)
    ones = np.ones((1, 2, block), np.float32)
    host.process(ones[0, 0], ones[0, 1], stream=0)
    device.process_batch(ones)
    host.set_target(second)
    device.set_target(second)

    h_rows, d_rows = [], []
    for _ in range(6):
        h_rows.append(host.process(ones[0, 0], ones[0, 1], stream=0)[0])
        d_rows.append(device.process_batch(ones)[0, 0])
    h = np.concatenate(h_rows)
    d = np.concatenate(d_rows)

    # Ramp 1 completes 448 frames in; the host starts ramp 2 right there,
    # the device at the next block boundary (frame 512): bounded skew.
    completion = length - block  # 448
    # Threshold well above f32-vs-f64 cascade rounding (~1e-6) but far
    # below the ramp-skew divergence (~O(0.1) on a 12 dB swing).
    diverged = np.abs(h - d) > 1e-3
    divergence = int(np.argmax(diverged))
    assert completion <= divergence <= completion + block
    skew = diverged.nonzero()[0]
    # After both second ramps finish, outputs reconverge to rounding noise.
    tail_start = block + length + block  # device ramp 2 fully done
    np.testing.assert_allclose(h[tail_start:], d[tail_start:], atol=1e-4)
    # And the total divergence window is bounded by ramp + one block.
    assert skew.max() - skew.min() <= length + block


@pytest.mark.heavy
def test_adapter_every_callback_size_1_to_4096_finite():
    """Reference parity (RealtimeAudioProcessorTests
    testAllRequiredCallbackSizesWriteFiniteOutput): EVERY callback size
    1..4096 returns finite output of exactly the requested length, and no
    sample is lost or reordered across the whole sweep."""
    adapter = FrameAdapter(identity_render, batch=1, in_channels=2,
                           block_size=512, max_frames_per_callback=4096)
    rng = np.random.default_rng(3)
    fed = []
    outs = []
    for size in range(1, 4097):
        x = rng.standard_normal((1, 2, size)).astype(np.float32)
        # Keep a nonzero floor so output zeros are unambiguous underflow.
        x[np.abs(x) < 1e-3] = 1e-3
        fed.append(x)
        y = adapter.process(x)
        assert y.shape == (1, 2, size), size
        assert np.all(np.isfinite(y)), size
        outs.append(y)
    sent = np.concatenate(fed, axis=-1)[0, 0]
    got = np.concatenate(outs, axis=-1)[0, 0]
    nonzero = got[got != 0]
    np.testing.assert_array_equal(nonzero, sent[: len(nonzero)])
    # Cumulative underflow is bounded by one block (the latency contract).
    assert len(nonzero) >= sent.shape[0] - 512
