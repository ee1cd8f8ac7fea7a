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
