"""Device-side bake API, pool renderer swap, watcher-to-library integration."""

import numpy as np

from airwave_tpu.assets import channel_maps as cm
from airwave_tpu.graph.renderer import prepare_renderer
from airwave_tpu.io.wav import WAVData
from airwave_tpu.models import bake
from airwave_tpu.ops import biquad_design as bd
from airwave_tpu.io.apo import EqualizerDefinition, EqualizerFilter, FilterType
from airwave_tpu.oracle.eq_oracle import EqCascadeOracle
from airwave_tpu.oracle.upols_oracle import UPOLSOracle
import pytest


def test_bake_matches_oracle_and_resumes():
    rng = np.random.default_rng(0)
    T, B, S = 64, 3, 2
    hrir = (rng.standard_normal((S, 2, 200)) * 0.3).astype(np.float32)
    definition = EqualizerDefinition(
        preamp_db=-2.0,
        filters=(EqualizerFilter(1, None, True, FilterType.PEAKING,
                                 1_000, 6, 0.707),),
    )
    preamp, coeffs = bd.design_cascade(definition, 48_000)
    n = 5 * T + 17  # non-multiple of block
    x = (rng.standard_normal((B, S, n)) * 0.4).astype(np.float32)

    y, state = bake.bake(hrir, x, 48_000.0, coeffs, preamp, block_size=T)
    assert y.shape == (B, 2, n)

    # Oracle for stream 1 (block-aligned region).
    naligned = (n // T) * T
    ref = np.zeros((2, naligned + T))
    xa = np.concatenate([x, np.zeros((B, S, T - n % T), np.float32)], -1)
    for s in range(S):
        for e in range(2):
            o = UPOLSOracle(hrir[s, e], T)
            ref[e] += np.concatenate(
                [o.process(xa[1, s, i * T:(i + 1) * T])
                 for i in range(xa.shape[-1] // T)]
            )
    eq = EqCascadeOracle(coeffs, preamp, 48_000)
    rl, rr = eq.process(ref[0].astype(np.float32), ref[1].astype(np.float32))
    ref = np.stack([rl, rr])[:, :n]
    err = np.sqrt(np.mean((y[1] - ref) ** 2)) / np.sqrt(np.mean(ref**2))
    assert err < 1e-5, err

    # Continuation: baking the second half from the mid-state equals the
    # full bake's second half.
    half = 2 * T
    y1, mid = bake.bake(hrir, x[:, :, :half], 48_000.0, coeffs, preamp, T)
    y2, _ = bake.bake(hrir, x[:, :, half:], 48_000.0, coeffs, preamp, T,
                      state=mid)
    stitched = np.concatenate([y1, y2], -1)
    np.testing.assert_allclose(stitched[:, :, :n], y, atol=1e-5)


def test_pool_renderer_hot_swap():
    from airwave_tpu.runtime.stream_pool import StreamPool

    rng = np.random.default_rng(1)
    block = 64

    def renderer_with(frames, seed):
        audio = (np.random.default_rng(seed).standard_normal((14, frames))
                 * 0.2).astype(np.float32)
        return prepare_renderer(WAVData(48_000.0, audio), cm.STEREO,
                                48_000.0, block)

    pool = StreamPool(2, 48_000.0, renderer_with(100, 1), block_size=block)
    s = pool.attach()
    pool.push(s, (rng.standard_normal((2, block)) * 0.3).astype(np.float32))
    pool.pump()
    pool.pull(s, block)

    # Same shape, crossfade opted out: state reset in place (the
    # reference's fresh-engines semantics; the glitch-free default is
    # differential-tested in test_hotswap.py).
    assert pool.set_renderer(renderer_with(100, 2), crossfade=False) is False
    pool.push(s, np.zeros((2, block), np.float32))
    pool.pump()
    np.testing.assert_array_equal(pool.pull(s, block), 0)  # fresh history

    # Different partition count: carry reallocated.
    pool.set_renderer(renderer_with(500, 3))
    pool.push(s, (rng.standard_normal((2, block)) * 0.3).astype(np.float32))
    pool.pump()
    out = pool.pull(s, block)
    assert np.all(np.isfinite(out)) and np.any(out != 0)


def test_config4_resampled_hrir_chain_with_midstream_swap():
    """BASELINE config 4 end-to-end: a 44.1 kHz HRIR preset renders
    through the 48 kHz chain (resampled at preparation), a second preset
    hot-swaps MID-STREAM, and both segments match their own oracle built
    from the same resampled IRs (crossfade=False restarts conv history —
    the reference's fresh-engines semantics; the glitch-free crossfaded
    default is covered in test_hotswap.py)."""
    from airwave_tpu.ops.resample import resample_linear
    from airwave_tpu.runtime.stream_pool import StreamPool

    block = 64
    rng = np.random.default_rng(3)

    def make_441_renderer(seed):
        audio = (np.random.default_rng(seed).standard_normal((14, 256))
                 * 0.2).astype(np.float32)
        return (prepare_renderer(WAVData(44_100.0, audio), cm.STEREO,
                                 48_000.0, block), audio)

    r1, audio1 = make_441_renderer(11)
    r2, audio2 = make_441_renderer(12)
    pool = StreamPool(2, 48_000.0, r1, block_size=block)
    s = pool.attach()
    n = 4
    sig = (rng.standard_normal((2, 2 * n * block)) * 0.3).astype(np.float32)
    for i in range(n):
        pool.push(s, sig[:, i * block:(i + 1) * block])
        pool.pump()
    seg1 = pool.pull(s, n * block)
    pool.set_renderer(r2, crossfade=False)  # mid-stream swap, fresh history
    for i in range(n, 2 * n):
        pool.push(s, sig[:, i * block:(i + 1) * block])
        pool.pump()
    seg2 = pool.pull(s, n * block)

    m = cm.hesuvi_14_channel(cm.STEREO.channels)
    for seg, audio, x0 in ((seg1, audio1, 0), (seg2, audio2, n * block)):
        ref = np.zeros((2, n * block))
        for spk_idx, speaker in enumerate((cm.FL, cm.FR)):
            li, ri = m.indices(speaker)
            for ear, ch in ((0, li), (1, ri)):
                ir = resample_linear(audio[ch], 44_100.0, 48_000.0)
                o = UPOLSOracle(ir, block)
                ref[ear] += np.concatenate(
                    [o.process(sig[spk_idx,
                                   x0 + j * block:x0 + (j + 1) * block])
                     for j in range(n)]
                )
        err = np.sqrt(np.mean((seg - ref) ** 2)) / np.sqrt(np.mean(ref**2))
        assert err < 1e-5, err


def test_watcher_drives_library_reload(tmp_path):
    """Disk change -> debounced watcher -> manager reload -> presets update
    (the reference's FSEvents flow, end to end)."""
    from airwave_tpu.assets.eq_library import EqualizerManager
    from airwave_tpu.assets.watcher import DirectoryWatcher
    from airwave_tpu.runtime.scheduler import ManualScheduler

    manager = EqualizerManager(str(tmp_path / "eq"))
    scheduler = ManualScheduler()
    watcher = DirectoryWatcher(manager.directory, manager.reload, scheduler,
                               poll_interval=0.5, debounce=0.2)
    watcher.start()

    src = tmp_path / "p.txt"
    src.write_text("Preamp: -3 dB\nFilter 1: ON PK Fc 100 Hz Gain 2 dB Q 1\n")
    preset = manager.import_preset(str(src))
    assert len(manager.presets()) == 1

    # Simulate an external deletion (no manager API involved).
    import os

    os.unlink(os.path.join(manager.directory, preset.filename))
    assert len(manager.presets()) == 1  # not yet noticed
    scheduler.advance(0.5)   # poll sees the change
    scheduler.advance(0.25)  # debounce fires -> reload
    assert manager.presets() == []


def test_end_to_end_determinism_across_fresh_jits():
    """Same inputs through independently-built engines -> bit-identical
    output (production reproducibility guarantee)."""
    rng = np.random.default_rng(0)
    hrir = (rng.standard_normal((2, 2, 200)) * 0.3).astype(np.float32)
    x = (rng.standard_normal((2, 2, 4 * 64)) * 0.4).astype(np.float32)
    y1, _ = bake.bake(hrir, x, 48_000.0, block_size=64)
    y2, _ = bake.bake(hrir, x, 48_000.0, block_size=64)
    np.testing.assert_array_equal(y1, y2)


@pytest.mark.heavy
def test_bake_blocks_per_step_matches_single_block_path():
    """The M-block lookahead bake is output-identical (f32 tolerance) to
    the classic per-block bake, including continuation across two calls."""
    rng = np.random.default_rng(3)
    T, B, S = 64, 3, 2
    hrir = (rng.standard_normal((S, 2, 300)) * 0.3).astype(np.float32)
    definition = EqualizerDefinition(
        preamp_db=-2.0,
        filters=(EqualizerFilter(1, None, True, FilterType.PEAKING,
                                 1_000, 6, 0.707),),
    )
    preamp, coeffs = bd.design_cascade(definition, 48_000)
    n = 7 * T + 19  # ragged: exercises the M*T padding path
    x = (rng.standard_normal((B, S, n)) * 0.4).astype(np.float32)

    y1, _ = bake.bake(hrir, x, 48_000.0, coeffs, preamp, block_size=T)
    y4, s4 = bake.bake(hrir, x, 48_000.0, coeffs, preamp, block_size=T,
                       blocks_per_step=4)
    assert y4.shape == y1.shape
    err = np.sqrt(np.mean((y4 - y1) ** 2)) / np.sqrt(np.mean(y1**2))
    assert err < 1e-5, err

    # Continuation with the paged carry: two halves == one pass.
    half = 4 * 4 * T  # multiple of M*T so the carry seam is block-aligned
    long_x = (rng.standard_normal((B, S, 2 * half)) * 0.4).astype(np.float32)
    whole, _ = bake.bake(hrir, long_x, 48_000.0, coeffs, preamp, T,
                         blocks_per_step=4)
    first, mid = bake.bake(hrir, long_x[:, :, :half], 48_000.0, coeffs,
                           preamp, T, blocks_per_step=4)
    second, _ = bake.bake(hrir, long_x[:, :, half:], 48_000.0, coeffs,
                          preamp, T, state=mid, blocks_per_step=4)
    joined = np.concatenate([first, second], axis=-1)
    err = np.sqrt(np.mean((joined - whole) ** 2)) / np.sqrt(np.mean(whole**2))
    assert err < 1e-6, err
