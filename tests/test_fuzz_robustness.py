"""Robustness fuzzing: loaders/parsers fail only with their typed errors,
and the frame adapter conserves samples under random callback schedules."""

import numpy as np
import pytest

from airwave_tpu.graph.frame_adapter import FrameAdapter
from airwave_tpu.io import apo, wav
from airwave_tpu.utils.errors import EqualizerParseError, WAVError


def test_apo_parser_never_crashes_on_random_bytes():
    rng = np.random.default_rng(0)
    for i in range(200):
        n = int(rng.integers(0, 400))
        blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        try:
            definition = apo.parse(blob, f"fuzz-{i}.txt")
            assert definition.preamp_db != 0 or definition.enabled_filters
        except EqualizerParseError:
            pass  # the only acceptable failure mode


def test_apo_parser_never_crashes_on_random_text_lines():
    rng = np.random.default_rng(1)
    words = ["Filter", "Preamp:", "ON", "OFF", "PK", "LSC", "HSC", "Fc",
             "Hz", "Gain", "dB", "Q", "1:", "-3.0", "nan", "1e3", "#x", ":",
             "100", "0", "-", "âˆž"]
    for i in range(200):
        lines = [
            " ".join(rng.choice(words, size=rng.integers(1, 9)))
            for _ in range(rng.integers(1, 8))
        ]
        try:
            apo.parse("\n".join(lines).encode(), f"fuzz-{i}.txt")
        except EqualizerParseError:
            pass


def test_wav_loader_never_crashes_on_random_bytes():
    rng = np.random.default_rng(2)
    for i in range(200):
        n = int(rng.integers(0, 300))
        blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        try:
            wav.load(blob)
        except WAVError:
            pass


def test_wav_loader_handles_corrupted_valid_header():
    rng = np.random.default_rng(3)
    import io as _io

    buf = _io.BytesIO()
    wav.save(buf, rng.standard_normal((2, 64)).astype(np.float32), 48_000)
    blob = bytearray(buf.getvalue())
    for i in range(100):
        corrupted = bytearray(blob)
        pos = int(rng.integers(0, len(corrupted)))
        corrupted[pos] = int(rng.integers(0, 256))
        try:
            data = wav.load(bytes(corrupted))
            assert data.channel_count > 0
        except WAVError:
            pass


def test_frame_adapter_conservation_under_random_schedules():
    """Property: total real (non-inserted) output samples == total input
    samples rendered; inserted zeros only ever appear on underflow; output
    never exceeds input."""
    rng = np.random.default_rng(4)
    for trial in range(10):
        block = int(rng.choice([8, 32, 512]))
        adapter = FrameAdapter(lambda b: b[:, :2], batch=1, in_channels=2,
                               block_size=block,
                               max_frames_per_callback=4096)
        seq = np.arange(1, 20_001, dtype=np.float32)
        cursor, outputs = 0, []
        for _ in range(int(rng.integers(5, 30))):
            n = int(rng.integers(1, 4097))
            chunk = seq[cursor:cursor + n]
            if len(chunk) < n:
                break
            cursor += n
            x = np.tile(chunk[None, None, :], (1, 2, 1))
            outputs.append(adapter.process(x))
        y = np.concatenate(outputs, axis=-1)[0, 0]
        nonzero = y[y != 0]
        # Real samples come out in order, unmodified, and never exceed input.
        np.testing.assert_array_equal(nonzero, seq[: len(nonzero)])
        assert len(nonzero) <= cursor
        # Everything rendered so far is input minus (pending + fifo backlog).
        backlog = adapter.pending_count + adapter.fifo_count
        assert len(nonzero) == cursor - backlog


def test_sofa_reader_rejects_truncated_hdf5(tmp_path):
    from airwave_tpu.tools.sofa import ConversionError, read_sofa_hrir
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_tools import write_sofa, FULL_RING

    path = write_sofa(tmp_path / "x.sofa", FULL_RING)
    blob = open(path, "rb").read()
    bad = tmp_path / "trunc.sofa"
    bad.write_bytes(blob[: len(blob) // 3])
    with pytest.raises(ConversionError):
        read_sofa_hrir(str(bad))
