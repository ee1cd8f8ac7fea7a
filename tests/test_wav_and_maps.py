"""WAV I/O roundtrips and HRIR channel-map tests."""

import io

import numpy as np
import pytest

from airwave_tpu.assets import channel_maps as cm
from airwave_tpu.io import wav
from airwave_tpu.utils.errors import WAVError


def test_float32_roundtrip_is_decode_identical():
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((14, 480)).astype(np.float32)
    buf = io.BytesIO()
    wav.save(buf, audio, 48_000, dtype="float32")
    loaded = wav.load(buf.getvalue())
    assert loaded.sample_rate == 48_000
    assert loaded.channel_count == 14
    assert loaded.frame_count == 480
    np.testing.assert_array_equal(loaded.audio, audio)


def test_int16_normalization_matches_reference_contract():
    buf = io.BytesIO()
    audio = np.array([[0.0, 0.5, -0.5, -1.0]], np.float32)
    wav.save(buf, audio, 44_100, dtype="int16")
    loaded = wav.load(buf.getvalue())
    np.testing.assert_allclose(loaded.audio[0], audio[0], atol=1.0 / 32768.0)


def test_mono_duplication_in_extract_stereo():
    buf = io.BytesIO()
    wav.save(buf, np.ones((1, 8), np.float32), 48_000)
    left, right = wav.extract_stereo(wav.load(buf.getvalue()))
    np.testing.assert_array_equal(left, right)


def test_invalid_files_raise():
    with pytest.raises(WAVError):
        wav.load(b"not a wav file at all....")
    with pytest.raises(WAVError):
        wav.load(b"RIFF\x04\x00\x00\x00WAVE")


def test_layout_detection():
    assert cm.detect_layout(2) is cm.STEREO
    assert cm.detect_layout(6) is cm.SURROUND_5_1
    assert cm.detect_layout(8) is cm.SURROUND_7_1
    assert cm.detect_layout(12) is cm.ATMOS_7_1_4
    generic = cm.detect_layout(3)
    assert generic.channels == (cm.custom("Ch0"), cm.custom("Ch1"), cm.custom("Ch2"))


def test_hesuvi14_production_map():
    m = cm.hesuvi_14_channel(cm.SURROUND_7_1.channels)
    assert m.indices(cm.FL) == (0, 1)
    assert m.indices(cm.FR) == (8, 7)
    assert m.indices(cm.FC) == (6, 13)
    assert m.indices(cm.LFE) == (6, 13)
    assert m.indices(cm.BL) == (4, 5)
    assert m.indices(cm.BR) == (12, 11)
    assert m.indices(cm.SL) == (2, 3)
    assert m.indices(cm.SR) == (10, 9)


def test_hesuvi7_symmetric_swap():
    m = cm.hesuvi_7_channel(cm.SURROUND_7_1.channels)
    assert m.indices(cm.FL) == (0, 1)
    assert m.indices(cm.FR) == (1, 0)
    assert m.indices(cm.FC) == (2, 2)
    assert m.indices(cm.BL) == (3, 4)
    assert m.indices(cm.SR) == (6, 5)


def test_interleaved_pairs_side_dependent_swap():
    m = cm.interleaved_pairs([cm.FL, cm.FR, cm.FC])
    assert m.indices(cm.FL) == (0, 1)
    assert m.indices(cm.FR) == (3, 2)  # right-side speakers swap ears
    assert m.indices(cm.FC) == (4, 5)


def test_split_blocks():
    m = cm.split_blocks([cm.FL, cm.FR, cm.FC])
    assert m.indices(cm.FL) == (0, 3)
    assert m.indices(cm.FC) == (2, 5)


def test_mix_txt_parser():
    text = """
    # comment
    ; another comment
    FL = 0, 1
    RR = 12, 11
    SUB = 6, 13
    WEIRD = 3, 4
    badline
    X = 1
    """
    m = cm.parse_hesuvi_format(text)
    assert m.indices(cm.FL) == (0, 1)
    assert m.indices(cm.BR) == (12, 11)
    assert m.indices(cm.LFE) == (6, 13)
    assert m.indices(cm.custom("WEIRD")) == (3, 4)
    assert not m.has_mapping(cm.custom("X"))


def test_channel_map_selection_policy():
    assert cm.select_channel_map(7, cm.STEREO.channels).indices(cm.FR) == (1, 0)
    assert cm.select_channel_map(14, cm.STEREO.channels).indices(cm.FR) == (8, 7)
