"""EqualizerAPO parser contract tests (ref EqualizerAPOParserTests.swift)."""

import pytest

from airwave_tpu.io import apo
from airwave_tpu.utils.errors import EqualizerParseError

CCA_CRA = """Preamp: -2.56 dB
Filter 1: ON LSC Fc 105.0 Hz Gain -2.8 dB Q 0.70
Filter 2: ON PK Fc 65.3 Hz Gain 1.0 dB Q 1.68
Filter 3: ON PK Fc 180.0 Hz Gain -2.2 dB Q 1.08
Filter 4: ON PK Fc 625.7 Hz Gain 0.6 dB Q 1.07
Filter 5: ON PK Fc 894.2 Hz Gain 2.0 dB Q 1.24
Filter 6: ON PK Fc 1431.5 Hz Gain -1.5 dB Q 1.77
Filter 7: ON PK Fc 3020.2 Hz Gain 2.5 dB Q 2.25
Filter 8: ON PK Fc 6165.4 Hz Gain 2.3 dB Q 5.37
Filter 9: ON PK Fc 9079.1 Hz Gain 1.2 dB Q 2.75
Filter 10: ON HSC Fc 10000.0 Hz Gain -5.2 dB Q 0.70
"""


def test_parses_reference_fixture_exactly():
    definition = apo.parse(CCA_CRA.encode(), "CCA CRA ParametricEq.txt")
    assert definition.preamp_db == -2.56
    assert len(definition.filters) == 10
    assert len(definition.enabled_filters) == 10
    f1 = definition.filters[0]
    assert f1.type is apo.FilterType.LOW_SHELF
    assert f1.frequency_hz == 105.0 and f1.gain_db == -2.8 and f1.q == 0.70
    assert f1.source_number == 1
    assert definition.filters[9].type is apo.FilterType.HIGH_SHELF


def test_bom_comments_and_off_filters():
    text = "﻿# comment\nPreamp: -1 dB\nFilter: OFF PK Fc 100 Hz Gain 1 dB Q 1\n"
    definition = apo.parse(text.encode("utf-8"), "x.txt")
    assert definition.preamp_db == -1
    assert not definition.filters[0].is_enabled
    assert definition.filters[0].source_number is None


def test_duplicate_preamp_is_line_numbered_issue():
    text = "Preamp: -1 dB\nPreamp: -2 dB\n"
    with pytest.raises(EqualizerParseError) as exc:
        apo.parse(text.encode(), "dup.txt")
    assert any(
        i.line_number == 2 and "duplicate" in i.reason for i in exc.value.issues
    )


def test_malformed_directives_and_unsupported_lines():
    text = "Preamp: -1 dB\nFilter 1: ON XYZ Fc 100 Hz Gain 1 dB Q 1\nbogus line\nPreamp junk\n"
    with pytest.raises(EqualizerParseError) as exc:
        apo.parse(text.encode(), "bad.txt")
    reasons = {(i.line_number, i.reason) for i in exc.value.issues}
    assert (2, "malformed Filter directive") in reasons
    assert (3, "unsupported directive") in reasons
    assert (4, "malformed Preamp directive") in reasons


def test_numeric_validation():
    text = "Filter 1: ON PK Fc -5 Hz Gain 1 dB Q 1\nFilter 2: ON PK Fc 100 Hz Gain inf dB Q 0\n"
    with pytest.raises(EqualizerParseError) as exc:
        apo.parse(text.encode(), "nums.txt")
    reasons = [i.reason for i in exc.value.issues]
    assert "frequency must be positive" in reasons
    assert "gain must be a finite number" in reasons
    assert "Q must be positive" in reasons


def test_rejects_more_than_64_filter_declarations():
    lines = [f"Filter {i}: ON PK Fc {100+i} Hz Gain 1 dB Q 1" for i in range(1, 66)]
    with pytest.raises(EqualizerParseError) as exc:
        apo.parse("\n".join(lines).encode(), "many.txt")
    assert any("more than 64" in i.reason for i in exc.value.issues)


def test_rejects_empty_effective_configuration():
    with pytest.raises(EqualizerParseError) as exc:
        apo.parse(b"Preamp: 0 dB\nFilter 1: OFF PK Fc 100 Hz Gain 1 dB Q 1\n", "e.txt")
    assert any("effective configuration" in i.reason for i in exc.value.issues)


def test_rejects_oversized_and_non_utf8():
    with pytest.raises(EqualizerParseError):
        apo.parse(b"x" * (apo.MAX_DATA_SIZE + 1), "big.txt")
    with pytest.raises(EqualizerParseError):
        apo.parse(b"Preamp: -1 dB\n\xff\xfe", "bin.txt")


def test_hex_float_literals_parse_like_swift_double():
    """Swift's Double(_:) accepts hex-float literals; the strict-parity
    parser must too (0x1.f4p9 == 1000.0). Underscore separators stay
    rejected in both grammars."""
    text = "Preamp: -0x1.8p1 dB\nFilter 1: ON PK Fc 0x1.f4p9 Hz Gain 3 dB Q 1\n"
    definition = apo.parse(text.encode(), "hex.txt")
    assert definition.preamp_db == -3.0
    assert definition.filters[0].frequency_hz == 1000.0

    with pytest.raises(EqualizerParseError):
        apo.parse(b"Preamp: -1_0 dB\nFilter 1: ON PK Fc 100 Hz Gain 3 dB Q 1\n",
                  "underscore.txt")
    with pytest.raises(EqualizerParseError):
        apo.parse(b"Preamp: 0x1_0p0 dB\nFilter 1: ON PK Fc 100 Hz Gain 3 dB Q 1\n",
                  "hex_underscore.txt")
