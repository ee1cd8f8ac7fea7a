"""Release version gate tests (analog of the reference's
scripts/test-release-version.sh assertions)."""

import subprocess
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
import validate_release_version as gate  # noqa: E402

REPO = Path(__file__).resolve().parent.parent


def test_build_number_monotonic_encoding():
    assert gate.build_number("0.0.1") == 1
    assert gate.build_number("1.2.3") == 1_002_003
    assert gate.build_number("999.999.999") == 999_999_999
    assert gate.build_number("2.0.0") > gate.build_number("1.999.999")


@pytest.mark.parametrize("bad", [
    "1.2", "1.2.3.4", "01.2.3", "1.02.3", "1.2.1000", "v1.2.3", "a.b.c", "",
])
def test_malformed_versions_rejected(bad):
    with pytest.raises(gate.ReleaseGateError):
        gate.build_number(bad)


def test_zero_version_cannot_release():
    with pytest.raises(gate.ReleaseGateError, match="0.0.0"):
        gate.validate("0.0.0")


def test_monotonic_vs_latest_tag():
    assert gate.validate("1.2.4", "v1.2.3")["BUILD_NUMBER"] == 1_002_004
    assert gate.validate("2.0.0", "1.999.999")["TAG"] == "v2.0.0"
    for equal_or_older in ("1.2.3", "1.2.2", "0.9.9"):
        with pytest.raises(gate.ReleaseGateError, match="greater"):
            gate.validate(equal_or_older, "v1.2.3")
    with pytest.raises(gate.ReleaseGateError, match="not semantic"):
        gate.validate("1.2.4", "vNext")


def test_metadata_match_against_pyproject(tmp_path):
    py = tmp_path / "pyproject.toml"
    py.write_text('[project]\nname = "x"\nversion = "1.2.3"\n')
    assert gate.validate("1.2.3", "", py)["VERSION"] == "1.2.3"
    with pytest.raises(gate.ReleaseGateError, match="pyproject"):
        gate.validate("1.2.4", "", py)
    empty = tmp_path / "no-version.toml"
    empty.write_text('[project]\nname = "x"\n')
    with pytest.raises(gate.ReleaseGateError, match="no version"):
        gate.validate("1.2.3", "", empty)


def test_real_pyproject_declares_releasable_version():
    declared = gate.pyproject_version(REPO / "pyproject.toml")
    assert gate.build_number(declared) > 0


@pytest.mark.heavy
def test_cli_contract(tmp_path):
    script = REPO / "scripts" / "validate_release_version.py"
    ok = subprocess.run(
        [sys.executable, str(script), "7.7.7", "v7.7.6", "--skip-metadata"],
        capture_output=True, text=True,
    )
    assert ok.returncode == 0
    assert "VERSION=7.7.7" in ok.stdout
    assert "BUILD_NUMBER=7007007" in ok.stdout
    assert "TAG=v7.7.7" in ok.stdout
    bad = subprocess.run(
        [sys.executable, str(script), "7.7.5", "v7.7.6", "--skip-metadata"],
        capture_output=True, text=True,
    )
    assert bad.returncode == 1 and "release validation failed" in bad.stderr
    # Metadata check on the real repo: mismatch against pyproject fails.
    mismatch = subprocess.run(
        [sys.executable, str(script), "999.0.0"],
        capture_output=True, text=True,
    )
    assert mismatch.returncode == 1 and "pyproject" in mismatch.stderr


def test_bench_emit_stamps_noncontract_precision(monkeypatch, capsys):
    """A bench JSON produced under the opt-in fast mode must self-describe:
    the accuracy contract holds only at HIGHEST (BENCH_NOTES precision
    ladder), so _emit stamps matmul_precision + accuracy_contract=false on
    anything else — a fast-mode number can never masquerade as the
    headline in a recorded artifact."""
    import json

    import bench

    monkeypatch.delenv("AIRWAVE_MATMUL_PRECISION", raising=False)
    bench._emit({"metric": "m", "value": 1.0})
    clean = json.loads(capsys.readouterr().out)
    assert "matmul_precision" not in clean
    assert "accuracy_contract" not in clean

    for fast in ("default", "high", "HIGH"):
        monkeypatch.setenv("AIRWAVE_MATMUL_PRECISION", fast)
        bench._emit({"metric": "m", "value": 1.0})
        stamped = json.loads(capsys.readouterr().out)
        assert stamped["matmul_precision"] == fast.lower()
        assert stamped["accuracy_contract"] is False
        # HIGH is the supported relaxed tier (<=1e-4, docs/architecture.md
        # "Precision tiers"): it alone earns the 1e-4 stamp. DEFAULT
        # (~4e-3) passes no supported contract.
        assert stamped["accuracy_contract_1e4"] is (fast.lower() == "high")

    monkeypatch.setenv("AIRWAVE_MATMUL_PRECISION", "highest")
    bench._emit({"metric": "m", "value": 1.0})
    assert "accuracy_contract" not in json.loads(capsys.readouterr().out)
