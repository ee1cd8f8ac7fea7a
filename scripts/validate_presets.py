#!/usr/bin/env python3
"""Preset dataset validation gate.

The analog of /root/reference/scripts/validate-ss2-presets.sh: validates that
a directory of converted HRIR WAVs + manifests is complete and internally
consistent (count, 14 channels, float32, manifest hash matches the WAV,
loudness target hit), and that EqualizerAPO presets in a directory parse.

Usage:
  python scripts/validate_presets.py --hrir-dir DIR [--expected-count N]
  python scripts/validate_presets.py --eq-dir DIR
Environment overrides (CI parity with the reference's env hooks):
  AIRWAVE_HRIR_VALIDATION_DIR, AIRWAVE_EXPECTED_HRIR_COUNT
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def validate_hrir_dir(directory: str, expected_count: int | None) -> list:
    from airwave_tpu.io import wav as wav_io
    from airwave_tpu.tools.convert import front_stereo_binaural_energy
    from airwave_tpu.tools.sofa import sha256_file

    problems = []
    wavs = sorted(glob.glob(os.path.join(directory, "*.wav")))
    manifests = sorted(glob.glob(os.path.join(directory, "*.json")))
    if expected_count is not None:
        if len(wavs) != expected_count:
            problems.append(f"expected {expected_count} WAVs, found {len(wavs)}")
        if len(manifests) != expected_count:
            problems.append(
                f"expected {expected_count} manifests, found {len(manifests)}"
            )
    for wav_path in wavs:
        name = os.path.basename(wav_path)
        try:
            data = wav_io.load(wav_path)
        except Exception as err:  # noqa: BLE001
            problems.append(f"{name}: unreadable ({err})")
            continue
        if data.channel_count != 14:
            problems.append(f"{name}: {data.channel_count} channels != 14")
        manifest_path = os.path.splitext(wav_path)[0] + ".json"
        if not os.path.exists(manifest_path):
            problems.append(f"{name}: missing manifest")
            continue
        with open(manifest_path) as f:
            manifest = json.load(f)
        if manifest.get("output", {}).get("sha256") != sha256_file(wav_path):
            problems.append(f"{name}: manifest sha256 mismatch")
        cal = manifest.get("loudness_calibration", {})
        target = cal.get("target_front_stereo_binaural_energy")
        if target:
            energy = front_stereo_binaural_energy(data.audio.T)
            if not math.isclose(energy, target, rel_tol=1e-4):
                problems.append(
                    f"{name}: front-stereo energy {energy:.6f} != {target:.6f}"
                )
    return problems


def validate_eq_dir(directory: str) -> list:
    from airwave_tpu.io import apo

    problems = []
    for path in sorted(glob.glob(os.path.join(directory, "*.txt"))):
        name = os.path.basename(path)
        try:
            with open(path, "rb") as f:
                apo.parse(f.read(), name)
        except Exception as err:  # noqa: BLE001
            problems.append(f"{name}: {err}")
    return problems


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--hrir-dir",
                        default=os.environ.get("AIRWAVE_HRIR_VALIDATION_DIR"))
    parser.add_argument(
        "--expected-count",
        type=int,
        default=int(os.environ.get("AIRWAVE_EXPECTED_HRIR_COUNT", 0)) or None,
    )
    parser.add_argument("--eq-dir")
    args = parser.parse_args()

    problems = []
    if args.hrir_dir:
        problems += validate_hrir_dir(args.hrir_dir, args.expected_count)
    if args.eq_dir:
        problems += validate_eq_dir(args.eq_dir)
    if not args.hrir_dir and not args.eq_dir:
        parser.error("provide --hrir-dir and/or --eq-dir")

    for problem in problems:
        print(f"INVALID: {problem}")
    if not problems:
        print("presets valid")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
