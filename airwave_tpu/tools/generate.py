"""Variant generation CLI: SOFA -> converted bank -> synthesized variants.

Re-implements the capability of
/root/reference/tools/ss2-spatial-prototype/generate.py:41-259: convert a
SOFA source (or take a 14-channel WAV directly), analyze a reference bank
for target metrics, synthesize the A-D variant set, validate each against the
metric bounds, and write WAVs + a provenance manifest.

CLI: python -m airwave_tpu.tools.generate --reference REF.wav
       (--sofa SRC.sofa | --base BASE.wav) --output-dir DIR
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from airwave_tpu.io import wav as wav_io
from airwave_tpu.tools import spatial
from airwave_tpu.tools.sofa import sha256_file


def load_bank(path: str) -> np.ndarray:
    data = wav_io.load(path)
    if data.channel_count != 14:
        raise spatial.PrototypeError(
            f"Expected 14 channels, got {data.channel_count}"
        )
    return data.audio.T.astype(np.float64)


def generate(reference_path: str, base_path: str, output_dir: str,
             seed: int = 20_260_816) -> dict:
    reference_metrics = spatial.analyze_wav(reference_path)
    base = load_bank(base_path)
    os.makedirs(output_dir, exist_ok=True)

    results = []
    for name, description, min_phase, ambience in spatial.VARIANTS:
        bank = spatial.synthesize_variant(
            base, reference_metrics, min_phase, ambience, seed=seed
        )
        problems = spatial.validate_variant(bank, reference_metrics)
        out_path = os.path.join(output_dir, f"{name}.wav")
        wav_io.save(out_path, bank.T, spatial.SAMPLE_RATE)
        results.append({
            "name": name,
            "description": description,
            "minimum_phase": min_phase,
            "ambience_scale": ambience,
            "path": os.path.basename(out_path),
            "sha256": sha256_file(out_path),
            "frames": int(bank.shape[0]),
            "validation_problems": problems,
        })

    manifest = {
        "schema_version": 1,
        "reference": {
            "path": os.path.basename(reference_path),
            "sha256": sha256_file(reference_path),
        },
        "base": {
            "path": os.path.basename(base_path),
            "sha256": sha256_file(base_path),
        },
        "seed": seed,
        "variants": results,
    }
    manifest_path = os.path.join(output_dir, "variants.json")
    with open(manifest_path, "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def main(argv=None) -> int:
    import signal

    try:  # behave like a unix tool when piped into head etc.
        signal.signal(signal.SIGPIPE, signal.SIG_DFL)
    except (AttributeError, ValueError):
        pass
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--reference", required=True,
                        help="14-ch reference WAV providing target metrics")
    group = parser.add_mutually_exclusive_group(required=True)
    group.add_argument("--sofa", help="SOFA source to convert as the base bank")
    group.add_argument("--base", help="14-ch WAV to use as the base bank")
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--seed", type=int, default=20_260_816)
    args = parser.parse_args(argv)

    base_path = args.base
    if args.sofa:
        from airwave_tpu.tools.convert import convert_file

        base_path, _ = convert_file(args.sofa, args.output_dir)
    manifest = generate(args.reference, base_path, args.output_dir, args.seed)
    bad = [v["name"] for v in manifest["variants"] if v["validation_problems"]]
    print(json.dumps({"variants": len(manifest["variants"]),
                      "with_problems": bad}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
