"""SOFA -> 14-channel HeSuVi WAV converter (offline HRIR dataset production).

Re-implements the contract of /root/reference/tools/ss2-to-hesuvi/convert.py:
  - target azimuths FC 0deg, FL/FR +-30 (configurable up to 90), SL/SR +-90,
    BL/BR +-135; +azimuth = listener-left (:21-29, 340-350)
  - nearest measurement per target by great-circle error on the horizontal
    target vector; ties resolved to the lowest measurement index; fail above
    the max-error limit (default 5 deg) (:353-383)
  - fractional source delays materialized with a 65-tap Blackman-windowed
    sinc; integer parts zero-padded per channel (:386-428)
  - loudness: one global gain matching the mean FL/FR binaural L2 energy to
    a reference target (:118-162)
  - float32 WAV output validated decode-identical + schema-v2 JSON manifest
    with hashes, directions, delays, and gain (:451-542)

CLI: python -m airwave_tpu.tools.convert SRC [SRC...] --output-dir DIR
"""

from __future__ import annotations

import argparse
import dataclasses
import hashlib
import json
import math
import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

from airwave_tpu.io import wav as wav_io
from airwave_tpu.tools.sofa import ConversionError, SofaHRIR, read_sofa_hrir, sha256_file

# +azimuth is listener-left (matches the SOFA listener frame's left axis).
DEFAULT_TARGET_AZIMUTHS: Dict[str, float] = {
    "FC": 0.0, "FL": 30.0, "FR": -30.0,
    "SL": 90.0, "SR": -90.0, "BL": 135.0, "BR": -135.0,
}

# HeSuVi 14-track order (see assets/channel_maps.py hesuvi_14_channel).
HESUVI_LAYOUT: Tuple[Tuple[str, str], ...] = (
    ("FL", "left"), ("FL", "right"),
    ("SL", "left"), ("SL", "right"),
    ("BL", "left"), ("BL", "right"),
    ("FC", "left"),
    ("FR", "right"), ("FR", "left"),
    ("SR", "right"), ("SR", "left"),
    ("BR", "right"), ("BR", "left"),
    ("FC", "right"),
)

FRACTIONAL_DELAY_TAPS = 65
EPSILON = 1e-9

# Mean FL/FR binaural L2 energy of the known-good reference preset the
# ecosystem calibrates against (dht.wav, ref convert.py:53-60).
DEFAULT_LOUDNESS_TARGET = 1.0163817234826116


@dataclasses.dataclass(frozen=True)
class DirectionSelection:
    speaker: str
    target_azimuth_deg: float
    measurement_index: int
    actual_azimuth_deg: float
    actual_elevation_deg: float
    angular_error_deg: float


def target_azimuths(front_azimuth_deg: float = 30.0) -> Dict[str, float]:
    if not (np.isfinite(front_azimuth_deg) and 0 < front_azimuth_deg <= 90):
        raise ConversionError(
            "Front azimuth must be greater than 0 deg and at most 90 deg"
        )
    targets = dict(DEFAULT_TARGET_AZIMUTHS)
    targets["FL"] = float(front_azimuth_deg)
    targets["FR"] = -float(front_azimuth_deg)
    return targets


def select_directions(
    data: SofaHRIR,
    max_error_deg: float = 5.0,
    targets: Dict[str, float] = None,
) -> Dict[str, DirectionSelection]:
    if targets is None:
        targets = DEFAULT_TARGET_AZIMUTHS
    if not np.isfinite(max_error_deg) or max_error_deg < 0:
        raise ConversionError("Maximum angular error must be finite and non-negative")
    out: Dict[str, DirectionSelection] = {}
    for speaker, azimuth in targets.items():
        rad = math.radians(azimuth)
        target_vec = np.array([math.cos(rad), math.sin(rad), 0.0])
        errors = np.rad2deg(
            np.arccos(np.clip(data.source_vectors @ target_vec, -1.0, 1.0))
        )
        best = float(np.min(errors))
        # Ties resolve to the lowest measurement index (deterministic).
        index = int(np.flatnonzero(np.isclose(errors, best, atol=1e-10, rtol=0))[0])
        if best > max_error_deg + 1e-9:
            raise ConversionError(
                f"{speaker} nearest measurement is {best:.6f} deg, "
                f"above {max_error_deg:.6f} deg limit"
            )
        out[speaker] = DirectionSelection(
            speaker=speaker,
            target_azimuth_deg=azimuth,
            measurement_index=index,
            actual_azimuth_deg=float(data.source_azimuths[index]),
            actual_elevation_deg=float(data.source_elevations[index]),
            angular_error_deg=best,
        )
    return out


def fractional_delay_kernel(fraction: float,
                            taps: int = FRACTIONAL_DELAY_TAPS) -> np.ndarray:
    if taps < 3 or taps % 2 == 0:
        raise ValueError("Fractional-delay tap count must be odd and at least 3")
    half = taps // 2
    offsets = np.arange(-half, half + 1, dtype=np.float64)
    kernel = np.sinc(offsets - fraction) * np.blackman(taps)
    return kernel / np.sum(kernel)


def materialize_delays(
    channels: Sequence[np.ndarray], delays: Sequence[float]
) -> np.ndarray:
    """Apply per-channel sample delays; returns [frames, channels] float32.

    When any delay has a fractional part, EVERY channel is convolved with a
    fractional-delay kernel (applying the same causal group delay across the
    matrix); integer parts are zero-padded per channel.
    """
    if not channels or len(channels) != len(delays):
        raise ConversionError(
            "Channels and delays must be non-empty and have equal length"
        )
    arrays = [np.asarray(c, np.float64) for c in channels]
    if any(a.ndim != 1 or a.size == 0 for a in arrays):
        raise ConversionError("Every output channel must be a non-empty vector")
    delay_values = np.asarray(delays, np.float64)
    if not np.all(np.isfinite(delay_values)) or np.any(delay_values < 0):
        raise ConversionError("Output delays must be finite and non-negative")

    any_fractional = bool(
        np.any(np.abs(delay_values - np.rint(delay_values)) > 1e-9)
    )
    rendered: List[np.ndarray] = []
    for samples, delay in zip(arrays, delay_values):
        integer = int(math.floor(float(delay) + 1e-12))
        fraction = float(delay) - math.floor(float(delay))
        if any_fractional:
            samples = np.convolve(samples, fractional_delay_kernel(fraction))
        if integer:
            samples = np.concatenate([np.zeros(integer), samples])
        rendered.append(samples)

    frames = max(c.size for c in rendered)
    output = np.zeros((frames, len(rendered)), np.float32)
    for i, c in enumerate(rendered):
        output[: c.size, i] = c.astype(np.float32)
    if not np.all(np.isfinite(output)):
        raise ConversionError("Delay materialization produced non-finite samples")
    return output


def front_stereo_binaural_energy(samples: np.ndarray) -> float:
    """Mean L2 energy of the FL (tracks 0/1) and FR (tracks 8/7) pairs."""
    array = np.asarray(samples, np.float64)
    if array.ndim != 2 or array.shape[0] == 0 or array.shape[1] != 14:
        raise ConversionError("Loudness data must be a non-empty 14-channel matrix")
    if not np.all(np.isfinite(array)):
        raise ConversionError("Loudness data contains NaN or infinite samples")
    norms = np.linalg.norm(array, axis=0)
    energy = float(np.mean([math.hypot(norms[0], norms[1]),
                            math.hypot(norms[8], norms[7])]))
    if not np.isfinite(energy) or energy <= EPSILON:
        raise ConversionError("Loudness data has no usable impulse energy")
    return energy


def calibrate_loudness(
    samples: np.ndarray, target_energy: float = DEFAULT_LOUDNESS_TARGET
):
    """One global gain to hit the front-stereo binaural energy target.
    Returns (calibrated float32 [frames, 14], source_energy, gain)."""
    if not np.isfinite(target_energy) or target_energy <= EPSILON:
        raise ConversionError("Loudness target must be positive and finite")
    source = front_stereo_binaural_energy(samples)
    gain = target_energy / source
    output = (np.asarray(samples, np.float64) * gain).astype(np.float32)
    if not np.all(np.isfinite(output)):
        raise ConversionError("Loudness calibration produced non-finite samples")
    return output, source, gain


def build_output(data: SofaHRIR, selections: Dict[str, DirectionSelection]):
    """Gather per-(speaker, ear) IRs into the HeSuVi track order."""
    ears = {"left": data.left_receiver, "right": data.right_receiver}
    channels, delays = [], []
    for speaker, ear in HESUVI_LAYOUT:
        m = selections[speaker].measurement_index
        r = ears[ear]
        channels.append(data.impulse_responses[m, r, :])
        delays.append(float(data.delays[m, r]))
    return materialize_delays(channels, delays), delays


def validate_output(path: str, expected: np.ndarray, sample_rate: int) -> None:
    """Decode-identical check: the written float32 WAV reads back bit-exact."""
    loaded = wav_io.load(path)
    if loaded.sample_rate != sample_rate:
        raise ConversionError("Decoded sample rate differs from generated data")
    actual = loaded.audio.T  # [frames, channels]
    if actual.shape != expected.shape:
        raise ConversionError("Decoded output shape differs from generated data")
    if not np.array_equal(actual, expected):
        raise ConversionError("Decoded output samples differ from generated data")


def build_manifest(
    data: SofaHRIR,
    output_name: str,
    output_hash: str,
    frames: int,
    selections: Dict[str, DirectionSelection],
    channel_delays: Sequence[float],
    source_energy: float,
    gain: float,
    target_energy: float,
) -> dict:
    return {
        "schema_version": 2,
        "source": {
            "path": os.path.basename(data.source_path),
            "sha256": data.source_hash,
            "sofa_convention": "SimpleFreeFieldHRIR",
            "data_type": "FIR",
            "database": data.database_name,
            "listener": data.listener_short_name,
            "license": data.license_name,
            "measurement_count": int(data.impulse_responses.shape[0]),
            "ir_frames": int(data.impulse_responses.shape[2]),
        },
        "output": {
            "path": output_name,
            "sha256": output_hash,
            "sample_rate_hz": data.sample_rate,
            "frames": frames,
            "channels": 14,
            "wav_subtype": "FLOAT",
        },
        "receiver_indices": {
            "left": data.left_receiver, "right": data.right_receiver
        },
        "loudness_calibration": {
            "method": "global_gain_to_reference_front_stereo_binaural_l2_energy",
            "uncalibrated_front_stereo_binaural_energy": source_energy,
            "target_front_stereo_binaural_energy": target_energy,
            "linear_gain": gain,
            "gain_db": 20.0 * math.log10(gain),
        },
        "directions": [
            {
                "speaker": s.speaker,
                "target_azimuth_deg": s.target_azimuth_deg,
                "measurement_index": s.measurement_index,
                "actual_azimuth_deg": round(s.actual_azimuth_deg, 9),
                "actual_elevation_deg": round(s.actual_elevation_deg, 9),
                "angular_error_deg": round(s.angular_error_deg, 9),
                "source_delays_samples": {
                    "left": float(data.delays[s.measurement_index,
                                              data.left_receiver]),
                    "right": float(data.delays[s.measurement_index,
                                               data.right_receiver]),
                },
            }
            for s in selections.values()
        ],
        "channel_map": [
            {"index": i, "speaker": speaker, "ear": ear,
             "delay_samples": float(channel_delays[i])}
            for i, (speaker, ear) in enumerate(HESUVI_LAYOUT)
        ],
    }


def convert_file(
    source_path: str,
    output_dir: str,
    max_error_deg: float = 5.0,
    front_azimuth_deg: float = 30.0,
    loudness_target: float = DEFAULT_LOUDNESS_TARGET,
) -> Tuple[str, str]:
    """Convert one SOFA file. Returns (wav_path, manifest_path)."""
    data = read_sofa_hrir(source_path)
    selections = select_directions(
        data, max_error_deg, target_azimuths(front_azimuth_deg)
    )
    raw, channel_delays = build_output(data, selections)
    calibrated, source_energy, gain = calibrate_loudness(raw, loudness_target)

    os.makedirs(output_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(source_path))[0]
    wav_path = os.path.join(output_dir, f"{stem}.wav")
    manifest_path = os.path.join(output_dir, f"{stem}.json")

    wav_io.save(wav_path, calibrated.T, data.sample_rate, dtype="float32")
    validate_output(wav_path, calibrated, data.sample_rate)

    manifest = build_manifest(
        data, os.path.basename(wav_path), sha256_file(wav_path),
        calibrated.shape[0], selections, channel_delays,
        source_energy, gain, loudness_target,
    )
    with open(manifest_path, "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return wav_path, manifest_path


def discover_sources(paths: Sequence[str]) -> List[str]:
    found: List[str] = []
    for path in paths:
        if os.path.isdir(path):
            for root, _dirs, files in os.walk(path):
                found.extend(
                    os.path.join(root, f) for f in sorted(files)
                    if f.lower().endswith(".sofa")
                )
        else:
            found.append(path)
    return found


def main(argv=None) -> int:
    import signal

    try:  # behave like a unix tool when piped into head etc.
        signal.signal(signal.SIGPIPE, signal.SIG_DFL)
    except (AttributeError, ValueError):
        pass
    parser = argparse.ArgumentParser(
        description="Convert SimpleFreeFieldHRIR SOFA files to 14-ch HeSuVi WAVs"
    )
    parser.add_argument("sources", nargs="+", help="SOFA files or directories")
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--max-error-deg", type=float, default=5.0)
    parser.add_argument("--front-azimuth-deg", type=float, default=30.0)
    parser.add_argument("--loudness-target", type=float,
                        default=DEFAULT_LOUDNESS_TARGET)
    args = parser.parse_args(argv)

    sources = discover_sources(args.sources)
    if not sources:
        parser.error("no .sofa sources found")
    failures = 0
    for source in sources:
        try:
            wav_path, manifest_path = convert_file(
                source, args.output_dir, args.max_error_deg,
                args.front_azimuth_deg, args.loudness_target,
            )
            print(f"ok: {source} -> {wav_path}")
        except ConversionError as err:
            failures += 1
            print(f"FAIL: {source}: {err}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
