"""Spatial metrics + deterministic HRIR synthesis (prototype toolchain).

Functional re-implementation of
/root/reference/tools/ss2-spatial-prototype/spatial.py: a reference 14-channel
HRIR bank is reduced to aggregate metrics (interaural level/time/correlation,
late-energy decay checkpoints at 5/10/20/50 ms, third-octave magnitudes), and
variants are synthesized from a base bank — minimum-phase reconstruction plus
deterministic diffuse ambience tails fit to the reference's decay targets —
then validated against direction-level and tonal-error bounds.
"""

from __future__ import annotations

import json
import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from airwave_tpu.io import wav as wav_io

SAMPLE_RATE = 48_000
OUTPUT_FRAMES = 8_192
CHECKPOINTS_MS: Tuple[int, ...] = (5, 10, 20, 50)
THIRD_OCTAVE_CENTERS: Tuple[float, ...] = tuple(
    1000.0 * 2.0 ** (i / 3.0) for i in range(-15, 13)
)

# (left-ear track, right-ear track) per direction — HeSuVi 14-ch order.
DIRECTION_PAIRS: Dict[str, Tuple[int, int]] = {
    "FL": (0, 1), "FR": (8, 7), "SL": (2, 3), "SR": (10, 9),
    "BL": (4, 5), "BR": (12, 11), "FC": (6, 13),
}

VARIANTS: Tuple[Tuple[str, str, bool, float], ...] = (
    ("A_tail_only", "Original timing plus full target ambience", False, 1.0),
    ("B_minphase_only", "Minimum-phase base without ambience", True, 0.0),
    ("C_minphase_low_space", "Minimum-phase plus half target ambience", True, 0.5),
    ("D_minphase_target_space", "Minimum-phase plus full target ambience", True, 1.0),
)


class PrototypeError(RuntimeError):
    pass


def _validate_bank(samples: np.ndarray, channels: int = 14) -> np.ndarray:
    array = np.asarray(samples, np.float64)
    if array.ndim != 2 or array.shape[0] == 0 or array.shape[1] != channels:
        raise PrototypeError(f"Expected a non-empty {channels}-channel matrix")
    if not np.all(np.isfinite(array)):
        raise PrototypeError("Audio contains NaN or infinite samples")
    if not np.any(array):
        raise PrototypeError("Audio contains no impulse energy")
    return array


def third_octave_magnitude_db(samples: np.ndarray, sample_rate: int) -> np.ndarray:
    fft_size = max(16_384, 1 << max(int(samples.size) - 1, 1).bit_length())
    power = np.abs(np.fft.rfft(samples, fft_size)) ** 2
    freqs = np.fft.rfftfreq(fft_size, 1.0 / sample_rate)
    values = []
    for center in THIRD_OCTAVE_CENTERS:
        band = power[(freqs >= center / 2 ** (1 / 6)) & (freqs < center * 2 ** (1 / 6))]
        mean = float(np.mean(band)) if band.size else 0.0
        values.append(10.0 * math.log10(max(mean, 1e-30)))
    return np.asarray(values)


def _band_energy_distribution(samples: np.ndarray, sample_rate: int) -> List[float]:
    if samples.size == 0 or not np.any(samples):
        return [0.0] * len(THIRD_OCTAVE_CENTERS)
    fft_size = max(16_384, 1 << (samples.size - 1).bit_length())
    power = np.abs(np.fft.rfft(samples, fft_size)) ** 2
    freqs = np.fft.rfftfreq(fft_size, 1.0 / sample_rate)
    values = []
    for center in THIRD_OCTAVE_CENTERS:
        band = power[(freqs >= center / 2 ** (1 / 6)) & (freqs < center * 2 ** (1 / 6))]
        values.append(float(np.mean(band)) if band.size else 0.0)
    total = sum(values)
    return [v / total for v in values] if total > 1e-30 else [0.0] * len(values)


def direction_metrics(samples: np.ndarray, sample_rate: int,
                      left_index: int, right_index: int) -> dict:
    array = _validate_bank(samples)
    left, right = array[:, left_index], array[:, right_index]
    left_peak = int(np.argmax(np.abs(left)))
    right_peak = int(np.argmax(np.abs(right)))
    anchor = min(left_peak, right_peak)
    left_energy = float(np.linalg.norm(left))
    right_energy = float(np.linalg.norm(right))
    pair_sq = left_energy**2 + right_energy**2
    if pair_sq <= 1e-30:
        raise PrototypeError("Direction contains no usable energy")

    late_ratios = {}
    for ms in CHECKPOINTS_MS:
        cutoff = min(array.shape[0], anchor + round(sample_rate * ms / 1000.0))
        late = float(np.sum(left[cutoff:] ** 2) + np.sum(right[cutoff:] ** 2))
        late_ratios[str(ms)] = late / pair_sq

    tail_start = min(array.shape[0], anchor + round(sample_rate * 0.005))
    tail = np.concatenate([left[tail_start:], right[tail_start:]])
    centers = np.asarray(THIRD_OCTAVE_CENTERS)
    audible = (centers >= 80.0) & (centers <= 16_000.0)
    responses = {}
    for name, channel in (("left", left), ("right", right)):
        r = third_octave_magnitude_db(channel, sample_rate)
        responses[name] = [float(v) for v in (r - float(np.mean(r[audible])))]

    denom = left_energy * right_energy
    iacc = float(np.dot(left, right) / denom) if denom > 1e-15 else 0.0
    return {
        "left_right_level_db": 20.0 * math.log10(left_energy / right_energy),
        "peak_itd_samples_right_minus_left": right_peak - left_peak,
        "zero_lag_interaural_correlation": iacc,
        "late_energy_ratios": late_ratios,
        "late_field_third_octave_energy": _band_energy_distribution(
            tail, sample_rate
        ),
        "normalized_third_octave_magnitude_db": responses,
    }


def bank_metrics(samples: np.ndarray, sample_rate: int) -> dict:
    array = _validate_bank(samples)
    return {
        "sample_rate_hz": sample_rate,
        "frames": int(array.shape[0]),
        "directions": {
            speaker: direction_metrics(array, sample_rate, li, ri)
            for speaker, (li, ri) in DIRECTION_PAIRS.items()
        },
    }


def analyze_wav(path: str) -> dict:
    data = wav_io.load(path)
    if data.channel_count != 14:
        raise PrototypeError(f"Expected 14 channels, got {data.channel_count}")
    return bank_metrics(data.audio.T.astype(np.float64), int(data.sample_rate))


# --- synthesis --------------------------------------------------------------------


def minimum_phase(ir: np.ndarray, fft_size: Optional[int] = None) -> np.ndarray:
    """Minimum-phase reconstruction via the real cepstrum (energy-preserving
    magnitude; all energy pulled to the front)."""
    ir = np.asarray(ir, np.float64)
    n = fft_size or max(4 * ir.size, 1 << (2 * ir.size - 1).bit_length())
    magnitude = np.abs(np.fft.fft(ir, n))
    log_mag = np.log(np.maximum(magnitude, 1e-12))
    cepstrum = np.fft.ifft(log_mag).real
    # Fold: double positive quefrencies, zero negative ones.
    folded = np.zeros_like(cepstrum)
    folded[0] = cepstrum[0]
    folded[1 : n // 2] = 2.0 * cepstrum[1 : n // 2]
    folded[n // 2] = cepstrum[n // 2]
    min_phase = np.fft.ifft(np.exp(np.fft.fft(folded))).real
    return min_phase[: ir.size]


def _diffuse_tail(length: int, sample_rate: int, decay_seconds: float,
                  band_weights: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Exponentially-decaying noise shaped to a third-octave distribution."""
    noise = rng.standard_normal(length)
    spectrum = np.fft.rfft(noise)
    freqs = np.fft.rfftfreq(length, 1.0 / sample_rate)
    gains = np.interp(freqs, THIRD_OCTAVE_CENTERS,
                      np.sqrt(np.maximum(band_weights, 0.0)),
                      left=0.0, right=0.0)
    shaped = np.fft.irfft(spectrum * gains, length)
    envelope = np.exp(-np.arange(length) / (decay_seconds * sample_rate))
    shaped *= envelope
    norm = float(np.linalg.norm(shaped))
    return shaped / norm if norm > 1e-15 else shaped


def synthesize_variant(
    base: np.ndarray,
    reference_metrics: dict,
    use_min_phase: bool,
    ambience_scale: float,
    frames: int = OUTPUT_FRAMES,
    sample_rate: int = SAMPLE_RATE,
    seed: int = 20_260_816,
) -> np.ndarray:
    """Build one variant bank [frames, 14] from a base bank + target metrics.

    Per direction: (optionally) minimum-phase the two ear IRs in place at
    their original peak anchors, add a deterministic diffuse tail whose
    energy hits `ambience_scale` x the reference 5 ms late-energy ratio, and
    rescale both ears to preserve the base pair energy and ILD.
    """
    base = _validate_bank(base)
    rng = np.random.default_rng(seed)
    out = np.zeros((frames, 14), np.float64)
    directions = reference_metrics["directions"]

    for speaker, (li, ri) in DIRECTION_PAIRS.items():
        target = directions[speaker]
        pair = []
        for idx in (li, ri):
            ir = base[:, idx][:frames]
            anchor = int(np.argmax(np.abs(ir)))
            if use_min_phase:
                mp = minimum_phase(ir)
                shifted = np.zeros(frames)
                usable = min(frames - anchor, mp.size)
                shifted[anchor : anchor + usable] = mp[:usable]
                ir = shifted
            else:
                padded = np.zeros(frames)
                padded[: ir.size] = ir
                ir = padded
            pair.append((idx, anchor, ir))

        pair_energy_sq = sum(float(np.sum(ir**2)) for _, _, ir in pair)
        anchor_min = min(anchor for _, anchor, _ in pair)
        onset = min(frames - 1, anchor_min + round(sample_rate * 0.005))
        existing_late = sum(
            float(np.sum(ir[onset:] ** 2)) for _, _, ir in pair
        )
        late_target = float(target["late_energy_ratios"]["5"]) * ambience_scale
        # Fit the DEFICIT so wet bases are not overshot: the added tails bring
        # the pair's late-energy ratio up to the target, never beyond.
        deficit = max(0.0, late_target * pair_energy_sq - existing_late)
        band_weights = np.asarray(target["late_field_third_octave_energy"])
        for idx, anchor, ir in pair:
            channel = ir.copy()
            if deficit > 1e-12 and band_weights.sum() > 0:
                tail_len = frames - onset
                tail = _diffuse_tail(tail_len, sample_rate, 0.030,
                                     band_weights, rng)
                # Two ear tails share the direction's energy budget.
                channel[onset:] += tail * math.sqrt(deficit / 2.0)
            out[:, idx] = channel

    peak = float(np.max(np.abs(out)))
    if peak > 0.98:
        out *= 0.98 / peak
    return out.astype(np.float32)


def validate_variant(
    variant: np.ndarray,
    reference_metrics: dict,
    sample_rate: int = SAMPLE_RATE,
    level_tolerance_db: float = 1.5,
    tonal_tolerance_db: float = 6.0,
) -> List[str]:
    """Direction-level and tonal-error bounds; returns a list of violations."""
    metrics = bank_metrics(np.asarray(variant, np.float64), sample_rate)
    problems: List[str] = []
    centers = np.asarray(THIRD_OCTAVE_CENTERS)
    audible = (centers >= 200.0) & (centers <= 12_000.0)
    for speaker in DIRECTION_PAIRS:
        got = metrics["directions"][speaker]
        want = reference_metrics["directions"][speaker]
        delta = abs(got["left_right_level_db"] - want["left_right_level_db"])
        if delta > level_tolerance_db:
            problems.append(
                f"{speaker}: interaural level error {delta:.2f} dB"
            )
        for ear in ("left", "right"):
            got_mag = np.asarray(got["normalized_third_octave_magnitude_db"][ear])
            want_mag = np.asarray(want["normalized_third_octave_magnitude_db"][ear])
            err = float(np.max(np.abs((got_mag - want_mag)[audible])))
            if err > tonal_tolerance_db:
                problems.append(
                    f"{speaker}/{ear}: tonal error {err:.2f} dB"
                )
    return problems


def main(argv=None) -> int:
    import signal

    try:  # behave like a unix tool when piped into head etc.
        signal.signal(signal.SIGPIPE, signal.SIG_DFL)
    except (AttributeError, ValueError):
        pass
    import argparse

    parser = argparse.ArgumentParser(
        description="Analyze a 14-channel HRIR WAV into aggregate spatial metrics"
    )
    parser.add_argument("wav")
    parser.add_argument("--output", help="metrics JSON path (default: stdout)")
    args = parser.parse_args(argv)
    metrics = analyze_wav(args.wav)
    text = json.dumps(metrics, indent=2, sort_keys=True)
    if args.output:
        with open(args.output, "w", encoding="utf-8") as f:
            f.write(text)
    else:
        print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
