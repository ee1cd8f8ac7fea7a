"""Minimal SOFA (SimpleFreeFieldHRIR) reader built on h5py.

Replaces the reference tool's sofar dependency
(/root/reference/tools/ss2-to-hesuvi/convert.py:287-333) with a direct
HDF5/netCDF4 reader covering exactly what the converter needs:
Data.IR / Data.SamplingRate / Data.Delay, listener basis, source geometry
(spherical-degrees or cartesian-metres), and left/right receiver
identification from receiver positions.
"""

from __future__ import annotations

import dataclasses
import hashlib
import math
from typing import Tuple

import numpy as np

EPSILON = 1e-9


class ConversionError(RuntimeError):
    """Raised when conversion cannot preserve the SOFA data safely."""


@dataclasses.dataclass
class SofaHRIR:
    source_path: str
    source_hash: str
    listener_short_name: str
    database_name: str
    license_name: str
    sample_rate: int
    impulse_responses: np.ndarray  # [M, 2, N] float64
    delays: np.ndarray             # [M, 2] float64 (samples)
    source_vectors: np.ndarray     # [M, 3] unit vectors in listener frame
    source_azimuths: np.ndarray    # [M] degrees, +left
    source_elevations: np.ndarray  # [M] degrees
    left_receiver: int
    right_receiver: int


def sha256_file(path: str) -> str:
    digest = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            digest.update(chunk)
    return digest.hexdigest()


def _attr(obj, name: str, default: str = "") -> str:
    value = obj.attrs.get(name, default)
    if isinstance(value, bytes):
        return value.decode("utf-8", "replace")
    if isinstance(value, np.ndarray):
        value = value.tobytes().decode("utf-8", "replace") if value.dtype.kind == "S" \
            else str(value)
    return str(value)


def _rows(value, columns: int, name: str) -> np.ndarray:
    array = np.asarray(value, np.float64).squeeze()
    if array.ndim == 1:
        if array.size != columns:
            raise ConversionError(f"{name} must contain {columns} coordinates")
        return array.reshape(1, columns)
    if array.ndim == 2 and array.shape[1] == columns:
        return array
    if array.ndim == 2 and array.shape[0] == columns:
        return array.T
    raise ConversionError(f"Unsupported {name} shape: {array.shape}")


def _constant_row(value, name: str) -> np.ndarray:
    rows = _rows(value, 3, name)
    if rows.shape[0] > 1 and not np.allclose(rows, rows[0], atol=EPSILON, rtol=0):
        raise ConversionError(f"Varying {name} is not supported")
    return rows[0]


def _spherical_to_cartesian(positions: np.ndarray) -> np.ndarray:
    az = np.deg2rad(positions[:, 0])
    el = np.deg2rad(positions[:, 1])
    r = positions[:, 2]
    return np.stack(
        [r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az), r * np.sin(el)],
        axis=1,
    )


def _listener_frame(f) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    lp_var = f["ListenerPosition"]
    if _attr(lp_var, "Type", "cartesian").lower() != "cartesian":
        raise ConversionError("Unsupported ListenerPosition type")
    position = _constant_row(lp_var[()], "ListenerPosition")
    forward = _constant_row(f["ListenerView"][()], "ListenerView")
    up = _constant_row(f["ListenerUp"][()], "ListenerUp")

    norm = np.linalg.norm(forward)
    if norm <= EPSILON:
        raise ConversionError("ListenerView has zero length")
    forward = forward / norm
    up = up - np.dot(up, forward) * forward
    norm = np.linalg.norm(up)
    if norm <= EPSILON:
        raise ConversionError("ListenerUp is parallel to ListenerView")
    up = up / norm
    left = np.cross(up, forward)
    left = left / np.linalg.norm(left)
    return position, forward, left, up


def _source_geometry(f):
    position, forward, left, up = _listener_frame(f)
    var = f["SourcePosition"]
    positions = _rows(var[()], 3, "SourcePosition")
    kind = _attr(var, "Type").lower()
    units = _attr(var, "Units").lower()
    if kind == "spherical":
        if "degree" not in units:
            raise ConversionError(f"SourcePosition must use degrees, got: {units}")
        world = _spherical_to_cartesian(positions)
    elif kind == "cartesian":
        if "metre" not in units and "meter" not in units:
            raise ConversionError(f"SourcePosition must use metres, got: {units}")
        world = positions
    else:
        raise ConversionError(f"Unsupported SourcePosition type: {kind}")

    offsets = world - position
    norms = np.linalg.norm(offsets, axis=1)
    if np.any(norms <= EPSILON):
        raise ConversionError("SourcePosition contains a source at ListenerPosition")
    unit = offsets / norms[:, None]
    local = np.stack([unit @ forward, unit @ left, unit @ up], axis=1)
    local = local / np.linalg.norm(local, axis=1)[:, None]
    azimuths = np.rad2deg(np.arctan2(local[:, 1], local[:, 0]))
    elevations = np.rad2deg(np.arcsin(np.clip(local[:, 2], -1.0, 1.0)))
    return local, azimuths, elevations


def _receivers(f) -> Tuple[int, int]:
    var = f["ReceiverPosition"]
    if _attr(var, "Type").lower() != "cartesian":
        raise ConversionError("Unsupported ReceiverPosition type")
    units = _attr(var, "Units").lower()
    if "metre" not in units and "meter" not in units:
        raise ConversionError(f"ReceiverPosition must use metres, got: {units}")
    positions = _rows(var[()], 3, "ReceiverPosition")
    if positions.shape[0] != 2:
        raise ConversionError(
            f"Expected two receiver positions, got {positions.shape[0]}"
        )
    listener_position, _, left_axis, _ = _listener_frame(f)
    lateral = (positions - listener_position) @ left_axis
    left_candidates = np.flatnonzero(lateral > EPSILON)
    right_candidates = np.flatnonzero(lateral < -EPSILON)
    if left_candidates.size != 1 or right_candidates.size != 1:
        raise ConversionError(
            "ReceiverPosition does not identify exactly one left and one right ear"
        )
    return int(left_candidates[0]), int(right_candidates[0])


def _expand_delays(raw, measurements: int) -> np.ndarray:
    array = np.asarray(raw, np.float64).squeeze()
    if array.ndim == 0:
        array = np.full((measurements, 2), float(array))
    elif array.shape == (2,):
        array = np.tile(array, (measurements, 1))
    elif array.shape != (measurements, 2):
        raise ConversionError(f"Unsupported Data.Delay shape: {array.shape}")
    if not np.all(np.isfinite(array)) or np.any(array < 0):
        raise ConversionError(
            "Data.Delay must contain finite, non-negative sample delays"
        )
    return array


def read_sofa_hrir(path: str) -> SofaHRIR:
    import h5py

    try:
        f = h5py.File(path, "r")
    except OSError as err:
        raise ConversionError(f"Cannot open SOFA file: {err}")
    with f:
        conventions = _attr(f, "SOFAConventions")
        if conventions != "SimpleFreeFieldHRIR":
            raise ConversionError(
                f"Expected SimpleFreeFieldHRIR, got {conventions}"
            )
        data_type = _attr(f, "DataType")
        if data_type != "FIR":
            raise ConversionError(f"Expected FIR data, got {data_type}")

        impulses = np.asarray(f["Data.IR"][()], np.float64)
        if impulses.ndim != 3 or impulses.shape[1] != 2 or impulses.shape[2] == 0:
            raise ConversionError(
                f"Expected non-empty M x 2 x N Data.IR, got {impulses.shape}"
            )
        if not np.all(np.isfinite(impulses)):
            raise ConversionError("Data.IR contains NaN or infinite samples")

        rates = np.asarray(f["Data.SamplingRate"][()], np.float64).reshape(-1)
        if rates.size != 1 or not np.isfinite(rates[0]) or rates[0] <= 0:
            raise ConversionError(
                "Data.SamplingRate must contain one positive finite value"
            )
        rate = int(round(float(rates[0])))
        if not math.isclose(float(rates[0]), rate, abs_tol=1e-6):
            raise ConversionError("WAV output requires an integer sample rate")

        vectors, azimuths, elevations = _source_geometry(f)
        if vectors.shape[0] != impulses.shape[0]:
            raise ConversionError(
                "SourcePosition and Data.IR measurement counts differ"
            )
        left, right = _receivers(f)
        delays = _expand_delays(
            f["Data.Delay"][()] if "Data.Delay" in f else 0.0,
            impulses.shape[0],
        )

        return SofaHRIR(
            source_path=path,
            source_hash=sha256_file(path),
            listener_short_name=_attr(f, "ListenerShortName"),
            database_name=_attr(f, "DatabaseName"),
            license_name=_attr(f, "License"),
            sample_rate=rate,
            impulse_responses=impulses,
            delays=delays,
            source_vectors=vectors,
            source_azimuths=azimuths,
            source_elevations=elevations,
            left_receiver=left,
            right_receiver=right,
        )
