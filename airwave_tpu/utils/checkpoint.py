"""Carry-pytree checkpoint/resume.

The reference deliberately resets transient DSP state on reconfiguration and
persists only configuration (SURVEY.md §5 "Checkpoint / resume"). The TPU
framework's carries (FDL + EQ state + crossfade counters) are plain
pytrees, so long-running bakes and serving pools get snapshot/resume for
free: save_pytree/load_pytree round-trip any NamedTuple-of-arrays carry to a
single .npz with structure metadata.
"""

from __future__ import annotations

import json
from typing import Any, Optional

import jax
import numpy as np


def _normalized(path: str) -> str:
    # np.savez appends ".npz" to extensionless paths but np.load does not;
    # normalize once so save/load agree on the SAME path for any caller.
    return path if path.endswith(".npz") else path + ".npz"


def _is_extension_dtype(dtype: np.dtype) -> bool:
    # Extension dtypes (ml_dtypes bfloat16 & friends) survive np.asarray but
    # np.savez serializes them as raw void ("|V2"), which load_pytree could
    # never match back to the true dtype. Detect them by the round-trip of
    # the dtype's serialized descriptor.
    try:
        return np.dtype(dtype.str) != dtype
    except TypeError:
        return True


def _resolve_dtype(name: str) -> np.dtype:
    try:
        import ml_dtypes

        if hasattr(ml_dtypes, name):
            return np.dtype(getattr(ml_dtypes, name))
    except ImportError:  # pragma: no cover - ml_dtypes ships with jax
        pass
    return np.dtype(name)


# Raw container magic (container="raw"): at multi-GB serving scale the
# npz/zipfile layer pays a CRC + small-chunk copy pass on every load —
# measured at 3 GiB on tmpfs (container cost isolated from the noisy
# virtio disk): npz 2.5 s save / 6.8 s load vs raw 2.3 s / 2.5 s
# (BENCH_NOTES "Round 5"). The raw layout is magic | u64 header-len |
# header JSON (treedef, extra, per-leaf shape/dtype/offset) |
# 64-byte-aligned leaf payloads, written with numpy tofile and read with
# chunked os.preadv into a preallocated buffer — the buffered read()
# path moves 13-40 MB/s on this class of virtualized host EVEN FROM
# PAGE CACHE, vs ~1 GB/s for 64 MiB preadv (measured; the fix took the
# at-scale pool load from 75 s to 17 s). Loaders dispatch on the file's
# first bytes, so every pre-existing .npz checkpoint (incl. the round-3
# gold fixtures) keeps loading through the zipfile path.
_RAW_MAGIC = b"AWSNAP1\n"


def _atomic_finalize(tmp: str, final: str) -> None:
    """fsync + rename + dir-fsync: atomic against process crash AND power
    loss (rename alone can land pointing at unflushed data)."""
    import os

    with open(tmp, "rb+") as f:
        os.fsync(f.fileno())
    os.replace(tmp, final)
    try:
        dir_fd = os.open(os.path.dirname(final) or ".", os.O_RDONLY)
        try:
            os.fsync(dir_fd)
        finally:
            os.close(dir_fd)
    except OSError:  # pragma: no cover - platform-dependent dir fsync
        pass


def _save_pytree_raw(path: str, tree: Any, extra_json: Any) -> None:
    import os

    leaves, _ = jax.tree_util.tree_flatten(tree)
    metas = []
    payloads = []
    base = 0
    for leaf in leaves:
        arr = np.asarray(leaf)
        shape = list(arr.shape)  # BEFORE ascontiguousarray: it 1-d-ifies
        arr = np.ascontiguousarray(arr)  # 0-d scalars (shape stays truth)
        pad = (-base) % 64
        base += pad
        metas.append({
            "shape": shape,
            "dtype": (arr.dtype.name if _is_extension_dtype(arr.dtype)
                      else arr.dtype.str),
            "ext": bool(_is_extension_dtype(arr.dtype)),
            "offset": base,
            "nbytes": int(arr.nbytes),
        })
        payloads.append((pad, arr))
        base += arr.nbytes
    header = json.dumps({
        "treedef": _treedef_repr(tree),
        "extra": extra_json,
        "leaves": metas,
    }).encode()
    final = _normalized(path)
    tmp = final + ".tmp.npz"
    with open(tmp, "wb") as f:
        f.write(_RAW_MAGIC)
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        payload_start = len(_RAW_MAGIC) + 8 + len(header)
        f.write(b"\x00" * ((-payload_start) % 64))
        for pad, arr in payloads:
            if pad:
                f.write(b"\x00" * pad)
            arr.tofile(f)
    _atomic_finalize(tmp, final)


class _RawContainer:
    """Reader counterpart of _save_pytree_raw with the subset of the
    NpzFile interface load_pytree uses. Leaf reads are single fseek +
    fromfile transfers (disk speed, no CRC/copy layer)."""

    def __init__(self, path: str) -> None:
        self._f = open(path, "rb")
        magic = self._f.read(len(_RAW_MAGIC))
        assert magic == _RAW_MAGIC, "not a raw snapshot"
        hlen = int.from_bytes(self._f.read(8), "little")
        header = json.loads(self._f.read(hlen).decode())
        self.extra = header.get("extra")
        self.treedef_repr = header.get("treedef")
        self._leaves = header["leaves"]
        start = len(_RAW_MAGIC) + 8 + hlen
        self._payload0 = start + ((-start) % 64)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self._f.close()

    # 64 MiB per preadv: large enough to amortize the syscall, small
    # enough that the kernel services it in one go. The obvious buffered
    # paths are pathological on virtualized hosts (measured, BENCH_NOTES
    # "Round 5": np.fromfile 13-40 MB/s, mmap-fault 75 MB/s — EVEN FROM
    # tmpfs — vs chunked preadv into a preallocated buffer at ~1 GB/s).
    _READ_CHUNK = 64 << 20

    def leaf(self, i: int) -> np.ndarray:
        import os

        if i >= len(self._leaves):
            raise ValueError(f"checkpoint missing leaf_{i}")
        m = self._leaves[i]
        raw = np.empty(m["nbytes"], np.uint8)
        mv = memoryview(raw)
        fd = self._f.fileno()
        pos = self._payload0 + m["offset"]
        done = 0
        while done < m["nbytes"]:
            got = os.preadv(
                fd, [mv[done:done + self._READ_CHUNK]], pos + done)
            if got <= 0:
                raise ValueError(
                    f"leaf_{i}: truncated payload "
                    f"({done} of {m['nbytes']} bytes)"
                )
            done += got
        dtype = _resolve_dtype(m["dtype"]) if m["ext"] \
            else np.dtype(m["dtype"])
        return raw.view(dtype).reshape(tuple(m["shape"]))


def _is_raw_snapshot(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return f.read(len(_RAW_MAGIC)) == _RAW_MAGIC
    except OSError:
        return False


def save_pytree(path: str, tree: Any, extra_json: Any = None,
                container: str = "npz") -> None:
    """Atomically persist a pytree of arrays to `<path>.npz`.

    The file is written to a temp name and os.replace'd into place, so a
    crash mid-write (the exact event checkpointing exists to survive)
    never tears or truncates an existing checkpoint. `extra_json`
    (optional, JSON-serializable) rides INSIDE the same file so array and
    control state can never be torn apart into mismatched generations;
    read it back with load_pytree_extra.

    `container="raw"` writes the raw large-transfer layout instead of
    npz (~2.7x faster load at multi-GB serving scale, no CRC pass, and
    per-leaf offsets for future lane surgery — BENCH_NOTES "Round 5");
    loaders auto-detect either container."""
    import os

    if container == "raw":
        _save_pytree_raw(path, tree, extra_json)
        return
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {}
    ext_dtypes = {}
    for i, leaf in enumerate(leaves):
        arr = np.asarray(leaf)
        key = f"leaf_{i}"
        if _is_extension_dtype(arr.dtype):
            # Store raw bytes; record the true dtype so load_pytree can
            # reinterpret (np.savez would silently write void "|V2").
            ext_dtypes[key] = {"dtype": arr.dtype.name, "shape": arr.shape}
            arr = np.frombuffer(arr.tobytes(), dtype=np.uint8)
        arrays[key] = arr
    arrays["__treedef__"] = np.frombuffer(
        json.dumps(_treedef_repr(tree)).encode(), dtype=np.uint8
    )
    if ext_dtypes:
        arrays["__ext_dtypes__"] = np.frombuffer(
            json.dumps(ext_dtypes).encode(), dtype=np.uint8
        )
    if extra_json is not None:
        arrays["__extra__"] = np.frombuffer(
            json.dumps(extra_json).encode(), dtype=np.uint8
        )
    final = _normalized(path)
    tmp = final + ".tmp.npz"  # keep the .npz suffix so savez won't append
    np.savez(tmp, **arrays)
    _atomic_finalize(tmp, final)


def load_pytree_extra(path: str) -> Any:
    """Read back save_pytree's `extra_json` payload (None if absent)."""
    norm = _normalized(path)
    if _is_raw_snapshot(norm):
        with _RawContainer(norm) as data:
            return data.extra
    with np.load(norm) as data:
        if "__extra__" not in data:
            return None
        return json.loads(bytes(data["__extra__"]).decode())


def load_pytree(path: str, like: Any, with_extra: bool = False,
                extra_check=None) -> Any:
    """Restore a pytree saved by save_pytree into the structure of `like`.

    The stored structure metadata and every leaf's shape and dtype must
    match `like` exactly — a checkpoint from a different carry structure
    (or precision policy) is an error, never a silent cast.

    with_extra=True returns (tree, extra_json_or_None) from the same
    archive open (load_pytree_extra exists for extra-only reads).
    `extra_check(extra_or_None)`, if given, runs BEFORE any structure or
    leaf validation (still within the single archive open) — the hook
    schema-versioned formats use to fail with a versioned error instead
    of a raw structure mismatch.

    Both containers load here (dispatch on the file's magic): the npz
    archive and save_pytree(container="raw")'s large-transfer layout."""
    norm = _normalized(path)
    if _is_raw_snapshot(norm):
        with _RawContainer(norm) as data:
            if extra_check is not None:
                extra_check(data.extra)
            if (data.treedef_repr is not None
                    and data.treedef_repr != _treedef_repr(like)):
                raise ValueError(
                    "checkpoint structure mismatch: saved "
                    f"{data.treedef_repr!r} != expected "
                    f"{_treedef_repr(like)!r}"
                )
            leaves_like, treedef = jax.tree_util.tree_flatten(like)
            leaves = []
            for i, ref in enumerate(leaves_like):
                loaded = data.leaf(i)
                _check_leaf_matches(i, loaded, ref)
                leaves.append(loaded)
            tree = jax.tree_util.tree_unflatten(treedef, leaves)
            return (tree, data.extra) if with_extra else tree
    with np.load(norm) as data:
        if extra_check is not None:
            extra_check(
                json.loads(bytes(data["__extra__"]).decode())
                if "__extra__" in data else None
            )
        if "__treedef__" in data:
            saved_structure = json.loads(bytes(data["__treedef__"]).decode())
            if saved_structure != _treedef_repr(like):
                raise ValueError(
                    "checkpoint structure mismatch: saved "
                    f"{saved_structure!r} != expected {_treedef_repr(like)!r}"
                )
        ext_dtypes = {}
        if "__ext_dtypes__" in data:
            ext_dtypes = json.loads(bytes(data["__ext_dtypes__"]).decode())
        leaves_like, treedef = jax.tree_util.tree_flatten(like)
        leaves = []
        for i, ref in enumerate(leaves_like):
            key = f"leaf_{i}"
            if key not in data:
                raise ValueError(f"checkpoint missing {key}")
            loaded = data[key]
            if key in ext_dtypes:
                meta = ext_dtypes[key]
                loaded = np.frombuffer(
                    loaded.tobytes(), dtype=_resolve_dtype(meta["dtype"])
                ).reshape(tuple(meta["shape"]))
            _check_leaf_matches(i, loaded, ref)
            leaves.append(loaded)
        tree = jax.tree_util.tree_unflatten(treedef, leaves)
        if not with_extra:
            return tree
        extra = (json.loads(bytes(data["__extra__"]).decode())
                 if "__extra__" in data else None)
        return tree, extra


def _check_leaf_matches(i: int, loaded: np.ndarray, ref: Any) -> None:
    """Strict per-leaf shape/dtype validation against the live template.

    Reads only `ref`'s metadata — never np.asarray(ref): the template is
    the pool's LIVE device state, and materializing it here would be a
    full device->host readback per load (fatal over the tunnel)."""
    ref_shape = getattr(ref, "shape", None)
    ref_dtype = getattr(ref, "dtype", None)
    if ref_shape is None or ref_dtype is None:
        arr = np.asarray(ref)  # non-array leaf (python scalar)
        ref_shape, ref_dtype = arr.shape, arr.dtype
    if loaded.shape != tuple(ref_shape):
        raise ValueError(
            f"leaf_{i}: shape {loaded.shape} != expected {tuple(ref_shape)}"
        )
    if loaded.dtype != ref_dtype:
        raise ValueError(
            f"leaf_{i}: dtype {loaded.dtype} != expected {ref_dtype}"
        )


def _treedef_repr(tree: Any) -> str:
    return str(jax.tree_util.tree_structure(tree))


# --- pool-snapshot persistence (serving checkpoint across processes) -----
#
# StreamPool.snapshot() returns arrays (the device carry + debt) plus
# control metadata (attached set, EQ crossfade machines with their
# definitions/designs). The arrays ride save_pytree/load_pytree (same
# strict structure/shape/dtype validation); the metadata goes to a JSON
# sidecar with explicit dataclass packing — never pickle.


def _pack_eq_definition(definition):
    if definition is None:
        return None
    return {
        "preamp_db": float(definition.preamp_db),
        "filters": [
            {
                "source_line": f.source_line,
                "source_number": f.source_number,
                "is_enabled": bool(f.is_enabled),
                "type": f.type.value,
                "frequency_hz": float(f.frequency_hz),
                "gain_db": float(f.gain_db),
                "q": float(f.q),
            }
            for f in definition.filters
        ],
    }


def _unpack_eq_definition(packed):
    if packed is None:
        return None
    from airwave_tpu.io.apo import (EqualizerDefinition, EqualizerFilter,
                                    FilterType)

    return EqualizerDefinition(
        preamp_db=packed["preamp_db"],
        filters=tuple(
            EqualizerFilter(
                source_line=f["source_line"],
                source_number=f["source_number"],
                is_enabled=f["is_enabled"],
                type=FilterType(f["type"]),
                frequency_hz=f["frequency_hz"],
                gain_db=f["gain_db"],
                q=f["q"],
            )
            for f in packed["filters"]
        ),
    )


def _pack_prepared(item):
    if item is None:
        return None
    _, definition, design = item
    preamp, coeffs = design
    return {
        "definition": _pack_eq_definition(definition),
        "design": [float(preamp),
                   [[c.b0, c.b1, c.b2, c.a1, c.a2] for c in coeffs]],
    }


def _unpack_prepared(packed):
    if packed is None:
        return None
    from airwave_tpu.ops.biquad_design import BiquadCoefficients

    preamp, coeffs = packed["design"]
    return (
        "prepared",
        _unpack_eq_definition(packed["definition"]),
        (preamp, [BiquadCoefficients(*c) for c in coeffs]),
    )


def _pack_eq_runtime(snap: dict) -> dict:
    return {
        "active": _pack_prepared(snap["active"]),
        "transition_from": _pack_prepared(snap["transition_from"]),
        "pending": _pack_prepared(snap["pending"]),
        "samples_into_transition": int(snap["samples_into_transition"]),
        "reset_requested": bool(snap["reset_requested"]),
    }


def _unpack_eq_runtime(packed: dict) -> dict:
    return {
        "active": _unpack_prepared(packed["active"]),
        "transition_from": _unpack_prepared(packed["transition_from"]),
        "pending": _unpack_prepared(packed["pending"]),
        "samples_into_transition": packed["samples_into_transition"],
        "reset_requested": packed["reset_requested"],
    }


def checkpoint_path(path: str) -> str:
    """The on-disk file a checkpoint path resolves to (single source of
    the .npz suffix rule — callers existence-check THIS, never reimplement
    the suffix logic)."""
    return _normalized(path)


# Serving-checkpoint schema history (the persisted format VERSIONS, the
# reference's DeviceProfileManager/ProductSetup pattern —
# /root/reference/Airwave/DeviceProfileManager.swift:45,317-320 and
# ProductSetup.swift:53-76 wrap every persisted store in a schemaVersion
# envelope and migrate or reject):
#   (unversioned, sidecar)  round-3 first iteration: metadata in a
#                           .meta.json sidecar next to the npz.
#   (unversioned, embedded) round-3 one-file format. Written by BOTH
#                           carry generations (the half-window fold
#                           shipped before versioning existed), so a
#                           schema-less one-file snapshot is decided by
#                           structure validation, not rejected outright.
#   2                       half-window carry: no overlap leaf, the delay
#                           line holds half-window analysis spectra and the
#                           bank carries P+1 partitions (ops/upols.py
#                           `_half_window_bank`).
# A schema mismatch is an UPGRADE event, not corruption: the loader names
# both versions so the operator knows a matching build can still read the
# file (serve moves it aside to `.incompatible`, never deletes).
POOL_SNAPSHOT_SCHEMA = 2


class SnapshotCompatError(ValueError):
    """A pool snapshot from an incompatible format generation (schema or
    carry mismatch). Subclasses ValueError so existing move-aside handlers
    (shell/app.py serve resume) keep working; exists as its own type so
    the loader can tell its OWN versioned errors from raw structural
    mismatches and never re-wrap one."""


def _carry_format(state_tree) -> str:
    """Structural tag for a pool carry, independent of the schema counter:
    the sorted leaf-field names of the carried state tree. Catches a
    future carry-layout change that forgets to bump POOL_SNAPSHOT_SCHEMA
    (the exact omission that motivated versioning: the half-window commit
    silently invalidated every existing snapshot)."""
    paths = jax.tree_util.tree_flatten_with_path(state_tree)[0]
    names = sorted({str(kp[-1]) for kp, _ in paths})
    return ",".join(names)


# The round-3 full-window conv carry, reconstructed for migration: the
# class NAME and field order must match what round 3 pickled into the
# treedef string (jax renders namedtuples by name, so a shim suffices).
import collections as _collections

_LegacyConvState = _collections.namedtuple(
    "ConvState", ["fdl", "overlap", "write_pos"]
)


def _migrate_full_window_snapshot(path: str, pool, like):
    """Try to read `path` as a round-3 FULL-window pool snapshot and
    convert it to this build's half-window carry (see
    ops/upols.migrate_full_window_fdl for the math). Returns the migrated
    StreamPool.restore() dict, or None if the file does not have the
    full-window layout (caller raises the versioned error)."""
    from airwave_tpu.ops import upols as _upols

    if getattr(pool, "blocks_per_step", 1) != 1:
        return None  # paged-tier carries have no migration path
    T = int(pool.block_size)

    # A grouped pool's state is ONE PoolState whose `conv`/`eq` fields
    # are per-group TUPLES (runtime/stream_pool: per-group lane-state
    # design); ungrouped is a bare ConvState. Same shape in round 3.
    def conv_to_legacy(conv):
        if not hasattr(conv, "fdl") or np.asarray(conv.fdl).ndim != 5:
            raise ValueError("not a single-block conv carry")
        kp, S, p2, c, B = np.asarray(conv.fdl).shape
        if p2 < 2 or c != 2:
            raise ValueError("unexpected conv carry shape")
        return _LegacyConvState(
            fdl=np.zeros((kp, S, p2 - 1, c, B), np.float32),
            overlap=np.zeros((B, S, T), np.float32),
            write_pos=np.zeros((), np.int32),
        )

    state_new = like["state"]
    conv_new = state_new.conv
    grouped = not hasattr(conv_new, "_fields")
    try:
        legacy_conv = (tuple(conv_to_legacy(c) for c in conv_new)
                       if grouped else conv_to_legacy(conv_new))
        like_old = {"state": state_new._replace(conv=legacy_conv),
                    "debt": like["debt"]}
        data, meta = load_pytree(path, like_old, with_extra=True)
    except (ValueError, KeyError):
        return None
    # A pre-versioning file that lacks any of the control-metadata keys
    # this build restores is from an even earlier generation than the
    # round-3 one-file format; fall through to the versioned error rather
    # than raising a raw KeyError (shell/app.py's move-aside path catches
    # ValueError).
    if not isinstance(meta, dict) or not (
        {"attached", "eq_enabled", "groups", "eq_runtime"} <= meta.keys()
    ):
        return None

    debt = np.asarray(data["debt"], np.int64)
    convs_old = data["state"].conv if grouped else (data["state"].conv,)
    groups = len(convs_old)
    lanes_per_group = debt.shape[0] // max(1, groups)

    def convert(conv, g):
        d = debt[g * lanes_per_group:(g + 1) * lanes_per_group]
        new_fdl = _upols.migrate_full_window_fdl(
            conv.fdl, conv.overlap, int(conv.write_pos), d
        )
        return _upols.ConvState(
            fdl=new_fdl,
            write_pos=np.asarray(conv.write_pos, np.int32),
        )

    converted = tuple(convert(c, g) for g, c in enumerate(convs_old))
    state = data["state"]._replace(
        conv=converted if grouped else converted[0]
    )
    snap = {
        "state": state,
        "debt": np.zeros_like(debt),  # repaid inside the migration
        "attached": meta["attached"],
        "eq_enabled": meta["eq_enabled"],
        "groups": meta["groups"],
        "eq_runtime": _unpack_eq_runtime(meta["eq_runtime"]),
        "migrated_from": "full-window (schema 1)",
    }
    if "eq_runtimes" in meta:
        snap["eq_runtimes"] = [_unpack_eq_runtime(s)
                               for s in meta["eq_runtimes"]]
    if "resume_tokens" in meta:
        snap["resume_tokens"] = {
            int(k): v for k, v in meta["resume_tokens"].items()
        }
    return snap


def save_pool_snapshot(path: str, snap: dict) -> None:
    """Persist a StreamPool.snapshot() to ONE file at `<path>.npz`,
    atomically (temp + os.replace): carry arrays plus control metadata
    (attached set, per-group EQ machines, debt, optional serving resume
    tokens) can never tear into mismatched generations. Pair with
    load_pool_snapshot on a pool of identical construction for a
    bit-identical cross-process serving resume.

    The meta carries POOL_SNAPSHOT_SCHEMA plus a structural carry tag
    derived from snap["state"], so snapshots are self-describing about
    WHICH carry generation wrote them."""
    meta = {
        "schema": POOL_SNAPSHOT_SCHEMA,
        "carry": _carry_format(snap["state"]),
        "attached": [int(s) for s in snap["attached"]],
        "eq_enabled": bool(snap["eq_enabled"]),
        "groups": int(snap.get("groups", 1)),
        "eq_runtime": _pack_eq_runtime(snap["eq_runtime"]),
    }
    if "eq_runtimes" in snap:
        meta["eq_runtimes"] = [_pack_eq_runtime(s)
                               for s in snap["eq_runtimes"]]
    if "resume_tokens" in snap:
        meta["resume_tokens"] = {
            str(k): str(v) for k, v in snap["resume_tokens"].items()
        }
    # Raw container: serving snapshots are multi-GB at production scale
    # (B=16,384 M=8 carry = 3.078 GiB); raw loads ~2.7x faster than npz
    # at that scale (no CRC/zip copy pass; chunked preadv — measured,
    # BENCH_NOTES "Round 5"). load_pool_snapshot auto-detects either
    # container, so pre-existing npz checkpoints (incl. round-3 gold
    # fixtures) keep loading.
    save_pytree(path, {"state": snap["state"],
                       "debt": np.asarray(snap["debt"])},
                extra_json=meta, container="raw")


def snapshot_lane_count(path: str) -> int:
    """Lane count (max_streams) a pool snapshot was written at, read from
    the debt leaf's shape without loading any carry arrays. The snapshot
    tree is {"debt": [max_streams], "state": ...} and dict pytrees
    flatten key-sorted, so debt is leaf 0 in either container (true for
    every one-file generation incl. pre-versioning round-3 files)."""
    norm = _normalized(path)
    if _is_raw_snapshot(norm):
        with _RawContainer(norm) as data:
            shape = data._leaves[0]["shape"]
    else:
        with np.load(norm) as data:
            if "leaf_0" not in data:
                raise ValueError(
                    f"{norm}: not a pool snapshot (no leaf_0)"
                )
            shape = data["leaf_0"].shape
    if len(shape) != 1:
        raise ValueError(
            f"{norm}: leaf 0 is not a per-lane vector (shape {shape}) — "
            "not a pool snapshot this build understands"
        )
    return int(shape[0])


def load_pool_snapshot(path: str, pool, lanes: Optional[int] = None) -> dict:
    """Load a persisted pool snapshot back into StreamPool.restore() form.

    `pool` supplies the expected carry structure (strict shape/dtype
    validation, as load_pytree); call `pool.restore(load_pool_snapshot(
    path, pool))` to resume. A serving checkpoint's `resume_tokens`
    (lane -> secret) ride along for RenderServer(orphan_tokens=...).

    `lanes=N` validates against the pool's carry RE-BATCHED to N lanes
    instead of the pool's own max_streams — for loading a snapshot
    written by a differently-SIZED pool (same renderer shapes / groups /
    blocks_per_step) ahead of `pool.restore(snap, resize=True)`, which
    compacts the attached lanes into the pool's lane space and returns
    the lane map (peek the written size with `snapshot_lane_count`).
    Pre-versioning (round-3 full-window) files are not resize-loadable:
    migrate them at their original size first.

    Schema versioning runs BEFORE the array validation (same archive
    open): a checkpoint from a different format generation fails with a
    versioned, actionable error naming both schemas — never a raw
    treedef/shape traceback. One nuance: the unversioned one-file format
    was written by BOTH carry generations (round 3 shipped the
    half-window fold before schema versioning existed), so a schema-less
    file is not rejected outright — the strict structure validation
    decides, and only if THAT fails is the error upgraded to the
    versioned pre-versioning explanation."""
    if lanes is not None and lanes != pool.max_streams:
        like = pool.state_like(lanes)
    else:
        lanes = None  # same-size: the plain path (incl. migration)
        like = {
            "state": jax.tree_util.tree_map(np.asarray, pool._state),
            "debt": np.asarray(pool._debt),
        }
    expected_carry = _carry_format(like["state"])
    seen = {}

    def _schema_check(meta):
        seen["meta"] = meta
        if meta is None:
            # Sidecar-era file (metadata lived in a .meta.json next to
            # the npz): predates both the one-file format and the
            # half-window carry; its control metadata is not in the
            # archive, so it cannot be restored by this build even if
            # the arrays happened to match.
            raise SnapshotCompatError(
                f"{checkpoint_path(path)}: checkpoint schema 1 (sidecar "
                "layout, full-window era) is incompatible with schema "
                f"{POOL_SNAPSHOT_SCHEMA}. Re-create the snapshot with "
                "this build, or read it with the build that wrote it."
            )
        if "schema" not in meta:
            return  # pre-versioning one-file format: structure decides
        if meta["schema"] != POOL_SNAPSHOT_SCHEMA:
            raise SnapshotCompatError(
                f"{checkpoint_path(path)}: checkpoint schema "
                f"{meta['schema']} is incompatible with this build's "
                f"schema {POOL_SNAPSHOT_SCHEMA}. Re-create the snapshot "
                "with this build, or read it with the build that wrote "
                "it."
            )
        if meta.get("carry", expected_carry) != expected_carry:
            raise SnapshotCompatError(
                f"{checkpoint_path(path)}: checkpoint carry format "
                f"{meta['carry']!r} does not match this build's "
                f"{expected_carry!r} at schema {POOL_SNAPSHOT_SCHEMA} — "
                "the carry layout changed without a schema bump; treat "
                "as an incompatible upgrade (re-create the snapshot "
                "with this build)."
            )

    try:
        data, meta = load_pytree(path, like, with_extra=True,
                                 extra_check=_schema_check)
    except ValueError as exc:
        if isinstance(exc, SnapshotCompatError):
            raise  # already one of our versioned errors — never re-wrap
        meta = seen.get("meta")
        if meta is not None and "schema" not in meta and lanes is not None:
            raise SnapshotCompatError(
                f"{checkpoint_path(path)}: pre-versioning snapshots "
                "cannot be loaded at a different lane count — load it "
                "at the size it was written (the round-3 full-window "
                "migration applies there), re-save, then resize."
            ) from exc
        if meta is not None and "schema" not in meta:
            # Pre-versioning one-file format whose arrays do NOT match
            # this build: the FULL-window carry (ConvState with an
            # `overlap` block). MIGRATE it (the reference's
            # ProductSetup v1->v2 migrate-on-load pattern,
            # /root/reference/Airwave/ProductSetup.swift:53-76): the
            # shift theorem makes the old carry exactly convertible —
            # see ops/upols.migrate_full_window_fdl.
            migrated = _migrate_full_window_snapshot(path, pool, like)
            if migrated is not None:
                return migrated
            raise SnapshotCompatError(
                f"{checkpoint_path(path)}: checkpoint predates schema "
                "versioning and its carry neither matches this build "
                "nor fits the round-3 full-window layout this build "
                "can migrate — schema 1 vs this build's schema "
                f"{POOL_SNAPSHOT_SCHEMA} (half-window carry). Re-create "
                "the snapshot with this build, or read it with the "
                f"build that wrote it. (Underlying mismatch: {exc})"
            ) from exc
        # Same schema AND same carry tag, yet the arrays still don't
        # match: either this pool is constructed differently from the
        # writer (lanes / block size / IR partitions / groups), or a
        # carry relayout kept the leaf field names while changing
        # shapes/axis order without a schema bump. Either way the
        # docstring's contract holds — versioned and actionable, never a
        # raw treedef/shape traceback.
        raise SnapshotCompatError(
            f"{checkpoint_path(path)}: checkpoint matches this build's "
            f"schema {POOL_SNAPSHOT_SCHEMA} and carry format but its "
            "arrays do not fit this pool — the writing pool was "
            "constructed differently (lanes, block size, IR partitions, "
            "profile groups), or the carry layout changed without a "
            "schema bump. Load it with an identically-constructed pool "
            "(a size-only difference resizes: load_pool_snapshot(..., "
            "lanes=snapshot_lane_count(path)) then restore(..., "
            f"resize=True)), or re-create the snapshot. "
            f"(Underlying mismatch: {exc})"
        ) from exc
    snap = {
        "state": data["state"],
        "debt": data["debt"],
        "attached": meta["attached"],
        "eq_enabled": meta["eq_enabled"],
        "groups": meta["groups"],
        "eq_runtime": _unpack_eq_runtime(meta["eq_runtime"]),
    }
    if "eq_runtimes" in meta:
        snap["eq_runtimes"] = [_unpack_eq_runtime(s)
                               for s in meta["eq_runtimes"]]
    if "resume_tokens" in meta:
        snap["resume_tokens"] = {
            int(k): v for k, v in meta["resume_tokens"].items()
        }
    return snap
