"""Carry-pytree checkpoint/resume.

The reference deliberately resets transient DSP state on reconfiguration and
persists only configuration (SURVEY.md §5 "Checkpoint / resume"). The TPU
framework's carries (FDL + overlap + EQ state + crossfade counters) are plain
pytrees, so long-running bakes and serving pools get snapshot/resume for
free: save_pytree/load_pytree round-trip any NamedTuple-of-arrays carry to a
single .npz with structure metadata.
"""

from __future__ import annotations

import json
from typing import Any

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


def save_pytree(path: str, tree: Any) -> None:
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
    np.savez(_normalized(path), **arrays)


def load_pytree(path: str, like: Any) -> Any:
    """Restore a pytree saved by save_pytree into the structure of `like`.

    The stored structure metadata and every leaf's shape and dtype must
    match `like` exactly — a checkpoint from a different carry structure
    (or precision policy) is an error, never a silent cast."""
    with np.load(_normalized(path)) as data:
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
            ref_arr = np.asarray(ref)
            if loaded.shape != ref_arr.shape:
                raise ValueError(
                    f"{key}: shape {loaded.shape} != expected {ref_arr.shape}"
                )
            if loaded.dtype != ref_arr.dtype:
                raise ValueError(
                    f"{key}: dtype {loaded.dtype} != expected {ref_arr.dtype}"
                )
            leaves.append(loaded)
        return jax.tree_util.tree_unflatten(treedef, leaves)


def _treedef_repr(tree: Any) -> str:
    return str(jax.tree_util.tree_structure(tree))
