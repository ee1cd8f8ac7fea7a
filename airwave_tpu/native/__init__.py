"""Native host data plane: build-on-demand C++ ragged frame assembler.

The shared library is compiled once per machine (g++ -O3) into the package
directory and loaded with ctypes; `RaggedAssembler` falls back to a pure
NumPy implementation when no compiler is available, so the framework stays
importable everywhere (identical semantics, covered by the same tests).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "assembler.cc")
_LIB = os.path.join(_DIR, "_assembler.so")


def _build_library() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except (OSError, subprocess.SubprocessError):
        return None
    return _LIB


def _load() -> Optional[ctypes.CDLL]:
    path = _build_library()
    if path is None:
        return None
    lib = _bind(path)
    if lib is None and os.path.exists(_SRC):
        # A stale prebuilt .so can be missing newer symbols while passing
        # the mtime check (copies/extractions flatten mtimes): force ONE
        # rebuild from the current source, then give up gracefully — a
        # bind failure must degrade to the NumPy fallback, never break
        # `import airwave_tpu.native`.
        try:
            os.remove(path)
        except OSError:
            return None
        path = _build_library()
        if path is not None:
            lib = _bind(path)
    return lib


def _bind(path: str) -> Optional[ctypes.CDLL]:
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    try:
        _declare(lib)
    except AttributeError:
        return None
    return lib


def _declare(lib: ctypes.CDLL) -> None:
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.awv_create.restype = ctypes.c_void_p
    lib.awv_create.argtypes = [ctypes.c_int] * 4
    lib.awv_destroy.argtypes = [ctypes.c_void_p]
    lib.awv_push.restype = ctypes.c_int
    lib.awv_push.argtypes = [ctypes.c_void_p, ctypes.c_int, f32p, ctypes.c_int]
    lib.awv_pending.restype = ctypes.c_int
    lib.awv_pending.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.awv_ready_count.restype = ctypes.c_int
    lib.awv_ready_count.argtypes = [ctypes.c_void_p]
    lib.awv_harvest.restype = ctypes.c_int
    lib.awv_harvest.argtypes = [ctypes.c_void_p, ctypes.c_int, i32p, f32p]
    lib.awv_harvest_allowed.restype = ctypes.c_int
    lib.awv_harvest_allowed.argtypes = [ctypes.c_void_p, ctypes.c_int, i32p,
                                        i32p, f32p]
    lib.awv_harvest_allowed_n.restype = ctypes.c_int
    lib.awv_harvest_allowed_n.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                          ctypes.c_int, i32p, i32p, f32p]
    lib.awv_scatter_out_n.restype = ctypes.c_int
    lib.awv_scatter_out_n.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_int, i32p, f32p]
    lib.awv_out_free_all.restype = ctypes.c_int
    lib.awv_out_free_all.argtypes = [ctypes.c_void_p, i32p]
    lib.awv_scatter_out.restype = ctypes.c_int
    lib.awv_scatter_out.argtypes = [ctypes.c_void_p, ctypes.c_int, i32p, f32p]
    lib.awv_push_out.restype = ctypes.c_int
    lib.awv_push_out.argtypes = [ctypes.c_void_p, ctypes.c_int, f32p,
                                 ctypes.c_int]
    lib.awv_pop_out.restype = ctypes.c_int
    lib.awv_pop_out.argtypes = [ctypes.c_void_p, ctypes.c_int, f32p,
                                ctypes.c_int]
    lib.awv_out_available.restype = ctypes.c_int
    lib.awv_out_available.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.awv_reset_stream.restype = ctypes.c_int
    lib.awv_reset_stream.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.awv_push_many.restype = ctypes.c_int
    lib.awv_push_many.argtypes = [ctypes.c_void_p, ctypes.c_int, i32p, f32p,
                                  ctypes.c_int]
    lib.awv_pop_out_many.restype = ctypes.c_int
    lib.awv_pop_out_many.argtypes = [ctypes.c_void_p, ctypes.c_int, i32p,
                                     f32p, ctypes.c_int]


_lib = _load()


def native_available() -> bool:
    return _lib is not None


def _f32(array: np.ndarray):
    return array.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32(array: np.ndarray):
    return array.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class RaggedAssembler:
    """Per-stream ragged ingest -> dense device batches -> per-stream drain.

    push(stream, [C, n]) buffers input; harvest(max_batch) pops one block from
    every block-complete stream as (indices [k], blocks [k, C, block]);
    scatter(indices, blocks) queues rendered output; pop(stream, n) drains
    with zero-fill on underflow (the reference adapter's latency contract).
    """

    def __init__(self, n_streams: int, channels: int, block: int,
                 capacity: Optional[int] = None,
                 force_python: bool = False) -> None:
        self.n_streams = n_streams
        self.channels = channels
        self.block = block
        self.capacity = capacity or (block * 16)
        self._handle = None
        if _lib is not None and not force_python:
            handle = _lib.awv_create(n_streams, channels, block, self.capacity)
            if handle:
                self._handle = ctypes.c_void_p(handle)
        if self._handle is None:
            self._py_in = [np.zeros((channels, 0), np.float32)
                           for _ in range(n_streams)]
            self._py_out = [np.zeros((channels, 0), np.float32)
                            for _ in range(n_streams)]

    def __del__(self):
        if getattr(self, "_handle", None) is not None and _lib is not None:
            _lib.awv_destroy(self._handle)
            self._handle = None

    @property
    def is_native(self) -> bool:
        return self._handle is not None

    # --- input side -------------------------------------------------------------

    def push(self, stream: int, chunk: np.ndarray) -> None:
        chunk = np.ascontiguousarray(chunk, np.float32)
        assert chunk.ndim == 2 and chunk.shape[0] == self.channels
        if self._handle is not None:
            rc = _lib.awv_push(self._handle, stream, _f32(chunk),
                               chunk.shape[1])
            if rc == -1:
                raise OverflowError(f"stream {stream} input ring full")
            if rc != 0:
                raise ValueError(f"push failed ({rc})")
            return
        if self._py_in[stream].shape[1] + chunk.shape[1] > self.capacity:
            raise OverflowError(f"stream {stream} input ring full")
        self._py_in[stream] = np.concatenate(
            [self._py_in[stream], chunk], axis=1
        )

    def push_many(self, streams, chunks: np.ndarray) -> None:
        """One call pushes chunks[k, C, n] onto k streams (all-or-nothing:
        if ANY ring lacks space, nothing is written and OverflowError
        raises). The batch-host data-plane fast path — k python push
        calls measured ~7.6 ms/round at k=1024."""
        streams = np.ascontiguousarray(streams, np.int32)
        chunks = np.ascontiguousarray(chunks, np.float32)
        assert chunks.ndim == 3 and chunks.shape[0] == len(streams)
        assert chunks.shape[1] == self.channels
        # Validate ids BEFORE the zero-length no-op so both batch APIs
        # reject stale ids uniformly regardless of payload size.
        if np.any((streams < 0) | (streams >= self.n_streams)):
            raise ValueError("stream id out of range")
        if len(streams) == 0 or chunks.shape[2] == 0:
            return  # no-op, native/python parity
        if self._handle is not None:
            rc = _lib.awv_push_many(self._handle, len(streams),
                                    _i32(streams), _f32(chunks),
                                    chunks.shape[2])
            if rc == -1:
                raise OverflowError("an input ring is full (nothing pushed)")
            if rc != 0:
                raise ValueError(f"push_many failed ({rc})")
            return
        extra = {}
        for s in (int(v) for v in streams):
            if not 0 <= s < self.n_streams:
                raise ValueError(f"stream {s} out of range")
            if (self._py_in[s].shape[1] + extra.get(s, 0) + chunks.shape[2]
                    > self.capacity):
                raise OverflowError("an input ring is full (nothing pushed)")
            extra[s] = extra.get(s, 0) + chunks.shape[2]
        for j, s in enumerate(int(v) for v in streams):
            self._py_in[s] = np.concatenate(
                [self._py_in[s], chunks[j]], axis=1
            )

    def pop_many(self, streams, frames: int) -> np.ndarray:
        """Drain k streams into one [k, C, frames] array (zero-filled per
        stream on underflow)."""
        streams = np.ascontiguousarray(streams, np.int32)
        if np.any((streams < 0) | (streams >= self.n_streams)):
            raise ValueError("stream id out of range")
        out = np.zeros((len(streams), self.channels, frames), np.float32)
        if len(streams) == 0 or frames == 0:
            return out  # no-op, native/python parity
        if self._handle is not None:
            rc = _lib.awv_pop_out_many(self._handle, len(streams),
                                       _i32(streams), _f32(out), frames)
            if rc != 0:
                raise ValueError(f"pop_many failed ({rc})")
            return out
        for j, s in enumerate(int(v) for v in streams):
            buf = self._py_out[s]
            available = min(frames, buf.shape[1])
            out[j, :, :available] = buf[:, :available]
            self._py_out[s] = buf[:, available:]
        return out

    def pending(self, stream: int) -> int:
        if self._handle is not None:
            return _lib.awv_pending(self._handle, stream)
        return self._py_in[stream].shape[1]

    def ready_count(self) -> int:
        if self._handle is not None:
            return _lib.awv_ready_count(self._handle)
        return sum(
            1 for buf in self._py_in if buf.shape[1] >= self.block
        )

    def harvest(self, max_batch: int) -> Tuple[np.ndarray, np.ndarray]:
        indices = np.zeros(max_batch, np.int32)
        blocks = np.zeros((max_batch, self.channels, self.block), np.float32)
        if self._handle is not None:
            k = _lib.awv_harvest(self._handle, max_batch, _i32(indices),
                                 _f32(blocks))
        else:
            k = 0
            for i in range(self.n_streams):
                if k >= max_batch:
                    break
                if self._py_in[i].shape[1] >= self.block:
                    blocks[k] = self._py_in[i][:, : self.block]
                    self._py_in[i] = self._py_in[i][:, self.block:]
                    indices[k] = i
                    k += 1
        return indices[:k], blocks[:k]

    def harvest_allowed(self, max_batch: int, allow: np.ndarray,
                        frames: int = 0) -> Tuple[np.ndarray, np.ndarray]:
        """harvest(), restricted to streams with allow[stream] truthy.

        `frames` (default one block) pops that many frames from each
        qualifying stream — streams with fewer buffered frames are skipped.
        The multi-block serving tier harvests M * block per round."""
        frames = frames or self.block
        allow = np.ascontiguousarray(allow, np.int32)
        assert allow.shape == (self.n_streams,)
        indices = np.zeros(max_batch, np.int32)
        blocks = np.zeros((max_batch, self.channels, frames), np.float32)
        if self._handle is not None:
            k = _lib.awv_harvest_allowed_n(self._handle, max_batch, frames,
                                           _i32(allow), _i32(indices),
                                           _f32(blocks))
        else:
            k = 0
            for i in range(self.n_streams):
                if k >= max_batch:
                    break
                if allow[i] and self._py_in[i].shape[1] >= frames:
                    blocks[k] = self._py_in[i][:, :frames]
                    self._py_in[i] = self._py_in[i][:, frames:]
                    indices[k] = i
                    k += 1
        return indices[:k], blocks[:k]

    # --- output side -----------------------------------------------------------------

    def out_free_all(self) -> np.ndarray:
        """Per-stream output-ring free space [n_streams] in one call."""
        if self._handle is not None:
            out = np.zeros(self.n_streams, np.int32)
            _lib.awv_out_free_all(self._handle, _i32(out))
            return out
        return np.array(
            [self.capacity - buf.shape[1] for buf in self._py_out], np.int32
        )

    def scatter(self, indices: np.ndarray, blocks: np.ndarray) -> None:
        """Queue rendered frames per (unique) stream — blocks [k, C, n]
        with any n (the single-block pool passes n = block, the
        multi-block tier n = M * block). All-or-nothing: an OverflowError
        means NO ring was modified."""
        indices = np.ascontiguousarray(indices, np.int32)
        blocks = np.ascontiguousarray(blocks, np.float32)
        assert (blocks.ndim == 3 and blocks.shape[0] == len(indices)
                and blocks.shape[1] == self.channels)
        frames = blocks.shape[2]
        if len(indices) == 0 or frames == 0:
            return
        if self._handle is not None:
            rc = _lib.awv_scatter_out_n(self._handle, len(indices), frames,
                                        _i32(indices), _f32(blocks))
            if rc == -1:
                raise OverflowError("output ring full")
            if rc != 0:
                raise ValueError(f"scatter failed ({rc})")
            return
        extra = {}
        for stream in (int(s) for s in indices):
            if (self._py_out[stream].shape[1] + extra.get(stream, 0)
                    + frames > self.capacity):
                raise OverflowError("output ring full")
            extra[stream] = extra.get(stream, 0) + frames
        for j, stream in enumerate(indices):
            self._py_out[stream] = np.concatenate(
                [self._py_out[stream], blocks[j]], axis=1
            )

    def try_push_out(self, stream: int, chunk: np.ndarray) -> bool:
        """Queue rendered output for one stream; False when the ring lacks
        space (no partial write — callers keep the chunk and retry)."""
        chunk = np.ascontiguousarray(chunk, np.float32)
        assert chunk.ndim == 2 and chunk.shape[0] == self.channels
        if self._handle is not None:
            rc = _lib.awv_push_out(self._handle, stream, _f32(chunk),
                                   chunk.shape[1])
            if rc == -1:
                return False
            if rc != 0:
                raise ValueError(f"push_out failed ({rc})")
            return True
        if self._py_out[stream].shape[1] + chunk.shape[1] > self.capacity:
            return False
        self._py_out[stream] = np.concatenate(
            [self._py_out[stream], chunk], axis=1
        )
        return True

    def pop(self, stream: int, frames: int) -> np.ndarray:
        out = np.zeros((self.channels, frames), np.float32)
        if self._handle is not None:
            _lib.awv_pop_out(self._handle, stream, _f32(out), frames)
            return out
        buf = self._py_out[stream]
        available = min(frames, buf.shape[1])
        out[:, :available] = buf[:, :available]
        self._py_out[stream] = buf[:, available:]
        return out

    def out_available(self, stream: int) -> int:
        if self._handle is not None:
            return _lib.awv_out_available(self._handle, stream)
        return self._py_out[stream].shape[1]

    def reset_stream(self, stream: int) -> None:
        if self._handle is not None:
            _lib.awv_reset_stream(self._handle, stream)
            return
        self._py_in[stream] = np.zeros((self.channels, 0), np.float32)
        self._py_out[stream] = np.zeros((self.channels, 0), np.float32)
