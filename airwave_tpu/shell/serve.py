"""Network streaming server: the deployable serving frontend.

Clients connect over TCP, send a JSON header line, then length-prefixed
float32 PCM chunks; the server renders them through a shared StreamPool
(HRIR binaural + EQ on the accelerator) and streams rendered stereo back.
This is the production analog of the reference's CoreAudio transport: the
socket replaces the HAL callback; everything downstream is the same graph.

Wire protocol (little-endian):
  client -> server:  one JSON line {"channels": C}\n
                     then frames: uint32 n | float32 data[C*n]  (n == 0: EOF)
  server -> client:  frames: uint32 n | float32 data[2*n]
Rendered audio follows the pool's underflow contract: the server returns
whatever is rendered so far; remaining tail is flushed after the client EOF
(zero-padded to the block boundary).
"""

from __future__ import annotations

import json
import socket
import struct
import threading
from typing import Optional

import numpy as np

from airwave_tpu.runtime.stream_pool import StreamPool

_LEN = struct.Struct("<I")


def _read_exact(conn: socket.socket, n: int) -> Optional[bytes]:
    chunks = []
    while n > 0:
        data = conn.recv(min(n, 1 << 16))
        if not data:
            return None
        chunks.append(data)
        n -= len(data)
    return b"".join(chunks)


def _send_frame(conn: socket.socket, audio: np.ndarray) -> None:
    payload = np.ascontiguousarray(audio.T, np.float32).tobytes()
    conn.sendall(_LEN.pack(audio.shape[1]) + payload)


class RenderServer:
    """One StreamPool shared across client connections."""

    def __init__(self, pool: StreamPool, host: str = "127.0.0.1",
                 port: int = 0) -> None:
        self.pool = pool
        self._lock = threading.Lock()  # pool control-plane lock
        self._listener = socket.create_server((host, port))
        self.address = self._listener.getsockname()
        self._threads = []
        self._accept_thread: Optional[threading.Thread] = None
        self._stopping = False
        self.connections_served = 0

    def start(self) -> None:
        self._accept_thread = threading.Thread(target=self._accept_loop,
                                               daemon=True)
        self._accept_thread.start()

    def stop(self) -> None:
        self._stopping = True
        try:
            self._listener.close()
        except OSError:
            pass
        for thread in self._threads:
            thread.join(timeout=5)

    def _accept_loop(self) -> None:
        while not self._stopping:
            try:
                conn, _addr = self._listener.accept()
            except OSError:
                return
            thread = threading.Thread(target=self._serve_client,
                                      args=(conn,), daemon=True)
            self._threads.append(thread)
            thread.start()

    def _serve_client(self, conn: socket.socket) -> None:
        stream: Optional[int] = None
        block = self.pool.block_size
        try:
            conn.settimeout(30.0)
            header_bytes = b""
            while not header_bytes.endswith(b"\n"):
                chunk = conn.recv(1)
                if not chunk:
                    return
                header_bytes += chunk
                if len(header_bytes) > 4096:
                    return
            header = json.loads(header_bytes.decode())
            channels = int(header.get("channels", 2))

            with self._lock:
                stream = self.pool.attach()
                self.connections_served += 1
            received = 0
            returned = 0

            while True:
                raw = _read_exact(conn, _LEN.size)
                if raw is None:
                    break
                (n,) = _LEN.unpack(raw)
                if n == 0:
                    break  # client EOF
                payload = _read_exact(conn, n * channels * 4)
                if payload is None:
                    break
                frames = np.frombuffer(payload, "<f4").reshape(n, channels).T
                with self._lock:
                    self.pool.push(stream, frames)
                    self.pool.pump()
                    available = self.pool.available(stream)
                    out = self.pool.pull(stream, available) if available else None
                received += n
                if out is not None and out.shape[1]:
                    returned += out.shape[1]
                    _send_frame(conn, out)

            # Flush: pad the pending partial block, render, return the exact
            # remaining frames of the client's signal.
            remaining = received - returned
            if remaining > 0:
                pad = (-received) % block
                with self._lock:
                    if pad:
                        self.pool.push(
                            stream, np.zeros((channels, pad), np.float32)
                        )
                    self.pool.pump()
                    out = self.pool.pull(stream, remaining)
                _send_frame(conn, out)
            conn.sendall(_LEN.pack(0))
        except (OSError, ValueError, json.JSONDecodeError):
            pass
        finally:
            if stream is not None:
                with self._lock:
                    self.pool.detach(stream)
            try:
                conn.close()
            except OSError:
                pass


def render_via_server(address, audio: np.ndarray,
                      chunk: int = 1024) -> np.ndarray:
    """Reference client: stream [C, n] audio, return rendered [2, n]."""
    channels, total = audio.shape
    conn = socket.create_connection(address, timeout=30)
    try:
        conn.sendall(json.dumps({"channels": channels}).encode() + b"\n")
        rendered = []

        def reader():
            while True:
                raw = _read_exact(conn, _LEN.size)
                if raw is None:
                    return
                (n,) = _LEN.unpack(raw)
                if n == 0:
                    return
                payload = _read_exact(conn, n * 2 * 4)
                if payload is None:
                    return
                rendered.append(
                    np.frombuffer(payload, "<f4").reshape(n, 2).T
                )

        thread = threading.Thread(target=reader, daemon=True)
        thread.start()
        for start in range(0, total, chunk):
            piece = np.ascontiguousarray(audio[:, start:start + chunk])
            conn.sendall(
                _LEN.pack(piece.shape[1])
                + piece.T.astype("<f4").tobytes()
            )
        conn.sendall(_LEN.pack(0))
        thread.join(timeout=30)
        return (np.concatenate(rendered, axis=1)
                if rendered else np.zeros((2, 0), np.float32))
    finally:
        conn.close()
