"""Network streaming server: the deployable serving frontend.

Clients connect over TCP, send a JSON header line, then length-prefixed
float32 PCM chunks; the server renders them through a shared StreamPool
(HRIR binaural + EQ on the accelerator) and streams rendered stereo back.
This is the production analog of the reference's CoreAudio transport: the
socket replaces the HAL callback; everything downstream is the same graph.

Batching: connection threads only do socket IO and ring pushes; ONE pump
thread drains every connection's pending input into shared device steps, so
N concurrent clients ride the same `_pool_step` per block instead of
serializing N separate steps (the pool's whole purpose). A short batch
window lets concurrent pushes coalesce before the pump fires.

Wire protocol (little-endian):
  client -> server:  one JSON line {"channels": C[, "group": G]
                                    [, "resume": LANE, "token": SECRET]
                                    [, "want_lane": true]}\n
                     then frames: uint32 n | float32 data[C*n]  (n == 0: EOF)
  server -> client:  [one JSON line {"lane": N, "token": SECRET}\n when
                      want_lane was set]
                     frames: uint32 n | float32 data[2*n]
"group" (default 0) selects the client's profile group on a grouped
multi-tenant pool (StreamPool(profiles=[...]): per-group HRIR + EQ, one
shared device step).
"resume" continues a lane that survived a SERVER RESTART: when the server
starts on a pool restored from a checkpoint (RenderServer(orphan_tokens=
checkpoint's resume_tokens)), the restored attached lanes are ORPHANS —
their DSP carries are intact but their connections are gone. A client
reclaims its lane with {"resume": LANE, "token": SECRET} using the secret
from its want_lane ack (no attach, no state reset: the stream's
convolution/EQ history continues exactly); orphans unclaimed within
`resume_grace` seconds are detached. Lane ids are guessable ints — the
token is the authentication; a wrong/missing token or a non-orphan lane
is a protocol error and never consumes the orphan (live lanes cannot be
hijacked). Rendered-but-undelivered audio and undrained input are
transient (rings are not checkpointed) — clients resend from their last
acknowledged frame.
Wire limits: C must be 1 (mono duplicated) or the group's speaker count, and
each message's n is capped at ring capacity minus (step - 1) frames by
default — the largest size guaranteed to eventually fit past any
un-harvestable sub-step residue (step = block, or M blocks on a
blocks_per_step=M throughput pool). Violations close the connection with a
clean EOF frame instead of killing the serving thread.
Rendered audio follows the pool's underflow contract: the server returns
whatever is rendered so far; remaining tail is flushed after the client EOF
(zero-padded to the step boundary). The server's EOF frame is a
completion guarantee — if rendering stalls past the client timeout the
connection closes WITHOUT it, so clients can distinguish a truncated
stream from a successful one (`truncated_closes` counts these).
"""

from __future__ import annotations

import collections
import hmac
import json
import secrets
import socket
import threading
import time
from typing import Optional

import numpy as np

from airwave_tpu.runtime.stream_pool import StreamPool
# The wire helpers + reference client live in a JAX-free module so
# deployment smoke checks run without the JAX stack; re-exported here for
# compatibility.
from airwave_tpu.shell.wire_client import (_LEN, _read_exact, _send_frame,
                                           render_via_server)

__all__ = ["RenderServer", "render_via_server"]


class RenderServer:
    """One StreamPool shared across client connections, one pump thread."""

    def __init__(
        self,
        pool: StreamPool,
        host: str = "127.0.0.1",
        port: int = 0,
        *,
        client_timeout: float = 30.0,
        batch_window: float = 0.002,
        max_message_frames: Optional[int] = None,
        resume_grace: float = 30.0,
        orphan_tokens: Optional[dict] = None,
    ) -> None:
        self.pool = pool
        self.client_timeout = float(client_timeout)
        self.batch_window = float(batch_window)
        self.resume_grace = float(resume_grace)
        # Per-lane resume secrets: generated at attach, handed to the
        # client in the want_lane ack, checkpointed, and REQUIRED to claim
        # an orphan — lane ids are guessable ints, the token is what ties
        # a lane to its original client.
        self._lane_tokens: dict = {}
        # Restart ORPHANS: when orphan_tokens is given (ANY dict — the
        # signal that this pool was restored from a checkpoint), EVERY
        # pre-attached lane is an orphan: its connection is gone by
        # definition, so it must either be reclaimed (needs its token) or
        # grace-detached — a token-less restored lane would otherwise
        # leak its slot forever. With orphan_tokens=None (a library
        # embedder sharing a live pool), pre-attached lanes are left
        # alone entirely.
        self._orphans: dict = {}
        if orphan_tokens is not None:
            now = time.monotonic()
            for s in getattr(pool, "_attached", {}):
                self._orphans[int(s)] = now + self.resume_grace
                tok = orphan_tokens.get(int(s))
                if tok is not None:
                    self._lane_tokens[int(s)] = str(tok)
        # Default cap: a max-size message must ALWAYS eventually fit. Up to
        # step_frames-1 frames of residue (block-1 for the default
        # single-block pool) can linger un-harvestable in the input ring,
        # so capacity-sized messages could stall forever against a
        # permanently short ring.
        self.max_message_frames = int(
            max_message_frames
            if max_message_frames is not None
            else pool.assembler.capacity - (pool.step_frames - 1)
        )
        self._lock = threading.Lock()  # pool control-plane lock
        self._listener = socket.create_server((host, port))
        self.address = self._listener.getsockname()
        self._threads: list[threading.Thread] = []
        # Live client sockets: stop() shuts these down so serving threads
        # blocked in recv() unblock immediately instead of each riding out
        # a join timeout (a lingering client must not stall shutdown).
        self._conns: set = set()
        self._threads_lock = threading.Lock()
        self._accept_thread: Optional[threading.Thread] = None
        self._pump_thread: Optional[threading.Thread] = None
        self._stopping = False
        self._data_ready = threading.Event()
        self._pump_cond = threading.Condition()
        self._pump_generation = 0
        self.connections_served = 0
        self.protocol_errors = 0
        self.pump_errors = 0
        self.rejected_full = 0
        self.truncated_closes = 0
        self.resumed_streams = 0
        self.expired_orphans = 0
        # Wire-to-wire chunk latency (client chunk pushed -> its last
        # rendered frame handed to the socket), measured per delivered
        # chunk. Bounded reservoir: stats() percentiles reflect the recent
        # window; the count is cumulative. The tiers' latency CONTRACTS
        # ("zero added blocks" / "<= M blocks") are pinned in frame units
        # by tests/test_serve.py::test_tier_added_latency_is_measured;
        # this is the wall-clock operational view of the same path.
        self._lat_lock = threading.Lock()
        self._lat_samples: collections.deque = collections.deque(maxlen=4096)
        self._lat_count = 0

    def start(self) -> None:
        self._pump_thread = threading.Thread(target=self._pump_loop,
                                             daemon=True)
        self._pump_thread.start()
        self._accept_thread = threading.Thread(target=self._accept_loop,
                                               daemon=True)
        self._accept_thread.start()

    def set_equalizer(self, definition, group: Optional[int] = None) -> None:
        """Live EQ retarget, serialized against the pump thread (the
        reference's no-restart live-EQ fast path,
        AudioRuntimeController.swift:154-158). Streams mid-render crossfade
        per the pool's ramp semantics. On a grouped pool, `group=g`
        retargets only that profile group's clients."""
        with self._lock:
            self.pool.set_equalizer(definition, group=group)

    def set_renderer(self, renderer, prewarm: bool = True,
                     group: Optional[int] = None) -> None:
        """Live HRIR swap (the reference's full-reprepare path: conv
        history restarts for the affected streams). Serving pauses under
        the lock for the swap — and, by default, for a prewarm when the
        new renderer's partition/speaker shape differs (otherwise the
        first rounds after the swap would stall on jit compiles instead).
        On a grouped pool pass `group=g` (grouped swaps keep the shared
        shape, so no re-prewarm is needed)."""
        with self._lock:
            old = self.pool.renderer
            self.pool.set_renderer(renderer, group=group)
            shape_changed = (
                old.partition_count != renderer.partition_count
                or old.num_speakers != renderer.num_speakers
            )
            if prewarm and shape_changed:
                self.pool.prewarm()

    def _record_latency(self, seconds: float) -> None:
        with self._lat_lock:
            self._lat_samples.append(seconds)
            self._lat_count += 1

    def reset_latency(self) -> None:
        """Drop all recorded wire-to-wire latency samples AND the
        cumulative count (e.g. to scope stats to a measurement window —
        bench.py resets after warmup so count matches the percentiles'
        backing data)."""
        with self._lat_lock:
            self._lat_samples.clear()
            self._lat_count = 0

    def latency_stats(self) -> dict:
        """p50/p90/p99/max wire-to-wire chunk latency (seconds) over the
        recent reservoir, plus the cumulative delivered-chunk count."""
        with self._lat_lock:
            samples = list(self._lat_samples)
            count = self._lat_count
        if not samples:
            return {"count": 0}
        arr = np.sort(np.asarray(samples))
        q = lambda p: float(arr[min(len(arr) - 1, int(p * len(arr)))])  # noqa: E731
        return {
            "count": count,
            "p50_ms": round(q(0.50) * 1e3, 3),
            "p90_ms": round(q(0.90) * 1e3, 3),
            "p99_ms": round(q(0.99) * 1e3, 3),
            "max_ms": round(float(arr[-1]) * 1e3, 3),
        }

    def stats(self) -> dict:
        """Operational snapshot: server counters + the pool's (host-side
        only, safe to poll — serialized against the pump so the pool's
        counters are round-consistent)."""
        with self._lock:
            pool = self.pool.stats()
            orphans = len(self._orphans)
        with self._threads_lock:
            live = sum(t.is_alive() for t in self._threads)
        return {
            "latency": self.latency_stats(),
            "connections_served": self.connections_served,
            "connections_live": live,
            "protocol_errors": self.protocol_errors,
            "pump_errors": self.pump_errors,
            "rejected_full": self.rejected_full,
            "truncated_closes": self.truncated_closes,
            "resumed_streams": self.resumed_streams,
            "orphan_lanes": orphans,
            "pool": pool,
        }

    def save_checkpoint(self, path: str) -> None:
        """Persist the pool's serving checkpoint (utils/checkpoint
        save_pool_snapshot), round-consistent but cheap under the lock:
        the lock holds only for an on-device carry copy + host counters
        (snapshot(materialize=False)); the device->host readback and the
        atomic file write run outside it, so serving never stalls on the
        fetch. The checkpoint carries each lane's resume token; a server
        started on a pool restored from this file (orphan_tokens=...)
        offers the restored lanes for token-authenticated `resume`."""
        from airwave_tpu.utils.checkpoint import save_pool_snapshot

        with self._lock:
            snap = self.pool.snapshot(materialize=False)
            snap["resume_tokens"] = dict(self._lane_tokens)
        save_pool_snapshot(path, snap)

    def stop(self) -> None:
        self._stopping = True
        # shutdown() BEFORE close(): on Linux, close() alone does not wake
        # a thread blocked in accept() (the fd stays blocked until a
        # connection arrives), so every stop() rode out the full join
        # timeout. shutdown(SHUT_RDWR) on the listening socket interrupts
        # the accept immediately.
        try:
            self._listener.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        try:
            self._listener.close()
        except OSError:
            pass
        self._data_ready.set()
        if self._accept_thread is not None:
            self._accept_thread.join(timeout=5)
        with self._threads_lock:
            threads = list(self._threads)
            conns = list(self._conns)
        for conn in conns:
            try:
                conn.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
        for thread in threads:
            thread.join(timeout=5)
        # Belt and braces for the register-after-snapshot race (see
        # _serve_client's _stopping check): any conn that slipped in
        # between the snapshot and the handlers observing _stopping gets
        # its shutdown() now, then one more join pass.
        with self._threads_lock:
            stragglers = [c for c in self._conns if c not in conns]
            late_threads = [t for t in self._threads if t not in threads]
        for conn in stragglers:
            try:
                conn.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
        for thread in late_threads:
            thread.join(timeout=5)
        if self._pump_thread is not None:
            self._pump_thread.join(timeout=5)

    # --- pump thread: the single place device steps run ----------------------

    def _pump_loop(self) -> None:
        while not self._stopping:
            fired = self._data_ready.wait(timeout=0.1)
            if self._stopping:
                break
            self._expire_orphans()
            if not fired:
                continue
            if self.batch_window > 0:
                time.sleep(self.batch_window)
            self._data_ready.clear()
            try:
                with self._lock:
                    if self.pool.assembler.ready_count() > 0:
                        self.pool.pump()
            except Exception:
                # The pump thread must survive anything a render round can
                # throw (e.g. transient device errors) — a dead pump wedges
                # every connection. The pool's delivery path itself never
                # raises on full output rings (StreamPool._deliver).
                self.pump_errors += 1
                # The event was cleared before this round claimed the
                # pending input; re-arm it so the work retries next cycle
                # instead of stranding until the next client push.
                self._data_ready.set()
                time.sleep(0.05)
            with self._pump_cond:
                self._pump_generation += 1
                self._pump_cond.notify_all()

    def _expire_orphans(self) -> None:
        """Detach restart orphans nobody resumed within the grace window."""
        if not self._orphans:
            return
        now = time.monotonic()
        with self._lock:
            expired = [s for s, dl in self._orphans.items() if dl <= now]
            for s in expired:
                self._orphans.pop(s, None)
                self._lane_tokens.pop(s, None)
                self.pool.detach(s)
                self.expired_orphans += 1

    def _await_pump_round(self, generation: int, deadline: float) -> int:
        """Block until a pump round later than `generation` has run (or the
        deadline passes); returns the latest observed generation."""
        with self._pump_cond:
            while (
                self._pump_generation <= generation
                and not self._stopping
                and time.monotonic() < deadline
            ):
                self._pump_cond.wait(timeout=0.05)
            return self._pump_generation

    # --- connection handling --------------------------------------------------

    def _accept_loop(self) -> None:
        while not self._stopping:
            try:
                conn, _addr = self._listener.accept()
            except OSError:
                return
            thread = threading.Thread(target=self._serve_client,
                                      args=(conn,), daemon=True)
            with self._threads_lock:
                self._threads = [
                    t for t in self._threads if t.is_alive()
                ] + [thread]
            thread.start()

    def _push_with_backpressure(self, stream: int, frames: np.ndarray) -> bool:
        """Push a client chunk, waiting out full rings via pump rounds."""
        deadline = time.monotonic() + self.client_timeout
        while True:
            generation = self._pump_generation
            try:
                with self._lock:
                    self.pool.push(stream, frames)
                self._data_ready.set()
                return True
            except OverflowError:
                self._data_ready.set()
                if time.monotonic() >= deadline or self._stopping:
                    return False
                self._await_pump_round(generation, deadline)

    def _serve_client(self, conn: socket.socket) -> None:
        stream: Optional[int] = None
        clean = False
        suppress_eof = False
        with self._threads_lock:
            # A connection accepted in the same instant stop() fired
            # would register AFTER stop()'s _conns snapshot and never get
            # the shutdown() wake-up — its recv() could ride out the full
            # client_timeout past the join pass. _stopping is set before
            # stop() takes this lock, so checking it under the lock
            # closes the window: either stop() sees this conn, or this
            # thread sees _stopping.
            if self._stopping:
                try:
                    conn.close()
                except OSError:
                    pass
                return
            self._conns.add(conn)
        try:
            conn.settimeout(self.client_timeout)
            header_bytes = b""
            while not header_bytes.endswith(b"\n"):
                chunk = conn.recv(1)
                if not chunk:
                    return
                header_bytes += chunk
                if len(header_bytes) > 4096:
                    self.protocol_errors += 1
                    return
            header = json.loads(header_bytes.decode())
            if not isinstance(header, dict):
                self.protocol_errors += 1
                return  # finally sends the clean EOF frame
            try:
                channels = int(header.get("channels", 2))
                group = int(header.get("group", 0))
                resume = header.get("resume")
                resume = None if resume is None else int(resume)
            except (TypeError, ValueError):
                self.protocol_errors += 1
                return
            if resume is not None:
                # Resuming fixes the lane, which fixes the group.
                group = self.pool.group_of(resume)
            if not (0 <= group < self.pool.groups):
                self.protocol_errors += 1
                return

            with self._lock:
                # The group's renderer is read under the pool lock so a
                # concurrent set_renderer(group=...) cannot race the
                # admission check against a stale layout.
                renderer = self.pool.renderers[group]
                if channels not in (1, renderer.num_speakers,
                                    renderer.layout_channels):
                    self.protocol_errors += 1
                    return
                if resume is not None:
                    # Only restart orphans are claimable, and only with
                    # the lane's resume token (lane ids are guessable
                    # ints): live lanes can never be hijacked, a wrong or
                    # missing token is an error, and a failed attempt
                    # does NOT consume the orphan.
                    want_tok = self._lane_tokens.get(resume)
                    got_tok = header.get("token")
                    # Compare ENCODED bytes: compare_digest raises
                    # TypeError on non-ASCII str input, which a hostile
                    # header could use to kill this serving thread.
                    if (resume not in self._orphans
                            or want_tok is None
                            or not isinstance(got_tok, str)
                            or not hmac.compare_digest(
                                want_tok.encode(), got_tok.encode())):
                        self.protocol_errors += 1
                        return
                    self._orphans.pop(resume, None)
                    stream = resume
                    token = want_tok
                    self.resumed_streams += 1
                else:
                    try:
                        stream = self.pool.attach(group)
                    except RuntimeError:
                        # Pool at max_streams: refuse THIS client cleanly
                        # instead of killing its serving thread.
                        self.rejected_full += 1
                        return
                    token = secrets.token_hex(16)
                    self._lane_tokens[stream] = token
                self.connections_served += 1
            if header.get("want_lane"):
                # Opt-in ack so the client can checkpoint its lane id +
                # resume token for a later resume; sent before any audio
                # frame.
                conn.sendall(json.dumps(
                    {"lane": stream, "token": token}
                ).encode() + b"\n")
            received = 0
            returned = 0
            # (cumulative frames pushed, push time): a chunk's wire-to-wire
            # latency closes when `returned` covers its last frame.
            pending_lat: collections.deque = collections.deque()

            def close_latencies() -> None:
                now = time.monotonic()
                while pending_lat and pending_lat[0][0] <= returned:
                    cum, t0 = pending_lat.popleft()
                    self._record_latency(now - t0)

            while True:
                raw = _read_exact(conn, _LEN.size)
                if raw is None:
                    break
                (n,) = _LEN.unpack(raw)
                if n == 0:
                    break  # client EOF
                if n > self.max_message_frames:
                    self.protocol_errors += 1
                    return
                payload = _read_exact(conn, n * channels * 4)
                if payload is None:
                    break
                frames = np.frombuffer(payload, "<f4").reshape(n, channels).T
                if not self._push_with_backpressure(stream, frames):
                    return
                received += n
                pending_lat.append((received, time.monotonic()))
                with self._lock:
                    available = self.pool.available(stream)
                    out = self.pool.pull(stream, available) if available else None
                if out is not None and out.shape[1]:
                    returned += out.shape[1]
                    _send_frame(conn, out)
                    close_latencies()

            # Flush: pad the pending partial step (block for the default
            # pool, M blocks for the multi-block tier), render, return the
            # exact remaining frames of the client's signal.
            remaining = received - returned
            if remaining > 0:
                pad = (-received) % self.pool.step_frames
                if pad and not self._push_with_backpressure(
                    stream, np.zeros((channels, pad), np.float32)
                ):
                    return
                deadline = time.monotonic() + self.client_timeout
                generation = self._pump_generation
                self._data_ready.set()
                while True:
                    with self._lock:
                        available = self.pool.available(stream)
                    if available >= remaining or time.monotonic() >= deadline:
                        break
                    generation = self._await_pump_round(generation, deadline)
                if available < remaining:
                    # Incomplete render (device stalled past the timeout):
                    # close WITHOUT the EOF frame so the client can tell
                    # truncation from success — an EOF frame means every
                    # pushed frame came back rendered.
                    self.truncated_closes += 1
                    suppress_eof = True
                    return
                with self._lock:
                    out = self.pool.pull(stream, remaining)
                returned += out.shape[1]
                _send_frame(conn, out)
                close_latencies()
            conn.sendall(_LEN.pack(0))
            clean = True
        except (OSError, ValueError, json.JSONDecodeError, OverflowError,
                AssertionError):
            pass
        finally:
            if not clean and not suppress_eof:
                try:
                    conn.sendall(_LEN.pack(0))
                except OSError:
                    pass
            if stream is not None:
                with self._lock:
                    self._lane_tokens.pop(stream, None)
                    self.pool.detach(stream)
            with self._threads_lock:
                self._conns.discard(conn)
            try:
                conn.close()
            except OSError:
                pass


