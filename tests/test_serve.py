"""Network render server: loopback clients against a shared StreamPool."""

import threading

import numpy as np
import pytest

from airwave_tpu.assets import channel_maps as cm
from airwave_tpu.graph.renderer import prepare_renderer
from airwave_tpu.io.wav import WAVData
from airwave_tpu.oracle.upols_oracle import UPOLSOracle
from airwave_tpu.runtime.stream_pool import StreamPool
from airwave_tpu.shell.serve import RenderServer, render_via_server

BLOCK = 64


# Both data planes run the full behavioral suite: the selector plane
# (io_mode="selector", the O(1000)-connection path) must be
# indistinguishable from thread-per-connection at the wire.
@pytest.fixture(params=["thread", "selector"])
def server(request):
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
    renderer = prepare_renderer(WAVData(48_000.0, audio), cm.STEREO,
                                48_000.0, BLOCK)
    pool = StreamPool(8, 48_000.0, renderer, block_size=BLOCK)
    srv = RenderServer(pool, port=0, io_mode=request.param)
    srv.start()
    yield srv, audio
    srv.stop()


def test_roundtrip_render_matches_oracle(server):
    srv, hrir_audio = server
    rng = np.random.default_rng(0)
    n = 6 * BLOCK + 13  # ragged tail
    x = (rng.standard_normal((2, n)) * 0.3).astype(np.float32)
    y = render_via_server(srv.address, x, chunk=100)
    assert y.shape == (2, n)

    m = cm.hesuvi_14_channel(cm.STEREO.channels)
    padded = np.concatenate(
        [x, np.zeros((2, (-n) % BLOCK), np.float32)], axis=1
    )
    nblk = padded.shape[1] // BLOCK
    ref = np.zeros((2, nblk * BLOCK))
    for spk, speaker in ((0, cm.FL), (1, cm.FR)):
        li, ri = m.indices(speaker)
        for ear, ch in ((0, li), (1, ri)):
            o = UPOLSOracle(hrir_audio[ch], BLOCK)
            ref[ear] += np.concatenate(
                [o.process(padded[spk, i * BLOCK:(i + 1) * BLOCK])
                 for i in range(nblk)]
            )
    ref = ref[:, :n]
    err = np.sqrt(np.mean((y - ref) ** 2)) / np.sqrt(np.mean(ref ** 2))
    assert err < 1e-5, err


def test_concurrent_clients_are_isolated(server):
    srv, _ = server
    rng = np.random.default_rng(1)
    signals = [
        (rng.standard_normal((2, 4 * BLOCK)) * 0.3).astype(np.float32)
        for _ in range(4)
    ]
    results = [None] * 4

    def client(i):
        results[i] = render_via_server(srv.address, signals[i], chunk=64)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)

    # Each client's render equals a solo render of its own signal.
    solo = render_via_server(srv.address, signals[2], chunk=4 * BLOCK)
    np.testing.assert_allclose(results[2], solo, atol=1e-5)
    for r in results:
        assert r is not None and r.shape[1] == 4 * BLOCK
        assert np.all(np.isfinite(r))
    assert srv.connections_served == 5


def test_malformed_header_does_not_kill_server(server):
    import socket

    srv, _ = server
    conn = socket.create_connection(srv.address, timeout=5)
    conn.sendall(b"this is not json\n")
    conn.close()
    # Server still serves a well-formed client afterwards.
    x = np.ones((2, BLOCK), np.float32) * 0.2
    y = render_via_server(srv.address, x)
    assert y.shape == (2, BLOCK)


def _read_until_eof(conn):
    import struct

    frames = 0
    while True:
        raw = b""
        while len(raw) < 4:
            chunk = conn.recv(4 - len(raw))
            if not chunk:
                return frames, False
            raw += chunk
        (n,) = struct.unpack("<I", raw)
        if n == 0:
            return frames, True
        payload = b""
        need = n * 2 * 4
        while len(payload) < need:
            chunk = conn.recv(need - len(payload))
            if not chunk:
                return frames, False
            payload += chunk
        frames += n


def test_wire_limits_close_cleanly(server):
    import json
    import socket
    import struct

    srv, _ = server

    # Bad channel count: rejected at the header with a clean EOF frame.
    conn = socket.create_connection(srv.address, timeout=5)
    conn.sendall(json.dumps({"channels": 7}).encode() + b"\n")
    _frames, clean = _read_until_eof(conn)
    assert clean
    conn.close()

    # Oversized frame length: clean EOF, no server-side thread death.
    conn = socket.create_connection(srv.address, timeout=5)
    conn.sendall(json.dumps({"channels": 2}).encode() + b"\n")
    conn.sendall(struct.pack("<I", srv.max_message_frames + 1))
    _frames, clean = _read_until_eof(conn)
    assert clean
    conn.close()

    assert srv.protocol_errors >= 2
    # Server still healthy.
    x = np.ones((2, BLOCK), np.float32) * 0.2
    y = render_via_server(srv.address, x)
    assert y.shape == (2, BLOCK)
    # Rejected connections released their slots (poll past the EOF race).
    import time

    deadline = time.monotonic() + 5
    while srv.pool._attached and time.monotonic() < deadline:
        time.sleep(0.01)
    assert not srv.pool._attached


def test_hostile_payloads_do_not_leak_across_lanes(server):
    """Tenant isolation through the SHARED batched device step: one
    client streaming NaN/Inf PCM must corrupt only its own lane — the
    batch axis is data-parallel through every contraction, so a
    well-behaved neighbor's output must be BIT-IDENTICAL to a solo
    render — and a client that dies mid-payload (length prefix sent,
    floats truncated) must release its slot without wedging the pump."""
    import json
    import socket
    import struct
    import threading
    import time

    srv, _ = server
    rng = np.random.default_rng(7)
    good = (rng.standard_normal((2, 4 * BLOCK)) * 0.3).astype(np.float32)

    # Solo reference render first (fresh lane; conv state resets per
    # attach, so a later identical stream reproduces it exactly).
    solo = render_via_server(srv.address, good)

    # Hostile client: valid header, then NaN/Inf blocks, concurrent
    # with the good client so both ride the same pump rounds.
    def hostile():
        conn = socket.create_connection(srv.address, timeout=10)
        try:
            conn.sendall(json.dumps({"channels": 2}).encode() + b"\n")
            evil = np.full((2, BLOCK), np.nan, np.float32)
            evil[0, ::3] = np.inf
            payload = evil.T.reshape(-1).tobytes()
            for _ in range(4):
                conn.sendall(struct.pack("<I", BLOCK) + payload)
                time.sleep(0.005)
            conn.sendall(struct.pack("<I", 0))
            _read_until_eof(conn)
        finally:
            conn.close()

    t = threading.Thread(target=hostile)
    t.start()
    try:
        got = render_via_server(srv.address, good)
    finally:
        t.join()
    assert np.all(np.isfinite(got))
    # Same lane values to f32 rounding: rounds with different occupancy
    # dispatch different compiled harvest variants (ring_id vs masked),
    # whose fusions round differently in the last ulp — but a NaN/Inf
    # neighbor must not perturb the lane beyond that.
    rel = (np.sqrt(np.mean((got - solo) ** 2))
           / np.sqrt(np.mean(solo ** 2)))
    assert rel < 1e-6, f"NaN lane leaked into a neighbor (rel {rel})"

    # Truncated payload: length prefix promises BLOCK frames, half
    # arrive, connection dies. Slot must come back, pump must survive.
    conn = socket.create_connection(srv.address, timeout=10)
    conn.sendall(json.dumps({"channels": 2}).encode() + b"\n")
    conn.sendall(struct.pack("<I", BLOCK))
    conn.sendall(b"\x00" * (BLOCK * 2 * 4 // 2))
    conn.close()

    deadline = time.monotonic() + 5
    while srv.pool._attached and time.monotonic() < deadline:
        time.sleep(0.01)
    assert not srv.pool._attached, "truncated client leaked its slot"
    assert srv.pump_errors == 0

    # Post-hostile solo render: finite and within f32 rounding of the
    # original. (Not bit-exact by design: the shared ring cursor has
    # advanced, and the rotated-bank MAC's partition-sum ORDER follows
    # the cursor phase — same-phase renders are bit-equal, as
    # test_roundtrip determinism shows; different-phase renders agree
    # to rounding.)
    again = render_via_server(srv.address, good)
    assert np.all(np.isfinite(again))
    rel2 = (np.sqrt(np.mean((again - solo) ** 2))
            / np.sqrt(np.mean(solo ** 2)))
    assert rel2 < 1e-6, f"hostile traffic left residue (rel {rel2})"


def test_concurrent_clients_share_device_steps(server):
    """The whole point of the pool: N clients ride shared _pool_step calls.

    With the single pump thread, concurrent clients' blocks coalesce into
    shared rounds — rounds must come out well under blocks_rendered."""
    srv, _ = server
    srv.batch_window = 0.02  # widen the coalescing window for determinism
    rng = np.random.default_rng(7)
    n_clients, n_blocks = 4, 6
    signals = [
        (rng.standard_normal((2, n_blocks * BLOCK)) * 0.3).astype(np.float32)
        for _ in range(n_clients)
    ]
    rounds_before = srv.pool.rounds
    blocks_before = srv.pool.blocks_rendered
    results = [None] * n_clients

    def client(i):
        results[i] = render_via_server(srv.address, signals[i], chunk=BLOCK)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)

    for r in results:
        assert r is not None and r.shape == (2, n_blocks * BLOCK)
    blocks = srv.pool.blocks_rendered - blocks_before
    rounds = srv.pool.rounds - rounds_before
    assert blocks == n_clients * n_blocks
    # Serialized per-connection pumping would need ~blocks rounds; shared
    # batching needs dramatically fewer.
    assert rounds <= blocks * 0.75, (rounds, blocks)


def test_churn_soak(server):
    """Attach/detach churn across sequential client waves (short form of the
    release-validation soak gate; the long form runs with AIRWAVE_SOAK=1)."""
    import os

    srv, _ = server
    waves = 20 if os.environ.get("AIRWAVE_SOAK") else 4
    rng = np.random.default_rng(11)
    for wave in range(waves):
        k = 1 + (wave % 3)
        signals = [
            (rng.standard_normal((2, (1 + wave % 4) * BLOCK + wave % 17))
             * 0.3).astype(np.float32)
            for _ in range(k)
        ]
        results = [None] * k
        threads = [
            threading.Thread(
                target=lambda i=i: results.__setitem__(
                    i, render_via_server(srv.address, signals[i], chunk=97)
                )
            )
            for i in range(k)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        for i, r in enumerate(results):
            assert r is not None and r.shape == signals[i].shape[:1] + (
                signals[i].shape[1],
            ), (wave, i)
            assert np.all(np.isfinite(r))
    # No slot leaks after churn (detach runs just after the EOF frame the
    # client returns on, so poll briefly).
    import time

    deadline = time.monotonic() + 5
    while srv.pool._attached and time.monotonic() < deadline:
        time.sleep(0.01)
    assert not srv.pool._attached
    assert len(srv.pool._free) == srv.pool.max_streams


@pytest.mark.heavy
def test_live_renderer_swap_through_server(server):
    """RenderServer.set_renderer swaps the pool's HRIR mid-serving
    (conv history restarts, reference semantics) and prewarm-compiles a
    shape change so the next clients render correctly."""
    import numpy as np

    from airwave_tpu.assets import channel_maps as cm
    from airwave_tpu.graph.renderer import prepare_renderer
    from airwave_tpu.io.wav import WAVData
    from airwave_tpu.oracle.upols_oracle import UPOLSOracle

    srv, _ = server
    rng = np.random.default_rng(6)
    new_audio = (rng.standard_normal((14, 500)) * 0.2).astype(np.float32)
    new_renderer = prepare_renderer(WAVData(48_000.0, new_audio), cm.STEREO,
                                    48_000.0, BLOCK)
    assert new_renderer.partition_count != srv.pool.renderer.partition_count
    srv.set_renderer(new_renderer)

    x = (rng.standard_normal((2, 4 * BLOCK)) * 0.3).astype(np.float32)
    y = render_via_server(srv.address, x)
    m = cm.hesuvi_14_channel(cm.STEREO.channels)
    ref = np.zeros((2, 4 * BLOCK))
    for spk, speaker in ((0, cm.FL), (1, cm.FR)):
        li, ri = m.indices(speaker)
        for ear, ch in ((0, li), (1, ri)):
            o = UPOLSOracle(new_audio[ch], BLOCK)
            ref[ear] += np.concatenate(
                [o.process(x[spk, i * BLOCK:(i + 1) * BLOCK])
                 for i in range(4)]
            )
    err = np.sqrt(np.mean((y - ref) ** 2)) / np.sqrt(np.mean(ref ** 2))
    assert err < 1e-5, err


def test_pump_thread_survives_render_exceptions(server):
    """A render round that raises must not kill the pump thread (a dead
    pump wedges every current and future connection): the error is
    counted and the next round proceeds normally."""
    srv, _ = server
    real_pump = srv.pool.pump
    fired = threading.Event()

    def flaky_pump(*args, **kwargs):
        if not fired.is_set():
            fired.set()
            raise RuntimeError("injected transient device failure")
        return real_pump(*args, **kwargs)

    srv.pool.pump = flaky_pump
    try:
        rng = np.random.default_rng(3)
        x = (rng.standard_normal((2, 4 * BLOCK)) * 0.3).astype(np.float32)
        y = render_via_server(srv.address, x, chunk=2 * BLOCK)
        assert fired.is_set()
        assert srv.pump_errors >= 1
        assert srv._pump_thread.is_alive()
        # The failed round's input was not lost: rendering completed.
        assert y.shape == (2, 4 * BLOCK) and np.abs(y).max() > 1e-4
    finally:
        srv.pool.pump = real_pump


def test_loadgen_concurrent_scale_smoke():
    """The selector data plane under the selector LOAD GENERATOR
    (shell/loadgen.py, the O(1000)-client harness — full-scale artifact in
    BENCH_NOTES "Round 5"): N paced concurrent clients all complete with
    zero failures, protocol errors, or truncations."""
    from airwave_tpu.shell.loadgen import run_load

    rng = np.random.default_rng(5)
    audio = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
    renderer = prepare_renderer(WAVData(48_000.0, audio), cm.STEREO,
                                48_000.0, BLOCK)
    pool = StreamPool(40, 48_000.0, renderer, block_size=BLOCK)
    pool.prewarm()
    srv = RenderServer(pool, port=0, io_mode="selector")
    srv.start()
    try:
        res = run_load(tuple(srv.address), clients=32, blocks_each=6,
                       chunk=4 * BLOCK, speed=4.0, timeout=60.0)
        assert res["completed"] == 32, res
        assert res["failed"] == 0, res
        st = srv.stats()
        assert st["protocol_errors"] == 0
        assert st["truncated_closes"] == 0
        assert st["rejected_full"] == 0
        assert st["connections_served"] == 32
    finally:
        srv.stop()


def test_accept_limit_saturation_is_clean():
    """Clients beyond max_streams during a single connect wave are refused
    cleanly (counted in rejected_full, clean EOF frame — loadgen sees an
    early server EOF), admitted clients complete untouched, and the
    server keeps serving afterwards."""
    from airwave_tpu.shell.loadgen import run_load

    rng = np.random.default_rng(5)
    audio = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
    renderer = prepare_renderer(WAVData(48_000.0, audio), cm.STEREO,
                                48_000.0, BLOCK)
    pool = StreamPool(8, 48_000.0, renderer, block_size=BLOCK)
    pool.prewarm()
    srv = RenderServer(pool, port=0, io_mode="selector")
    srv.start()
    try:
        # One 16-wide connect wave against 8 lanes: stream durations
        # (6 chunks at realtime pace) comfortably outlast the admission
        # wave, so no lane frees up mid-wave.
        res = run_load(tuple(srv.address), clients=16, blocks_each=6,
                       chunk=4 * BLOCK, speed=1.0, connect_burst=16,
                       timeout=60.0)
        assert res["completed"] == 8, res
        assert res["failed"] == 8, res
        assert res["fail_reasons"] == ["rejected before ack"], res
        assert srv.rejected_full == 8
        assert srv.protocol_errors == 0
        # The saturated wave left the server fully functional.
        x = (rng.standard_normal((2, 4 * BLOCK)) * 0.2).astype(np.float32)
        y = render_via_server(srv.address, x, chunk=BLOCK)
        assert y.shape == x.shape and np.isfinite(y).all()
    finally:
        srv.stop()


def test_selector_stall_backpressure_and_fixed_deadline():
    """A selector connection whose pinned push cannot land (input ring
    full, lane never draining) must (a) STOP BEING READ — the server
    buffers only a bounded prefix and TCP backpressures the producer
    (zero selector interest unregisters the fd; a fallback READ interest
    would refill inbuf at line rate while the push keeps failing), and
    (b) close at a FIXED per-message deadline even while delivery passes
    keep retrying the push — re-arming the deadline on every retry would
    let any concurrent traffic's pump rounds defer the stall sweep
    forever."""
    import json
    import socket
    import struct
    import time

    _len = struct.Struct("<I")
    rng = np.random.default_rng(9)
    audio = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
    renderer = prepare_renderer(WAVData(48_000.0, audio), cm.STEREO,
                                48_000.0, BLOCK)
    pool = StreamPool(2, 48_000.0, renderer, block_size=BLOCK)
    srv = RenderServer(pool, port=0, io_mode="selector", client_timeout=2.0)
    blocked: set = set()
    orig_push = pool.push

    def push(stream, frames):
        if stream in blocked:
            raise OverflowError("forced: lane cannot drain")
        return orig_push(stream, frames)

    pool.push = push
    srv.start()
    stop_wakes = threading.Event()

    def waker():
        # Stand-in for concurrent traffic: every wake runs a delivery
        # pass, which retries the pinned push (the path that must NOT
        # re-arm the stall deadline).
        while not stop_wakes.is_set():
            srv._wake_io()
            time.sleep(0.05)

    wt = threading.Thread(target=waker, daemon=True)
    try:
        conn = socket.create_connection(srv.address, timeout=10)
        # Pin the client send buffer: TCP autotuning would otherwise grow
        # it toward 4 MiB, and `accepted` below would mostly measure the
        # client's OWN buffering rather than what the server consumed.
        conn.setsockopt(socket.SOL_SOCKET, socket.SO_SNDBUF, 1 << 17)
        conn.sendall(json.dumps({"channels": 2, "want_lane": True}).encode()
                     + b"\n")
        line = b""
        while not line.endswith(b"\n"):
            line += conn.recv(64)
        blocked.add(int(json.loads(line.decode())["lane"]))
        wt.start()
        # Flood: offer ~6 MiB of frames. The server must accept only a
        # bounded prefix (its one in-flight recv + the pinned message +
        # loopback kernel buffers), not keep draining the socket.
        msg = (_len.pack(3 * BLOCK)
               + np.zeros((3 * BLOCK, 2), "<f4").tobytes())
        payload = memoryview(bytes(msg * (6 * (1 << 20) // len(msg))))
        conn.setblocking(False)
        accepted, closed = 0, False
        t_end = time.monotonic() + 8.0  # well past the 2 s deadline
        while time.monotonic() < t_end and accepted < len(payload):
            try:
                accepted += conn.send(payload[accepted:accepted + (1 << 16)])
            except BlockingIOError:
                time.sleep(0.02)
            except OSError:  # server closed the stalled conn — expected
                closed = True
                break
        assert accepted < (2 << 20), (
            f"server kept reading a stalled connection "
            f"({accepted} bytes accepted of {len(payload)} offered)"
        )
        # The FIXED deadline fires despite the retrying delivery passes.
        deadline = time.monotonic() + 10.0
        conn.setblocking(True)
        conn.settimeout(1.0)
        while not closed and time.monotonic() < deadline:
            try:
                data = conn.recv(4096)
            except socket.timeout:
                continue
            except OSError:
                closed = True
                break
            if not data or _len.unpack(data[:4])[0] == 0:
                closed = True
        assert closed, "stalled connection never hit the stall deadline"
        blocked.clear()
        conn.close()
        # The stalled lane was released; the server still serves.
        x = (rng.standard_normal((2, 4 * BLOCK)) * 0.2).astype(np.float32)
        y = render_via_server(srv.address, x, chunk=96)
        assert y.shape == x.shape and np.isfinite(y).all()
        assert srv.pump_errors == 0
    finally:
        stop_wakes.set()
        srv.stop()


def test_serve_latency_budget_loopback():
    """Regression gate for the wire layer's added latency (VERDICT r4 #8):
    at trivial client counts on a prewarmed pool, the client-observed
    chunk latency must stay within an explicit budget of the serving
    cadence — catching any regression back toward inbound-triggered
    delivery (thread-plane server p50 measured ~2.5x the selector
    plane's at 32 clients) or
    unthrottled pump chasing. Budget: p50 <= 100 ms on the CI box (the
    render-completion-driven plane measures ~10-25 ms at 32 clients on
    one core; a delivery regression lands in the hundreds)."""
    from airwave_tpu.shell.loadgen import run_load

    rng = np.random.default_rng(5)
    audio = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
    renderer = prepare_renderer(WAVData(48_000.0, audio), cm.STEREO,
                                48_000.0, BLOCK)
    pool = StreamPool(4, 48_000.0, renderer, block_size=BLOCK)
    pool.prewarm()
    srv = RenderServer(pool, port=0, io_mode="selector")
    srv.start()
    try:
        # Untimed warmup pass: first-touch costs (allocator, lazy imports,
        # socket setup) belong to startup, not the per-chunk budget.
        run_load(tuple(srv.address), clients=2, blocks_each=4,
                 chunk=4 * BLOCK, speed=0.25, timeout=60.0)
        srv.reset_latency()
        # 0.25x pacing (one 4-block message per ~21 ms): demand sits far
        # below the 1-core CPU DSP capacity, so the measurement is the
        # WIRE layer (batching window + delivery), not device saturation.
        res = run_load(tuple(srv.address), clients=2, blocks_each=24,
                       chunk=4 * BLOCK, speed=0.25, timeout=60.0)
        assert res["completed"] == 2 and res["failed"] == 0, res
        assert res["chunk_latency"]["p50_ms"] <= 100.0, res["chunk_latency"]
        srv_lat = srv.latency_stats()
        assert srv_lat["p50_ms"] <= 60.0, srv_lat
    finally:
        srv.stop()


@pytest.mark.heavy
def test_full_pool_rejects_connection_cleanly():
    """A connection beyond max_streams is refused with a clean close (and
    counted) instead of killing its serving thread."""
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
    renderer = prepare_renderer(WAVData(48_000.0, audio), cm.STEREO,
                                48_000.0, BLOCK)
    pool = StreamPool(1, 48_000.0, renderer, block_size=BLOCK)
    srv = RenderServer(pool, port=0)
    srv.start()
    try:
        import json as _json
        import socket
        import time

        # Hold the single slot with a half-open client.
        holder = socket.create_connection(srv.address, timeout=10)
        holder.sendall(_json.dumps({"channels": 2}).encode() + b"\n")
        holder.sendall(np.float32(1).tobytes()[:0])  # nothing yet
        deadline = time.monotonic() + 5
        while not pool._attached and time.monotonic() < deadline:
            time.sleep(0.01)
        assert pool._attached

        # Second client: refused cleanly, server stays healthy.
        x = np.ones((2, BLOCK), np.float32) * 0.2
        y = render_via_server(srv.address, x)
        assert y.shape == (2, 0)
        assert srv.rejected_full == 1
        holder.close()
        deadline = time.monotonic() + 5
        while pool._attached and time.monotonic() < deadline:
            time.sleep(0.01)
        y = render_via_server(srv.address, x)
        assert y.shape == (2, BLOCK)
    finally:
        srv.stop()


@pytest.mark.heavy
def test_roundtrip_through_multiblock_pool_matches_oracle():
    """The throughput tier behind the server: blocks_per_step=M renders M
    blocks per lane per round; the wire contract is unchanged (exact frame
    count back, ragged tail flushed at the M-block step boundary)."""
    rng = np.random.default_rng(5)
    M = 2
    audio = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
    renderer = prepare_renderer(WAVData(48_000.0, audio), cm.STEREO,
                                48_000.0, BLOCK, lookahead=M)
    pool = StreamPool(8, 48_000.0, renderer, block_size=BLOCK,
                      blocks_per_step=M)
    srv = RenderServer(pool, port=0)
    srv.start()
    try:
        n = 5 * BLOCK + 13  # ragged tail, not an M-block multiple
        x = (rng.standard_normal((2, n)) * 0.3).astype(np.float32)
        y = render_via_server(srv.address, x, chunk=100)
        assert y.shape == (2, n)

        m = cm.hesuvi_14_channel(cm.STEREO.channels)
        step = M * BLOCK
        padded = np.concatenate(
            [x, np.zeros((2, (-n) % step), np.float32)], axis=1
        )
        nblk = padded.shape[1] // BLOCK
        ref = np.zeros((2, nblk * BLOCK))
        for spk, speaker in ((0, cm.FL), (1, cm.FR)):
            li, ri = m.indices(speaker)
            for ear, ch in ((0, li), (1, ri)):
                o = UPOLSOracle(audio[ch], BLOCK)
                ref[ear] += np.concatenate(
                    [o.process(padded[spk, i * BLOCK:(i + 1) * BLOCK])
                     for i in range(nblk)]
                )
        ref = ref[:, :n]
        err = np.sqrt(np.mean((y - ref) ** 2)) / np.sqrt(np.mean(ref ** 2))
        assert err < 1e-5, err
        assert srv.truncated_closes == 0 and srv.pump_errors == 0
    finally:
        srv.stop()


@pytest.mark.heavy
def test_grouped_server_routes_clients_to_their_profiles():
    """Two profile groups, concurrent clients in each: every client's
    render matches a single-profile server running its group's HRIR bank
    (EQ-less here: the EQ crossfade clock is round-based by design, so
    concurrent scheduling legitimately varies it — EQ group parity is the
    sequential test below); a bad group header closes cleanly without
    killing the server."""
    import socket

    from airwave_tpu.runtime.stream_pool import PoolProfile

    rng = np.random.default_rng(7)
    banks = [(rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
             for _ in range(2)]
    rends = [prepare_renderer(WAVData(48_000.0, a), cm.STEREO, 48_000.0,
                              BLOCK) for a in banks]
    grouped = StreamPool(8, 48_000.0, block_size=BLOCK, profiles=[
        PoolProfile(rends[0], None), PoolProfile(rends[1], None),
    ])
    srv = RenderServer(grouped, port=0)
    srv.start()
    singles = []
    for g in (0, 1):
        p = StreamPool(4, 48_000.0, rends[g], block_size=BLOCK)
        s = RenderServer(p, port=0)
        s.start()
        singles.append(s)
    try:
        n = 5 * BLOCK
        x = (rng.standard_normal((4, 2, n)) * 0.3).astype(np.float32)
        got = [None] * 4
        groups = [0, 1, 0, 1]

        def client(i):
            got[i] = render_via_server(srv.address, x[i], chunk=97,
                                       group=groups[i])

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        for i in range(4):
            want = render_via_server(singles[groups[i]].address, x[i],
                                     chunk=97)
            assert np.abs(want).max() > 1e-3
            np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=5e-5)

        # Out-of-range group: clean protocol error, server stays up.
        errs = srv.protocol_errors
        conn = socket.create_connection(srv.address, timeout=10)
        conn.sendall(b'{"channels": 2, "group": 9}\n')
        assert conn.recv(16) in (b"\x00\x00\x00\x00", b"")
        conn.close()
        assert srv.protocol_errors == errs + 1
        y = render_via_server(srv.address, x[0], group=1)
        assert y.shape == (2, n)
    finally:
        srv.stop()
        for s in singles:
            s.stop()


@pytest.mark.heavy
def test_grouped_server_eq_groups_match_single_profile_sequentially():
    """One client at a time (deterministic round clock): a grouped
    server's EQ'd group matches a single-profile EQ server, and its
    unity group stays EQ-free."""
    from airwave_tpu.io.apo import (EqualizerDefinition, EqualizerFilter,
                                    FilterType)
    from airwave_tpu.runtime.stream_pool import PoolProfile

    rng = np.random.default_rng(8)
    bank = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
    rend = prepare_renderer(WAVData(48_000.0, bank), cm.STEREO, 48_000.0,
                            BLOCK)
    eq1 = EqualizerDefinition(-1.0, (
        EqualizerFilter(1, 1, True, FilterType.PEAKING, 800.0, 6.0, 1.0),
    ))
    grouped = StreamPool(8, 48_000.0, block_size=BLOCK, profiles=[
        PoolProfile(rend, None), PoolProfile(rend, eq1),
    ])
    srv = RenderServer(grouped, port=0)
    srv.start()
    p_eq = StreamPool(4, 48_000.0, rend, eq_definition=eq1,
                      block_size=BLOCK)
    srv_eq = RenderServer(p_eq, port=0)
    srv_eq.start()
    p_plain = StreamPool(4, 48_000.0, rend, block_size=BLOCK)
    srv_plain = RenderServer(p_plain, port=0)
    srv_plain.start()
    try:
        n = 4 * BLOCK
        x = (rng.standard_normal((2, n)) * 0.3).astype(np.float32)
        got1 = render_via_server(srv.address, x, chunk=BLOCK, group=1)
        want1 = render_via_server(srv_eq.address, x, chunk=BLOCK)
        np.testing.assert_allclose(got1, want1, rtol=1e-4, atol=5e-5)
        got0 = render_via_server(srv.address, x, chunk=BLOCK, group=0)
        want0 = render_via_server(srv_plain.address, x, chunk=BLOCK)
        np.testing.assert_allclose(got0, want0, rtol=1e-4, atol=5e-5)
        # The two groups render genuinely different audio (the EQ bites).
        assert np.sqrt(np.mean((got1 - got0) ** 2)) > 1e-3
    finally:
        srv.stop()
        srv_eq.stop()
        srv_plain.stop()


@pytest.mark.heavy
def test_build_serve_pool_profiles_keep_own_partition_counts(tmp_path):
    """--profile specs with different HRIR lengths build one grouped pool
    (shorter banks padded onto the shared partition count)."""
    import argparse

    from airwave_tpu.io import wav as wav_io
    from airwave_tpu.shell.app import build_serve_pool

    rng = np.random.default_rng(9)
    paths = []
    for i, frames in enumerate((600, 1500)):  # 2 vs 3 partitions @ 512
        audio = (rng.standard_normal((14, frames)) * 0.2).astype(np.float32)
        path = tmp_path / f"bank{i}.wav"
        wav_io.save(str(path), audio, 48_000.0)
        paths.append(str(path))
    eq_path = tmp_path / "p.txt"
    eq_path.write_text("Preamp: -2 dB\nFilter 1: ON PK Fc 900 Hz Gain 2 dB"
                       " Q 1.0\n")
    args = argparse.Namespace(
        hrir=None, eq=None, layout="stereo", sample_rate=48_000.0,
        max_streams=4, mesh_devices=0, blocks_per_step=1,
        profile=[paths[0], f"{paths[1]}:{eq_path}"],
    )
    pool, _layout = build_serve_pool(args)
    assert pool.groups == 2
    # Heterogeneous bank lengths stay heterogeneous: each group carries
    # its own delay line, so the short bank pays only its own partitions
    # (half-window bank: HRIR partitions + 1).
    assert pool.renderers[0].partition_count == 3
    assert pool.renderers[1].partition_count == 4
    # Targets are observed at the first pump round; the constructor
    # publishes them.
    assert pool.eq_runtimes[0]._published is None
    assert pool.eq_runtimes[1]._published.definition is not None

    both = argparse.Namespace(**{**vars(args), "hrir": paths[0]})
    with pytest.raises(SystemExit, match="not both"):
        build_serve_pool(both)
    neither = argparse.Namespace(**{**vars(args), "profile": None})
    with pytest.raises(SystemExit, match="required"):
        build_serve_pool(neither)


def test_server_stats_surface(server):
    """stats() reports server counters + a round-consistent pool snapshot
    without touching the device; grouped pools report per-group
    occupancy."""
    srv, _ = server
    rng = np.random.default_rng(13)
    x = (rng.standard_normal((2, 3 * BLOCK)) * 0.3).astype(np.float32)
    before = srv.stats()
    assert before["pool"]["attached"] == 0
    assert before["pool"]["attached_per_group"] is None
    y = render_via_server(srv.address, x)
    assert y.shape == x.shape
    after = srv.stats()
    assert after["connections_served"] == before["connections_served"] + 1
    assert after["pool"]["rounds"] >= before["pool"]["rounds"] + 3
    assert after["pool"]["blocks_rendered"] >= 3
    assert after["pump_errors"] == 0 and after["pool"]["render_errors"] == 0

    from airwave_tpu.runtime.stream_pool import PoolProfile

    rend = srv.pool.renderer
    gpool = StreamPool(4, 48_000.0, block_size=BLOCK, profiles=[
        PoolProfile(rend, None), PoolProfile(rend, None),
    ])
    gpool.attach(1)
    s = gpool.stats()
    assert s["groups"] == 2 and s["attached_per_group"] == [0, 1]
    assert s["lanes_in_debt"] == 0


def test_client_cli_roundtrip(server, tmp_path):
    """The `client` subcommand streams a WAV through a live server and
    writes the rendered stereo WAV (exit 0, frames preserved)."""
    from airwave_tpu.io import wav as wav_io
    from airwave_tpu.shell.app import main as cli_main

    srv, _ = server
    rng = np.random.default_rng(17)
    n = 3 * BLOCK + 7
    x = (rng.standard_normal((2, n)) * 0.3).astype(np.float32)
    inp, outp = tmp_path / "in.wav", tmp_path / "out.wav"
    wav_io.save(str(inp), x, 48_000.0)
    host, port = srv.address
    rc = cli_main(["client", "--input", str(inp), "--output", str(outp),
                   "--host", host, "--port", str(port), "--chunk", "97"])
    assert rc == 0
    rendered = wav_io.load(str(outp))
    assert rendered.audio.shape == (2, n)
    direct = render_via_server(srv.address, x, chunk=97)
    np.testing.assert_allclose(rendered.audio, direct, atol=1e-6)


@pytest.mark.heavy
def test_server_restart_resume_continues_stream(tmp_path):
    """Checkpoint -> restart -> {"resume": lane}: the stream's DSP history
    continues across the server generation (output equals an
    uninterrupted render); live lanes can't be hijacked; unclaimed
    orphans expire after the grace window."""
    import json as _json
    import socket
    import struct
    import time

    from airwave_tpu.utils.checkpoint import load_pool_snapshot

    _len = struct.Struct("<I")

    def send_blocks(conn, audio):
        conn.sendall(_len.pack(audio.shape[1])
                     + audio.T.astype("<f4").tobytes())

    rng = np.random.default_rng(21)
    audio14 = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
    renderer = prepare_renderer(WAVData(48_000.0, audio14), cm.STEREO,
                                48_000.0, BLOCK)
    x = (rng.standard_normal((2, 4 * BLOCK)) * 0.3).astype(np.float32)

    # Uninterrupted reference render.
    ref_pool = StreamPool(4, 48_000.0, renderer, block_size=BLOCK)
    ref_srv = RenderServer(ref_pool, port=0)
    ref_srv.start()
    want = render_via_server(ref_srv.address, x, chunk=BLOCK)
    ref_srv.stop()

    # Generation A: stream the first half, keep the connection open.
    pool_a = StreamPool(4, 48_000.0, renderer, block_size=BLOCK)
    srv_a = RenderServer(pool_a, port=0)
    srv_a.start()
    conn = socket.create_connection(srv_a.address, timeout=10)
    conn.sendall(_json.dumps({"channels": 2, "want_lane": True}).encode()
                 + b"\n")
    line = b""
    while not line.endswith(b"\n"):
        line += conn.recv(1)
    ack = _json.loads(line.decode())
    lane, token = int(ack["lane"]), ack["token"]
    for t in range(2):
        send_blocks(conn, x[:, t * BLOCK:(t + 1) * BLOCK])
    # Collect the rendered first half: some frames arrive on the wire
    # (the server delivers on inbound messages), the rest sit undelivered
    # in the pool — drain those under the server lock. The checkpoint
    # must capture a carry whose rendered frames were all delivered, and
    # must happen while the connection is open so the lane stays
    # attached.
    pieces = []
    have = 0
    conn.settimeout(0.5)
    try:
        while have < 2 * BLOCK:
            raw = b""
            while len(raw) < 4:
                raw += conn.recv(4 - len(raw))
            (k,) = _len.unpack(raw)
            payload = b""
            while len(payload) < k * 8:
                payload += conn.recv(k * 8 - len(payload))
            pieces.append(np.frombuffer(payload, "<f4").reshape(k, 2).T)
            have += k
    except TimeoutError:
        pass
    deadline = time.monotonic() + 10
    while have < 2 * BLOCK and time.monotonic() < deadline:
        with srv_a._lock:
            avail = pool_a.available(lane)
            take = min(avail, 2 * BLOCK - have)
            if take:
                pieces.append(pool_a.pull(lane, take))
                have += take
        time.sleep(0.01)
    assert have == 2 * BLOCK, have
    first = np.concatenate(pieces, axis=1)
    ckpt = str(tmp_path / "serve_ckpt")
    srv_a.save_checkpoint(ckpt)  # lane still attached (connection open)
    conn.close()
    srv_a.stop()
    np.testing.assert_allclose(first, want[:, :2 * BLOCK], atol=1e-6)

    # Generation B: restore, resume the lane, stream the second half.
    pool_b = StreamPool(4, 48_000.0, renderer, block_size=BLOCK)
    snap = load_pool_snapshot(ckpt, pool_b)
    pool_b.restore(snap)
    srv_b = RenderServer(pool_b, port=0, resume_grace=30.0,
                         orphan_tokens=snap["resume_tokens"])
    srv_b.start()
    try:
        assert srv_b.stats()["orphan_lanes"] == 1
        # A wrong/missing token never claims the orphan (lane ids are
        # guessable; the token is the authentication).
        errs = srv_b.protocol_errors
        out = render_via_server(srv_b.address, x[:, :BLOCK], resume=lane)
        assert out.shape[1] == 0
        out = render_via_server(srv_b.address, x[:, :BLOCK], resume=lane,
                                resume_token="not-the-token")
        assert out.shape[1] == 0
        assert srv_b.protocol_errors == errs + 2
        assert srv_b.stats()["orphan_lanes"] == 1  # attempts don't consume
        second = render_via_server(srv_b.address, x[:, 2 * BLOCK:],
                                   chunk=BLOCK, resume=lane,
                                   resume_token=token)
        np.testing.assert_allclose(second, want[:, 2 * BLOCK:], atol=1e-6)
        assert srv_b.resumed_streams == 1
        # The lane detached at the resumed connection's EOF; resuming it
        # again (or any live/unknown lane) is a protocol error.
        errs = srv_b.protocol_errors
        out = render_via_server(srv_b.address, x[:, :BLOCK], resume=lane,
                                resume_token=token)
        assert out.shape[1] == 0
        assert srv_b.protocol_errors == errs + 1
    finally:
        srv_b.stop()

    # Generation C: unclaimed orphans expire after the grace window.
    pool_c = StreamPool(4, 48_000.0, renderer, block_size=BLOCK)
    snap_c = load_pool_snapshot(ckpt, pool_c)
    pool_c.restore(snap_c)
    srv_c = RenderServer(pool_c, port=0, resume_grace=0.2,
                         orphan_tokens=snap_c["resume_tokens"])
    srv_c.start()
    try:
        deadline = time.monotonic() + 5
        while pool_c._attached and time.monotonic() < deadline:
            time.sleep(0.05)
        assert not pool_c._attached
        assert srv_c.expired_orphans == 1
        errs = srv_c.protocol_errors
        out = render_via_server(srv_c.address, x[:, :BLOCK], resume=lane,
                                resume_token=token)
        assert out.shape[1] == 0 and srv_c.protocol_errors == errs + 1
    finally:
        srv_c.stop()


@pytest.mark.heavy
def test_tokenless_restored_lanes_expire_and_hostile_tokens_are_safe(
        tmp_path):
    """A library-style checkpoint (no resume tokens) restored under a
    server still grace-expires its dead lanes instead of leaking slots;
    a non-ASCII resume token is a counted protocol error, not a thread
    death."""
    import socket
    import time

    from airwave_tpu.utils.checkpoint import (load_pool_snapshot,
                                              save_pool_snapshot)

    rng = np.random.default_rng(31)
    audio14 = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
    renderer = prepare_renderer(WAVData(48_000.0, audio14), cm.STEREO,
                                48_000.0, BLOCK)
    a = StreamPool(4, 48_000.0, renderer, block_size=BLOCK)
    a.attach()
    a.attach()
    path = str(tmp_path / "tokenless")
    save_pool_snapshot(path, a.snapshot())  # library flow: no tokens

    b = StreamPool(4, 48_000.0, renderer, block_size=BLOCK)
    snap = load_pool_snapshot(path, b)
    assert "resume_tokens" not in snap
    b.restore(snap)
    srv = RenderServer(b, port=0, resume_grace=0.2,
                       orphan_tokens=snap.get("resume_tokens", {}) or {})
    srv.start()
    try:
        deadline = time.monotonic() + 5
        while b._attached and time.monotonic() < deadline:
            time.sleep(0.05)
        assert not b._attached, "token-less restored lanes leaked"
        assert srv.expired_orphans == 2

        # Hostile non-ASCII token on an orphan lane id: protocol error.
        c = StreamPool(4, 48_000.0, renderer, block_size=BLOCK)
        c.attach()
        srv2 = RenderServer(c, port=0, resume_grace=30.0,
                            orphan_tokens={0: "deadbeef"})
        srv2.start()
        try:
            errs = srv2.protocol_errors
            conn = socket.create_connection(srv2.address, timeout=10)
            conn.sendall(('{"channels": 2, "resume": 0, '
                          '"token": "á"}\n').encode())
            assert conn.recv(16) in (b"\x00\x00\x00\x00", b"")
            conn.close()
            deadline = time.monotonic() + 5
            while srv2.protocol_errors == errs and \
                    time.monotonic() < deadline:
                time.sleep(0.02)
            assert srv2.protocol_errors == errs + 1
            assert srv2.stats()["orphan_lanes"] == 1  # not consumed
        finally:
            srv2.stop()
    finally:
        srv.stop()


def test_tier_added_latency_is_measured():
    """The tier latency CONTRACTS, measured not asserted (VERDICT r3 #4):
    the default ring tier's 'zero added blocks' and the throughput tier's
    '<= M blocks added' are pinned here in frame units — blocks pushed
    until the first rendered frame appears, solo and with a saturated
    neighbor lane (the neighbor's rounds must not force a partial lane's
    audio out early OR starve it past the contract). The reference pins
    its latency contract the same way
    (/root/reference/AirwaveTests/RealtimeAudioProcessorTests.swift:68-78,
    the 384-sample prefix)."""
    rng = np.random.default_rng(50)
    audio14 = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)

    for m in (1, 4):
        renderer = prepare_renderer(WAVData(48_000.0, audio14), cm.STEREO,
                                    48_000.0, BLOCK, lookahead=m)
        pool = StreamPool(4, 48_000.0, renderer, block_size=BLOCK,
                          blocks_per_step=m, ring_blocks=8 * m)
        a = pool.attach()
        b = pool.attach()

        def blocks_to_first_output(lane, feed_neighbor):
            for k in range(1, 3 * m + 2):
                pool.push(lane, (rng.standard_normal((2, BLOCK)) * 0.3
                                 ).astype(np.float32))
                if feed_neighbor:
                    pool.push(b, (rng.standard_normal((2, m * BLOCK)) * 0.3
                                  ).astype(np.float32))
                pool.pump()
                if pool.available(lane):
                    return k
            raise AssertionError(f"no output after {3 * m + 1} blocks")

        solo = blocks_to_first_output(a, feed_neighbor=False)
        # Added latency = blocks beyond the one being rendered.
        assert solo - 1 <= max(0, m - 1), (m, solo)
        assert solo == m, (m, solo)  # measured: exactly M, not just <= M

        # Saturated neighbor: lane a detaches/reattaches fresh, lane b
        # keeps full rounds flowing while a trickles one block per round.
        pool.detach(a)
        a = pool.attach()
        contended = blocks_to_first_output(a, feed_neighbor=True)
        assert contended == m, (m, contended)
        pool.detach(a)
        pool.detach(b)


def test_server_latency_stats():
    """RenderServer.stats() reports wire-to-wire p50/p99 chunk latency
    (push -> rendered frames on the socket), populated by real traffic."""
    rng = np.random.default_rng(51)
    audio14 = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
    renderer = prepare_renderer(WAVData(48_000.0, audio14), cm.STEREO,
                                48_000.0, BLOCK)
    pool = StreamPool(4, 48_000.0, renderer, block_size=BLOCK)
    srv = RenderServer(pool, port=0)
    srv.start()
    try:
        assert srv.stats()["latency"] == {"count": 0}
        x = (rng.standard_normal((2, 6 * BLOCK + 13)) * 0.3
             ).astype(np.float32)
        out = render_via_server(srv.address, x, chunk=BLOCK)
        assert out.shape == x.shape
        lat = srv.stats()["latency"]
        assert lat["count"] > 0
        assert 0.0 <= lat["p50_ms"] <= lat["p90_ms"] <= lat["p99_ms"] \
            <= lat["max_ms"]
        # Sanity ceiling: loopback chunk latency is milliseconds, not the
        # client timeout.
        assert lat["max_ms"] < 10_000.0
    finally:
        srv.stop()


def test_checkpoint_schema_versioning(tmp_path):
    """Serving checkpoints are schema-versioned (the reference's
    DeviceProfileManager/ProductSetup envelope pattern,
    /root/reference/Airwave/DeviceProfileManager.swift:45,317-320): a
    pre-upgrade snapshot fails with a versioned, actionable error naming
    both schemas — never a raw treedef/shape traceback. The schema-1
    fixture is PINNED in the repo so this error path is exercised
    forever, across every future carry change."""
    import os

    import pytest

    from airwave_tpu.shell.app import restore_serve_checkpoint
    from airwave_tpu.utils.checkpoint import (POOL_SNAPSHOT_SCHEMA,
                                              checkpoint_path,
                                              load_pool_snapshot,
                                              load_pytree_extra,
                                              save_pool_snapshot,
                                              save_pytree)

    rng = np.random.default_rng(43)
    audio14 = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
    renderer = prepare_renderer(WAVData(48_000.0, audio14), cm.STEREO,
                                48_000.0, BLOCK)
    pool = StreamPool(4, 48_000.0, renderer, block_size=BLOCK)

    # 1. The pinned synthetic pre-versioning fixture: its shapes fit
    # neither this build nor the migratable round-3 full-window layout,
    # so the versioned error (naming both schemas) fires after the
    # migration attempt. (The MIGRATABLE case — a real round-3
    # checkpoint — is tests/test_migration.py.)
    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "pool_snapshot_prehalfwindow.npz")
    with pytest.raises(ValueError, match=r"schema 1.*"
                       rf"schema {POOL_SNAPSHOT_SCHEMA}"):
        load_pool_snapshot(fixture, pool)

    # 2. Sidecar-era file (no embedded meta at all): same versioned error.
    sidecar_era = str(tmp_path / "sidecar_era")
    save_pytree(sidecar_era, {"state": np.zeros(3, np.float32),
                              "debt": np.zeros(4, np.int32)})
    with pytest.raises(ValueError, match="schema 1"):
        load_pool_snapshot(sidecar_era, pool)

    # 2b. A schema-less one-file snapshot whose arrays DO match this
    # build (what round-3 HEAD wrote after the half-window fold but
    # before versioning existed) must still load — rejecting it would
    # spuriously drop every lane's DSP state across that upgrade.
    legacy_lane = pool.attach()
    snap_now = pool.snapshot()
    legacy_meta = {
        "attached": [int(s) for s in snap_now["attached"]],
        "eq_enabled": bool(snap_now["eq_enabled"]),
        "groups": 1,
        "eq_runtime": {"active": None, "transition_from": None,
                       "pending": None, "samples_into_transition": 0,
                       "reset_requested": False},
    }
    legacy_ok = str(tmp_path / "legacy_ok")
    save_pytree(legacy_ok, {"state": snap_now["state"],
                            "debt": np.asarray(snap_now["debt"])},
                extra_json=legacy_meta)
    restored = load_pool_snapshot(legacy_ok, pool)
    assert restored["attached"] == legacy_meta["attached"]
    pool.detach(legacy_lane)

    # 3. A future schema is rejected symmetrically (no silent forward
    # compatibility).
    future = str(tmp_path / "future")
    save_pytree(future, {"state": np.zeros(3, np.float32),
                         "debt": np.zeros(4, np.int32)},
                extra_json={"schema": POOL_SNAPSHOT_SCHEMA + 1})
    with pytest.raises(ValueError, match=rf"schema {POOL_SNAPSHOT_SCHEMA + 1}"
                       rf".*schema {POOL_SNAPSHOT_SCHEMA}"):
        load_pool_snapshot(future, pool)

    # 4. Carry-layout change WITHOUT a schema bump (the exact omission
    # that motivated versioning) is still caught by the structural tag.
    real = str(tmp_path / "real")
    save_pool_snapshot(real, pool.snapshot())
    meta = load_pytree_extra(real)
    assert meta["schema"] == POOL_SNAPSHOT_SCHEMA
    assert meta["carry"]  # self-describing snapshots
    forgot_bump = str(tmp_path / "forgot_bump")
    save_pytree(forgot_bump, {"state": np.zeros(3, np.float32),
                              "debt": np.zeros(4, np.int32)},
                extra_json=dict(meta, carry=meta["carry"] + ",.overlap"))
    with pytest.raises(ValueError, match="carry format.*schema bump"):
        load_pool_snapshot(forgot_bump, pool)

    # 5. serve --checkpoint surfaces the versioned error cleanly: fresh
    # start, file moved aside (never deleted or overwritten).
    old = str(tmp_path / "old")
    import shutil
    shutil.copy(fixture, checkpoint_path(old))
    resumed, tokens, aliases = restore_serve_checkpoint(old, pool)
    assert resumed is False and tokens is None and aliases is None
    assert not os.path.exists(checkpoint_path(old))
    assert os.path.exists(checkpoint_path(old) + ".incompatible")

    # 6. A current-format snapshot still round-trips.
    pool.attach()
    save_pool_snapshot(real, pool.snapshot())
    fresh = StreamPool(4, 48_000.0, renderer, block_size=BLOCK)
    fresh.restore(load_pool_snapshot(real, fresh))
    assert len(fresh._attached) == 1

    # 7. Same schema AND carry tag but a differently-constructed pool
    # (here: lane count) — still a versioned, actionable error, never
    # the raw treedef/shape traceback (the tag only hashes leaf NAMES,
    # so shape mismatches must be upgraded at the catch site).
    from airwave_tpu.utils.checkpoint import SnapshotCompatError
    other = StreamPool(8, 48_000.0, renderer, block_size=BLOCK)
    mism = str(tmp_path / "mism")
    save_pool_snapshot(mism, other.snapshot())
    with pytest.raises(SnapshotCompatError, match="constructed differently"):
        load_pool_snapshot(mism, pool)

    # 8. A pre-versioning file whose ARRAYS fit the migratable round-3
    # full-window layout but whose control metadata is from an even
    # older generation (missing required keys) falls through to the
    # versioned error — never a raw KeyError (serve's move-aside path
    # catches ValueError).
    import jax

    from airwave_tpu.utils import checkpoint as _ckpt_mod
    state_now = jax.tree_util.tree_map(np.asarray, pool._state)
    kp, S, p2, c, B = state_now.conv.fdl.shape
    legacy_conv = _ckpt_mod._LegacyConvState(
        fdl=np.zeros((kp, S, p2 - 1, c, B), np.float32),
        overlap=np.zeros((B, S, BLOCK), np.float32),
        write_pos=np.zeros((), np.int32),
    )
    ancient = str(tmp_path / "ancient")
    save_pytree(ancient, {"state": state_now._replace(conv=legacy_conv),
                          "debt": np.asarray(pool._debt)},
                extra_json={"eq_enabled": True})  # no attached/groups/...
    with pytest.raises(ValueError, match="predates schema versioning"):
        load_pool_snapshot(ancient, pool)


def test_incompatible_checkpoint_degrades_to_fresh_start(tmp_path):
    """A serve checkpoint whose pool layout no longer matches (e.g. a
    pre-upgrade snapshot format, or a changed profile set) must not
    crash-loop `serve --checkpoint`: the server starts fresh and the
    unreadable file is moved aside, never silently overwritten."""
    import os

    from airwave_tpu.shell.app import restore_serve_checkpoint
    from airwave_tpu.utils.checkpoint import (checkpoint_path,
                                              save_pool_snapshot)

    rng = np.random.default_rng(41)
    audio14 = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
    renderer = prepare_renderer(WAVData(48_000.0, audio14), cm.STEREO,
                                48_000.0, BLOCK)
    a = StreamPool(4, 48_000.0, renderer, block_size=BLOCK)
    a.attach()
    path = str(tmp_path / "ckpt")
    save_pool_snapshot(path, a.snapshot())

    # A size-only difference is NOT incompatible anymore: it resizes
    # (lanes keep their history; covered in depth by test_resize.py).
    b = StreamPool(8, 48_000.0, renderer, block_size=BLOCK)
    resumed, tokens, aliases = restore_serve_checkpoint(path, b)
    assert resumed is True and len(b._attached) == 1
    assert os.path.exists(checkpoint_path(path))  # never moved aside

    # A pool whose SHAPE differs (other block size -> other partition
    # count) cannot restore: fresh start, file moved aside.
    renderer2 = prepare_renderer(WAVData(48_000.0, audio14), cm.STEREO,
                                 48_000.0, 2 * BLOCK)
    d = StreamPool(4, 48_000.0, renderer2, block_size=2 * BLOCK)
    resumed, tokens, aliases = restore_serve_checkpoint(path, d)
    assert resumed is False and tokens is None and aliases is None
    assert not d._attached  # fresh start, nothing half-restored
    assert not os.path.exists(checkpoint_path(path))
    assert os.path.exists(checkpoint_path(path) + ".incompatible")

    # A matching pool restores normally through the same helper.
    save_pool_snapshot(path, a.snapshot())
    c = StreamPool(4, 48_000.0, renderer, block_size=BLOCK)
    resumed, tokens, aliases = restore_serve_checkpoint(path, c)
    assert resumed is True and tokens == {} and aliases is None
    assert len(c._attached) == 1

    # No checkpoint / missing file: clean no-op.
    assert restore_serve_checkpoint(None, c) == (False, None, None)
    assert restore_serve_checkpoint(str(tmp_path / "missing"), c) == (
        False, None, None)

def test_save_checkpoint_never_holds_lock_during_io(tmp_path, monkeypatch):
    """The serve `--checkpoint` pump-stall contract (VERDICT r4 #5): the
    serving lock is held only for the device-side carry copy
    (`snapshot(materialize=False)`) — the multi-GB readback +
    serialization + fsync'd atomic write all run OUTSIDE it, so periodic
    checkpointing can never stall pump rounds for the file-write
    duration. Pinned mechanically (not by wall clock, which is flaky on
    a 1-core box): a slow write is simulated and the lock must be
    acquirable while it runs."""
    import time

    from airwave_tpu.shell import serve as serve_mod

    rng = np.random.default_rng(5)
    audio = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
    renderer = prepare_renderer(WAVData(48_000.0, audio), cm.STEREO,
                                48_000.0, BLOCK)
    pool = StreamPool(8, 48_000.0, renderer, block_size=BLOCK)
    srv = RenderServer(pool, port=0)

    in_write = threading.Event()
    release = threading.Event()
    calls = {}

    def slow_save(path, snap):
        calls["snap"] = snap
        in_write.set()
        assert release.wait(10), "test orchestration failure"

    # save_checkpoint imports the symbol from utils.checkpoint at call
    # time, so patching the module attribute intercepts the real write.
    from airwave_tpu.utils import checkpoint as ckpt_mod
    monkeypatch.setattr(ckpt_mod, "save_pool_snapshot", slow_save)

    t = threading.Thread(
        target=srv.save_checkpoint, args=(str(tmp_path / "ck"),))
    t.start()
    try:
        assert in_write.wait(10)
        # The write is in flight: the serving lock must be FREE (a pump
        # round could run right now).
        acquired = srv._lock.acquire(timeout=2)
        assert acquired, "save_checkpoint held the serving lock into the write phase"
        srv._lock.release()
        # And the snapshot handed to the writer is round-consistent
        # (carry + resume tokens were captured under the lock).
        assert "state" in calls["snap"]
        assert "resume_tokens" in calls["snap"]
    finally:
        release.set()
        t.join(timeout=10)
    assert not t.is_alive()
