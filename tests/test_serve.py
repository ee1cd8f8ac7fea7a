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


@pytest.fixture()
def server():
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
    renderer = prepare_renderer(WAVData(48_000.0, audio), cm.STEREO,
                                48_000.0, BLOCK)
    pool = StreamPool(8, 48_000.0, renderer, block_size=BLOCK)
    srv = RenderServer(pool, port=0)
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
