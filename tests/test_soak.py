"""Wall-clock serving soak (`pytest -m soak`, deselected by default).

The executable form of docs/release-validation.md's long soak: a live
RenderServer driven for AIRWAVE_SOAK_SECONDS per serving tier (default
300 s x 2 tiers = 10 min total) of continuous attach/detach churn, ragged
chunk sizes, slow readers, and periodic EQ retargets. Pass criteria: every completed stream's audio is finite and
full-length, the pump thread survives the whole window with zero pump
errors, and churn leaks no slots, rings, or stashed blocks.

Run:  python -m pytest -m soak tests/test_soak.py -q
Short CI-scale churn coverage lives in tests/test_serve.py::test_churn_soak.
"""

import json
import os
import socket
import struct
import threading
import time

import numpy as np
import pytest

from airwave_tpu.assets import channel_maps as cm
from airwave_tpu.graph.renderer import prepare_renderer
from airwave_tpu.io.apo import EqualizerDefinition, EqualizerFilter, FilterType
from airwave_tpu.io.wav import WAVData
from airwave_tpu.runtime.stream_pool import StreamPool
from airwave_tpu.shell.serve import RenderServer, render_via_server

BLOCK = 64
_LEN = struct.Struct("<I")


def _eq(gain_db: float) -> EqualizerDefinition:
    return EqualizerDefinition(-1.5, (
        EqualizerFilter(1, 1, True, FilterType.PEAKING, 900.0, gain_db, 0.8),
        EqualizerFilter(2, 2, True, FilterType.HIGH_SHELF, 6000.0,
                        -gain_db / 2, 0.7),
    ))


def _slow_reader_client(address, audio: np.ndarray, pause: float,
                        group: int = 0) -> int:
    """Send everything up front, then drain slowly — exercises the output
    ring's gated-harvest backpressure. Returns frames received."""
    conn = socket.create_connection(address, timeout=60)
    try:
        conn.sendall(json.dumps({"channels": audio.shape[0],
                                 "group": group}).encode() + b"\n")
        chunk = 3 * BLOCK
        for start in range(0, audio.shape[1], chunk):
            piece = np.ascontiguousarray(audio[:, start:start + chunk])
            conn.sendall(_LEN.pack(piece.shape[1])
                         + piece.T.astype("<f4").tobytes())
        conn.sendall(_LEN.pack(0))
        got = 0
        while True:
            raw = b""
            while len(raw) < _LEN.size:
                piece = conn.recv(_LEN.size - len(raw))
                if not piece:
                    return got
                raw += piece
            (n,) = _LEN.unpack(raw)
            if n == 0:
                return got
            need = n * 2 * 4
            payload = b""
            while len(payload) < need:
                piece = conn.recv(min(1 << 16, need - len(payload)))
                if not piece:
                    return got
                payload += piece
            frames = np.frombuffer(payload, "<f4")
            assert np.all(np.isfinite(frames))
            got += n
            time.sleep(pause)
    finally:
        conn.close()


# Both serving tiers share the soak window: the default single-block pool
# (as a GROUPED 2-profile pool, so multi-tenant churn soaks too) and the
# multi-block throughput tier (paged line + folded EQ + page-debt rolls
# under churn, single-profile). Between them every serving design axis
# (ring vs paged, grouped vs single) gets a long-run window.
_TIERS = ((1, 2), (2, 1))


@pytest.mark.soak
@pytest.mark.parametrize("blocks_per_step,groups", _TIERS)
def test_render_server_soak(blocks_per_step, groups):
    # Per-TIER window (NOT divided by the tier count): selecting a single
    # parametrization with -k still soaks the full requested window. The
    # default full matrix = 300 s x 2 tiers = the release gate's 10 min.
    seconds = float(os.environ.get("AIRWAVE_SOAK_SECONDS", "300"))
    rng = np.random.default_rng(23)
    hrir = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
    renderer = prepare_renderer(WAVData(48_000.0, hrir), cm.STEREO,
                                48_000.0, BLOCK, lookahead=blocks_per_step)
    if groups > 1:
        from airwave_tpu.runtime.stream_pool import PoolProfile

        # Different length than group 0's bank: the soak also churns the
        # heterogeneous-partition grouped design (per-group delay lines).
        hrir_b = (np.random.default_rng(24).standard_normal((14, 700))
                  * 0.2).astype(np.float32)
        renderer_b = prepare_renderer(WAVData(48_000.0, hrir_b), cm.STEREO,
                                      48_000.0, BLOCK,
                                      lookahead=blocks_per_step)
        pool = StreamPool(12, 48_000.0, block_size=BLOCK,
                          ring_blocks=4 * blocks_per_step,
                          blocks_per_step=blocks_per_step,
                          profiles=[PoolProfile(renderer, _eq(3.0)),
                                    PoolProfile(renderer_b, _eq(-2.0))])
    else:
        pool = StreamPool(12, 48_000.0, renderer, eq_definition=_eq(3.0),
                          block_size=BLOCK, ring_blocks=4 * blocks_per_step,
                          blocks_per_step=blocks_per_step)
    pool.prewarm(include_hotswap=True)
    # Crossfaded HRIR hot-swap targets: same-shape scaled variants of
    # each group's bank, swapped mid-traffic every few waves (the same
    # sustained-mutation coverage that caught the round-3 EQ retirement
    # wedge — a fade left pending or a bank that never lands only shows
    # up under churn).
    base_hrirs = [hrir]
    if groups > 1:
        base_hrirs.append(hrir_b)
    swap_banks = [
        [prepare_renderer(WAVData(48_000.0,
                                  (h * s).astype(np.float32)),
                          cm.STEREO, 48_000.0, BLOCK,
                          lookahead=blocks_per_step)
         for s in (0.85, 1.0)]
        for h in base_hrirs
    ]
    srv = RenderServer(pool, port=0, client_timeout=60.0)
    srv.start()
    stats = {"clients": 0, "frames": 0, "failures": []}
    stop = time.monotonic() + seconds
    lock = threading.Lock()

    def normal_client(i: int):
        # Thread-local generator: np.random.Generator is not thread-safe,
        # and the main thread draws from `rng` concurrently.
        trng = np.random.default_rng(i)
        n = int(trng.integers(2 * BLOCK, 14 * BLOCK))
        audio = (trng.standard_normal((2, n)) * 0.3).astype(np.float32)
        try:
            # Stay under the wire cap (ring capacity - block + 1 frames).
            out = render_via_server(srv.address, audio,
                                    chunk=int(trng.integers(17, 3 * BLOCK)),
                                    group=i % groups)
            assert out.shape == (2, n), (out.shape, n)
            assert np.all(np.isfinite(out))
            with lock:
                stats["clients"] += 1
                stats["frames"] += n
        except Exception as err:  # noqa: BLE001
            with lock:
                stats["failures"].append(f"normal[{i}]: {err!r}")

    def slow_client(i: int):
        n = 10 * BLOCK
        audio = (np.random.default_rng(10_000 + i).standard_normal((2, n))
                 * 0.3).astype(np.float32)
        try:
            got = _slow_reader_client(srv.address, audio, pause=0.05,
                                      group=i % groups)
            assert got == n, (got, n)
            with lock:
                stats["clients"] += 1
                stats["frames"] += n
        except Exception as err:  # noqa: BLE001
            with lock:
                stats["failures"].append(f"slow[{i}]: {err!r}")

    last_def = {g: None for g in range(groups)}
    last_bank = {g: None for g in range(groups)}
    try:
        wave = 0
        while time.monotonic() < stop:
            wave += 1
            threads = [
                threading.Thread(target=normal_client, args=(wave * 10 + j,))
                for j in range(int(rng.integers(1, 5)))
            ]
            if wave % 3 == 0:
                threads.append(
                    threading.Thread(target=slow_client, args=(wave,))
                )
            for t in threads:
                t.start()
            if wave % 5 == 0:  # live EQ retarget mid-traffic
                # Grouped tiers alternate per-group and pool-wide targets.
                target_group = ((wave // 5) % (groups + 1)) - 1
                new_def = _eq(float(rng.uniform(-6, 6)))
                srv.set_equalizer(
                    new_def,
                    group=None if target_group < 0 else target_group,
                )
                for g in range(groups):
                    if target_group < 0 or target_group == g:
                        last_def[g] = new_def
            if wave % 7 == 0:  # crossfaded HRIR hot-swap mid-traffic
                g = (wave // 7) % groups
                bank = swap_banks[g][(wave // 7) % 2]
                srv.set_renderer(bank, group=g if groups > 1 else None)
                last_bank[g] = bank
            for t in threads:
                t.join(timeout=90)
            assert srv._pump_thread.is_alive(), "pump thread died mid-soak"

        assert not stats["failures"], stats["failures"][:5]
        assert stats["clients"] >= 3
        assert srv.pump_errors == 0
        assert pool.render_errors == 0
        # Retargets actually LAND (regression: the retirement handoff
        # wedged every retarget after the second completed transition) —
        # settle the last ramp with a few quiet rounds first.
        ramp_rounds = -(-960 // pool.step_frames) + 3
        settle = np.zeros((2, ramp_rounds * pool.step_frames), np.float32)
        for g, want in last_def.items():
            if want is None:
                continue
            out = render_via_server(srv.address, settle, chunk=BLOCK,
                                    group=g)
            assert out.shape == settle.shape
            rt = pool.eq_runtimes[g]
            assert rt.active.definition == want, (
                f"group {g}: last retarget never became active")
            assert rt.pending_target is None
        # Hot-swaps actually LAND: the newest bank is the group's active
        # renderer and no live lane still owes a fade round.
        for g, bank in last_bank.items():
            if bank is None:
                continue
            assert pool.renderers[g] is bank, (
                f"group {g}: last hot-swap never became active")
        assert not (pool._xfade_pending & pool._attached_mask).any()
        # Churn leaves nothing behind once the last EOF lands.
        deadline = time.monotonic() + 10
        while pool._attached and time.monotonic() < deadline:
            time.sleep(0.02)
        assert not pool._attached
        assert len(pool._free) == pool.max_streams
        assert not pool._pending_out
        print(f"soak: {stats['clients']} clients, {stats['frames']} frames, "
              f"{wave} waves over {seconds:.0f}s")
    finally:
        srv.stop()
