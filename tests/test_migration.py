"""Schema-1 -> schema-2 serving-checkpoint MIGRATION (the reference's
ProductSetup v1->v2 migrate-on-load pattern, ProductSetup.swift:53-76).

The gold fixture was written by the ACTUAL round-3 build (a git worktree
of c98e2a6, the last full-window commit — generator pinned at
tests/fixtures/gen_r3_full_window_fixture.py): a real StreamPool served
a ragged schedule and was checkpointed MID-PAUSE, so one lane carries
live alignment debt the migration must repay. The current build must
read that file, convert the full-window carry to the half-window line
(ops/upols.migrate_full_window_fdl: shift-theorem backward recursion in
f64), and continue every stream within tolerance of an uninterrupted
render."""

import os

import numpy as np
import pytest

from airwave_tpu.assets import channel_maps as cm
from airwave_tpu.graph.renderer import prepare_renderer
from airwave_tpu.io.wav import WAVData
from airwave_tpu.runtime.stream_pool import StreamPool
from airwave_tpu.utils.checkpoint import load_pool_snapshot

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _rel_rms(a, b):
    return (np.sqrt(np.mean((a - b) ** 2))
            / max(np.sqrt(np.mean(b ** 2)), 1e-12))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_migration_recursion_property(seed):
    """The gold fixtures pin two real configurations; this locks the
    conversion math itself across random partition counts, cursor
    positions and per-lane debts. Construct the full-window line
    directly from its definition (slot j holds X_{t-j} = u_{t-j-1} +
    s (.) u_{t-j}, s_k = (-1)^k, u from DFT_2T([b,0])), migrate, and
    compare every slot against the independently-built half-window
    truth. The backward recursion's f32->f64 error walk stays well
    under the 1e-5 chain contract even at config-5-scale P."""
    from airwave_tpu.ops.upols import migrate_full_window_fdl

    rng = np.random.default_rng(seed)
    T = 64
    K = T + 1
    P = int(rng.integers(1, 9)) if seed < 3 else 94   # long-IR stress
    S, B = 2, 3
    kp = K + int(rng.integers(0, 4))   # pad rows beyond K are zero
    w = int(rng.integers(0, P))

    # P+1 consecutive analysis spectra u_{t-P} .. u_t, from f32 blocks.
    blocks = rng.standard_normal((P + 1, B, S, T)).astype(np.float32)
    padded = np.zeros((P + 1, B, S, 2 * T), np.float64)
    padded[..., :T] = blocks
    u = np.fft.rfft(padded, axis=-1)               # [P+1, B, S, K]
    u = np.transpose(u, (0, 3, 2, 1))              # [P+1, K, S, B]
    s = ((-1.0) ** np.arange(K))[:, None, None]

    # Full-window slots: (w-1-j) mod P holds X_{t-j}, j = 0..P-1.
    fdl_old = np.zeros((kp, S, P, 2, B), np.float32)
    for j in range(P):
        X = u[P - j - 1] + s * u[P - j]            # u_{t-j-1}+s(.)u_{t-j}
        slot = (w - 1 - j) % P
        fdl_old[:K, :, slot, 0, :] = X.real
        fdl_old[:K, :, slot, 1, :] = X.imag
    overlap = np.transpose(blocks[P], (0, 1, 2))   # [B, S, T] = b_t

    # Per-lane debt: the stored (pre-roll) line satisfies
    # roll(stored, d)[p] = stored[(p-d) mod P] = debt-free[p].
    debt = rng.integers(0, P + 3, size=B)
    stored = fdl_old.copy()
    for b in range(B):
        src = (np.arange(P) + debt[b]) % P
        stored[:, :, :, :, b] = np.take(fdl_old[:, :, :, :, b], src,
                                        axis=2)

    got = migrate_full_window_fdl(stored, overlap, w, debt)
    assert got.shape == (kp, S, P + 1, 2, B)
    assert got.dtype == np.float32

    tol = 1e-5
    for j in range(P + 1):
        slot = (w - 1 - j) % (P + 1)
        want = u[P - j]
        for plane, part in ((0, want.real), (1, want.imag)):
            g = got[:K, :, slot, plane, :]
            err = (np.abs(g - part).max()
                   / max(np.abs(part).max(), 1e-12))
            assert err < tol, (j, plane, err)
    assert not np.any(got[K:])                     # pad rows stay zero


def test_round3_full_window_checkpoint_migrates_and_continues():
    d = np.load(os.path.join(FIXDIR, "r3_full_window_inputs.npz"))
    block = int(d["block"])
    n_pre, n_post = int(d["n_pre"]), int(d["n_post"])
    x = d["x"]                      # [lane, ch, (n_pre+n_post)*block]
    extra_a = d["extra_a"]          # lane a's 2 extra mid-pause blocks
    pre_out = d["pre_out"]          # what round 3 already delivered
    renderer = prepare_renderer(WAVData(48_000.0, d["hrir_audio"]),
                                cm.STEREO, 48_000.0, block)

    # Uninterrupted reference with the CURRENT build. Lane a's true
    # stream is [x_a_pre, extra_a, x_a_post]; lane b's [x_b_pre,
    # x_b_post] (it was paused while a played extra_a).
    streams = [
        np.concatenate([x[0, :, :n_pre * block], extra_a,
                        x[0, :, n_pre * block:]], axis=1),
        np.concatenate([x[1, :, :n_pre * block],
                        x[1, :, n_pre * block:]], axis=1),
    ]
    ref_pool = StreamPool(4, 48_000.0, renderer, block_size=block)
    ref_lanes = [ref_pool.attach(), ref_pool.attach()]
    ref_out = [[], []]
    blocks_total = [s.shape[1] // block for s in streams]
    for t in range(max(blocks_total)):
        for j, lane in enumerate(ref_lanes):
            if t < blocks_total[j]:
                ref_pool.push(lane, streams[j][:, t * block:(t + 1) * block])
        ref_pool.pump()
        for j, lane in enumerate(ref_lanes):
            n = ref_pool.available(lane)
            if n:
                ref_out[j].append(ref_pool.pull(lane, n))
    ref_out = [np.concatenate(o, axis=1) for o in ref_out]

    # The already-delivered round-3 prefix matches the current build's
    # render of the same blocks (the half-window rewrite is
    # output-equivalent).
    assert _rel_rms(pre_out[0], ref_out[0][:, :n_pre * block]) < 1e-5
    assert _rel_rms(pre_out[1], ref_out[1][:, :n_pre * block]) < 1e-5

    # Migrate-on-load: the schema-less full-window file converts
    # transparently; the paused lane's debt is repaid inside the
    # migration.
    pool = StreamPool(4, 48_000.0, renderer, block_size=block)
    snap = load_pool_snapshot(os.path.join(FIXDIR, "r3_full_window_pool"),
                              pool)
    assert snap.get("migrated_from") == "full-window (schema 1)"
    assert not np.any(np.asarray(snap["debt"]))
    pool.restore(snap)
    lanes = snap["attached"]
    assert len(lanes) == 2

    got = [[], []]
    for t in range(n_post):
        for j, lane in enumerate(lanes):
            pool.push(lane, x[j, :, (n_pre + t) * block:
                              (n_pre + t + 1) * block])
        pool.pump()
        for j, lane in enumerate(lanes):
            n = pool.available(lane)
            if n:
                got[j].append(pool.pull(lane, n))
    got = [np.concatenate(o, axis=1) for o in got]

    # Continuation equals the uninterrupted render's tail: lane a had
    # rendered n_pre+2 blocks before the snapshot, lane b n_pre.
    tails = [ref_out[0][:, (n_pre + 2) * block:],
             ref_out[1][:, n_pre * block:]]
    for j in range(2):
        assert got[j].shape == tails[j].shape, (j, got[j].shape)
        rel = _rel_rms(got[j], tails[j])
        assert rel < 1e-5, (j, rel)


def test_round3_grouped_full_window_checkpoint_migrates():
    """Grouped (multi-tenant) round-3 checkpoints migrate too: per-group
    full-window carries (heterogeneous HRIR lengths) convert with the
    per-group debt slices, and both tenants continue within tolerance."""
    from airwave_tpu.runtime.stream_pool import PoolProfile

    d = np.load(os.path.join(FIXDIR, "r3_grouped_full_window_inputs.npz"))
    block = int(d["block"])
    n_pre, n_post = int(d["n_pre"]), int(d["n_post"])
    x, extra_a = d["x"], d["extra_a"]
    r0 = prepare_renderer(WAVData(48_000.0, d["hrir_a"]), cm.STEREO,
                          48_000.0, block)
    r1 = prepare_renderer(WAVData(48_000.0, d["hrir_b"]), cm.STEREO,
                          48_000.0, block)

    def build():
        return StreamPool(4, 48_000.0, None, block_size=block,
                          profiles=[PoolProfile(r0), PoolProfile(r1)])

    # Uninterrupted reference (current build).
    streams = [
        np.concatenate([x[0, :, :n_pre * block], extra_a,
                        x[0, :, n_pre * block:]], axis=1),
        np.concatenate([x[1, :, :n_pre * block],
                        x[1, :, n_pre * block:]], axis=1),
    ]
    ref = build()
    ref_lanes = [ref.attach(0), ref.attach(1)]
    ref_out = [[], []]
    blocks_total = [s.shape[1] // block for s in streams]
    for t in range(max(blocks_total)):
        for j, lane in enumerate(ref_lanes):
            if t < blocks_total[j]:
                ref.push(lane, streams[j][:, t * block:(t + 1) * block])
        ref.pump()
        for j, lane in enumerate(ref_lanes):
            n = ref.available(lane)
            if n:
                ref_out[j].append(ref.pull(lane, n))
    ref_out = [np.concatenate(o, axis=1) for o in ref_out]
    assert _rel_rms(d["pre_out_a"][:, :n_pre * block],
                    ref_out[0][:, :n_pre * block]) < 1e-5
    assert _rel_rms(d["pre_out_b"], ref_out[1][:, :n_pre * block]) < 1e-5

    pool = build()
    snap = load_pool_snapshot(
        os.path.join(FIXDIR, "r3_grouped_full_window_pool"), pool)
    assert snap.get("migrated_from") == "full-window (schema 1)"
    pool.restore(snap)
    lanes = snap["attached"]
    got = [[], []]
    for t in range(n_post):
        for j, lane in enumerate(lanes):
            pool.push(lane, x[j, :, (n_pre + t) * block:
                              (n_pre + t + 1) * block])
        pool.pump()
        for j, lane in enumerate(lanes):
            n = pool.available(lane)
            if n:
                got[j].append(pool.pull(lane, n))
    got = [np.concatenate(o, axis=1) for o in got]
    tails = [ref_out[0][:, (n_pre + 2) * block:],
             ref_out[1][:, n_pre * block:]]
    for j in range(2):
        assert got[j].shape == tails[j].shape, (j, got[j].shape)
        rel = _rel_rms(got[j], tails[j])
        assert rel < 1e-5, (j, rel)
