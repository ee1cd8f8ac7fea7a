"""Pool resizing via snapshot (round 5).

`plan_capacity --calibrate` tells an operator the pool SHOULD be a
different max_streams than it is; `StreamPool.restore(snap, resize=True)`
makes that actionable without dropping live streams: attached lanes keep
their exact DSP history (per-group gather into the new lane space) and
the returned lane map lets the serving layer remap resume tokens. The
reference has no analog — its engines are per-stream objects, so "resize"
is free there; here the lane axis is a device-array dimension and the
resize is real carry surgery.
"""

import numpy as np
import pytest

from airwave_tpu.assets import channel_maps as cm
from airwave_tpu.graph.renderer import prepare_renderer
from airwave_tpu.io.apo import EqualizerDefinition, EqualizerFilter, FilterType
from airwave_tpu.io.wav import WAVData
from airwave_tpu.runtime.stream_pool import PoolProfile, StreamPool

BLOCK = 64


def make_renderer(frames=500, seed=5, block=BLOCK, lookahead=1):
    rng = np.random.default_rng(seed)
    audio = (rng.standard_normal((14, frames)) * 0.2).astype(np.float32)
    return prepare_renderer(WAVData(48_000.0, audio), cm.STEREO,
                            48_000.0, block, lookahead=lookahead)


def _eq_def(seed):
    return EqualizerDefinition(-1.0, (
        EqualizerFilter(1, 1, True, FilterType.PEAKING,
                        400.0 + 100 * seed, 3.0, 1.0),
    ))


def _feed(pool, streams, sigs, start, stop, skip=()):
    for i in range(start, stop):
        for s, sig in zip(streams, sigs):
            if (s, i) not in skip:
                pool.push(s, sig[:, i * BLOCK:(i + 1) * BLOCK])
        pool.pump()


@pytest.mark.parametrize("new_size", [12, 4])
def test_resize_preserves_lane_history_exactly(new_size):
    """Grow AND shrink: mid-life snapshot (incl. a debt-carrying paused
    lane) restored into a differently-sized pool continues bit-identical
    to the uninterrupted original, under the mapped lane ids."""
    renderer = make_renderer()
    a = StreamPool(6, 48_000.0, renderer, block_size=BLOCK)
    rng = np.random.default_rng(7)
    lanes = [a.attach() for _ in range(3)]
    # Spread the attached lanes out so the compaction is a real remap.
    a.detach(lanes[1])
    lanes = [lanes[0], lanes[2], a.attach()]
    sigs = [(rng.standard_normal((2, 8 * BLOCK)) * 0.3).astype(np.float32)
            for _ in lanes]
    # lane[2] pauses rounds 2-3: real alignment debt rides the resize.
    _feed(a, lanes, sigs, 0, 4, skip={(lanes[2], 2), (lanes[2], 3)})
    for s in lanes[:2]:
        a.pull(s, 4 * BLOCK)
    a.pull(lanes[2], 2 * BLOCK)
    snap = a.snapshot()
    assert snap["debt"][lanes[2]] > 0

    b = StreamPool(new_size, 48_000.0, renderer, block_size=BLOCK)
    lane_map = b.restore(snap, resize=True)
    assert sorted(lane_map) == sorted(lanes)
    assert sorted(lane_map.values()) == list(range(3))  # compacted head
    assert sorted(b._attached) == list(range(3))

    # Continue both pools on the same audio; outputs must match exactly.
    new_lanes = [lane_map[s] for s in lanes]
    for pool, ls in ((a, lanes), (b, new_lanes)):
        for i in range(4, 8):
            for s, sig in zip(ls, sigs):
                pool.push(s, sig[:, i * BLOCK:(i + 1) * BLOCK])
            pool.pump()
    for s_old, s_new, want_frames in zip(
            lanes, new_lanes, (4, 4, 6)):
        np.testing.assert_array_equal(
            a.pull(s_old, want_frames * BLOCK),
            b.pull(s_new, want_frames * BLOCK))
    # Fresh attaches land on clean lanes (gather filler was reset).
    extra = b.attach()
    sig_x = (rng.standard_normal((2, BLOCK)) * 0.3).astype(np.float32)
    b.push(extra, sig_x)
    b.pump()
    got = b.pull(extra, BLOCK)
    fresh = StreamPool(2, 48_000.0, renderer, block_size=BLOCK)
    f = fresh.attach()
    fresh.push(f, sig_x)
    fresh.pump()
    np.testing.assert_array_equal(got, fresh.pull(f, BLOCK))


def test_resize_overflow_and_plain_restore_still_strict():
    renderer = make_renderer()
    a = StreamPool(6, 48_000.0, renderer, block_size=BLOCK)
    for _ in range(3):
        a.attach()
    snap = a.snapshot()

    too_small = StreamPool(2, 48_000.0, renderer, block_size=BLOCK)
    with pytest.raises(ValueError, match="3 attached lanes"):
        too_small.restore(snap, resize=True)
    assert not too_small._attached  # nothing half-restored

    # Without resize=True a size mismatch is still a hard error.
    other = StreamPool(4, 48_000.0, renderer, block_size=BLOCK)
    with pytest.raises(ValueError, match="mismatch"):
        other.restore(snap)


def test_resize_paged_tier_with_debt():
    """The multi-block (paged) tier resizes too: pages gather on the lane
    axis, page-granular debt rides along."""
    M = 2
    renderer = make_renderer(lookahead=M)
    a = StreamPool(4, 48_000.0, renderer, block_size=BLOCK,
                   blocks_per_step=M)
    rng = np.random.default_rng(9)
    s0, s1 = a.attach(), a.attach()
    step = a.step_frames
    sig0 = (rng.standard_normal((2, 6 * step)) * 0.3).astype(np.float32)
    sig1 = (rng.standard_normal((2, 6 * step)) * 0.3).astype(np.float32)
    for i in range(4):
        a.push(s0, sig0[:, i * step:(i + 1) * step])
        if i < 2:
            a.push(s1, sig1[:, i * step:(i + 1) * step])
        a.pump()
    a.pull(s0, 4 * step)
    a.pull(s1, 2 * step)
    snap = a.snapshot()
    assert snap["debt"][s1] > 0

    b = StreamPool(8, 48_000.0, renderer, block_size=BLOCK,
                   blocks_per_step=M)
    lane_map = b.restore(snap, resize=True)
    for pool, l0, l1 in ((a, s0, s1), (b, lane_map[s0], lane_map[s1])):
        for i in range(4, 6):
            pool.push(l0, sig0[:, i * step:(i + 1) * step])
        for i in range(2, 6):
            pool.push(l1, sig1[:, i * step:(i + 1) * step])
        pool.pump()
        pool.pump()
    # Not bit-identical by design: the paged tier's debt rolls are
    # full-tensor masked ops over ALL lanes, so a different pool size
    # legitimately re-tiles the float reductions (same as having run the
    # lanes in the larger pool from the start). The ring tier's
    # gathered-bucket step IS bitwise (asserted above); here the contract
    # is numerical continuity.
    np.testing.assert_allclose(a.pull(s0, 2 * step),
                               b.pull(lane_map[s0], 2 * step), atol=1e-5)
    np.testing.assert_allclose(a.pull(s1, 4 * step),
                               b.pull(lane_map[s1], 4 * step), atol=1e-5)


def test_resize_grouped_compacts_per_group():
    """Grouped pools resize per profile group: each group's lanes compact
    into ITS new segment (heterogeneous HRIR lengths per group), and a
    group that overflows its resized segment errors even when the total
    fits."""
    r0 = make_renderer(frames=300, seed=1)
    r1 = make_renderer(frames=500, seed=2)
    profiles = [PoolProfile(r0, _eq_def(1)), PoolProfile(r1, None)]
    a = StreamPool(8, 48_000.0, block_size=BLOCK, profiles=profiles)
    rng = np.random.default_rng(11)
    g0 = [a.attach(0)]
    g1 = [a.attach(1), a.attach(1)]
    sigs = {s: (rng.standard_normal((2, 6 * BLOCK)) * 0.3
                ).astype(np.float32) for s in g0 + g1}
    for i in range(3):
        for s in g0 + g1:
            a.push(s, sigs[s][:, i * BLOCK:(i + 1) * BLOCK])
        a.pump()
    for s in g0 + g1:
        a.pull(s, 3 * BLOCK)
    snap = a.snapshot()

    b = StreamPool(12, 48_000.0, block_size=BLOCK, profiles=profiles)
    lane_map = b.restore(snap, resize=True)
    assert all(b.group_of(lane_map[s]) == 0 for s in g0)
    assert all(b.group_of(lane_map[s]) == 1 for s in g1)
    for pool, id_of in ((a, lambda s: s), (b, lambda s: lane_map[s])):
        for i in range(3, 6):
            for s in g0 + g1:
                pool.push(id_of(s), sigs[s][:, i * BLOCK:(i + 1) * BLOCK])
            pool.pump()
    for s in g0 + g1:
        np.testing.assert_array_equal(a.pull(s, 3 * BLOCK),
                                      b.pull(lane_map[s], 3 * BLOCK))

    # Per-group overflow: total fits (3 <= 4) but group 1's two lanes
    # exceed its one-slot segment in a 2-lane-per-group pool.
    tiny = StreamPool(2, 48_000.0, block_size=BLOCK, profiles=profiles)
    with pytest.raises(ValueError, match="group 1"):
        tiny.restore(snap, resize=True)


def test_resize_through_checkpoint_file_and_serve(tmp_path):
    """End-to-end: a serve checkpoint written at one --max-streams
    restores into a server sized differently; the client reclaims its
    lane WITH THE OLD ID (the ack it holds predates the resize) and its
    audio continues exactly."""
    from airwave_tpu.shell.app import restore_serve_checkpoint
    from airwave_tpu.shell.serve import RenderServer
    from airwave_tpu.shell.wire_client import render_via_server
    from airwave_tpu.utils.checkpoint import (load_pool_snapshot,
                                              save_pool_snapshot,
                                              snapshot_lane_count)

    renderer = make_renderer()
    a = StreamPool(6, 48_000.0, renderer, block_size=BLOCK)
    rng = np.random.default_rng(13)
    # Occupy-then-detach so the surviving lane is NOT lane 0 and the
    # resize genuinely remaps it.
    pad = a.attach()
    lane = a.attach()
    a.detach(pad)
    sig = (rng.standard_normal((2, 6 * BLOCK)) * 0.3).astype(np.float32)
    for i in range(3):
        a.push(lane, sig[:, i * BLOCK:(i + 1) * BLOCK])
        a.pump()
    a.pull(lane, 3 * BLOCK)
    snap = a.snapshot()
    token = "c0ffee"
    snap["resume_tokens"] = {lane: token}
    path = str(tmp_path / "ckpt")
    save_pool_snapshot(path, snap)
    assert snapshot_lane_count(path) == 6

    # Library-level: load at the written size, restore with resize.
    b = StreamPool(4, 48_000.0, renderer, block_size=BLOCK)
    snap_b = load_pool_snapshot(path, b, lanes=6)
    lane_map = b.restore(snap_b, resize=True)
    assert lane_map == {lane: 0}

    # Serve-level: the helper does all of it and remaps the token.
    c = StreamPool(4, 48_000.0, renderer, block_size=BLOCK)
    resumed, tokens, aliases = restore_serve_checkpoint(path, c)
    assert resumed is True
    assert tokens == {0: token}
    assert aliases == {lane: 0}

    server = RenderServer(c, port=0, orphan_tokens=tokens,
                          orphan_aliases=aliases, resume_grace=30.0)
    server.start()
    try:
        # Resume with the OLD lane id — the alias routes it.
        got = render_via_server(
            server.address, sig[:, 3 * BLOCK:], chunk=BLOCK,
            resume=lane, resume_token=token,
        )
    finally:
        server.stop()
    for i in range(3, 6):
        a.push(lane, sig[:, i * BLOCK:(i + 1) * BLOCK])
        a.pump()
    want = a.pull(lane, 3 * BLOCK)
    np.testing.assert_allclose(got, want, atol=1e-6)
