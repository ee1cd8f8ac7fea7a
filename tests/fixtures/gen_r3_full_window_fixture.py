# PROVENANCE: run against a git worktree of c98e2a6 (the last full-window
# commit) to regenerate tests/fixtures/r3_full_window_pool.npz — see the
# module docstring. Committed for the record; the fixture files are pinned.
"""Generate the ROUND-3 (full-window carry) serving-checkpoint fixture
with round-3 code (worktree at c98e2a6): real pool, ragged pause
schedule (lane 1 accrues alignment debt), snapshot mid-stream.

Saves: tests fixture npz (the old-format checkpoint) + an inputs npz
(the streams, pause schedule, and frames already pulled) so the current
build can migrate and continue the EXACT same streams."""
import sys
sys.path.insert(0, "/tmp/r3tree")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from airwave_tpu.assets import channel_maps as cm
from airwave_tpu.graph.renderer import prepare_renderer
from airwave_tpu.io.wav import WAVData
from airwave_tpu.runtime.stream_pool import StreamPool
from airwave_tpu.utils.checkpoint import save_pool_snapshot

BLOCK = 64
rng = np.random.default_rng(77)
audio14 = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
renderer = prepare_renderer(WAVData(48_000.0, audio14), cm.STEREO,
                            48_000.0, BLOCK)
pool = StreamPool(4, 48_000.0, renderer, block_size=BLOCK)
a = pool.attach()
b = pool.attach()

N_PRE, N_POST = 10, 8   # blocks before/after the snapshot
x = (rng.standard_normal((2, 2, (N_PRE + N_POST) * BLOCK)) * 0.3
     ).astype(np.float32)   # [lane, ch, t]

# Ragged schedule: lane b sits out rounds 2, 5, 8 (accrues debt).
fed = [0, 0]
pulled = [[], []]
rnd = 0
while min(fed) < N_PRE:
    for j, lane in enumerate((a, b)):
        paused = (j == 1 and rnd in (2, 5, 8))
        if fed[j] < N_PRE and not paused:
            pool.push(lane, x[j, :, fed[j]*BLOCK:(fed[j]+1)*BLOCK])
            fed[j] += 1
    pool.pump()
    for j, lane in enumerate((a, b)):
        n = pool.available(lane)
        if n:
            pulled[j].append(pool.pull(lane, n))
    rnd += 1
# Two extra rounds where ONLY lane a steps: lane b is mid-pause at the
# snapshot, carrying live alignment debt the migration must repay.
extra_a = (rng.standard_normal((2, 2 * BLOCK)) * 0.3).astype(np.float32)
for t in range(2):
    pool.push(a, extra_a[:, t*BLOCK:(t+1)*BLOCK])
    pool.pump()
    n = pool.available(a)
    if n:
        pulled[0].append(pool.pull(a, n))
pre_out = [np.concatenate(p, axis=1) if p else np.zeros((2, 0), np.float32)
           for p in pulled]
assert pre_out[0].shape[1] == (N_PRE + 2) * BLOCK, pre_out[0].shape
assert pre_out[1].shape[1] == N_PRE * BLOCK, pre_out[1].shape
pre_out[0] = pre_out[0][:, :N_PRE * BLOCK]  # compare window: first N_PRE
print("debt at snapshot:", pool._debt[:4])
assert pool._debt[b] != 0, "fixture must exercise nonzero debt"

save_pool_snapshot("/root/repo/tests/fixtures/r3_full_window_pool", pool.snapshot())
np.savez("/root/repo/tests/fixtures/r3_full_window_inputs.npz",
         hrir_audio=audio14, x=x, n_pre=N_PRE, n_post=N_POST, block=BLOCK,
         lanes=np.array([a, b]), pre_out=np.stack(pre_out),
         extra_a=extra_a)
print("fixture written; pre_out checksum", float(np.abs(np.stack(pre_out)).sum()))
