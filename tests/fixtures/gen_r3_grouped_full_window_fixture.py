"""Round-3 GROUPED full-window fixture: G=2 profiles (het HRIR lengths),
ragged schedule, snapshot mid-pause (debt in group 1)."""
import sys
sys.path.insert(0, "/tmp/r3tree")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from airwave_tpu.assets import channel_maps as cm
from airwave_tpu.graph.renderer import prepare_renderer
from airwave_tpu.io.wav import WAVData
from airwave_tpu.runtime.stream_pool import StreamPool, PoolProfile
from airwave_tpu.utils.checkpoint import save_pool_snapshot

BLOCK = 64
rng = np.random.default_rng(99)
a14 = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
b14 = (rng.standard_normal((14, 180)) * 0.2).astype(np.float32)
r0 = prepare_renderer(WAVData(48_000.0, a14), cm.STEREO, 48_000.0, BLOCK)
r1 = prepare_renderer(WAVData(48_000.0, b14), cm.STEREO, 48_000.0, BLOCK)
pool = StreamPool(4, 48_000.0, None, block_size=BLOCK,
                  profiles=[PoolProfile(r0), PoolProfile(r1)])
a = pool.attach(0)
b = pool.attach(1)
N_PRE, N_POST = 9, 7
x = (rng.standard_normal((2, 2, (N_PRE + N_POST) * BLOCK)) * 0.3
     ).astype(np.float32)
pulled = [[], []]
for t in range(N_PRE):
    for j, lane in enumerate((a, b)):
        pool.push(lane, x[j, :, t*BLOCK:(t+1)*BLOCK])
    pool.pump()
    for j, lane in enumerate((a, b)):
        n = pool.available(lane)
        if n:
            pulled[j].append(pool.pull(lane, n))
# lane b (group 1) pauses for 2 rounds while a plays on -> live debt
extra_a = (rng.standard_normal((2, 2 * BLOCK)) * 0.3).astype(np.float32)
for t in range(2):
    pool.push(a, extra_a[:, t*BLOCK:(t+1)*BLOCK])
    pool.pump()
    n = pool.available(a)
    if n:
        pulled[0].append(pool.pull(a, n))
pre_out = [np.concatenate(p, axis=1) for p in pulled]
assert pre_out[0].shape[1] == (N_PRE + 2) * BLOCK
assert pre_out[1].shape[1] == N_PRE * BLOCK
print("debt:", pool._debt[:4])
assert pool._debt[b] != 0
save_pool_snapshot("/root/repo/tests/fixtures/r3_grouped_full_window_pool",
                   pool.snapshot())
np.savez("/root/repo/tests/fixtures/r3_grouped_full_window_inputs.npz",
         hrir_a=a14, hrir_b=b14, x=x, n_pre=N_PRE, n_post=N_POST,
         block=BLOCK, lanes=np.array([a, b]),
         pre_out_a=pre_out[0], pre_out_b=pre_out[1], extra_a=extra_a)
print("grouped fixture written")
