"""Aux subsystems: checkpoint/resume, profiler, safety gate, preset validator."""

import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np

from airwave_tpu.models.binaural import ChainState
from airwave_tpu.ops import eq_block, upols
from airwave_tpu.utils import checkpoint, profiling
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_checkpoint_roundtrip_resumes_stream_exactly(tmp_path):
    """Snapshot mid-stream, keep rendering, restore, re-render: identical."""
    rng = np.random.default_rng(0)
    T, B, S = 64, 2, 2
    hrir = rng.standard_normal((S, 2, 200)).astype(np.float32) * 0.3
    params = upols.make_conv_params(hrir, T)
    state = ChainState(
        conv=upols.make_conv_state(B, S, params.partition_count, T),
        eq=eq_block.make_eq_state(B),
    )
    eq_params = eq_block.unity_eq_params(T)

    from airwave_tpu.models.binaural import chain_step_fn

    def step(s, x):
        return chain_step_fn(params, eq_params, eq_params, s, x,
                             transition_length=960, spatial_enabled=True,
                             eq_enabled=True, eq_crossfading=False)

    xs = [jnp.asarray(rng.standard_normal((B, S, T)).astype(np.float32))
          for _ in range(6)]
    for x in xs[:3]:
        state, _ = step(state, x)

    path = str(tmp_path / "carry.npz")
    checkpoint.save_pytree(path, state)

    cont = []
    for x in xs[3:]:
        state, y = step(state, x)
        cont.append(np.asarray(y))

    restored = checkpoint.load_pytree(
        path,
        like=ChainState(
            conv=upols.make_conv_state(B, S, params.partition_count, T),
            eq=eq_block.make_eq_state(B),
        ),
    )
    resumed = []
    s = restored
    for x in xs[3:]:
        s, y = step(s, x)
        resumed.append(np.asarray(y))
    np.testing.assert_array_equal(
        np.concatenate(cont, -1), np.concatenate(resumed, -1)
    )


def test_checkpoint_shape_validation(tmp_path):
    state = eq_block.make_eq_state(2)
    path = str(tmp_path / "c.npz")
    checkpoint.save_pytree(path, state)
    import pytest

    with pytest.raises(ValueError):
        checkpoint.load_pytree(path, like=eq_block.make_eq_state(4))


def test_checkpoint_rejects_structure_and_dtype_mismatch(tmp_path):
    import pytest

    # Different carry structure, coincidentally compatible leaf count/shapes:
    # must fail on the stored treedef, not load silently.
    state = eq_block.make_eq_state(2)
    path = str(tmp_path / "c.npz")
    checkpoint.save_pytree(path, state)
    leaves = list(state)
    with pytest.raises(ValueError, match="structure"):
        checkpoint.load_pytree(path, like=tuple(leaves))

    # Same structure, different leaf dtype: must raise, never silently cast.
    path2 = str(tmp_path / "d.npz")
    checkpoint.save_pytree(path2, state)
    wrong = type(state)(*[np.asarray(leaf, np.float64) for leaf in state])
    with pytest.raises(ValueError, match="dtype"):
        checkpoint.load_pytree(path2, like=wrong)


def test_profiler_accounting():
    profiler = profiling.RenderProfiler(48_000.0, 512, batch=10)
    import time

    for _ in range(3):
        with profiler.step():
            time.sleep(0.001)
    report = profiler.report()["render"]
    assert report["steps"] == 3
    assert report["mean_ms"] >= 1.0
    # 10 streams x 512 frames x 3 steps of audio in ~3ms of wall time.
    assert profiler.realtime_multiple() > 10


def test_hot_path_safety_gate_passes():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import check_hot_path

    problems = check_hot_path.run()
    assert problems == [], problems


def test_hot_path_gate_catches_violations(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import ast

    import check_hot_path

    bad = ast.parse(
        "def f(x):\n"
        "    print(x)\n"
        "    y = np.asarray(x)\n"
        "    jax.debug.print('{}', x)\n"
        "    return x\n"
    )
    fn = bad.body[0]
    problems = check_hot_path.check_function(fn, "fake.py")
    found = {p[2] for p in problems}
    assert "print" in found
    assert "np.asarray" in found
    assert "jax.debug.print" in found


@pytest.mark.heavy
def test_preset_validator_on_converted_output(tmp_path):
    from tests.test_tools import write_sofa, FULL_RING
    from airwave_tpu.tools.convert import convert_file

    src = write_sofa(tmp_path / "a.sofa", FULL_RING)
    convert_file(src, str(tmp_path / "out"))
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "validate_presets.py"),
         "--hrir-dir", str(tmp_path / "out"), "--expected-count", "1"],
        capture_output=True, text=True,
    )
    assert result.returncode == 0, result.stdout + result.stderr

    # Corrupt the WAV: hash mismatch must fail the gate.
    wav_path = tmp_path / "out" / "a.wav"
    blob = bytearray(wav_path.read_bytes())
    blob[-4] ^= 0xFF
    wav_path.write_bytes(bytes(blob))
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "validate_presets.py"),
         "--hrir-dir", str(tmp_path / "out")],
        capture_output=True, text=True,
    )
    assert result.returncode == 1
    assert "sha256 mismatch" in result.stdout


def test_device_complex_helpers():
    """utils/device_arrays: complex built on device from float planes (the
    safe pattern for transports that cannot transfer complex64)."""
    import numpy as np

    from airwave_tpu.utils.device_arrays import complex_zeros, device_complex

    spec = (np.arange(6).reshape(2, 3) + 1j * np.arange(6)[::-1].reshape(2, 3))
    arr = device_complex(spec.astype(np.complex64))
    assert arr.dtype.name == "complex64"
    np.testing.assert_allclose(np.asarray(arr), spec, atol=1e-6)
    z = complex_zeros((4, 5))
    assert z.shape == (4, 5) and z.dtype.name == "complex64"
    np.testing.assert_array_equal(np.asarray(z), 0)


def test_checkpoint_bf16_round_trip(tmp_path):
    """Extension dtypes (the bf16 fast-mode carry) must round-trip: np.savez
    writes ml_dtypes bfloat16 as raw void, so save_pytree records the true
    dtype and load_pytree reinterprets."""
    import jax

    state = eq_block.make_eq_state(2)
    bf = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.bfloat16), state)
    path = str(tmp_path / "bf.npz")
    checkpoint.save_pytree(path, bf)
    like = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.bfloat16), eq_block.make_eq_state(2)
    )
    restored = checkpoint.load_pytree(path, like=like)
    for got, want in zip(jax.tree_util.tree_leaves(restored),
                         jax.tree_util.tree_leaves(bf)):
        got = np.asarray(got)
        assert got.dtype == np.asarray(want).dtype
        np.testing.assert_array_equal(got.astype(np.float32),
                                      np.asarray(want).astype(np.float32))

    # Precision-policy mismatch still refuses: a bf16 checkpoint into an
    # f32 carry is an error, never a silent cast.
    import pytest

    with pytest.raises(ValueError, match="dtype"):
        checkpoint.load_pytree(path, like=eq_block.make_eq_state(2))

def test_checkpoint_raw_container_roundtrip(tmp_path):
    """container="raw" (the multi-GB serving-snapshot fast path) must
    round-trip exactly — mixed dtypes incl. bf16 extension dtype and 0-d
    scalar leaves — carry extra_json, and auto-detect on load so callers
    never name the container when reading."""
    import jax

    tree = {
        "f32": np.arange(24, dtype=np.float32).reshape(2, 3, 4),
        "i32": np.asarray([[1, -2], [3, 4]], np.int32),
        "bf16": jnp.asarray(np.linspace(-2, 2, 16), jnp.bfloat16),
        "scalar": np.float64(3.25),
        "nested": (np.zeros((5,), np.uint8), np.asarray(7, np.int64)),
    }
    path = str(tmp_path / "raw.npz")
    checkpoint.save_pytree(path, tree, extra_json={"k": [1, 2]},
                           container="raw")
    assert checkpoint.load_pytree_extra(path) == {"k": [1, 2]}
    restored, extra = checkpoint.load_pytree(path, like=tree,
                                             with_extra=True)
    assert extra == {"k": [1, 2]}
    for got, want in zip(jax.tree_util.tree_leaves(restored),
                         jax.tree_util.tree_leaves(tree)):
        got, want = np.asarray(got), np.asarray(want)
        assert got.dtype == want.dtype and got.shape == want.shape
        np.testing.assert_array_equal(
            got.astype(np.float64), want.astype(np.float64))

    # The same validation contract as npz: shape, dtype, and structure
    # mismatches all refuse with ValueError, never load silently.
    with pytest.raises(ValueError, match="shape"):
        checkpoint.load_pytree(
            path, like={**tree, "f32": np.zeros((2, 3), np.float32)})
    with pytest.raises(ValueError, match="dtype"):
        checkpoint.load_pytree(
            path, like={**tree, "i32": np.zeros((2, 2), np.int64)})
    with pytest.raises(ValueError, match="structure"):
        checkpoint.load_pytree(path, like=list(tree.values()))


def test_checkpoint_raw_container_detects_truncation(tmp_path):
    """A torn raw snapshot (payload cut short) must raise, not return a
    silently short/garbage leaf."""
    tree = {"a": np.arange(4096, dtype=np.float32)}
    path = str(tmp_path / "torn.npz")
    checkpoint.save_pytree(path, tree, container="raw")
    full = checkpoint.checkpoint_path(path)
    data = open(full, "rb").read()
    with open(full, "wb") as f:
        f.write(data[:-64])
    with pytest.raises(ValueError, match="truncated"):
        checkpoint.load_pytree(path, like=tree)


def test_checkpoint_npz_still_loads_alongside_raw(tmp_path):
    """Pre-existing npz checkpoints keep loading through the same entry
    points after the raw container landed (dispatch is by file magic)."""
    state = eq_block.make_eq_state(2)
    path = str(tmp_path / "old.npz")
    checkpoint.save_pytree(path, state, extra_json={"v": 1})  # npz default
    assert checkpoint.load_pytree_extra(path) == {"v": 1}
    restored = checkpoint.load_pytree(path, like=eq_block.make_eq_state(2))
    for got, want in zip(restored, state):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
