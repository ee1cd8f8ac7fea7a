"""Pallas kernel correctness tests (interpret mode on CPU).

The fused FDL kernel must match both the jnp conv_step and the float64
oracle, including circular-slot wraparound and the packed bin-0 handling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airwave_tpu.kernels import upols_pallas as kp
from airwave_tpu.ops import upols
from airwave_tpu.oracle.upols_oracle import UPOLSOracle


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 64)).astype(np.float32)
    spec = jnp.fft.rfft(x)
    re, im = kp.pack_spectrum(spec)
    assert re.shape == (3, 32) and im.shape == (3, 32)
    back = kp.unpack_spectrum(re, im)
    np.testing.assert_allclose(np.asarray(back), np.asarray(spec),
                               atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("hrir_len,n_blocks", [(100, 3), (300, 14)])
def test_packed_conv_matches_oracle_and_jnp(hrir_len, n_blocks):
    rng = np.random.default_rng(5)
    T = 64
    B, S, E = 8, 2, 2
    hrir = rng.standard_normal((S, E, hrir_len)).astype(np.float32) * 0.3

    packed_params = kp.make_packed_params(hrir, T)
    P = packed_params.partition_count
    # Exact (no pow2 padding) + the half-window bank's +1 coefficient —
    # the same partition math as ops.upols.make_conv_params exact mode.
    assert P == int(np.ceil(hrir_len / T)) + 1
    packed_state = kp.make_packed_state(B, S, P, T)

    ref_params = upols.make_conv_params(hrir, T)
    ref_state = upols.make_conv_state(B, S, ref_params.partition_count, T)

    x = rng.standard_normal((B, S, n_blocks * T)).astype(np.float32)
    got, ref = [], []
    for i in range(n_blocks):
        block = jnp.asarray(x[:, :, i * T:(i + 1) * T])
        packed_state, y1 = kp.conv_step_packed(
            packed_params, packed_state, block, batch_tile=8, interpret=True
        )
        ref_state, y2 = upols.conv_step(ref_params, ref_state, block)
        got.append(np.asarray(y1))
        ref.append(np.asarray(y2))
    got = np.concatenate(got, -1)
    ref = np.concatenate(ref, -1)
    scale = np.sqrt(np.mean(ref ** 2))
    assert np.sqrt(np.mean((got - ref) ** 2)) / scale < 1e-5

    # And against the f64 oracle for one (stream, ear).
    oracle_out = np.zeros(n_blocks * T)
    for s in range(S):
        o = UPOLSOracle(hrir[s, 0], T)
        oracle_out += np.concatenate(
            [o.process(x[3, s, i * T:(i + 1) * T]) for i in range(n_blocks)]
        )
    err = np.sqrt(np.mean((got[3, 0] - oracle_out) ** 2))
    assert err / max(np.sqrt(np.mean(oracle_out**2)), 1e-9) < 1e-5


def test_identity_impulse_through_kernel():
    hrir = np.zeros((1, 2, 8), np.float32)
    hrir[0, :, 0] = 1.0
    params = kp.make_packed_params(hrir, 8)
    state = kp.make_packed_state(8, 1, params.partition_count, 8)
    x = np.tile(
        np.array([0.25, -0.5, 1, 0.75, -1, 0.125, 0.5, -0.25], np.float32),
        (8, 1, 1),
    )
    _, y = kp.conv_step_packed(params, state, jnp.asarray(x),
                               batch_tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(y)[:, 0], x[:, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(y)[:, 1], x[:, 0], atol=1e-4)


@pytest.mark.heavy
def test_bf16_fast_mode_accuracy_and_auto_tile():
    """bf16 delay line: documented ~3e-3 accuracy class; auto tile clamps
    for long impulse responses."""
    rng = np.random.default_rng(11)
    T, B, S = 64, 8, 2
    hrir = rng.standard_normal((S, 2, 1000)).astype(np.float32) * 0.2
    params = kp.make_packed_params(hrir, T)
    P = params.partition_count  # 16 partitions of a "long" IR

    s32 = kp.make_packed_state(B, S, P, T)
    s16 = kp.make_packed_state(B, S, P, T, dtype=jnp.bfloat16)
    assert s16.fdl_re.dtype == jnp.bfloat16

    x = rng.standard_normal((B, S, 6 * T)).astype(np.float32)
    got32, got16 = [], []
    for i in range(6):
        block = jnp.asarray(x[:, :, i * T:(i + 1) * T])
        s32, y32 = kp.conv_step_packed(params, s32, block, interpret=True)
        s16, y16 = kp.conv_step_packed(params, s16, block, interpret=True)
        got32.append(np.asarray(y32))
        got16.append(np.asarray(y16))
    a = np.concatenate(got32, -1)
    b = np.concatenate(got16, -1)
    rel = np.sqrt(np.mean((a - b) ** 2)) / np.sqrt(np.mean(a**2))
    assert rel < 2e-2, rel          # fast mode stays in its accuracy class
    assert rel > 1e-5               # and is genuinely lower precision

    # Auto-tile: a huge request is clamped to the VMEM budget and divides B.
    tile = kp.auto_batch_tile(1024, 2 * 94, 512, 4, requested=1024)
    assert 1024 % tile == 0
    assert 4 * (2 * 94) * 512 * 4 * tile <= kp.VMEM_BUDGET_BYTES


def test_mac_kmajor_matches_numpy():
    """kernels/mac_kmajor: exact-f32 VPU contraction parity (interpret)."""
    from airwave_tpu.kernels.mac_kmajor import mac_kmajor

    rng = np.random.default_rng(11)
    K, B, R, O = 72, 16, 36, 4
    x = rng.standard_normal((K, R, B)).astype(np.float32)
    h = rng.standard_normal((K, O, R)).astype(np.float32)
    got = np.asarray(mac_kmajor(jnp.asarray(x), jnp.asarray(h),
                                interpret=True))
    ref = np.einsum("krb,kor->okb", x, h)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-4)


def test_mac_impl_variants_agree():
    """All three MAC lowerings (einsum / dot_general / Pallas VPU kernel)
    produce the same chain output (ops/upols._MAC_IMPL switch)."""
    from airwave_tpu.ops import upols

    rng = np.random.default_rng(12)
    T, B, S = 64, 3, 2
    hrir = rng.standard_normal((S, 2, 300)).astype(np.float32) * 0.3
    params = upols.make_conv_params(hrir, T)
    xs = [rng.standard_normal((B, S, T)).astype(np.float32)
          for _ in range(6)]

    outs = {}
    original = upols._MAC_IMPL
    try:
        for impl in ("einsum", "dot", "pallas"):
            upols._MAC_IMPL = impl
            s = upols.make_conv_state(B, S, params.partition_count, T)
            ys = []
            for x in xs:
                s, y = upols.conv_step(params, s, jnp.asarray(x))
                ys.append(np.asarray(y))
            outs[impl] = np.concatenate(ys, -1)
    finally:
        upols._MAC_IMPL = original

    scale = np.sqrt(np.mean(outs["einsum"] ** 2))
    for impl in ("dot", "pallas"):
        rel = np.sqrt(np.mean((outs[impl] - outs["einsum"]) ** 2)) / scale
        assert rel < 1e-6, (impl, rel)


def test_auto_batch_tile_accounts_for_resident_hrir_planes():
    """The rotated HRIR planes stay whole in VMEM for every tile; a
    speakers x partitions shape whose resident planes alone exceed the
    budget must raise (instead of an opaque Mosaic VMEM overflow), and a
    fitting shape's tile must leave room for them."""
    # 8 speakers x 288 partitions (7.1 with ~3 s IRs): ~18.9 MB resident
    # HRIR alone — impossible at any tile.
    with pytest.raises(ValueError, match="VMEM"):
        kp.auto_batch_tile(1024, 8 * 288, 512, 4, requested=8)
    # 8 speakers x 94 partitions: resident planes eat most of the budget,
    # so the tile clamps all the way down to 1.
    assert kp.auto_batch_tile(1024, 8 * 94, 512, 4, requested=8) == 1
    # 2 speakers x 94 partitions fits, with the resident planes counted.
    rows = 2 * 94
    tile = kp.auto_batch_tile(1024, rows, 512, 4, requested=1024)
    resident = 2 * 2 * rows * 512 * 4
    per_row = (4 * rows + 4 * 2) * 512 * 4
    assert resident + tile * per_row <= kp.VMEM_BUDGET_BYTES
    assert 1024 % tile == 0
