"""Pallas kernel correctness tests (interpret mode on CPU).

The package's one shipped Pallas kernel is the exact-f32 VPU MAC
(kernels/mac_kmajor, the opt-in `AIRWAVE_MAC_IMPL=pallas` lowering of the
delay-line contraction). The fused FDL kernel (kernels/upols_pallas) was
RETIRED to git history in round 4: after the half-window port it measured
15,712x on-chip vs the XLA path's 42,062x at the same shape/accuracy
(2.7x slower; its bf16 fast mode additionally failed Mosaic scoped-vmem
sizing at B=8192) — see BENCH_NOTES.md "Round 4" and the mac_paged
precedent. The XLA lowering is the single conv path."""

import jax.numpy as jnp
import numpy as np
import pytest  # noqa: F401  (parity with the suite's import convention)


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
