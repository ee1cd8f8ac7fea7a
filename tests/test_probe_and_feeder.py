"""Capture probe stimulus + double-buffered device feeder."""

import numpy as np

from airwave_tpu.models.binaural import ChainState, chain_step_fn
from airwave_tpu.ops import eq_block, upols
from airwave_tpu.runtime.feeder import DeviceFeeder
from airwave_tpu.runtime.probe import CaptureProbe, probe_stimulus
from airwave_tpu.runtime.synthetic_transport import SyntheticTransport
from airwave_tpu.runtime.transport import (
    OutputDeviceDescriptor,
    StreamTapRequest,
    TapPurpose,
)


def test_probe_stimulus_properties():
    probe = probe_stimulus(48_000.0, seconds=0.25)
    assert probe.shape == (2, 12_000)
    assert float(np.max(np.abs(probe))) <= 0.25 + 1e-6
    assert float(np.max(np.abs(probe))) > 0.2
    # Faded in/out, no DC offset, deterministic.
    assert abs(probe[0, 0]) < 1e-3 and abs(probe[0, -1]) < 1e-3
    assert abs(float(np.mean(probe))) < 1e-3
    np.testing.assert_array_equal(probe, probe_stimulus(48_000.0, 0.25))


def test_probe_plays_through_synthetic_transport_capture_path():
    out = OutputDeviceDescriptor(uid="synth", nominal_sample_rate=48_000.0)
    transport = SyntheticTransport(out, amplitude=0.0)  # silent source
    captured = []

    tap = transport.create_tap(
        StreamTapRequest(output=out, purpose=TapPurpose.VERIFICATION)
    )
    agg = transport.create_aggregate(tap)
    io = transport.create_io(agg, lambda x: (captured.append(x), x)[1])
    transport.start_io(io)

    probe = CaptureProbe(sink=transport, sample_rate=48_000.0)
    transport.pump(512)
    assert np.max(np.abs(captured[-1])) < 1e-6  # silence before the probe
    probe.play()
    transport.pump(512)
    assert np.max(np.abs(captured[-1])) > 0.1  # probe audible in capture
    probe.stop()
    transport.pump(512)


def test_feeder_pipelines_and_matches_unstaged_loop():
    import jax.numpy as jnp
    import functools
    import jax

    rng = np.random.default_rng(0)
    T, B, S = 64, 2, 2
    hrir = (rng.standard_normal((S, 2, 128)) * 0.3).astype(np.float32)
    params = upols.make_conv_params(hrir, T)
    eq = eq_block.unity_eq_params(T)

    def make_state():
        return ChainState(
            conv=upols.make_conv_state(B, S, params.partition_count, T),
            eq=eq_block.make_eq_state(B),
        )

    step = jax.jit(functools.partial(
        chain_step_fn, params, eq, eq,
        transition_length=960, spatial_enabled=True, eq_enabled=False,
    ))

    blocks = [rng.standard_normal((B, S, T)).astype(np.float32)
              for _ in range(5)]

    # Plain loop.
    state = make_state()
    want = []
    for b in blocks:
        state, y = step(state, jnp.asarray(b))
        want.append(np.asarray(y))

    # Feeder loop (prime + step + flush covers all 5 blocks).
    feeder = DeviceFeeder(step, make_state())
    feeder.prime(blocks[0])
    got = []
    for b in blocks[1:]:
        got.append(np.asarray(feeder.step(b)))
    got.append(np.asarray(feeder.flush()))
    assert feeder.steps == 5

    np.testing.assert_allclose(
        np.concatenate(got, -1), np.concatenate(want, -1), atol=1e-6
    )
