"""Multi-chip scaling: stream-sharded (and optionally speaker-sharded) render.

Parallelism design (SURVEY.md §2.4): the natural axis is **data parallelism
over streams** — each stream's carry (FDL, EQ state) stays
chip-local, so steady-state rendering needs **no collectives**; ICI traffic
appears only if the virtual-speaker axis is also sharded (the binaural
downmix sums over speakers -> one psum per block). There is no TP/PP analog:
per-stream state is small and must stay chip-local (the reference is a
single-process app; the TPU framework's scale axis is stream count).

Two shardings are provided:
  - `stream_sharded_step`: 1-D mesh ("streams",) — pure DP, zero collectives.
  - `stream_speaker_sharded_step`: 2-D mesh ("streams", "speakers") — the
    conv MAC is computed per speaker shard and psum'd over the speaker axis
    (rides ICI), demonstrating a real multi-axis layout for very large
    speaker banks (e.g. Atmos 7.1.4 with long IRs).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from airwave_tpu.models.binaural import ChainState, chain_step_fn
from airwave_tpu.ops import eq_block, upols


def make_mesh(
    devices: Optional[Sequence] = None, axis_names: Sequence[str] = ("streams",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) if len(axis_names) == 1 else None
    assert shape is not None, "provide shape for multi-axis meshes"
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def shard_chain_state(state: ChainState, mesh: Mesh,
                      stream_axis: str = "streams") -> ChainState:
    """Place the carry with the batch dim sharded over the stream axis."""
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return ChainState(
        conv=upols.ConvState(
            # fdl is batch-minor: [Kp, S, P, 2, B] — streams on the last axis.
            fdl=put(state.conv.fdl, P(None, None, None, None, stream_axis)),
            write_pos=put(state.conv.write_pos, P()),
        ),
        eq=eq_block.EqState(
            s_from=put(state.eq.s_from, P(stream_axis)),
            s_to=put(state.eq.s_to, P(stream_axis)),
            counter=put(state.eq.counter, P(stream_axis)),
        ),
    )


def _param_shardings(mesh: Mesh):
    """(conv params, eq params) shardings: everything replicated — the ONE
    place the stream-DP parameter policy lives."""
    repl = NamedSharding(mesh, P())
    return (
        upols.ConvParams(Gflip2=repl, wf=repl, wi=repl),
        eq_block.EqParams(Hm=repl, O=repl, A_T=repl, G=repl),
    )


def chain_state_shardings(mesh: Mesh) -> ChainState:
    """Sharding pytree for a stream-sharded ChainState (batch axis sharded,
    everything else chip-local/replicated). Public so multi-process hosts
    can allocate a globally-sharded carry with
    jax.jit(make_state, out_shardings=chain_state_shardings(mesh))()."""
    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P("streams"))
    fdl_sharding = NamedSharding(mesh, P(None, None, None, None, "streams"))
    return ChainState(
        conv=upols.ConvState(fdl=fdl_sharding, write_pos=repl),
        eq=eq_block.EqState(s_from=batched, s_to=batched, counter=batched),
    )


def paged_chain_state_shardings(mesh: Mesh, n_pages: int) -> ChainState:
    """chain_state_shardings for the M-block lookahead carry (pages are
    batch-minor like the FDL). Public for the same multi-process
    allocation use as the non-paged form."""
    batched = NamedSharding(mesh, P("streams"))
    page = NamedSharding(mesh, P(None, None, None, None, "streams"))
    return ChainState(
        conv=upols.PagedConvState(pages=(page,) * n_pages),
        eq=eq_block.EqState(s_from=batched, s_to=batched, counter=batched),
    )


def stream_sharded_step(mesh: Mesh, transition_length: int = 960,
                        spatial_enabled: bool = True, eq_enabled: bool = True,
                        eq_crossfading: bool = True):
    """Pure-DP sharded step: batch dim sharded, params replicated.

    With in/out shardings declared, XLA compiles an SPMD program with no
    collectives in steady state (per-stream carries are chip-local).
    """
    batched = NamedSharding(mesh, P("streams"))
    conv_shardings, eq_shardings = _param_shardings(mesh)
    state_shardings = chain_state_shardings(mesh)

    fn = functools.partial(
        chain_step_fn,
        transition_length=transition_length,
        spatial_enabled=spatial_enabled,
        eq_enabled=eq_enabled,
        eq_crossfading=eq_crossfading,
    )
    return jax.jit(
        fn,
        in_shardings=(conv_shardings, eq_shardings, eq_shardings,
                      state_shardings, batched),
        out_shardings=(state_shardings, batched),
        donate_argnums=(3,),
    )


def stream_sharded_bake(mesh: Mesh, transition_length: int = 960,
                        eq_enabled: bool = True):
    """Sharded offline bake: lax.scan over blocks, streams sharded over the
    mesh (BASELINE config 5 on a slice). x_blocks [N, B, S, T] with B sharded;
    returns (state', y_blocks [N, B, 2, T])."""
    blocks_sharded = NamedSharding(mesh, P(None, "streams"))
    conv_shardings, eq_shardings = _param_shardings(mesh)
    state_shardings = chain_state_shardings(mesh)

    def run(conv_params, eq_from, eq_to, state, x_blocks):
        def body(s, xb):
            s, y = chain_step_fn(
                conv_params, eq_from, eq_to, s, xb,
                transition_length=transition_length,
                spatial_enabled=True,
                eq_enabled=eq_enabled,
                eq_crossfading=False,
            )
            return s, y
        return jax.lax.scan(body, state, x_blocks)

    return jax.jit(
        run,
        in_shardings=(conv_shardings, eq_shardings, eq_shardings,
                      state_shardings, blocks_sharded),
        out_shardings=(state_shardings, blocks_sharded),
        donate_argnums=(3,),
    )


def stream_sharded_bake_multi(mesh: Mesh, n_pages: int,
                              transition_length: int = 960,
                              eq_enabled: bool = True):
    """Sharded M-block lookahead bake (the headline-throughput path on a
    slice): streams sharded, paged delay-line carry chip-local, zero
    steady-state collectives — the multi-chip form of
    models/bake.bake_scan_multi. x_steps [N, B, S, M, T] with B sharded;
    returns (state', y_steps [N, B, M, 2, T]). `n_pages` must equal
    len(state.conv.pages) (the scan unrolls by it so page rotation stays
    free — see upols.conv_step_paged)."""
    from airwave_tpu.models.binaural import chain_step_multi_fn

    steps_sharded = NamedSharding(mesh, P(None, "streams"))
    conv_shardings, eq_shardings = _param_shardings(mesh)
    state_shardings = paged_chain_state_shardings(mesh, n_pages)

    def run(conv_params, eq_from, eq_to, state, x_steps):
        def body(s, xs):
            s, y = chain_step_multi_fn(
                conv_params, eq_from, eq_to, s, xs,
                transition_length=transition_length,
                eq_enabled=eq_enabled,
                eq_crossfading=False,
            )
            return s, y
        return jax.lax.scan(body, state, x_steps, unroll=n_pages)

    return jax.jit(
        run,
        in_shardings=(conv_shardings, eq_shardings, eq_shardings,
                      state_shardings, steps_sharded),
        out_shardings=(state_shardings, steps_sharded),
        donate_argnums=(3,),
    )


def stream_speaker_sharded_step(mesh: Mesh, transition_length: int = 960,
                                eq_enabled: bool = True):
    """2-D sharding via shard_map: streams x speakers; psum over speakers.

    Each speaker shard holds its slice of the HRIR bank and FDL and computes a
    partial binaural mix; a single psum over the "speakers" axis produces the
    stereo downmix, after which the (replicated-over-speakers) EQ runs.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def step(conv_params, eq_from, eq_to, state, x):
        conv_state, eq_state = state
        conv_state, y_partial = upols.conv_step(conv_params, conv_state, x)
        y = jax.lax.psum(y_partial, "speakers")
        if eq_enabled:
            eq_state, y = eq_block.eq_step(
                eq_from, eq_to, eq_state, y, transition_length
            )
        return ChainState(conv_state, eq_state), y

    conv_specs = upols.ConvParams(
        Gflip2=P("speakers", None, None, None, None), wf=P(), wi=P()
    )
    eq_specs = eq_block.EqParams(Hm=P(), O=P(), A_T=P(), G=P())
    state_specs = ChainState(
        conv=upols.ConvState(
            fdl=P(None, "speakers", None, None, "streams"),
            write_pos=P(),
        ),
        eq=eq_block.EqState(
            s_from=P("streams"), s_to=P("streams"), counter=P("streams")
        ),
    )

    mapped = shard_map(
        step,
        mesh=mesh,
        in_specs=(conv_specs, eq_specs, eq_specs, state_specs,
                  P("streams", "speakers", None)),
        out_specs=(state_specs, P("streams", None, None)),
    )
    return jax.jit(mapped, donate_argnums=(3,))
