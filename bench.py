"""Headline benchmark: aggregate realtime multiple of the flagship chain.

Measures the 48 kHz stereo HRIR(4320-tap, 9-partition)+10-filter-EQ render
chain (BASELINE.md headline: >=5000x aggregate realtime per TPU chip), batched
over B concurrent streams with device-resident data (the "offline bake"
configuration, BASELINE.json config 5).

Measurement is *sync-proof*: K chained blocks run inside one jitted
lax.scan whose per-block checksums are fetched to the host, so the clock
covers real device execution end-to-end (block_until_ready alone is not
trusted — on tunneled platforms it can return before execution).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "x_realtime", "vs_baseline": N}
vs_baseline is value / 5000 (the BASELINE.json target; the reference app
publishes no benchmark numbers of its own).
"""

from __future__ import annotations

import argparse
import functools
import gc
import json
import os
import sys
import threading
import time

import numpy as np

SAMPLE_RATE = 48_000.0
BLOCK = 512


def _pick_unroll(pages: int, steps: int, max_unroll: int = 0) -> int:
    """Largest unroll <= min(pages, steps[, max_unroll]) dividing steps.

    Paged scans want unroll == page count (rotation stays SSA renaming —
    see upols.conv_step_paged); a smaller divisor is a measured
    compromise only when a cap (memory-planner rung) forces it."""
    unroll = max(1, min(pages, steps))
    if max_unroll:
        unroll = min(unroll, max_unroll)
    while steps % unroll:
        unroll -= 1
    return unroll


def _watchdog(seconds: float, message: str,
              metric: str = "realtime-multiple per chip "
                            "(48kHz stereo HRIR+EQ chain)"):
    """Hard-exit with an honest failure JSON if the device wedges."""
    def fire():
        print(json.dumps({
            "metric": metric,
            "value": 0.0,
            "unit": "x_realtime",
            "vs_baseline": 0.0,
            "error": message,
        }))
        sys.stdout.flush()
        os._exit(2)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def _emit(payload: dict) -> None:
    """Print a result JSON, stamping any non-contract matmul precision.

    The strict accuracy contract (≤1e-5 vs the f64 oracle) holds only at
    Precision.HIGHEST (the measured ladder in BENCH_NOTES.md: DEFAULT
    4.9e-3 / HIGH 4.2e-5 / HIGHEST 1.5e-7), so a run under the opt-in
    fast mode (AIRWAVE_MATMUL_PRECISION=default/high) must never be
    mistakable for a headline number: the JSON carries the precision and
    an explicit accuracy_contract=false.

    HIGH is additionally a SUPPORTED relaxed tier (docs/architecture.md
    "Precision tiers"): its on-chip error is the 2^-16 bf16x6 split
    residual (4.56e-5 at HEAD, r4d ladder), safely inside a 1e-4
    contract, at ~1.4x the HIGHEST throughput. Such runs stamp
    accuracy_contract_1e4=true so the relaxed tier is a first-class,
    machine-readable claim rather than measurement lore; DEFAULT
    (~4e-3) passes no supported contract and stamps only false.
    """
    prec = os.environ.get("AIRWAVE_MATMUL_PRECISION", "highest").lower()
    if prec != "highest":
        payload["matmul_precision"] = prec
        payload["accuracy_contract"] = False
        payload["accuracy_contract_1e4"] = (prec == "high")
    print(json.dumps(payload))


def effective_speakers(speakers: int, hrir_seconds=None,
                       synthetic: bool = False) -> int:
    """The speaker count the benched chain actually renders. With the
    real bundled hesuvi14 asset, a layout channel the map cannot resolve
    drops (the reference's activation contract — renderer.py
    build_hrir_time_domain): a 12-channel 7.1.4 request renders the 8
    mapped base speakers. The memory planner must size for THIS count,
    not the request — planning for 12 at a 8-speaker chain shipped a
    needlessly conservative chunk2/split2 plan for config-6 (round 5).
    Synthetic banks (--synthetic-hrir / --hrir-seconds) carry exactly
    the requested count."""
    if synthetic or hrir_seconds or speakers == 2:
        return speakers
    try:
        from airwave_tpu.assets import channel_maps as cm
        from airwave_tpu.io import wav

        data = wav.load("/root/reference/assets/hrtf/NeutralSH1.0.wav")
        layout = cm.detect_layout(speakers)
        cmap = cm.select_channel_map(data.channel_count, layout.channels)
        mapped = sum(1 for s in layout.channels
                     if cmap.indices(s) is not None)
        return mapped or speakers
    except Exception:
        return speakers  # asset missing: build() synthesizes the request


def build(batch: int, hrir_len: int = 4320, hrir_seconds: float = None,
          lookahead: int = 1, speakers: int = 2,
          synthetic: bool = False):
    import jax
    import jax.numpy as jnp

    from airwave_tpu.io.apo import EqualizerDefinition, EqualizerFilter, FilterType
    from airwave_tpu.models.binaural import ChainState
    from airwave_tpu.ops import biquad_design as bd
    from airwave_tpu.ops import eq_block, upols

    rng = np.random.default_rng(0)

    if hrir_seconds:  # config-5 stress: long partitioned IRs
        hrir_len = int(hrir_seconds * SAMPLE_RATE)
        hrir = (rng.standard_normal((speakers, 2, hrir_len)) * 0.02).astype(np.float32)
        hrir *= np.exp(-np.arange(hrir_len) / (0.3 * SAMPLE_RATE))
        hrir[:, :, 0] += 0.8
        conv_params = upols.make_conv_params(hrir, BLOCK, pad_to_pow2=False,
                                             lookahead=lookahead)
        return _finish_build(batch, hrir, conv_params, lookahead)

    # HRIR: prefer the real bundled asset; synthesize the same shape if
    # absent. synthetic=True forces the synthesized bank so EVERY
    # requested speaker renders (a 12-channel 7.1.4 through the real
    # hesuvi14 asset drops its 4 unmapped height channels — see
    # effective_speakers).
    try:
        if synthetic:
            raise LookupError("--synthetic-hrir")
        from airwave_tpu.assets import channel_maps as cm
        from airwave_tpu.graph.renderer import build_hrir_time_domain
        from airwave_tpu.io import wav

        data = wav.load("/root/reference/assets/hrtf/NeutralSH1.0.wav")
        layout = cm.STEREO if speakers == 2 else cm.detect_layout(speakers)
        hrir = build_hrir_time_domain(data, layout, SAMPLE_RATE)
    except Exception:
        hrir = (rng.standard_normal((speakers, 2, hrir_len)) * 0.05).astype(np.float32)
        hrir[:, :, 0] += 0.8
    # Exact partition count: 9 vs pow2 16 = 1.78x less FDL traffic.
    conv_params = upols.make_conv_params(hrir, BLOCK, pad_to_pow2=False,
                                         lookahead=lookahead)
    return _finish_build(batch, hrir, conv_params, lookahead)


def _finish_build(batch: int, hrir, conv_params, lookahead: int = 1):
    speakers = hrir.shape[0]
    import jax
    import jax.numpy as jnp

    from airwave_tpu.io.apo import EqualizerDefinition, EqualizerFilter, FilterType
    from airwave_tpu.models.binaural import ChainState
    from airwave_tpu.ops import biquad_design as bd
    from airwave_tpu.ops import eq_block, upols

    rng = np.random.default_rng(0)
    filters = tuple(
        EqualizerFilter(i + 1, i + 1, True,
                        (FilterType.PEAKING, FilterType.LOW_SHELF,
                         FilterType.HIGH_SHELF)[i % 3],
                        100.0 * (i + 1) + 60.0, (-1.0) ** i * 2.0, 0.9)
        for i in range(10)
    )
    preamp, coeffs = bd.design_cascade(EqualizerDefinition(-2.5, filters),
                                       SAMPLE_RATE)
    eq_params = eq_block.make_eq_params(coeffs, preamp, BLOCK)

    if lookahead > 1:
        conv_state = upols.make_conv_state_paged(
            batch, speakers, conv_params.partition_count, BLOCK, lookahead
        )
    else:
        conv_state = upols.make_conv_state(
            batch, speakers, conv_params.partition_count, BLOCK
        )
    state = ChainState(conv=conv_state, eq=eq_block.make_eq_state(batch))
    # Generate the input block ON DEVICE (no multi-MB host upload — keeps
    # the bench viable over slow/flaky device transports).
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, speakers, BLOCK),
                          jnp.float32) * 0.25
    return conv_params, eq_params, state, x


def make_runner(blocks_per_call: int, blocks_per_step: int = 1,
                acc_chunk: int = 0, max_unroll: int = 0):
    """One jit: scan `blocks_per_call` chained render blocks; return final
    state + a [8, 128] checksum that depends on every block's output.

    blocks_per_step=M > 1 uses the M-block lookahead chain (one delay-line
    read per M blocks, 4M-column MAC; upols.conv_step_paged)."""
    import jax
    import jax.numpy as jnp

    from airwave_tpu.models.binaural import chain_step_fn, chain_step_multi_fn

    if blocks_per_step > 1:
        M = blocks_per_step
        assert blocks_per_call % M == 0, (blocks_per_call, M)

        @functools.partial(jax.jit, donate_argnums=(2,))
        def run(conv_params, eq_params, state, x):
            xm = jnp.broadcast_to(
                x[:, :, None, :], x.shape[:2] + (M,) + x.shape[2:]
            )
            # Unroll by the page count so page rotation stays SSA renaming
            # (see upols.conv_step_paged).
            pages = (len(state.conv.pages)
                     if hasattr(state.conv, "pages") else 1)

            def body(carry, _):
                s, acc = carry
                s, y = chain_step_multi_fn(
                    conv_params, eq_params, eq_params, s, xm,
                    transition_length=960, eq_enabled=True,
                    eq_crossfading=False, acc_chunk=acc_chunk,
                )
                acc = acc + jnp.sum(y.reshape(-1, 8, 128), axis=0)
                return (s, acc), None

            acc0 = jnp.zeros((8, 128), jnp.float32)
            steps = blocks_per_call // M
            unroll = _pick_unroll(pages, steps, max_unroll)
            (s, acc), _ = jax.lax.scan(body, (state, acc0), None,
                                       length=steps, unroll=unroll)
            return s, acc

        return run

    @functools.partial(jax.jit, donate_argnums=(2,))
    def run(conv_params, eq_params, state, x):
        def body(carry, _):
            s, acc = carry
            s, y = chain_step_fn(
                conv_params, eq_params, eq_params, s, x,
                transition_length=960, spatial_enabled=True,
                eq_enabled=True, eq_crossfading=False,
            )
            acc = acc + jnp.sum(y.reshape(-1, 8, 128), axis=0)
            return (s, acc), None
        acc0 = jnp.zeros((8, 128), jnp.float32)
        (s, acc), _ = jax.lax.scan(body, (state, acc0), None,
                                   length=blocks_per_call)
        return s, acc

    return run



def _reference_hrir_wav():
    """The bundled reference HRIR when present; otherwise a deterministic
    synthesized 14-channel bank (CI runners have no /root/reference)."""
    from airwave_tpu.io import wav
    from airwave_tpu.io.wav import WAVData

    try:
        return wav.load("/root/reference/assets/hrtf/NeutralSH1.0.wav")
    except Exception:
        from airwave_tpu.assets.bundled import synthesize_hrir

        return WAVData(SAMPLE_RATE, synthesize_hrir("neutral", 4320))


def _hrir_seconds_arg(text: str):
    """argparse type for --hrir-seconds: float, or comma list of floats
    (per-group lengths for a heterogeneous grouped pool)."""
    parts = [float(s) for s in str(text).split(",")]
    return parts[0] if len(parts) == 1 else parts


def build_pool(batch: int, hrir_seconds=None, speakers: int = 2,
               blocks_per_step: int = 1, groups: int = 1):
    """Pool-bench fixture: (conv_params, eq_params, PoolState, x) for the
    StreamPool's jitted round at the bench shapes (exact partitions, the
    renderer default). Shared by measure_pool and scripts/profile_chain so
    the profiler always profiles exactly what the bench measures.

    groups=G builds the GROUPED multi-profile fixture (G distinct HRIR
    banks + G distinct EQ cascades, per-group lane state — the
    StreamPool(profiles=[...]) round). hrir_seconds may be a per-group
    list (heterogeneous lengths: each group pays only its own
    partitions)."""
    import jax
    import jax.numpy as jnp

    from airwave_tpu.io.apo import (EqualizerDefinition, EqualizerFilter,
                                    FilterType)
    from airwave_tpu.ops import biquad_design as bd
    from airwave_tpu.ops import eq_block, upols
    from airwave_tpu.runtime.stream_pool import PoolState

    groups = int(groups)
    if groups < 1 or batch % groups:
        raise ValueError(
            f"batch ({batch}) must divide by the profile-group count "
            f"({groups})"
        )
    eq_singles = []
    for g in range(groups):
        filters = tuple(
            EqualizerFilter(i + 1, i + 1, True,
                            (FilterType.PEAKING, FilterType.LOW_SHELF,
                             FilterType.HIGH_SHELF)[i % 3],
                            100.0 * (i + 1) + 60.0 + 13.0 * g,
                            (-1.0) ** i * (2.0 + 0.3 * g), 0.9)
            for i in range(10)
        )
        preamp, coeffs = bd.design_cascade(
            EqualizerDefinition(-2.5 + 0.5 * g, filters), SAMPLE_RATE
        )
        eq_singles.append(eq_block.make_eq_params(coeffs, preamp, BLOCK))
    eq_params = (eq_singles[0] if groups == 1 else tuple(eq_singles))
    M = int(blocks_per_step)
    x_shape = ((batch, speakers, M, BLOCK) if M > 1
               else (batch, speakers, BLOCK))
    x = jax.random.normal(jax.random.PRNGKey(0), x_shape, jnp.float32) * 0.25
    per_group_seconds = None
    if isinstance(hrir_seconds, (list, tuple)):
        if len(hrir_seconds) != groups:
            raise ValueError(
                f"--hrir-seconds lists {len(hrir_seconds)} lengths for "
                f"--pool-groups {groups}"
            )
        per_group_seconds = list(hrir_seconds)
        hrir_seconds = per_group_seconds[0]
    # Pool configuration: exact partitions (renderer default; the pow2
    # bucket measured +23% pool-round time at B=8192 — see BENCH_NOTES).
    rng = np.random.default_rng(0)
    if hrir_seconds:
        n = int(hrir_seconds * SAMPLE_RATE)
        hrir = (rng.standard_normal((speakers, 2, n)) * 0.02).astype(np.float32)
        hrir *= np.exp(-np.arange(n) / (0.3 * SAMPLE_RATE))
        hrir[:, :, 0] += 0.8
    else:
        try:
            from airwave_tpu.assets import channel_maps as cm
            from airwave_tpu.graph.renderer import build_hrir_time_domain
            from airwave_tpu.io import wav

            data = wav.load("/root/reference/assets/hrtf/NeutralSH1.0.wav")
            layout = cm.STEREO if speakers == 2 else cm.detect_layout(speakers)
            hrir = build_hrir_time_domain(data, layout, SAMPLE_RATE)
        except Exception:
            hrir = (rng.standard_normal((speakers, 2, 4320)) * 0.05
                    ).astype(np.float32)
            hrir[:, :, 0] += 0.8
    conv_params = upols.make_conv_params(hrir, BLOCK, pad_to_pow2=False,
                                         lookahead=M)
    if groups > 1:
        # G distinct banks; each group carries its own lane state
        # (runtime/stream_pool._pool_round_grouped). Heterogeneous
        # per-group lengths come from a --hrir-seconds comma list.
        conv_singles = [conv_params]
        for g in range(1, groups):
            rg = np.random.default_rng(100 + g)
            if per_group_seconds is not None:
                n_g = int(per_group_seconds[g] * SAMPLE_RATE)
                hg = (rg.standard_normal((speakers, 2, n_g)) * 0.05
                      ).astype(np.float32)
            else:
                hg = (rg.standard_normal(hrir.shape) * 0.05
                      ).astype(np.float32)
            hg[:, :, 0] += 0.8
            conv_singles.append(
                upols.make_conv_params(hg, BLOCK, pad_to_pow2=False,
                                       lookahead=M)
            )
        conv_params = tuple(conv_singles)

    def mk_state(lanes, p):
        if M > 1:
            return upols.make_conv_state_paged(lanes, speakers, p, BLOCK, M)
        return upols.make_conv_state(lanes, speakers, p, BLOCK)

    if groups == 1:
        conv_state = mk_state(batch, conv_params.partition_count)
        eq_state = eq_block.make_eq_state(batch)
    else:
        bg = batch // groups
        conv_state = tuple(mk_state(bg, cp.partition_count)
                           for cp in conv_params)
        eq_state = tuple(eq_block.make_eq_state(bg) for _ in range(groups))
    state = PoolState(conv=conv_state, eq=eq_state)
    return conv_params, eq_params, state, x


def plan_pool_schedule(blocks_per_step: int, blocks_per_call: int,
                       n_pages: int, identity: bool):
    """Variant selection + page-cycle rounding + unroll for a pool scan:
    returns (variant, steps, unroll, blocks_per_call). `identity` = every
    lane harvested (pump's saturated ring_id/paged_id fast round)."""
    M = int(blocks_per_step)
    if M > 1:
        variant = "paged_id" if identity else "paged"
        assert blocks_per_call % M == 0, (blocks_per_call, M)
        steps = blocks_per_call // M
        # Scan macro-iteration boundaries materialize the whole page
        # carry, so unroll must equal the page count for the rotation to
        # stay SSA renaming (see upols.conv_step_paged) — round the step
        # count UP to whole page cycles (the production pump pays no such
        # boundary: one jitted round per call with a donated carry) and
        # account for the rounded total in the returned blocks_per_call.
        steps += (-steps) % n_pages
        blocks_per_call = steps * M
        unroll = _pick_unroll(n_pages, steps)
    else:
        variant = "ring_id" if identity else "ring"
        steps, unroll = blocks_per_call, 1
    return variant, steps, unroll, blocks_per_call


def make_pool_runner(variant: str, steps: int, unroll: int):
    """Jitted sync-proof scan of the pool's real round body
    (run(conv_params, eq_params, state, x, idx) -> (state, checksum))."""
    import jax
    import jax.numpy as jnp

    from airwave_tpu.runtime.stream_pool import pool_step_body

    @functools.partial(jax.jit, donate_argnums=(2,))
    def run(conv_params, eq_params, state, x, idx):
        def body(carry, _):
            s, acc = carry
            s, y_rows = pool_step_body(
                conv_params, eq_params, eq_params, s, x, idx,
                transition_length=960, eq_enabled=True,
                eq_crossfading=False, variant=variant,
            )
            acc = acc + jnp.sum(y_rows.reshape(-1, 8, 128), axis=0)
            return (s, acc), None

        acc0 = jnp.zeros((8, 128), jnp.float32)
        (s, acc), _ = jax.lax.scan(body, (state, acc0), None,
                                   length=steps, unroll=unroll)
        return s, acc

    return run


def measure_pool(batch: int, blocks_per_call: int, calls: int,
                 hrir_seconds: float = None, speakers: int = 2,
                 active_fraction: float = 1.0, blocks_per_step: int = 1,
                 groups: int = 1):
    """Serving-path device number: the StreamPool's jitted round
    (shared-cursor ring step + device scatter/gather of the harvested
    rows, in the unmasked ring_all variant pump selects when every
    attached lane is harvested) scanned sync-proof with every lane active
    — the steady-state cost the production pool pays per block. Exact
    partitions, matching the renderer default (pow2 measured +23%).

    blocks_per_step=M > 1 benches the multi-block THROUGHPUT tier
    (StreamPool(blocks_per_step=M)): the paged lookahead round with the
    EQ folded into the synthesis DFT."""
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    conv_params, eq_params, state, x = build_pool(
        batch, hrir_seconds=hrir_seconds, speakers=speakers,
        blocks_per_step=blocks_per_step, groups=groups,
    )
    M = int(blocks_per_step)
    if not (0.0 < active_fraction <= 1.0):
        raise ValueError(
            f"active_fraction must be in (0, 1], got {active_fraction}"
        )
    k = max(1, int(round(batch * active_fraction)))
    idx = jnp.arange(k, dtype=jnp.int32)
    if k != batch:
        x = x[:k]
    # Full harvest == the saturated steady state, where pump selects the
    # identity-harvest ring_id/paged_id variant (idx == arange: no input
    # scatter, no output gather); a partial harvest exercises the masked
    # variant (paused lanes preserved by the slot read-back / oldest-page
    # recycle).
    conv0 = state.conv[0] if type(state.conv) is tuple else state.conv
    n_pages = len(conv0.pages) if M > 1 else 1
    variant, steps, unroll, blocks_per_call = plan_pool_schedule(
        M, blocks_per_call, n_pages, identity=(k == batch)
    )
    run = make_pool_runner(variant, steps, unroll)

    state, acc = run(conv_params, eq_params, state, x, idx)
    warm = np.asarray(acc)
    assert np.all(np.isfinite(warm)), "non-finite pool bench output"

    best = float("inf")
    for _ in range(calls):
        t0 = time.perf_counter()
        state, acc = run(conv_params, eq_params, state, x, idx)
        host = np.asarray(acc)
        dt = time.perf_counter() - t0
        assert np.all(np.isfinite(host))
        best = min(best, dt)
    # Aggregate counts RENDERED lanes only (k, not batch): a partial
    # harvest renders k lanes' audio per round.
    audio_seconds = k * blocks_per_call * BLOCK / SAMPLE_RATE
    return audio_seconds / best, best / blocks_per_call


def measure_pool_hotswap(batch: int, blocks_per_call: int, calls: int,
                         hrir_seconds: float = None, speakers: int = 2,
                         blocks_per_step: int = 1):
    """Cost of the glitch-free HRIR hot-swap's crossfade round (VERDICT
    r4 Missing #1 done-criterion c): the dual-ear-bank round
    (upols.xfade_conv_params — MAC output columns doubled, delay-line
    read NOT doubled) + the per-sample old/new blend, measured per block
    against the steady-state round on the same shapes. A swap pays this
    for ceil(960/T) rounds (ring tier) or one round (M-block tier);
    every other round is the steady number."""
    import jax
    import jax.numpy as jnp

    from airwave_tpu.ops import upols
    from airwave_tpu.runtime.stream_pool import pool_step_body

    _enable_compile_cache()
    _, steady_s_per_block = measure_pool(
        batch, blocks_per_call, calls, hrir_seconds=hrir_seconds,
        speakers=speakers, blocks_per_step=blocks_per_step,
    )

    conv_params, eq_params, state, x = build_pool(
        batch, hrir_seconds=hrir_seconds, speakers=speakers,
        blocks_per_step=blocks_per_step,
    )
    M = int(blocks_per_step)
    # The incoming bank: same shape (the same-shape swap path — the
    # history-preserving case). Values are irrelevant to the round's
    # cost, so a scaled copy guarantees shape compatibility with
    # whatever HRIR asset build_pool resolved.
    new_params = upols.ConvParams(Gflip2=conv_params.Gflip2 * 0.9,
                                  wf=conv_params.wf, wi=conv_params.wi)
    dual = upols.xfade_conv_params(conv_params, new_params)
    round_frames = M * BLOCK
    ramp = jnp.asarray(upols.xfade_ramp(min(960, round_frames),
                                        round_frames))
    mask = jnp.ones((batch,), jnp.bool_)
    idx = jnp.arange(batch, dtype=jnp.int32)
    conv0 = state.conv[0] if type(state.conv) is tuple else state.conv
    n_pages = len(conv0.pages) if M > 1 else 1
    variant, steps, unroll, blocks_per_call = plan_pool_schedule(
        M, blocks_per_call, n_pages, identity=True
    )

    @functools.partial(jax.jit, donate_argnums=(2,))
    def run(dual_params, eq_p, st, xx, ii):
        def body(carry, _):
            s, acc = carry
            s, y_rows = pool_step_body(
                dual_params, eq_p, eq_p, s, xx, ii,
                transition_length=960, eq_enabled=True,
                eq_crossfading=False, variant=variant,
                xfade_ramp=ramp, xfade_mask=mask,
            )
            acc = acc + jnp.sum(y_rows.reshape(-1, 8, 128), axis=0)
            return (s, acc), None

        acc0 = jnp.zeros((8, 128), jnp.float32)
        (s, acc), _ = jax.lax.scan(body, (st, acc0), None,
                                   length=steps, unroll=unroll)
        return s, acc

    state, acc = run(dual, eq_params, state, x, idx)
    warm = np.asarray(acc)
    assert np.all(np.isfinite(warm)), "non-finite hotswap bench output"
    best = float("inf")
    for _ in range(calls):
        t0 = time.perf_counter()
        state, acc = run(dual, eq_params, state, x, idx)
        host = np.asarray(acc)
        dt = time.perf_counter() - t0
        assert np.all(np.isfinite(host))
        best = min(best, dt)
    xfade_ms = best / blocks_per_call * 1e3
    return steady_s_per_block * 1e3, xfade_ms


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR", "/tmp/jaxcache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def measure_pool_host(batch: int, rounds: int, calls: int,
                      speakers: int = 2, blocks_per_step: int = 1):
    """End-to-end host serving loop: the REAL StreamPool (native assembler
    rings, harvest, indexed upload, pipelined delivery, pull) with every
    stream fed one step per round. On this environment the host<->device
    tunnel dominates; the number records the full serving stack's
    throughput, with a breakdown of where wall-clock goes.

    blocks_per_step=M runs the multi-block throughput tier — M blocks of
    audio per round of host loops, so per-BLOCK host overhead drops ~M×
    (rounds here counts pump rounds; realtime accounting uses M*BLOCK
    frames per round)."""
    _enable_compile_cache()
    from airwave_tpu.assets import channel_maps as cm
    from airwave_tpu.graph.renderer import prepare_renderer
    from airwave_tpu.io import wav
    from airwave_tpu.runtime.stream_pool import StreamPool

    data = _reference_hrir_wav()
    layout = cm.STEREO if speakers == 2 else cm.detect_layout(speakers)
    M = int(blocks_per_step)
    renderer = prepare_renderer(data, layout, SAMPLE_RATE, BLOCK,
                                lookahead=M)
    pool = StreamPool(batch, SAMPLE_RATE, renderer, eq_definition=None,
                      block_size=BLOCK, ring_blocks=4 * M,
                      blocks_per_step=M)
    streams = [pool.attach() for _ in range(batch)]
    step = pool.step_frames
    rng = np.random.default_rng(0)
    block_in = (rng.standard_normal((batch, speakers, step)) * 0.25
                ).astype(np.float32)

    stream_ids = np.asarray(streams, np.int32)

    def one_round(t):
        t0 = time.perf_counter()
        pool.push_many(stream_ids, block_in)
        t1 = time.perf_counter()
        pool.pump(max_rounds=1)
        t2 = time.perf_counter()
        pool.pull_many(stream_ids, step)
        t3 = time.perf_counter()
        if t is not None:
            t["push"] += t1 - t0
            t["pump"] += t2 - t1
            t["pull"] += t3 - t2

    one_round(None)  # warmup: compile
    one_round(None)
    best = float("inf")
    breakdown = None
    for _ in range(calls):
        t = {"push": 0.0, "pump": 0.0, "pull": 0.0}
        t0 = time.perf_counter()
        for _r in range(rounds):
            one_round(t)
        dt = time.perf_counter() - t0
        if dt < best:
            best, breakdown = dt, t
    audio_seconds = batch * rounds * step / SAMPLE_RATE
    per_block = best / (rounds * M)
    return audio_seconds / best, per_block, {
        k: round(v / rounds * 1e3, 3) for k, v in breakdown.items()
    }


def measure_serve_scale(clients: int, blocks_each: int,
                        blocks_per_step: int = 1, speed: float = 0.01,
                        batch_window: float = 0.25):
    """Wire-layer SCALE artifact: O(1000) concurrent paced clients through
    the selector data plane, driven by the selector load generator
    (shell/loadgen.py) in a separate process so the harness never shares
    the server's GIL. Reports completion/failure counts, admission and
    chunk-latency percentiles, and the server's own wire-to-wire latency.

    Pacing defaults keep aggregate DSP demand within the host's measured
    capacity so the artifact reflects the WIRE layer (admission, delivery,
    fairness), not device saturation: with the real reference HRIR (9
    partitions) a 1-core CPU pool renders ~35x realtime at kb=1024, so the
    default 0.01x pacing puts 1,024 clients at ~10x aggregate — the wire
    carries the same message RATE regardless. The full-scale methodology
    note is BENCH_NOTES "Round 5"."""
    _enable_compile_cache()
    import subprocess

    from airwave_tpu.assets import channel_maps as cm
    from airwave_tpu.graph.renderer import prepare_renderer
    from airwave_tpu.runtime.stream_pool import StreamPool
    from airwave_tpu.shell.serve import RenderServer

    data = _reference_hrir_wav()
    M = int(blocks_per_step)
    renderer = prepare_renderer(data, cm.STEREO, SAMPLE_RATE, BLOCK,
                                lookahead=M)
    pool = StreamPool(clients + 8, SAMPLE_RATE, renderer,
                      eq_definition=None, block_size=BLOCK,
                      ring_blocks=8 * M, blocks_per_step=M)
    pool.prewarm()
    server = RenderServer(pool, port=0, client_timeout=300.0,
                          batch_window=batch_window, io_mode="selector")
    server.start()
    try:
        host, port = server.address
        repo = os.path.dirname(os.path.abspath(__file__))
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.run(
            [sys.executable, "-m", "airwave_tpu.shell.loadgen",
             "--connect", f"{host}:{port}",
             "--clients", str(clients),
             "--blocks-each", str(blocks_each),
             "--chunk", str(BLOCK),
             "--speed", str(speed),
             "--timeout", "280"],
            env=env, capture_output=True, text=True, timeout=300,
        )
        if not proc.stdout.strip():
            raise RuntimeError(f"loadgen produced no output: "
                               f"{proc.stderr[-500:]}")
        load = json.loads(proc.stdout.strip().splitlines()[-1])
        return load, server.stats()
    finally:
        server.stop()


def measure_serve(clients: int, blocks_each: int, calls: int,
                  blocks_per_step: int = 1):
    """Loopback RenderServer throughput: N synthetic TCP clients stream
    concurrently through one shared pool (the production serving stack:
    sockets -> native rings -> batched device rounds -> sockets). The
    analog of the reference's committed realtime perf harnesses
    (/root/reference/AirwaveTests/RealtimeAudioProcessorTests.swift:128-166),
    scaled to the pool architecture.

    blocks_per_step=M serves from the multi-block throughput tier (the
    serve CLI's --blocks-per-step): same wire contract, ~M× fewer host
    rounds and the paged/folded device step."""
    _enable_compile_cache()
    import threading

    from airwave_tpu.assets import channel_maps as cm
    from airwave_tpu.graph.renderer import prepare_renderer
    from airwave_tpu.io import wav
    from airwave_tpu.runtime.stream_pool import StreamPool
    from airwave_tpu.shell.serve import RenderServer, render_via_server

    data = _reference_hrir_wav()
    M = int(blocks_per_step)
    renderer = prepare_renderer(data, cm.STEREO, SAMPLE_RATE, BLOCK,
                                lookahead=M)
    # +2 slots of headroom: a finished client's server-side detach runs
    # just after its EOF frame, so a back-to-back wave can momentarily
    # overlap the previous occupancy.
    pool = StreamPool(clients + 2, SAMPLE_RATE, renderer,
                      eq_definition=None, block_size=BLOCK,
                      ring_blocks=8 * M, blocks_per_step=M)
    # Compile every harvest-bucket/roll shape before opening the doors —
    # a cold bucket compile mid-flight stalls past client timeouts.
    pool.prewarm()
    server = RenderServer(pool, port=0, client_timeout=120.0)
    server.start()
    try:
        rng = np.random.default_rng(0)
        audio = (rng.standard_normal((2, blocks_each * BLOCK)) * 0.25
                 ).astype(np.float32)
        render_via_server(server.address, audio)  # warmup: compile + route

        def one(outs, j):
            outs[j] = render_via_server(server.address, audio)

        # Untimed full-fleet round: compiles every harvest-bucket shape the
        # fleet can produce, so the timed rounds measure serving, not jit.
        outs = [None] * clients
        threads = [threading.Thread(target=one, args=(outs, j))
                   for j in range(clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        best = float("inf")
        # Latency over the TIMED rounds only (drop warmup/untimed samples
        # and their count, so count matches the percentiles' backing
        # data).
        server.reset_latency()
        for _ in range(calls):
            outs = [None] * clients
            threads = [threading.Thread(target=one, args=(outs, j))
                       for j in range(clients)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            dt = time.perf_counter() - t0
            assert all(o is not None and o.size and
                       np.all(np.isfinite(o)) for o in outs)
            best = min(best, dt)
        audio_seconds = clients * blocks_each * BLOCK / SAMPLE_RATE
        return audio_seconds / best, best / blocks_each, server.latency_stats()
    finally:
        server.stop()


def measure(batch: int, blocks_per_call: int, calls: int,
            hrir_seconds: float = None,
            blocks_per_step: int = 1, speakers: int = 2,
            acc_chunk: int = 0, max_unroll: int = 0,
            batch_split: int = 1, synthetic: bool = False):
    # Persistent compilation cache: flaky-tunnel retries skip the multi-minute
    # compile and fit inside short healthy windows.
    _enable_compile_cache()

    if batch_split > 1:
        # Terminal memory rung: the full batch's CARRY does not fit, so
        # run `batch_split` sequential stream-groups of batch/split each,
        # ONE group resident at a time (group g bakes to completion and
        # frees its carry before group g+1 builds — two resident carries
        # is exactly the OOM this rung exists to avoid). The workload
        # still completes; the aggregate counts all groups' audio over
        # the summed group times.
        assert batch % batch_split == 0, (batch, batch_split)
        gb = batch // batch_split
        import jax
        import jax.numpy as jnp

        runner = make_runner(blocks_per_call,
                             blocks_per_step, acc_chunk, max_unroll)
        # One carry allocation for ALL groups: group g+1's fresh (zero)
        # carry is group g's buffers donate-reset in place — rebuilding a
        # second multi-GB carry while the first frees asynchronously
        # reproduced ResourceExhausted on the tunneled terminal.
        reset = jax.jit(
            lambda s: jax.tree_util.tree_map(jnp.zeros_like, s),
            donate_argnums=0,
        )
        conv_params, eq_params, state, x = build(
            gb, hrir_seconds=hrir_seconds,
            lookahead=blocks_per_step, speakers=speakers,
            synthetic=synthetic,
        )
        total = 0.0
        for g in range(batch_split):
            if g:
                state = reset(state)
            state, acc = runner(conv_params, eq_params, state, x)
            warm = np.asarray(acc)
            assert np.all(np.isfinite(warm))
            best_g = float("inf")
            for _ in range(calls):
                t0 = time.perf_counter()
                state, acc = runner(conv_params, eq_params, state, x)
                host = np.asarray(acc)
                dt = time.perf_counter() - t0
                assert np.all(np.isfinite(host))
                best_g = min(best_g, dt)
            total += best_g
        audio_seconds = batch * blocks_per_call * BLOCK / SAMPLE_RATE
        return audio_seconds / total, total / (
            blocks_per_call * batch_split
        )

    conv_params, eq_params, state, x = build(batch, hrir_seconds=hrir_seconds,
                                             lookahead=blocks_per_step,
                                             speakers=speakers,
                                             synthetic=synthetic)
    runner = make_runner(blocks_per_call,
                         blocks_per_step, acc_chunk, max_unroll)

    # Warmup: compile + one real execution, checksum fetched (true sync).
    state, acc = runner(conv_params, eq_params, state, x)
    warm = np.asarray(acc)
    assert np.all(np.isfinite(warm)), "non-finite bench output"

    best = float("inf")
    for _ in range(calls):
        t0 = time.perf_counter()
        state, acc = runner(conv_params, eq_params, state, x)
        host = np.asarray(acc)  # forces execution + readback
        dt = time.perf_counter() - t0
        assert np.all(np.isfinite(host))
        best = min(best, dt)

    audio_seconds = batch * blocks_per_call * BLOCK / SAMPLE_RATE
    return audio_seconds / best, best / blocks_per_call


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true",
                        help="tiny CPU run (CI sanity)")
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--blocks", type=int, default=None,
                        help="chained blocks per jit call")
    parser.add_argument("--calls", type=int, default=3)
    parser.add_argument("--hrir-seconds", type=_hrir_seconds_arg,
                        default=None,
                        help="config-5 stress: synthetic IR of this length; "
                             "with --pool --pool-groups G, a comma list "
                             "gives per-group lengths (heterogeneous "
                             "grouped pool — each group pays only its own "
                             "partitions)")
    parser.add_argument("--speakers", type=int, default=2,
                        help="input/virtual-speaker count (8 = BASELINE "
                             "config 3, 7.1 surround to binaural)")
    parser.add_argument("--synthetic-hrir", action="store_true",
                        help="force a synthesized HRIR bank so every "
                             "requested speaker renders (the real "
                             "hesuvi14 asset drops 7.1.4's four height "
                             "channels per the activation contract; this "
                             "flag measures a TRUE 12-speaker chain)")
    parser.add_argument("--blocks-per-step", type=int, default=8,
                        help="M-block lookahead per delay-line read "
                             "(1 = classic per-block stepping)")
    parser.add_argument("--pool", action="store_true",
                        help="serving-path number: the StreamPool's jitted "
                             "round (masked ring step) scanned sync-proof")
    parser.add_argument("--pool-active-fraction", type=float, default=1.0,
                        help="fraction of lanes harvested per round "
                             "(<1 measures the masked ragged variant; "
                             "aggregate counts only rendered lanes)")
    parser.add_argument("--pool-blocks", type=int, default=1,
                        help="with --pool / --pool-host: bench the "
                             "multi-block throughput tier "
                             "(StreamPool(blocks_per_step=M) — paged line "
                             "+ folded EQ, +up to M blocks latency, ~M× "
                             "fewer host rounds per block)")
    parser.add_argument("--pool-groups", type=int, default=1,
                        help="with --pool: bench the grouped multi-profile "
                             "round (StreamPool(profiles=[...]) — G "
                             "distinct HRIR banks + EQ cascades in one "
                             "step)")
    parser.add_argument("--pool-hotswap", action="store_true",
                        help="measure the HRIR hot-swap crossfade round "
                             "(dual-ear bank + blend) vs the steady round "
                             "on the same shapes; --pool-blocks M selects "
                             "the tier")
    parser.add_argument("--pool-host", action="store_true",
                        help="end-to-end host serving loop through the real "
                             "StreamPool (rings + transfers + pulls)")
    parser.add_argument("--serve", action="store_true",
                        help="loopback RenderServer throughput with "
                             "--batch synthetic TCP clients")
    parser.add_argument("--deadline", type=float, default=480.0)
    parser.add_argument("--strict", action="store_true",
                        help="exit nonzero when only an error JSON could "
                             "be produced (CI release gates)")
    args = parser.parse_args()
    if args.pool_groups < 1:
        parser.error("--pool-groups must be >= 1")
    if args.pool_groups > 1 and not args.pool:
        parser.error("--pool-groups requires --pool")
    if isinstance(args.hrir_seconds, list):
        if not (args.pool and args.pool_groups > 1):
            parser.error("--hrir-seconds takes a comma list only with "
                         "--pool --pool-groups G (per-group lengths)")
        if len(args.hrir_seconds) != args.pool_groups:
            parser.error(f"--hrir-seconds lists {len(args.hrir_seconds)} "
                         f"lengths but --pool-groups is {args.pool_groups}")
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
        batch = args.batch or 8
        blocks = args.blocks or (4 * args.blocks_per_step)
    else:
        # 16384 measured the headline sweet spot after the EQ fold (round-2
        # sweep: 8192 = 29.2-29.5k, 16384 = 30.16k twice; BENCH_NOTES.md).
        batch = args.batch or 16384
        blocks = args.blocks or 192  # ~2 s of audio per stream per call
    blocks -= blocks % args.blocks_per_step or 0
    blocks = max(blocks, args.blocks_per_step)

    _watchdog(args.deadline, "device wedged: checksum readback did not "
                             "complete before deadline",
              metric=("serving-pool realtime-multiple per chip"
                      if args.pool else
                      "serving-pool host-loop realtime-multiple"
                      if args.pool_host else
                      "render-server loopback realtime-multiple"
                      if args.serve else
                      "realtime-multiple per chip "
                      "(48kHz stereo HRIR+EQ chain)"))

    if args.serve and (args.batch or 0) > 64:
        # Wire-layer scale artifact (selector plane + selector loadgen):
        # `bench.py --serve --batch 1024`. Value = completed clients; the
        # latency percentiles ride along.
        clients = args.batch
        blocks_each = args.blocks or 20
        try:
            load, stats = measure_serve_scale(
                clients, blocks_each, blocks_per_step=args.pool_blocks)
        except Exception as err:  # noqa: BLE001
            print(json.dumps({
                "metric": "render-server concurrent clients served",
                "value": 0.0, "unit": "clients", "vs_baseline": 0.0,
                "error": f"serve scale bench failed: {err}",
            }))
            if args.strict:
                sys.exit(1)
            return
        _emit({
            "metric": "render-server concurrent clients served",
            "value": load["completed"],
            "unit": "clients",
            # The reference app's HAL serving surface is ONE process/
            # device (SURVEY §1 L3) — any concurrent-client count >= 1
            # beats it; scale vs the r4-era tested ceiling of 32.
            "vs_baseline": round(load["completed"] / 32.0, 3),
            "failed": load["failed"],
            "admission_ms": load["admission"],
            "chunk_latency_ms": load["chunk_latency"],
            "server_latency_ms": stats["latency"],
            "protocol_errors": stats["protocol_errors"],
            "truncated_closes": stats["truncated_closes"],
            "completion_spread_s": load["completion_spread_s"],
            "pacing_speed": load["speed"],
        })
        return

    if args.serve:
        clients = args.batch or (2 if args.smoke else 32)
        blocks_each = args.blocks or (4 if args.smoke else 48)
        try:
            multiple, per_block, latency = measure_serve(
                clients, blocks_each, args.calls,
                blocks_per_step=args.pool_blocks)
        except Exception as err:  # noqa: BLE001
            print(json.dumps({
                "metric": "render-server loopback realtime-multiple",
                "value": 0.0, "unit": "x_realtime", "vs_baseline": 0.0,
                "error": f"serve bench failed: {err}",
            }))
            if args.strict:
                sys.exit(1)
            return
        out = {
            "metric": "render-server loopback realtime-multiple",
            "value": round(multiple, 1),
            "unit": "x_realtime",
            "vs_baseline": round(multiple / 5000.0, 3),
            "clients": clients,
            "ms_per_block_step": round(per_block * 1e3, 3),
            # Wire-to-wire per-chunk latency (client chunk pushed ->
            # rendered frames on the socket), recorded server-side over
            # the timed rounds: the latency artifact beside the
            # throughput number (VERDICT r3 #4).
            "latency_ms": latency,
        }
        if args.pool_blocks > 1:
            out["blocks_per_step"] = args.pool_blocks
        _emit(out)
        return

    if args.pool_hotswap:
        batch = args.batch or (8 if args.smoke else 8192)
        blocks = args.blocks or (8 if args.smoke else 96)
        blocks += (-blocks) % args.pool_blocks
        try:
            steady_ms, xfade_ms = measure_pool_hotswap(
                batch, blocks, args.calls,
                hrir_seconds=args.hrir_seconds, speakers=args.speakers,
                blocks_per_step=args.pool_blocks)
        except Exception as err:  # noqa: BLE001
            print(json.dumps({
                "metric": "hotswap crossfade round cost",
                "value": 0.0, "unit": "ms_per_block", "vs_baseline": 0.0,
                "error": f"{type(err).__name__}: {err}",
            }))
            if args.strict:
                sys.exit(1)
            return
        _emit({
            "metric": "hotswap crossfade round cost",
            "value": round(xfade_ms, 3),
            "unit": "ms_per_block",
            # vs the steady round on the same shapes: the ratio a swap
            # round pays (the reference PAYS a full state reset instead).
            "vs_baseline": round(xfade_ms / steady_ms, 3),
            "steady_ms_per_block": round(steady_ms, 3),
            "batch_streams": batch,
            "speakers": args.speakers,
            "blocks_per_step": args.pool_blocks,
        })
        return

    if args.pool or args.pool_host:
        if args.smoke:
            batch = args.batch or 8
        else:
            batch = args.batch or 8192
        if batch % args.pool_groups:
            parser.error(f"--batch {batch} must divide by --pool-groups "
                         f"{args.pool_groups}")
        last_error = None
        for _attempt in range(4):
            try:
                if args.pool:
                    blocks = args.blocks or (8 if args.smoke else 96)
                    blocks += (-blocks) % args.pool_blocks
                    multiple, per_block = measure_pool(
                        batch, blocks, args.calls,
                        hrir_seconds=args.hrir_seconds,
                        speakers=args.speakers,
                        active_fraction=args.pool_active_fraction,
                        blocks_per_step=args.pool_blocks,
                        groups=args.pool_groups)
                    breakdown = None
                else:
                    rounds = args.blocks or (4 if args.smoke else 24)
                    multiple, per_block, breakdown = measure_pool_host(
                        batch, rounds, args.calls, speakers=args.speakers,
                        blocks_per_step=args.pool_blocks)
                break
            except Exception as err:  # noqa: BLE001
                # Message only — the exception's traceback frames would
                # pin the failed attempt's device buffers across retries.
                last_error = f"{type(err).__name__}: {err}"
            gc.collect()  # outside the handler: exc state cleared
            time.sleep(5.0)
        else:
            print(json.dumps({
                "metric": "serving-pool realtime-multiple per chip",
                "value": 0.0, "unit": "x_realtime", "vs_baseline": 0.0,
                "error": f"device error after retries: {last_error}",
            }))
            if args.strict:
                sys.exit(1)
            return
        out = {
            "metric": ("serving-pool realtime-multiple per chip"
                       if args.pool else
                       "serving-pool host-loop realtime-multiple"),
            "value": round(multiple, 1),
            "unit": "x_realtime",
            "vs_baseline": round(multiple / 5000.0, 3),
            "batch_streams": batch,
            "speakers": args.speakers,
            "ms_per_block_step": round(per_block * 1e3, 3),
        }
        if args.pool and args.pool_active_fraction != 1.0:
            out["active_fraction"] = args.pool_active_fraction
        if args.pool and args.pool_groups > 1:
            out["profile_groups"] = args.pool_groups
            if isinstance(args.hrir_seconds, list):
                out["hrir_seconds_per_group"] = args.hrir_seconds
        if args.pool_blocks > 1:
            out["blocks_per_step"] = args.pool_blocks
        if breakdown:
            out["host_ms_per_round"] = breakdown
        _emit(out)
        return

    # Memory plan: an ordered (lookahead, acc_chunk) ladder. A shape whose
    # paged delay line / MAC temporaries overflow HBM retries with
    # accumulation chunking, then smaller lookaheads, instead of dying
    # (airwave_tpu/utils/memory_planner.py).
    from airwave_tpu.utils.memory_planner import (device_hbm_bytes,
                                                  plan_paged_bake)

    hrir_taps = (int(args.hrir_seconds * SAMPLE_RATE)
                 if args.hrir_seconds else 4320)
    # Plan for the speakers the chain will RENDER, not the request: a
    # 7.1.4 request through the height-less hesuvi14 asset renders 8
    # speakers, and planning for 12 shipped chunk2/split2 needlessly.
    plan_speakers = effective_speakers(args.speakers, args.hrir_seconds,
                                       args.synthetic_hrir)
    if args.blocks_per_step > 1 and not args.smoke:
        plan = plan_paged_bake(batch, plan_speakers, hrir_taps, BLOCK,
                               args.blocks_per_step,
                               hbm_bytes=device_hbm_bytes())
    else:
        from airwave_tpu.utils.memory_planner import PlanAttempt

        plan = [PlanAttempt(args.blocks_per_step, 0, "as requested")]

    def _is_oom(err) -> bool:
        text = str(err)
        return ("RESOURCE_EXHAUSTED" in text or "Out of memory" in text
                or "Ran out of memory" in text
                or "exceeds the memory capacity" in text
                or "Attempting to reserve" in text)

    # The tunneled device can fail individual requests transiently; rebuild
    # and retry (compiles hit the persistent cache, so retries are cheap).
    last_error = None
    result = None
    for attempt in plan:
        if attempt.batch_split > 1 and batch % attempt.batch_split:
            continue  # a split that does not divide the batch cannot run
        m, chunk = attempt.lookahead, attempt.acc_chunk
        step_blocks = max(blocks - blocks % m, m)
        for _attempt in range(3):
            try:
                multiple, per_block = measure(
                    batch, step_blocks, args.calls,
                    hrir_seconds=args.hrir_seconds,
                    blocks_per_step=m,
                    speakers=args.speakers,
                    acc_chunk=chunk,
                    max_unroll=attempt.max_unroll,
                    batch_split=attempt.batch_split,
                    synthetic=args.synthetic_hrir,
                )
                result = (multiple, per_block, attempt)
                break
            except Exception as err:  # noqa: BLE001
                # Keep only the MESSAGE: holding the exception object pins
                # the failed attempt's device buffers via its traceback
                # frames (a 13 GB carry kept alive starved the next rung's
                # allocation on-chip). The collect runs OUTSIDE the
                # handler — inside it, the interpreter's exception state
                # still references the frames and nothing frees.
                oom = _is_oom(err)
                last_error = f"{type(err).__name__}: {err}"
            gc.collect()
            if oom:
                break  # next plan attempt, not a transient retry
            time.sleep(5.0)
        if result is not None:
            break
    if result is None:
        print(json.dumps({
            "metric": "realtime-multiple per chip (48kHz stereo HRIR+EQ chain)",
            "value": 0.0, "unit": "x_realtime", "vs_baseline": 0.0,
            "error": f"device error after retries: {last_error}",
        }))
        if args.strict:
            sys.exit(1)
        return
    multiple, per_block, used = result
    out = {
        "metric": "realtime-multiple per chip (48kHz stereo HRIR+EQ chain)",
        "value": round(multiple, 1),
        "unit": "x_realtime",
        "vs_baseline": round(multiple / 5000.0, 3),
        "batch_streams": batch,
        "speakers": args.speakers,
        "ms_per_block_step": round(per_block * 1e3, 3),
    }
    if plan_speakers != args.speakers:
        # The asset's channel map dropped unmapped (height) channels —
        # the honest render count, so a 7.1.4-labeled row can't be
        # mistaken for a 12-speaker render (it isn't one; use
        # --synthetic-hrir for that).
        out["speakers_rendered"] = plan_speakers
    if (used.lookahead, used.acc_chunk, used.max_unroll,
            used.batch_split) != (args.blocks_per_step, 0, 0, 1):
        out["memory_plan"] = {"blocks_per_step": used.lookahead,
                              "acc_chunk": used.acc_chunk,
                              "max_unroll": used.max_unroll,
                              "batch_split": used.batch_split}
    _emit(out)


if __name__ == "__main__":
    main()
