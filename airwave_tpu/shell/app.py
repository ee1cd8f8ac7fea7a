"""Headless application shell: the framework's user-facing CLI.

What the reference exposes as a menu-bar app (SURVEY.md §2.2 L7), this
framework exposes as subcommands over the same layers:

  render   offline bake: input WAV(s) -> HRIR (+EQ) -> stereo WAV(s)
  presets  seed / list / import the managed preset libraries
  demo     run the FULL runtime (controller + verification + recovery) on a
           synthetic transport and report the status trail
  serve    TCP streaming render server (single- or multi-profile pool)
  client   stream a WAV through a running server (deployment smoke check)
  status   environment and device summary

`python -m airwave_tpu <command> ...`
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import List, Optional

import numpy as np


def _default_data_dir() -> str:
    return os.environ.get(
        "AIRWAVE_DATA_DIR",
        os.path.join(os.path.expanduser("~"), ".airwave_tpu"),
    )


def _load_equalizer(path: Optional[str]):
    """Parse an EqualizerAPO preset for the render/serve CLIs.

    EQ failures are NON-FATAL on the processing chain (the reference
    graph's contract) — a preset that fails to parse warns with its
    line-numbered issues and the render continues spatial-only, same as
    a preset that parses but fails coefficient design."""
    if path is None:
        return None
    from airwave_tpu.io import apo
    from airwave_tpu.utils.errors import EqualizerParseError

    with open(path, "rb") as f:
        data = f.read()
    try:
        return apo.parse(data, os.path.basename(path))
    except EqualizerParseError as err:
        print(f"warning: equalizer disabled: {err}", file=sys.stderr)
        return None


def cmd_render(args) -> int:
    import jax

    from airwave_tpu.assets import channel_maps as cm
    from airwave_tpu.graph.effect_graph import AudioEffectGraph
    from airwave_tpu.graph.renderer import prepare_renderer
    from airwave_tpu.graph.spatial_effect import SpatialEffect
    from airwave_tpu.io import wav as wav_io
    from airwave_tpu.utils.profiling import RenderProfiler

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    inputs = [wav_io.load(p) for p in args.input]
    rate = inputs[0].sample_rate
    channels = inputs[0].channel_count
    for path, data in zip(args.input, inputs):
        if data.sample_rate != rate or data.channel_count != channels:
            raise SystemExit(
                f"{path}: all inputs must share rate/channels in one bake"
            )
    layout = cm.detect_layout(channels) if channels > 1 else cm.STEREO

    hrir = wav_io.load(args.hrir)
    batch = len(inputs)
    definition = _load_equalizer(args.eq)
    eq_active = definition is not None
    graph = None
    if not args.throughput:
        renderer = prepare_renderer(hrir, layout, rate, args.block_size)
        spatial = SpatialEffect(batch=batch, sample_rate=rate,
                                block_size=args.block_size)
        spatial.set_renderer(renderer)
        graph = AudioEffectGraph(spatial, batch=batch)
        result = graph.prepare(rate, definition)
        if result.equalizer_warning is not None:
            print(f"warning: {result.equalizer_warning}", file=sys.stderr)
            eq_active = False

    frames = max(d.frame_count for d in inputs)
    block = args.block_size
    padded = ((frames + block - 1) // block) * block
    x = np.zeros((batch, max(channels, 2), padded), np.float32)
    for i, data in enumerate(inputs):
        audio = data.audio
        if audio.shape[0] == 1:
            audio = np.repeat(audio, 2, axis=0)
        x[i, : audio.shape[0], : data.frame_count] = audio

    profiler = RenderProfiler(rate, block, batch)
    if args.throughput:
        # Device-resident lookahead bake: the whole signal scans on-device
        # with 8 blocks per delay-line read (ops/upols.conv_step_paged) —
        # the fast path for long renders. Difference vs the default graph
        # path: the EQ applies from sample 0 with no activation ramp (the
        # graph path plays the reference's 20 ms unity->target ramp).
        from airwave_tpu.graph.renderer import build_hrir_time_domain
        from airwave_tpu.models.bake import bake as bake_fn
        from airwave_tpu.ops import biquad_design as bd

        hrir_td, _speakers, mapped = build_hrir_time_domain(
            hrir, layout, rate, with_speakers=True
        )
        if x.shape[1] != hrir_td.shape[0]:
            # Unmapped layout channels (e.g. 7.1.4 heights vs a height-less
            # map) drop here, same as the live graph path.
            x = x[:, list(mapped)]
        preamp, coeffs = 1.0, None
        if definition is not None:
            # EQ preparation failures stay NON-FATAL warnings here too
            # (the graph path's contract, AudioEffectGraph.swift:103-137):
            # spatial continues without the EQ.
            try:
                preamp, coeffs = bd.design_cascade(definition, rate)
            except Exception as exc:
                print(f"warning: equalizer disabled: {exc}", file=sys.stderr)
                eq_active = False
        t0 = time.perf_counter()
        y, _ = bake_fn(hrir_td, x, rate, coeffs, preamp,
                       block_size=block, blocks_per_step=8)
        elapsed = time.perf_counter() - t0
        profile_report = {
            "mode": "throughput",
            "seconds": elapsed,
            "realtime_multiple": (batch * padded / rate) / max(elapsed, 1e-9),
        }
    else:
        outs = []
        for i in range(padded // block):
            with profiler.step():
                outs.append(graph.process(x[:, :, i * block:(i + 1) * block]))
        y = np.concatenate(outs, axis=-1)
        profile_report = profiler.report()

    os.makedirs(args.output_dir, exist_ok=True)
    written = []
    for i, src in enumerate(args.input):
        stem = os.path.splitext(os.path.basename(src))[0]
        out_path = os.path.join(args.output_dir, f"{stem}.binaural.wav")
        # Block-aligned pushes drain with zero adapter lag; trim the padding.
        trimmed = y[i, :, : inputs[i].frame_count]
        wav_io.save(out_path, trimmed, rate)
        written.append(out_path)

    print(json.dumps({
        "rendered": written,
        "sample_rate": rate,
        "layout": layout.name,
        "equalizer": eq_active,
        "profile": profile_report,
    }, indent=2))
    return 0


def cmd_presets(args) -> int:
    from airwave_tpu.assets import bundled
    from airwave_tpu.assets.eq_library import EqualizerManager
    from airwave_tpu.assets.hrir_library import HRIRManager

    base = args.data_dir
    eq = EqualizerManager(os.path.join(base, "eq"))
    hrir = HRIRManager(os.path.join(base, "hrir"))

    if args.presets_command == "seed":
        bundled.seed_bundled_presets(eq, hrir, os.path.join(base, "staging"))
        print(f"seeded {len(eq.presets())} EQ + {len(hrir.presets())} HRIR "
              f"presets into {base}")
        return 0
    if args.presets_command == "list":
        for preset in hrir.presets():
            print(f"hrir  {preset.id[:8]}  {preset.display_name}  "
                  f"{preset.channel_count}ch@{preset.sample_rate:.0f}")
        for preset in eq.presets():
            print(f"eq    {preset.id[:8]}  {preset.display_name}")
        return 0
    if args.presets_command == "import":
        failures = 0
        for path in args.files:
            try:
                if path.lower().endswith(".wav"):
                    preset = hrir.import_preset(path)
                else:
                    preset = eq.import_preset(path)
                print(f"imported {preset.display_name} ({preset.id[:8]})")
            except Exception as err:  # noqa: BLE001
                failures += 1
                print(f"FAIL {path}: {err}", file=sys.stderr)
        return 1 if failures else 0
    return 2


def cmd_demo(args) -> int:
    import jax

    from airwave_tpu.assets import bundled
    from airwave_tpu.assets.eq_library import EqualizerManager
    from airwave_tpu.assets.hrir_library import HRIRManager
    from airwave_tpu.assets.profiles import DeviceProfileManager
    from airwave_tpu.assets.store import JSONStore
    from airwave_tpu.graph.effect_graph import AudioEffectGraph
    from airwave_tpu.graph.spatial_effect import SpatialEffect
    from airwave_tpu.runtime.controller import AudioRuntimeController
    from airwave_tpu.runtime.coordinators import (
        DeviceProfileRuntimeCoordinator,
        OutputDeviceDiscoveryCoordinator,
    )
    from airwave_tpu.runtime.pipeline import StreamPipeline
    from airwave_tpu.runtime.scheduler import ManualScheduler
    from airwave_tpu.runtime.state import AudioRuntimeState
    from airwave_tpu.runtime.synthetic_transport import SyntheticTransport
    from airwave_tpu.runtime.transport import OutputDeviceDescriptor
    from airwave_tpu.shell.presentation import present_status

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    base = args.data_dir
    eq = EqualizerManager(os.path.join(base, "eq"))
    hrir = HRIRManager(os.path.join(base, "hrir"))
    bundled.seed_bundled_presets(eq, hrir, os.path.join(base, "staging"))
    profiles = DeviceProfileManager(JSONStore(os.path.join(base, "profiles.json")))

    output = OutputDeviceDescriptor(uid="synthetic-out", name="Synthetic",
                                    nominal_sample_rate=48_000.0)
    transport = SyntheticTransport(output)
    scheduler = ManualScheduler()
    state = AudioRuntimeState()
    trail = []
    state.observe(lambda s: trail.append(s.status.value))

    spatial = SpatialEffect(batch=1, sample_rate=48_000.0)
    graph = AudioEffectGraph(spatial)
    controller = AudioRuntimeController(
        transport=transport,
        pipeline_factory=lambda: StreamPipeline(transport, graph.process),
        effect_graph=graph,
        state=state,
        scheduler=scheduler,
    )
    coordinator = DeviceProfileRuntimeCoordinator(
        profiles, hrir, eq, controller, spatial
    )
    OutputDeviceDiscoveryCoordinator(transport, profiles).launch()

    neutral = next((p for p in hrir.presets() if "Neutral" in p.display_name),
                   None)
    if neutral is not None:
        profiles.set_hrir_preset_id(output.uid, neutral.id)
    eq_applied = None
    if args.eq_preset:
        match = next((p for p in eq.presets()
                      if args.eq_preset.lower() in p.display_name.lower()),
                     None)
        if match is not None:
            profiles.set_equalizer_preset_id(output.uid, match.id)
            eq_applied = match.display_name
        else:
            print(f"warning: no bundled EQ preset matches "
                  f"{args.eq_preset!r}; running without EQ", file=sys.stderr)

    coordinator.launch()
    block = 512
    total_blocks = int(args.seconds * 48_000 / block)
    peak = 0.0
    for i in range(total_blocks):
        out = transport.pump(block)
        if out is not None:
            peak = max(peak, float(np.max(np.abs(out))))
        scheduler.advance(block / 48_000.0)

    presentation = present_status(state)
    print(json.dumps({
        "status": state.status.value,
        "title": presentation.title,
        "severity": presentation.severity,
        "health": list(presentation.health_lines),
        "status_trail": trail[-12:],
        "frames_pumped": transport.frames_pumped,
        "spatial_ready": spatial.is_ready,
        "equalizer_preset": eq_applied,
        "output_peak": round(peak, 4),
    }, indent=2))
    return 0


def build_serve_pool(args):
    """Resolve serve-CLI args into a prewarmed StreamPool (tested
    directly; cmd_serve wraps it in the accept loop)."""
    import jax

    from airwave_tpu.assets import channel_maps as cm
    from airwave_tpu.graph.renderer import prepare_renderer
    from airwave_tpu.io import wav as wav_io
    from airwave_tpu.runtime.stream_pool import StreamPool

    layout = {"stereo": cm.STEREO, "7.1": cm.SURROUND_7_1,
              "7.1.4": cm.ATMOS_7_1_4}[args.layout]
    blocks_per_step = getattr(args, "blocks_per_step", 1) or 1
    profile_specs = getattr(args, "profile", None) or []
    if profile_specs and (args.hrir or args.eq):
        raise SystemExit("pass either --hrir/--eq or --profile, not both")
    if not profile_specs and not args.hrir:
        raise SystemExit("one of --hrir or --profile is required")
    profiles = None
    if profile_specs:
        from airwave_tpu.runtime.stream_pool import PoolProfile

        parsed = []
        for spec in profile_specs:
            hrir_path, _, eq_path = spec.partition(":")
            parsed.append((hrir_path, eq_path or None))
        # One load + one preparation per UNIQUE HRIR path (several tenants
        # commonly share a bank and differ only in EQ).
        banks = {h: wav_io.load(h) for h, _ in parsed}
        rend_by_path = {
            h: prepare_renderer(bank, layout, args.sample_rate,
                                lookahead=blocks_per_step)
            for h, bank in banks.items()
        }
        # Differing HRIR lengths need no alignment: each profile group
        # carries its own delay line (runtime/stream_pool, tuple design),
        # so a short bank pays only its own partitions.
        profiles = [
            PoolProfile(rend_by_path[h], _load_equalizer(eq_path))
            for h, eq_path in parsed
        ]
        renderer = None
    else:
        hrir = wav_io.load(args.hrir)
        renderer = prepare_renderer(hrir, layout, args.sample_rate,
                                    lookahead=blocks_per_step)
    mesh = None
    if args.mesh_devices:
        from jax.sharding import Mesh
        import numpy as _np

        devices = jax.devices()[: args.mesh_devices]
        if len(devices) < args.mesh_devices:
            raise SystemExit(
                f"--mesh-devices {args.mesh_devices}: only "
                f"{len(devices)} devices visible"
            )
        if args.max_streams % args.mesh_devices:
            raise SystemExit(
                f"--max-streams {args.max_streams} must divide by "
                f"--mesh-devices {args.mesh_devices}"
            )
        mesh = Mesh(_np.array(devices), ("streams",))
    pool = StreamPool(
        max_streams=args.max_streams,
        sample_rate=args.sample_rate,
        renderer=renderer,
        eq_definition=(None if profiles else _load_equalizer(args.eq)),
        mesh=mesh,
        blocks_per_step=blocks_per_step,
        profiles=profiles,
    )
    # Compile every bucket shape before accepting traffic — INCLUDING
    # the crossfaded hot-swap rounds: RenderServer.set_renderer
    # crossfades by default, and a live server's first fade round must
    # not jit-compile mid-traffic under the serving lock.
    pool.prewarm(include_hotswap=True)
    return pool, layout


def restore_serve_checkpoint(ckpt: Optional[str], pool):
    """Restore a serve checkpoint into `pool`; returns
    (resumed: bool, orphan_tokens: dict | None,
    orphan_aliases: dict | None — old lane id -> new, set after a resize).

    An incompatible checkpoint (different pool shape/profile layout, or a
    pre-upgrade snapshot format) must not crash-loop the server:
    restart-resume degrades to a fresh start, and the unreadable file is
    moved aside to `<path>.incompatible` (never silently overwritten) so
    its lanes' audio state can be inspected or restored by a matching
    build.

    A checkpoint written at a DIFFERENT --max-streams resizes on load
    (e.g. the operator re-sized the fleet to plan_capacity's
    recommendation and restarted): attached lanes keep their exact DSP
    history, compacted into the new lane space, and their resume tokens
    are remapped so reconnecting clients reclaim the same audio state
    under the new lane ids (the ack they hold names the OLD lane — the
    server translates old-id resumes for the grace window)."""
    if not ckpt:
        return False, None, None
    from airwave_tpu.utils.checkpoint import (checkpoint_path,
                                              load_pool_snapshot,
                                              snapshot_lane_count)

    if not os.path.exists(checkpoint_path(ckpt)):
        return False, None, None
    try:
        written_lanes = snapshot_lane_count(ckpt)
        if written_lanes != pool.max_streams:
            snap = load_pool_snapshot(ckpt, pool, lanes=written_lanes)
            lane_map = pool.restore(snap, resize=True) or {}
            tokens = snap.get("resume_tokens", {}) or {}
            snap["resume_tokens"] = {
                lane_map[s]: tok for s, tok in tokens.items()
                if s in lane_map
            }
            # Clients reclaim with the lane id the server ACKED BEFORE
            # the restart (the old id): alias old->new for resume lookups.
            snap["resume_aliases"] = {
                int(s_old): int(s_new) for s_old, s_new in lane_map.items()
            }
            print(json.dumps({
                "checkpoint_resized": {
                    "from_max_streams": written_lanes,
                    "to_max_streams": pool.max_streams,
                    "lanes_kept": len(lane_map),
                },
            }), flush=True)
        else:
            snap = load_pool_snapshot(ckpt, pool)
            pool.restore(snap)
    except (ValueError, KeyError) as exc:
        aside = checkpoint_path(ckpt) + ".incompatible"
        os.replace(checkpoint_path(ckpt), aside)
        print(json.dumps({"checkpoint_incompatible": str(exc),
                          "moved_to": aside}), flush=True)
        return False, None, None
    # Always a dict when restored: even a token-less checkpoint's
    # restored lanes are dead connections that must grace-expire.
    return (True, snap.get("resume_tokens", {}) or {},
            snap.get("resume_aliases") or None)


def cmd_serve(args) -> int:
    import jax

    from airwave_tpu.shell.serve import RenderServer

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    pool, layout = build_serve_pool(args)
    ckpt = getattr(args, "checkpoint", None)
    resumed, orphan_tokens, orphan_aliases = restore_serve_checkpoint(
        ckpt, pool)
    server = RenderServer(pool, host=args.host, port=args.port,
                          resume_grace=getattr(args, "resume_grace", 30.0),
                          orphan_tokens=orphan_tokens,
                          orphan_aliases=orphan_aliases,
                          io_mode=getattr(args, "io_mode", "selector"))
    server.start()
    print(json.dumps({"listening": list(server.address),
                      "max_streams": args.max_streams,
                      "layout": layout.name,
                      "mesh_devices": args.mesh_devices or 1,
                      "blocks_per_step": pool.blocks_per_step,
                      "profile_groups": pool.groups,
                      "restored_checkpoint": resumed,
                      "resumable_lanes": len(server._orphans)}), flush=True)
    interval = getattr(args, "stats_interval", 0.0) or 0.0
    next_stats = time.monotonic() + interval if interval > 0 else None
    ckpt_interval = getattr(args, "checkpoint_interval", 30.0) or 0.0
    next_ckpt = (time.monotonic() + ckpt_interval
                 if ckpt and ckpt_interval > 0 else None)
    poll = min(1.0, interval) if interval > 0 else 1.0
    try:
        while True:
            time.sleep(poll)
            now = time.monotonic()
            if next_stats is not None and now >= next_stats:
                print(json.dumps({"stats": server.stats()}), flush=True)
                next_stats = now + interval
            if next_ckpt is not None and now >= next_ckpt:
                server.save_checkpoint(ckpt)
                next_ckpt = now + ckpt_interval
    except KeyboardInterrupt:
        if ckpt:
            server.save_checkpoint(ckpt)
        server.stop()
    return 0


def cmd_client(args) -> int:
    """Stream a WAV through a running RenderServer and write the result.

    The ops-side counterpart of `serve`: smoke-checks a deployment end to
    end (socket -> rings -> device -> socket) without any JAX in this
    process. Exit 1 if the server truncated the stream (its EOF frame is
    the completion guarantee, shell/serve.py)."""
    from airwave_tpu.io import wav as wav_io
    from airwave_tpu.shell.wire_client import render_via_server

    data = wav_io.load(args.input)
    audio = data.audio.astype(np.float32)
    error = None
    try:
        out = render_via_server((args.host, args.port), audio,
                                chunk=args.chunk, group=args.group)
    except OSError as err:
        # The smoke check's contract is a JSON report + exit 1 on
        # truncation — a mid-stream server death is exactly that, not a
        # traceback.
        out = np.zeros((2, 0), np.float32)
        error = f"{type(err).__name__}: {err}"
    truncated = out.shape[1] < audio.shape[1]
    if out.shape[1]:
        wav_io.save(args.output, out, data.sample_rate)
    result = {
        "input_frames": int(audio.shape[1]),
        "rendered_frames": int(out.shape[1]),
        "sample_rate": data.sample_rate,
        "channels_in": int(audio.shape[0]),
        "group": args.group,
        "truncated": truncated,
        "output": args.output if out.shape[1] else None,
    }
    if error is not None:
        result["error"] = error
    print(json.dumps(result))
    return 1 if truncated else 0


def cmd_status(args) -> int:
    import jax

    from airwave_tpu.native import native_available

    if args.cpu:
        # In-process pin: on this class of environment a force-registered
        # remote TPU platform ignores JAX_PLATFORMS, and the quickest
        # diagnostic command must not hang on a flapping tunnel.
        jax.config.update("jax_platforms", "cpu")

    print(json.dumps({
        "package": "airwave_tpu",
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "native_assembler": native_available(),
        "data_dir": args.data_dir,
    }, indent=2))
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="airwave_tpu",
        description="TPU-native spatial-audio rendering framework",
    )
    parser.add_argument("--data-dir", default=_default_data_dir())
    sub = parser.add_subparsers(dest="command", required=True)

    render = sub.add_parser("render", help="offline binaural bake")
    render.add_argument("--input", action="append", required=True)
    render.add_argument("--output-dir", required=True)
    render.add_argument("--hrir", required=True, help="HRIR WAV path")
    render.add_argument("--eq", help="EqualizerAPO preset path")
    render.add_argument("--block-size", type=int, default=512)
    render.add_argument("--cpu", action="store_true")
    render.add_argument("--throughput", action="store_true",
                        help="device-resident lookahead bake (fastest for "
                             "long renders; EQ applies from sample 0 with "
                             "no 20 ms activation ramp)")
    render.set_defaults(fn=cmd_render)

    presets = sub.add_parser("presets", help="manage preset libraries")
    presets_sub = presets.add_subparsers(dest="presets_command", required=True)
    presets_sub.add_parser("seed")
    presets_sub.add_parser("list")
    imp = presets_sub.add_parser("import")
    imp.add_argument("files", nargs="+")
    presets.set_defaults(fn=cmd_presets)

    demo = sub.add_parser("demo", help="run the full runtime on a synthetic "
                                       "transport")
    demo.add_argument("--seconds", type=float, default=1.0)
    demo.add_argument("--eq-preset", help="bundled EQ preset name substring")
    demo.add_argument("--cpu", action="store_true")
    demo.set_defaults(fn=cmd_demo)

    serve = sub.add_parser("serve", help="TCP streaming render server")
    serve.add_argument("--hrir", help="HRIR WAV (single-profile pool)")
    serve.add_argument("--eq")
    serve.add_argument("--profile", action="append",
                       help="HRIR.wav[:EQ.txt] — repeat for a grouped "
                            "multi-tenant pool (per-group HRIR + EQ, one "
                            "shared device step; clients pick a group via "
                            'the {"group": G} header field). Mutually '
                            "exclusive with --hrir/--eq.")
    serve.add_argument("--host", default="127.0.0.1")
    serve.add_argument("--port", type=int, default=7711)
    serve.add_argument("--sample-rate", type=float, default=48_000.0)
    serve.add_argument("--layout", choices=["stereo", "7.1", "7.1.4"],
                       default="stereo")
    serve.add_argument("--max-streams", type=int, default=64)
    serve.add_argument("--mesh-devices", type=int, default=0,
                       help="shard the pool's lane state over this many "
                            "local devices (1-D streams mesh; 0 = single "
                            "device)")
    serve.add_argument("--blocks-per-step", type=int, default=1,
                       help="throughput tier: render M blocks per lane per "
                            "round on the paged lookahead path (~1.3x "
                            "aggregate at M=8, +up to M blocks of latency; "
                            "1 = the zero-added-latency default)")
    serve.add_argument("--checkpoint",
                       help="serving checkpoint path: saved every "
                            "--checkpoint-interval seconds (and on "
                            "Ctrl-C); if the file exists at startup the "
                            "pool restores from it and restored lanes "
                            "become resumable for --resume-grace seconds "
                            '(clients reconnect with {"resume": LANE})')
    serve.add_argument("--checkpoint-interval", type=float, default=30.0)
    serve.add_argument("--resume-grace", type=float, default=30.0,
                       help="seconds a restored lane stays claimable "
                            "before it is detached")
    serve.add_argument("--io-mode", choices=["selector", "thread"],
                       default="selector",
                       help="data plane: 'selector' (one epoll IO thread, "
                            "the O(1000)-connection path, default) or "
                            "'thread' (thread-per-connection)")
    serve.add_argument("--stats-interval", type=float, default=0.0,
                       help="seconds between JSON stats lines on stdout "
                            "(0 = off): server counters + pool occupancy/"
                            "rounds/errors")
    serve.add_argument("--cpu", action="store_true")
    serve.set_defaults(fn=cmd_serve)

    client = sub.add_parser("client",
                            help="stream a WAV through a running render "
                                 "server (deployment smoke check)")
    client.add_argument("--input", required=True, help="input WAV path")
    client.add_argument("--output", required=True, help="rendered WAV path")
    client.add_argument("--host", default="127.0.0.1")
    client.add_argument("--port", type=int, default=7711)
    client.add_argument("--group", type=int, default=0,
                        help="profile group on a grouped pool")
    client.add_argument("--chunk", type=int, default=1024,
                        help="frames per wire message")
    client.set_defaults(fn=cmd_client)

    status = sub.add_parser("status")
    status.add_argument("--cpu", action="store_true")
    status.set_defaults(fn=cmd_status)
    return parser


def install_cli_signal_handlers() -> None:
    """Process-entry signal setup: die quietly on SIGPIPE like a unix tool
    when piped into head etc. Called by __main__ ONLY — flipping the
    process-wide disposition from a library call would make every socket
    peer-close fatal to the EMBEDDING process (a test embedding main()
    died of SIGPIPE three tests later)."""
    import signal

    try:
        signal.signal(signal.SIGPIPE, signal.SIG_DFL)
    except (AttributeError, ValueError):
        pass


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


def cli(argv: Optional[List[str]] = None) -> int:
    """Process entry point (console script + python -m): installs the
    unix-tool signal handlers for the SHORT-LIVED subcommands, then
    dispatches. Long-running subcommands (serve, demo) keep Python's
    default SIGPIPE=ignore: with SIG_DFL a client disconnecting while the
    server is mid-sendall would SIGPIPE-kill the whole serving process
    instead of raising the per-connection BrokenPipeError it handles."""
    args = build_parser().parse_args(argv)
    if args.command not in ("serve", "demo"):
        install_cli_signal_handlers()
    return args.fn(args)
