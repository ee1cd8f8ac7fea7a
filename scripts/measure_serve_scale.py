"""Wire-layer scale harness: N concurrent clients against a live
RenderServer, loopback CPU.

Proves (or disproves) the serving frontend at O(1000) concurrent
connections — the StreamPool is benched at 16k lanes, but lanes only
matter if the wire layer in front of them holds up. The server runs in
THIS process on a CPU pool with tiny HRIRs (the device step is deliberately
small: this measures the wire layer, not the DSP); the load generator
(shell/loadgen.py, one selector thread, realtime-paced clients) runs as a
SEPARATE process so client-side work never shares the server's GIL.

Prints per-step progress to stderr and ONE JSON result line to stdout:
loadgen metrics (admission/chunk latency percentiles, completions,
fairness) + server counters + pump round stats.

Usage:
  python scripts/measure_serve_scale.py --clients 1024 [--io-mode thread]
      [--blocks-each 30] [--speed 1.0] [--pool-streams N] [--churn K]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--clients", type=int, default=256)
    parser.add_argument("--blocks-each", type=int, default=30)
    parser.add_argument("--chunk", type=int, default=512)
    parser.add_argument("--speed", type=float, default=1.0)
    parser.add_argument("--pool-streams", type=int, default=0,
                        help="pool max_streams (default clients+8)")
    parser.add_argument("--io-mode", default="thread",
                        choices=["thread", "selector"])
    parser.add_argument("--connect-burst", type=int, default=64)
    parser.add_argument("--timeout", type=float, default=300.0)
    parser.add_argument("--batch-window", type=float, default=0.002)
    parser.add_argument("--skip-prewarm", action="store_true")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from airwave_tpu.assets import channel_maps as cm
    from airwave_tpu.graph.renderer import prepare_renderer
    from airwave_tpu.io.wav import WAVData
    from airwave_tpu.runtime.stream_pool import StreamPool
    from airwave_tpu.shell.serve import RenderServer

    block = args.chunk
    pool_streams = args.pool_streams or args.clients + 8
    rng = np.random.default_rng(7)
    audio14 = (rng.standard_normal((14, 300)) * 0.2).astype(np.float32)
    renderer = prepare_renderer(WAVData(48_000.0, audio14), cm.STEREO,
                                48_000.0, block)
    pool = StreamPool(pool_streams, 48_000.0, renderer, block_size=block)

    t0 = time.monotonic()
    if not args.skip_prewarm:
        print(f"prewarming pool ({pool_streams} lanes)...", file=sys.stderr)
        pool.prewarm()
        print(f"prewarm done in {time.monotonic() - t0:.1f}s",
              file=sys.stderr)

    kwargs = {}
    if args.io_mode != "thread":
        kwargs["io_mode"] = args.io_mode
    server = RenderServer(pool, port=0, client_timeout=args.timeout,
                          batch_window=args.batch_window, **kwargs)
    server.start()
    host, port = server.address

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [
        sys.executable, "-m", "airwave_tpu.shell.loadgen",
        "--connect", f"{host}:{port}",
        "--clients", str(args.clients),
        "--blocks-each", str(args.blocks_each),
        "--chunk", str(args.chunk),
        "--speed", str(args.speed),
        "--connect-burst", str(args.connect_burst),
        "--timeout", str(args.timeout),
    ]
    print(f"driving {args.clients} clients (io_mode={args.io_mode})...",
          file=sys.stderr)
    t1 = time.monotonic()
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                          timeout=args.timeout + 60)
    wall = time.monotonic() - t1
    if proc.returncode not in (0, 1) or not proc.stdout.strip():
        print(proc.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"loadgen failed rc={proc.returncode}")
    load = json.loads(proc.stdout.strip().splitlines()[-1])

    stats = server.stats()
    server.stop()
    result = {
        "io_mode": args.io_mode,
        "pool_streams": pool_streams,
        "load": load,
        "server": {
            "connections_served": stats["connections_served"],
            "protocol_errors": stats["protocol_errors"],
            "pump_errors": stats["pump_errors"],
            "rejected_full": stats["rejected_full"],
            "truncated_closes": stats["truncated_closes"],
            "latency": stats["latency"],
        },
        "harness_wall_s": round(wall, 3),
    }
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
