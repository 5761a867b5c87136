"""Online transcription server:
`python serve.py <config.yaml> [--host H] [--port P]`.

Framework addition — the reference has no serving layer (its inference
surface is the one-file-at-a-time CLI, `/root/reference/inference.py`).
This entry point loads the checkpoint named by the config's `inference:`
section, wraps it in the micro-batching `ServingEngine` (one compiled
executable per batch bucket, all buckets warmed before the socket opens),
and serves `adt_str_tpu.serving.http`'s endpoints:

- `GET  /healthz`        readiness
- `GET  /stats`          micro-batching counters
- `POST /v1/transcribe`  audio body (WAV/FLAC/raw f32 PCM) -> notes JSON/MIDI

With more than one visible device the engine decodes data-parallel over the
mesh's data axis; bucket sizes are validated against the mesh shape.
"""

import argparse
import signal
import sys

from adt_str_tpu.utils.misc import pin_jax_platform_from_env

pin_jax_platform_from_env()

from adt_str_tpu.config import FrameworkConfig
from adt_str_tpu.serving.engine import ServingEngine
from adt_str_tpu.serving.http import make_server
from adt_str_tpu.training.checkpoint import load_params_from_reference_checkpoint


def main() -> None:
    parser = argparse.ArgumentParser(
        description="ADT transcription server. Every knob below defaults to "
        "the config's `serving:` section (config.ServingConfig); flags "
        "override YAML."
    )
    parser.add_argument("config_path", type=str)
    parser.add_argument("--host", type=str, default=None)
    parser.add_argument("--port", type=int, default=None)
    parser.add_argument(
        "--buckets", type=int, nargs="+", default=None,
        help="batch buckets (sorted); one decode executable is compiled per "
        "bucket and requests are padded up to the smallest that fits",
    )
    parser.add_argument(
        "--max-wait-ms", type=float, default=None,
        help="after the first queued request, wait at most this long for "
        "stragglers to grow the batch (0 = pure low-latency)",
    )
    parser.add_argument(
        "--max-length", type=int, default=None,
        help="decode token budget (default: config inference.max_length)",
    )
    parser.add_argument(
        "--beam", action="store_true", default=None, dest="use_beam",
        help="beam-search decoding (serving.beam_size wide) instead of greedy",
    )
    parser.add_argument(
        "--no-precompile", action="store_true",
        help="skip warming the bucket executables at startup (first request "
        "per bucket then pays the compile)",
    )
    parser.add_argument("--verbose", action="store_true",
                        help="log each HTTP request to stderr")
    args = parser.parse_args()

    cfg = FrameworkConfig.from_yaml(args.config_path)
    if cfg.inference is None or not cfg.inference.checkpoint_path:
        raise SystemExit(
            "config needs an `inference:` section with `checkpoint_path` set"
        )
    print(f"Loading checkpoint: {cfg.inference.checkpoint_path}")
    params = load_params_from_reference_checkpoint(cfg.inference.checkpoint_path)

    import jax

    mesh = None
    if len(jax.devices()) > 1:
        from adt_str_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(n_data=len(jax.devices()), n_model=1)
        print(f"Serving data-parallel over {len(jax.devices())} devices")

    engine = ServingEngine.from_config(
        params,
        cfg,
        mesh=mesh,
        max_length=args.max_length,
        buckets=tuple(args.buckets) if args.buckets else None,
        max_wait_ms=args.max_wait_ms,
        use_beam=args.use_beam,
    )
    if cfg.serving.precompile and not args.no_precompile:
        print(f"Precompiling {len(engine.buckets)} bucket executables "
              f"({'beam' if engine.use_beam else 'greedy'})...")
        dt = engine.precompile()
        print(f"Precompile done in {dt:.1f}s")

    host = args.host if args.host is not None else cfg.serving.host
    port = args.port if args.port is not None else cfg.serving.port
    server = make_server(engine, host, port, quiet=not args.verbose)

    def _shutdown(signum, frame):
        print(f"signal {signum}: draining and shutting down", file=sys.stderr)
        # shutdown() blocks until serve_forever() exits, and the handler runs
        # ON the serve_forever thread — call it from a helper thread or the
        # two deadlock waiting on each other. engine.close() (in the finally)
        # then drains the queue so every accepted request still gets answered.
        import threading

        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _shutdown)
    signal.signal(signal.SIGINT, _shutdown)

    host, port = server.server_address[:2]
    print(f"Serving on http://{host}:{port} (POST /v1/transcribe)")
    try:
        server.serve_forever()
    finally:
        engine.close()
        server.server_close()


if __name__ == "__main__":
    main()
