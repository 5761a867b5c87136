"""Serving latency on real TPU: single-chunk p50/p99 + whole-song realtime factor.

Throughput (tools/bench_decode.py) is the eval-harness figure; SERVING cares
about latency — how long one 2.56 s chunk takes end-to-end (mel -> encoder ->
greedy KV-cache decode -> tokens on host), and how fast a whole song
transcribes through the batched-chunk path `inference.py` uses (all chunks of
the file decoded as batches, `inference.py:96-120`). The reference has no
serving numbers and its decode re-runs the full decoder prefix per token
(`/root/reference/model.py:260-324`).

Methodology notes (same as every bench in tools/): distinct pre-staged inputs
per repeat (byte-identical dispatches are elided somewhere in the axon
tunnel) and the timed region ends at a host transfer of the result, because a
server must fetch tokens to respond.

Writes tools/latency_bench.json and prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-length", type=int, default=512)
    ap.add_argument("--repeats", type=int, default=50, help="bs1 latency samples")
    ap.add_argument("--song-sec", type=float, default=180.0)
    ap.add_argument("--song-batch", type=int, default=64)
    ap.add_argument("--checkpoint", default=None, help="trained params (early exit live)")
    ap.add_argument("--bank", default=None, help="one-shot bank prefix for in-distribution audio")
    ap.add_argument("--out", default=str(Path(__file__).parent / "latency_bench.json"))
    args = ap.parse_args()

    from adt_str_tpu.utils.misc import (
        enable_persistent_compilation_cache,
        pin_jax_platform_from_env,
    )

    pin_jax_platform_from_env()
    enable_persistent_compilation_cache()
    import jax

    from adt_str_tpu.models.decode import greedy_decode
    from tools._bench_common import WARM_SEED, load_flagship

    cfg, params, make_waves = load_flagship(args.checkpoint, args.bank)

    results: dict = {
        "max_length": args.max_length,
        "params": args.checkpoint or "random",
        "audio": "bank-rendered" if args.bank else "noise",
        "device": str(jax.devices()[0]),
    }

    def run(wave):
        out = greedy_decode(params, wave, cfg, max_length=args.max_length)
        return np.asarray(out)  # host transfer IS part of serving latency

    # --- single-chunk latency (bs 1): the interactive-serving figure ---
    # the warm input is a THROWAWAY (never re-dispatched in the timed loop:
    # byte-identical dispatches can be elided in the axon tunnel, which
    # would count a no-op as a latency sample)
    waves1 = [make_waves(1, s) for s in range(args.repeats)]
    warm1 = make_waves(1, WARM_SEED)
    t_c0 = time.perf_counter()
    run(warm1)  # compile + warm
    compile_s = time.perf_counter() - t_c0
    lats = []
    for w in waves1:
        t0 = time.perf_counter()
        run(w)
        lats.append(time.perf_counter() - t0)
    lats_ms = np.sort(np.asarray(lats) * 1e3)
    results["bs1_p50_ms"] = round(float(np.percentile(lats_ms, 50)), 2)
    results["bs1_p90_ms"] = round(float(np.percentile(lats_ms, 90)), 2)
    results["bs1_p99_ms"] = round(float(np.percentile(lats_ms, 99)), 2)
    results["bs1_compile_s"] = round(compile_s, 1)
    print(
        f"bs1 latency: p50 {results['bs1_p50_ms']} ms, p90 "
        f"{results['bs1_p90_ms']} ms, p99 {results['bs1_p99_ms']} ms "
        f"(first-call compile {compile_s:.1f} s)"
    )

    # --- whole-song path: all chunks batched, like inference.py ---
    n_chunks = int(np.ceil(args.song_sec / cfg.input_sec))
    bs = args.song_batch
    n_batches = -(-n_chunks // bs)
    batches = [make_waves(bs, 100 + i) for i in range(n_batches)]
    run(make_waves(bs, WARM_SEED))  # warm the song batch shape (throwaway)
    t0 = time.perf_counter()
    for b in batches:
        run(b)
    wall = time.perf_counter() - t0
    results["song_sec"] = args.song_sec
    results["song_chunks"] = n_chunks
    results["song_batch"] = bs
    results["song_wall_s"] = round(wall, 3)
    results["song_realtime_factor"] = round(args.song_sec / wall, 1)
    print(
        f"{args.song_sec:.0f}s song ({n_chunks} chunks, bs {bs}): "
        f"{wall:.2f} s -> {args.song_sec / wall:.0f}x realtime"
    )

    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
