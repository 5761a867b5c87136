"""Decode throughput on real TPU: greedy + beam, flagship model.

Refreshes the round-1 decode figure with the current sharded KV-cache path
(VERDICT r2 missing #4 — the decode path changed in round 2: mesh
data-parallel eval, bucket trims). Measures items/s excluding compile, at
batch 16 and 64, greedy (the metric path, `use_beam_search: false` in both
reference eval configs) and beam-5 (ENSTinference.yaml schema default).

The loop being replaced: the reference re-runs the FULL decoder prefix per
generated token with no KV cache (`/root/reference/model.py:260-324`), one
python beam dict per batch item (`:326-500`).

Writes tools/decode_bench.json and prints it.
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
    ap.add_argument("--max-length", type=int, default=256)
    ap.add_argument("--beam-size", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--out", default=str(Path(__file__).parent / "decode_bench.json"))
    args = ap.parse_args()

    import jax

    from adt_str_tpu.utils.misc import (
        enable_persistent_compilation_cache,
        pin_jax_platform_from_env,
    )

    pin_jax_platform_from_env()
    enable_persistent_compilation_cache()
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from adt_str_tpu.models import adt
    from adt_str_tpu.models.decode import beam_search_decode, greedy_decode

    cfg = _flagship_config()
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    results: dict = {
        "max_length": args.max_length,
        "beam_size": args.beam_size,
        "device": str(jax.devices()[0]),
    }

    for bs in (16, 64):
        wave = jnp.asarray(
            (rng.normal(size=(bs, cfg.chunk_samples)) * 0.2).astype(np.float32)
        )
        for mode in ("greedy", "beam"):
            def run():
                if mode == "greedy":
                    out = greedy_decode(
                        params, wave, cfg, max_length=args.max_length
                    )
                else:
                    out = beam_search_decode(
                        params, wave, cfg, beam_size=args.beam_size,
                        max_length=args.max_length,
                    )
                # cheap device-side sync: a full token-matrix D2H here would
                # bill the flaky tunnel (up to ~15% at bs64) to decode time
                jax.block_until_ready(out)
                return out

            np.asarray(run())  # compile + warm + drain the dispatch queue
            t0 = time.perf_counter()
            for _ in range(args.repeats):
                out = run()
            dt = (time.perf_counter() - t0) / args.repeats
            out = np.asarray(out)  # transfer once, outside the timer
            assert out.shape[0] == bs
            results[f"{mode}_bs{bs}_items_per_s"] = round(bs / dt, 2)
            results[f"{mode}_bs{bs}_s_per_batch"] = round(dt, 4)
            print(f"{mode:6s} bs{bs:3d}: {bs/dt:8.1f} items/s ({dt*1e3:.1f} ms/batch)")

    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
