"""Greedy-decode ablations on the real TPU chip: attribute the per-step cost.

The decode loop runs ~1.1 ms/step at flagship shapes (bs64, max_length 256)
against a ~0.5 ms modeled memory floor (weights ~78 MB + self/cross cache
reads ~300 MB per step at 819 GB/s). This tool decomposes the measured
per-step cost along three axes so future kernel work aims at the right

term:
- decoder depth (4 vs 2 layers): per-layer cost and the depth-independent
  residual (embedding + generator + loop bookkeeping),
- batch (64 vs 128): row-proportional share vs row-independent launch/weight
  share,
- buffer length (128/256/512): KV-cache-read share of a step.

Random-init params never finish all rows early (P(EOS) ~ 1/1400 per row-
step), so every run executes the full max_length-1 steps and ms/step is
well-defined. The reference decode loop being replaced re-runs the whole
prefix per token with no KV cache (/root/reference/model.py:260-324).

Writes tools/profile_decode.json and prints one line per variant.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=str(Path(__file__).parent / "profile_decode.json"))
    args = ap.parse_args()

    from adt_str_tpu.utils.misc import (
        enable_persistent_compilation_cache,
        pin_jax_platform_from_env,
    )

    pin_jax_platform_from_env()
    enable_persistent_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from adt_str_tpu.models import adt
    from adt_str_tpu.models.decode import greedy_decode

    cfg = _flagship_config()
    rng = np.random.default_rng(0)
    results: dict = {"device": str(jax.devices()[0]), "repeats": args.repeats}

    def run_variant(name, model_cfg, bs, max_length):
        params = adt.init_params(jax.random.PRNGKey(0), model_cfg)
        wave = jnp.asarray(
            (rng.normal(size=(bs, model_cfg.chunk_samples)) * 0.2).astype(np.float32)
        )

        def run():
            out = greedy_decode(params, wave, model_cfg, max_length=max_length)
            jax.block_until_ready(out)
            return out

        np.asarray(run())  # compile + drain
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            out = run()
        dt = (time.perf_counter() - t0) / args.repeats
        np.asarray(out)
        ms_step = dt * 1e3 / (max_length - 1)
        results[name] = {
            "s_per_batch": round(dt, 4),
            "ms_per_step": round(ms_step, 4),
        }
        print(f"{name:44s} {dt*1e3:8.1f} ms/batch  {ms_step:6.3f} ms/step")
        return ms_step

    base = run_variant("bs64 ml256 L4 (flagship)", cfg, 64, 256)
    l2 = run_variant("bs64 ml256 L2", dataclasses.replace(cfg, dec_layers=2), 64, 256)
    b128 = run_variant("bs128 ml256 L4", cfg, 128, 256)
    m128 = run_variant("bs64 ml128 L4", cfg, 64, 128)
    m512 = run_variant("bs64 ml512 L4", cfg, 64, 512)

    per_layer = (base - l2) / 2.0
    results["decomposition_ms_per_step"] = {
        "per_decoder_layer": round(per_layer, 4),
        "depth_independent": round(base - 4 * per_layer, 4),
        "row_proportional_at_bs64": round(b128 - base, 4),
        "cache_buffer_per_128_positions": round((m512 - m128) / 3.0, 4),
    }
    print(json.dumps(results["decomposition_ms_per_step"]))
    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")


if __name__ == "__main__":
    main()
