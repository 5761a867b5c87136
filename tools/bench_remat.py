"""Measure what `model.remat` buys on the real chip: peak HBM and steps/s
for the flagship train step with and without per-layer rematerialization,
plus a scaled-up model config that shows the enabled headroom.

The reference never enables torch's gradient_checkpointing (no call sites);
remat is a TPU-framework addition (ModelConfig.remat) for training larger
models / batches inside v5e's 16 GiB HBM.

Writes tools/remat_bench.json and prints it.
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


def _peak_mb() -> float:
    import jax

    stats = jax.devices()[0].memory_stats() or {}
    return round(stats.get("peak_bytes_in_use", 0) / 2**20, 1)


def _measure(cfg, batch_size, max_tokens, steps=10):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch
    from adt_str_tpu.config import TrainingConfig
    from adt_str_tpu.models import adt
    from adt_str_tpu.parallel.train_step import init_train_state, make_train_step
    from adt_str_tpu.training.optimizer import make_optimizer

    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(
        TrainingConfig(learning_rate=1e-4, warmup_ratio=0.1),
        total_steps=1000, params=params,
    )
    step = make_train_step(cfg, tx)
    state = init_train_state(params, tx)
    batch = _make_batch(cfg, batch_size=batch_size, max_tokens=max_tokens)
    rngs = [jax.random.PRNGKey(i) for i in range(steps + 2)]
    try:
        for i in range(2):
            state, metrics = step(state, batch, rngs[i])
        float(metrics["loss"])
        t0 = time.perf_counter()
        for i in range(steps):
            state, metrics = step(state, batch, rngs[2 + i])
        final = float(metrics["loss"])
        dt = (time.perf_counter() - t0) / steps
        assert np.isfinite(final)
        return {"ms_per_step": round(dt * 1e3, 2), "peak_hbm_mb": _peak_mb()}
    except Exception as e:  # noqa: BLE001 - OOM is an expected, reported outcome
        msg = str(e)
        return {"error": ("OOM" if "RESOURCE_EXHAUSTED" in msg or "memory" in msg.lower() else msg[:200])}


def _cases():
    from __graft_entry__ import _flagship_config

    flagship = _flagship_config()
    # a model large enough that stored activations matter at these batch
    # sizes: 2x width, 3x depth of setting-1 (d_model=1536, 12+12 layers)
    big = dataclasses.replace(flagship, enc_layers=12, dec_layers=12, d_query=256)
    return {
        "flagship_bs64": (flagship, 64, 256),
        "flagship_bs256": (flagship, 256, 256),
        "big_bs64": (big, 64, 256),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", default=str(Path(__file__).parent / "remat_bench.json"))
    # internal: run ONE case in this process. peak_bytes_in_use is a
    # process-cumulative high-water mark, so cases must not share a process —
    # the second case's "peak" would include the first's (a remat=True run
    # after a remat=False run could never report a lower peak).
    ap.add_argument("--case", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.case:
        import jax

        jax.config.update("jax_default_prng_impl", "rbg")
        from adt_str_tpu.utils.misc import enable_persistent_compilation_cache

        enable_persistent_compilation_cache()
        name, remat = args.case.rsplit(":", 1)
        base_cfg, bs, toks = _cases()[name]
        cfg = dataclasses.replace(base_cfg, remat=bool(int(remat)))
        result = _measure(cfg, bs, toks, steps=args.steps)
        result["device"] = str(jax.devices()[0])
        print("RESULT " + json.dumps(result))
        return

    # The parent must NOT touch the jax backend: on a single-TPU host the
    # parent would hold the chip and every per-case child (needed because
    # peak_bytes_in_use is process-cumulative) would fail to acquire it.
    import subprocess

    results: dict = {}
    for name in _cases():
        for remat in (False, True):
            tag = f"{name}_remat{int(remat)}"
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--steps", str(args.steps), "--case", f"{name}:{int(remat)}"],
                    capture_output=True, text=True, timeout=1800,
                )
                line = next(
                    (l for l in proc.stdout.splitlines() if l.startswith("RESULT ")),
                    None,
                )
                if line is None:
                    results[tag] = {"error": (proc.stderr or "no output")[-200:]}
                else:
                    results[tag] = json.loads(line[len("RESULT "):])
            except subprocess.TimeoutExpired:
                results[tag] = {"error": "timeout after 1800s"}
            dev = results[tag].pop("device", None)
            if dev and "device" not in results:
                results["device"] = dev
            print(tag, results[tag], flush=True)

    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
