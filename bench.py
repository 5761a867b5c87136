"""Benchmark: flagship training-step throughput on real TPU hardware.

Measures end-to-end jitted train-step time (forward bf16 + fp32 loss +
backward + AdamW update) on the setting-1 flagship model (d_model=768, 4+4
layers, vocab 1400, batch 64 of 2.56 s @ 24 kHz audio —
configs/train/setting-1.yaml parity) on the available chip(s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` is measured steps/sec divided by REF_STEPS_PER_SEC, an estimate
of the PyTorch reference's setting-1 throughput. The reference publishes no
speed numbers (SURVEY.md §6); its pipeline is CPU-synthesis-bound by
construction (per-note h5py open + pedalboard FX on dataloader workers,
SURVEY.md §3.1), which bounds it to ~1 step/s at batch 64 with 16 workers.
"""

from __future__ import annotations

import json
import time

import numpy as np

REF_STEPS_PER_SEC = 1.0  # estimated reference throughput (see module docstring)
BATCH_SIZE = 64
MAX_TOKENS = 256
WARMUP_STEPS = 3
MEASURE_STEPS = 20


def main() -> None:
    import jax

    # XLA's hardware RngBitGenerator for dropout masks: threefry mask
    # generation otherwise costs ~73 ms of a ~140 ms step (measured on v5e)
    jax.config.update("jax_default_prng_impl", "rbg")

    from __graft_entry__ import _flagship_config, _make_batch
    from adt_str_tpu.config import TrainingConfig
    from adt_str_tpu.models import adt
    from adt_str_tpu.parallel import mesh as mesh_lib
    from adt_str_tpu.parallel.train_step import init_train_state, make_train_step
    from adt_str_tpu.training.optimizer import make_optimizer

    cfg = _flagship_config()
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(
        TrainingConfig(learning_rate=1e-4, warmup_ratio=0.1),
        total_steps=10_000,
        params=params,
    )

    n_dev = len(jax.devices())
    batch = _make_batch(cfg, batch_size=BATCH_SIZE, max_tokens=MAX_TOKENS)
    if n_dev > 1:
        mesh = mesh_lib.make_mesh(n_data=n_dev, n_model=1)
        params = mesh_lib.shard_params(mesh, params)
        batch = mesh_lib.shard_batch(mesh, batch)

    step = make_train_step(cfg, tx)
    state = init_train_state(params, tx)

    rngs = [jax.random.PRNGKey(i) for i in range(WARMUP_STEPS + MEASURE_STEPS)]
    for i in range(WARMUP_STEPS):
        state, metrics = step(state, batch, rngs[i])
    # force a host transfer: block_until_ready alone does not reliably drain
    # the axon-tunnel dispatch queue
    float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        state, metrics = step(state, batch, rngs[WARMUP_STEPS + i])
    final_loss = float(metrics["loss"])  # depends on the whole step chain
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    steps_per_sec = MEASURE_STEPS / dt
    print(
        json.dumps(
            {
                "metric": "train_steps_per_sec_bs64",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / REF_STEPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
