"""Benchmark: flagship end-to-end training-step throughput on real TPU.

Measures the *production* train step — on-device drum synthesis (one-shot
gathers, mixup, Pallas placement kernel, randomized FX) fused with the
Pallas log-mel frontend, bf16 transformer forward/backward, fp32 loss, and
the AdamW update — on the setting-1 flagship model (d_model=768, 4+4 layers,
vocab 1400, batch 64 of 2.56 s @ 24 kHz; configs/train/setting-1.yaml parity).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` is measured steps/sec divided by REF_STEPS_PER_SEC, the
*measured* upper bound of the PyTorch reference's setting-1 throughput
(tools/measure_reference_baseline.py, results in tools/reference_baseline.json).
The reference publishes no speed numbers (SURVEY.md §6); its pipeline is
CPU-synthesis-bound by construction (per-note h5py open + pedalboard FX on
dataloader workers, SURVEY.md §3.1). Running the reference's own SynthDrum
hot loop against a layout-exact synthetic HDF5 measures 76.8 ms/sample per
worker core (FX stubbed out — generous), i.e. with its configured 16
dataloader workers (setting-1.yaml:11) and an infinitely fast device step,
at most 16 / (64 * 0.0768) = 3.26 steps/s at batch 64.
"""

from __future__ import annotations

import json
import time

import numpy as np

REF_STEPS_PER_SEC = 3.256  # measured upper bound (see module docstring)
BATCH_SIZE = 64
MAX_TOKENS = 256
MAX_NOTES = 128
WARMUP_STEPS = 3
MEASURE_STEPS = 20
# Best-of-N timed windows: the tunnel to the TPU chip on this host degrades
# unpredictably (dispatch RPCs stall for seconds at a time); the fastest
# window measures the chip, the slower ones measure tunnel weather.
MEASURE_WINDOWS = 3


def _make_notes(rng, batch_size):
    from __graft_entry__ import make_notes

    # shared layout with the multichip dryrun; default n_range reproduces
    # this bench's historical U[3, 40) per-row note count
    return make_notes(
        rng, batch_size, max_notes=MAX_NOTES,
        pitches=[35, 36, 38, 41, 42, 46, 48], onset_hi=2.4,
    )


def main() -> None:
    import jax

    from adt_str_tpu.utils.misc import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    import jax.numpy as jnp

    # XLA's hardware RngBitGenerator for dropout masks: threefry mask
    # generation otherwise costs ~73 ms of a ~140 ms step (measured on v5e)
    jax.config.update("jax_default_prng_impl", "rbg")

    from __graft_entry__ import _flagship_config, _make_batch
    from adt_str_tpu.config import SynthConfig, TrainingConfig
    from adt_str_tpu.models import adt
    from adt_str_tpu.parallel import mesh as mesh_lib
    from adt_str_tpu.parallel.train_step import init_train_state, make_synth_train_step
    from adt_str_tpu.synth.bank import make_test_bank
    from adt_str_tpu.synth.render import SynthStatics
    from adt_str_tpu.training.optimizer import make_optimizer

    cfg = _flagship_config()
    rng = np.random.default_rng(0)
    bank = make_test_bank(
        rng, [35, 36, 38, 41, 42, 46, 48, 49],
        sample_rate=cfg.sample_rate, max_len=30720, n_per_bin=8,
    )
    statics = SynthStatics.from_bank(bank)
    synth_cfg = SynthConfig(
        sample_rate=cfg.sample_rate, input_sec=cfg.input_sec,
        mixup_range=0.8, use_fx_prob=0.3, similarity_threshold=0.8,
        max_notes=MAX_NOTES, max_oneshot_sec=1.28,
    )

    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(
        TrainingConfig(learning_rate=1e-4, warmup_ratio=0.1),
        total_steps=10_000, params=params,
    )

    n_dev = len(jax.devices())
    base = _make_batch(cfg, batch_size=BATCH_SIZE, max_tokens=MAX_TOKENS, make_wavs=False)
    notes, mask = _make_notes(rng, BATCH_SIZE)
    # production input path applies the same bucket trim (datasets.collate)
    from adt_str_tpu.data.datasets import trim_note_bucket

    trimmed = trim_note_bucket({"notes": notes, "note_mask": mask})
    batch = {
        "notes": jnp.asarray(trimmed["notes"]),
        "note_mask": jnp.asarray(trimmed["note_mask"]),
        "tokens": base["tokens"],
        "token_lengths": base["token_lengths"],
    }
    mesh = None
    if n_dev > 1:
        mesh = mesh_lib.make_mesh(n_data=n_dev, n_model=1)
        params = mesh_lib.shard_params(mesh, params)
        batch = mesh_lib.shard_batch(mesh, batch)

    step = make_synth_train_step(cfg, synth_cfg, statics, tx, mesh=mesh)
    state = init_train_state(params, tx)

    n_steps = WARMUP_STEPS + MEASURE_WINDOWS * MEASURE_STEPS
    rngs = [jax.random.PRNGKey(i) for i in range(n_steps)]
    for i in range(WARMUP_STEPS):
        state, metrics = step(state, batch, rngs[i])
    # force a host transfer: block_until_ready alone does not reliably drain
    # the axon-tunnel dispatch queue
    float(metrics["loss"])

    best_dt = float("inf")
    k = WARMUP_STEPS
    for _ in range(MEASURE_WINDOWS):
        t0 = time.perf_counter()
        for _ in range(MEASURE_STEPS):
            state, metrics = step(state, batch, rngs[k])
            k += 1
        final_loss = float(metrics["loss"])  # depends on the whole window's chain
        best_dt = min(best_dt, time.perf_counter() - t0)
        assert np.isfinite(final_loss)

    steps_per_sec = MEASURE_STEPS / best_dt
    print(
        json.dumps(
            {
                "metric": "synth_train_steps_per_sec_bs64",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / REF_STEPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
