"""Shared scaffolding for the serving benches (bench_decode, bench_latency):
flagship config + trained-or-random params + an in-distribution wave factory.

One copy so a bank-format or synth-config change cannot fix one bench and
silently skew the other — the checkpoint/bank recipe and the synth literals
(mixup 0.8, threshold 0.8, 1.28 s one-shots) were previously duplicated in
both benches.

Methodology invariants encoded here:
- `make_waves(bs, seed)` returns a DISTINCT batch per seed. Never time a
  loop of byte-identical dispatches (elided somewhere in the axon tunnel),
  and never warm with a batch that later appears inside the timed region —
  warm with `make_waves(bs, WARM_SEED)` and time only fresh seeds.
- With `--bank`, audio renders through the run's one-shot bank so a trained
  checkpoint sees in-distribution input and the EOS early exit is live
  (random params never emit EOS: every row runs to max_length — the floor).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# reserved for warm/compile calls — timed regions must use seeds below this
WARM_SEED = 1_000_000


def bench_synth_config(cfg):
    """The synth config every bench renders eval audio with (mirrors the
    validation-run bank protocol, tools/validation_train_run.py)."""
    from adt_str_tpu.config import SynthConfig

    return SynthConfig(
        sample_rate=cfg.sample_rate, input_sec=cfg.input_sec,
        mixup_range=0.8, use_fx_prob=0.0, similarity_threshold=0.8,
        max_notes=64, max_oneshot_sec=1.28,
    )


def load_flagship(checkpoint: str | None, bank: str | None):
    """-> (cfg, params, make_waves) where `make_waves(bs, seed)` is a
    (bs, chunk_samples) device array — bank-rendered when `bank` is given
    (a one-shot prefix, as synthetiser.oneshot_path), else scaled noise."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config, make_notes
    from adt_str_tpu.models import adt

    cfg = _flagship_config()
    if checkpoint:
        from adt_str_tpu.training.checkpoint import (
            load_params_from_reference_checkpoint,
        )

        params = jax.device_put(load_params_from_reference_checkpoint(checkpoint))
    else:
        params = adt.init_params(jax.random.PRNGKey(0), cfg)

    statics = synth_cfg = bank_pitches = None
    if bank:
        from adt_str_tpu.synth.bank import load_bank_hdf5
        from adt_str_tpu.synth.render import SynthStatics

        b = load_bank_hdf5(
            f"{bank}@{cfg.sample_rate}.hdf5", int(1.28 * cfg.sample_rate)
        )
        statics = SynthStatics.from_bank(b)
        synth_cfg = bench_synth_config(cfg)
        bank_pitches = [
            int(p) for p in np.nonzero(np.asarray(b.bin_count).sum(axis=1))[0]
        ]

    def make_waves(bs: int, seed: int) -> jnp.ndarray:
        if statics is None:
            r = np.random.default_rng(seed)
            return jnp.asarray(
                (r.normal(size=(bs, cfg.chunk_samples)) * 0.2).astype(np.float32)
            )
        from adt_str_tpu.synth.render import render_batch

        notes, mask = make_notes(
            np.random.default_rng(seed), bs, max_notes=64, pitches=bank_pitches,
            onset_hi=2.4, n_range=(4, 32),
        )
        # disjoint key blocks per seed (bs <= 1000 everywhere in tools/)
        keys = jax.vmap(jax.random.PRNGKey)(
            jnp.arange(bs) + np.int64(seed) * 1000 + 55_000
        )
        return render_batch(
            statics, jnp.asarray(notes), jnp.asarray(mask), keys, synth_cfg
        )

    return cfg, params, make_waves
