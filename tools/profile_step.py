"""Flagship-step timing ablations on the real TPU chip.

Times variants of the setting-1 train step to attribute the per-step cost:
synth on/off, dropout on/off, flash attention on/off, fwd-only vs fwd+bwd.
Used to direct kernel work (docs/STATUS.md roofline table).

Usage: python tools/profile_step.py [--steps 20]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, *args, steps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def _force(out):
    import jax

    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf if leaf.ndim == 0 else leaf.reshape(-1)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")

    from __graft_entry__ import _flagship_config, _make_batch
    from bench import BATCH_SIZE, MAX_TOKENS, _make_notes
    from adt_str_tpu.config import SynthConfig, TrainingConfig
    from adt_str_tpu.models import adt
    from adt_str_tpu.parallel.train_step import (
        init_train_state,
        make_eval_step,
        make_synth_train_step,
        make_train_step,
    )
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
        max_notes=128, max_oneshot_sec=1.28,
    )
    base = _make_batch(cfg, batch_size=BATCH_SIZE, max_tokens=MAX_TOKENS)
    notes, mask = _make_notes(rng, BATCH_SIZE)
    import jax.numpy as jnp

    # same input path as the production step being decomposed (bench.py
    # applies the note-bucket trim; per-note stream cost scales with PADDED
    # slot count, so timing 128 untrimmed slots would inflate the synth
    # share by ~2 ms vs the 13.8 steps/s step this tool attributes)
    from adt_str_tpu.data.datasets import trim_note_bucket

    trimmed = trim_note_bucket({"notes": notes, "note_mask": mask})
    synth_batch = {
        "notes": jnp.asarray(trimmed["notes"]),
        "note_mask": jnp.asarray(trimmed["note_mask"]),
        "tokens": base["tokens"], "token_lengths": base["token_lengths"],
    }
    wav_batch = {
        "wavs": base["wavs"], "tokens": base["tokens"],
        "token_lengths": base["token_lengths"],
    }
    key = jax.random.PRNGKey(0)
    results = {}

    def train_variant(name, model_cfg, synth=True):
        params = adt.init_params(jax.random.PRNGKey(0), model_cfg)
        tx, _ = make_optimizer(
            TrainingConfig(learning_rate=1e-4, warmup_ratio=0.1), 10_000, params
        )
        if synth:
            step = make_synth_train_step(model_cfg, synth_cfg, statics, tx)
            batch = synth_batch
        else:
            step = make_train_step(model_cfg, tx)
            batch = wav_batch

        state = init_train_state(params, tx)

        def run(state):
            s, m = step(state, batch, key)
            return s, m

        # manual loop (donated state must thread through)
        for _ in range(3):
            state, m = step(state, batch, key)
        _force(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = step(state, batch, key)
        _force(m["loss"])
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        results[name] = ms
        print(f"{name:42s} {ms:8.2f} ms/step")

    cfg_nodrop = dataclasses.replace(cfg, dropout=0.0)
    cfg_flash = dataclasses.replace(cfg, use_flash_attention=True)
    cfg_flash_nodrop = dataclasses.replace(cfg, use_flash_attention=True, dropout=0.0)

    train_variant("synth train step (flagship)", cfg)
    train_variant("model-only train step", cfg, synth=False)
    train_variant("model-only, dropout=0", cfg_nodrop, synth=False)
    train_variant("model-only, flash attn", cfg_flash, synth=False)
    train_variant("model-only, flash attn, dropout=0", cfg_flash_nodrop, synth=False)

    # eval forward (no grad)
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    estep = make_eval_step(cfg)
    ms = _time(lambda: estep(params, wav_batch), steps=args.steps)
    results["eval forward"] = ms
    print(f"{'eval forward':42s} {ms:8.2f} ms/step")


if __name__ == "__main__":
    main()
