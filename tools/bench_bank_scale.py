"""Renderer load test with a production-scale one-shot bank.

The round-1 bench used a toy bank (64 one-shots); a curated production
library is tens of thousands (README.md:5-13 curates a 1M library into
percentage bins, of which the top bins feed training). This tool builds a
synthetic bank of `--n-shots` one-shots (default 100k, ~6 GB in bf16 at
1.28 s / 24 kHz), loads it into `SynthStatics` on the TPU, and times
`render_batch_arrays` at the flagship batch size against a toy-bank control —
isolating how HBM residency + gather behavior scale with bank size.

Writes tools/bank_scale_bench.json.

Usage: python tools/bench_bank_scale.py [--n-shots 100000] [--batch-size 64]
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

PITCHES = [35, 36, 38, 40, 41, 42, 44, 46, 48, 49, 51, 57]  # common GM drums


def make_scale_bank(n_shots: int, max_len: int, sample_rate: int):
    """Synthetic OneShotBank with n_shots rows, built directly as one matrix
    (build_bank's per-row list would need ~2x host RAM at this scale)."""
    from adt_str_tpu.synth.bank import BIN_NAMES, N_BINS, OneShotBank

    rng = np.random.default_rng(0)
    per_cell = max(1, n_shots // (len(PITCHES) * N_BINS))
    waveforms = np.zeros((n_shots, max_len), dtype=np.float32)
    lengths = np.zeros((n_shots,), dtype=np.int32)
    bin_offset = np.zeros((128, N_BINS), dtype=np.int32)
    bin_count = np.zeros((128, N_BINS), dtype=np.int32)

    # cheap per-row synthesis: enveloped noise, varied length
    t = np.arange(max_len, dtype=np.float32) / sample_rate
    row = 0
    for pitch in sorted(PITCHES):
        for b in range(N_BINS):
            bin_offset[pitch, b] = row
            take = min(per_cell, n_shots - row)
            bin_count[pitch, b] = take
            for _ in range(take):
                n = int(rng.integers(max_len // 4, max_len))
                decay = np.exp(-t[:n] * rng.uniform(5, 30))
                waveforms[row, :n] = decay * rng.normal(0, 0.3, n).astype(np.float32)
                lengths[row] = n
                row += 1
    waveforms = waveforms[:row]
    lengths = lengths[:row]
    return OneShotBank(waveforms, lengths, bin_offset, bin_count, max_len)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-shots", type=int, default=100_000)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")

    from adt_str_tpu.synth.bank import make_test_bank
    from adt_str_tpu.synth.render import SynthStatics, render_batch_arrays

    sample_rate, input_sec = 24_000, 2.56
    chunk = int(input_sec * sample_rate)  # 61440
    max_len = 30_720  # 1.28 s one-shots
    B, max_notes = args.batch_size, 128
    rng = np.random.default_rng(1)

    notes = np.zeros((B, max_notes, 4), np.float32)
    mask = np.zeros((B, max_notes), bool)
    for i in range(B):
        n = int(rng.integers(16, max_notes))
        onsets = np.sort(rng.uniform(0, input_sec - 0.1, n))
        notes[i, :n] = np.stack(
            [onsets, onsets + 0.1, rng.choice(PITCHES, n), rng.integers(20, 127, n)],
            axis=1,
        )
        mask[i, :n] = True
    notes_j, mask_j = jnp.asarray(notes), jnp.asarray(mask)

    def time_bank(name, bank):
        statics = SynthStatics.from_bank(bank)
        jax.block_until_ready(statics.waveforms)
        bank_bytes = statics.waveforms.size * statics.waveforms.dtype.itemsize

        # statics rides as a jit argument (closed-over arrays would be baked
        # into the HLO as multi-GB literals; see make_synth_train_step);
        # per-item keys are derived inside the jit (eager vmap(PRNGKey) costs
        # 64 device roundtrips per step and dominated the toy timing)
        @jax.jit
        def step(statics, s):
            keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B) + s * B)
            return render_batch_arrays(
                statics, notes_j, mask_j, keys, chunk, sample_rate,
                mixup_range=0.8, use_fx_prob=0.3, n_allowed=11, adtof=False,
            )

        # step indices pre-staged on device: an eager jnp.int32(s+1) inside
        # the timed loop is a fresh H2D over the flaky tunnel per iteration.
        # Best-of-3 windows for the same reason as bench.py (the recorded
        # round-2 JSON had the tiny control bank 3x SLOWER than the 156x
        # bigger bank — pure tunnel weather).
        steps_dev = [jnp.int32(s) for s in range(args.steps * 3 + 1)]
        out = step(statics, steps_dev[0])
        jax.block_until_ready(out)
        best = float("inf")
        k = 1
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                out = step(statics, steps_dev[k])
                k += 1
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        ms = best / args.steps * 1e3
        print(
            f"{name:28s} {bank.n_samples:7d} shots "
            f"({bank_bytes/2**30:5.2f} GiB on device)  {ms:7.2f} ms/render @ bs{B}"
        )
        del statics
        return ms, bank_bytes

    toy = make_test_bank(
        np.random.default_rng(0), PITCHES[:8], sample_rate=sample_rate,
        max_len=max_len, n_per_bin=8,
    )
    toy_ms, toy_bytes = time_bank("toy bank (round-1 bench)", toy)

    big = make_scale_bank(args.n_shots, max_len, sample_rate)
    big_ms, big_bytes = time_bank(f"scale bank ({args.n_shots})", big)

    results = {
        "batch_size": B,
        "toy_shots": toy.n_samples,
        "toy_ms": toy_ms,
        "scale_shots": big.n_samples,
        "scale_ms": big_ms,
        "scale_bank_gib": big_bytes / 2**30,
        "slowdown": big_ms / toy_ms,
    }
    out = Path(__file__).parent / "bank_scale_bench.json"
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(f"slowdown at scale: {big_ms/toy_ms:.2f}x; wrote {out}")


if __name__ == "__main__":
    main()
