"""Production train.py CLI validation on real hardware.

Fabricates flagship-scale inputs (Lakh-schema parquet of 2.56 s drum
segments + a reference-layout one-shot HDF5 bank), writes a setting-1-shaped
YAML, and runs the *actual* `python train.py <yaml>` CLI for --steps steps at
batch 64 — validating sustained throughput, checkpointing, logging, and
loss descent end to end (not through test harnesses).

With --eval, it then renders a held-out eval set from FRESH note lists
(new timbre/mixup draws through the same bank), writes it as an ENST-schema
parquet, and runs the *actual* `python eval.py <yaml>` CLI against the final
checkpoint — reporting onset F-measure through the full metric stack
(the round-trip protocol behind the round-1 "F1 0.977 on held-out rendered
set" number, now reproducible in one command).

Usage: python tools/validation_train_run.py [--steps 2000] [--eval] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SR = 24_000
PITCHES = [35, 36, 38, 40, 41, 42, 44, 46, 48, 49, 51]


def mapped_pitches(pitches=PITCHES) -> list[int]:
    """GM-custom image of the raw GM pitches (what the training pipeline
    tokenizes AND renders — LakhDataset maps notes before both): the bank
    must be keyed by these, not the raw values (map_notes_to_Gm_custom
    renumbers e.g. 44->43, 49->46, 51->48)."""
    from adt_str_tpu.config import TokenizerConfig
    from adt_str_tpu.domain.tokenizer import MidiTokenizer

    tok = MidiTokenizer(TokenizerConfig())
    notes = np.array([[0.0, 0.1, p, 100] for p in pitches], np.float32)
    out = tok.map_notes_to_Gm_custom(notes, rng=np.random.default_rng(0))
    return [int(v) for v in out[:, 2]]


def write_lakh_parquet(path: Path, n_segments: int, rng: np.random.Generator) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [("midi_id", pa.string()), ("segment_number", pa.int32()), ("notes", pa.binary())]
    )
    rows = {"midi_id": [], "segment_number": [], "notes": []}
    for i in range(n_segments):
        n = int(rng.integers(4, 48))
        onsets = np.sort(rng.uniform(0, 2.4, n))
        notes = np.stack(
            [onsets, onsets + 0.05, rng.choice(PITCHES, n), rng.integers(30, 127, n)],
            axis=1,
        ).astype(np.float32)
        rows["midi_id"].append(f"val{i:06d}")
        rows["segment_number"].append(i)
        rows["notes"].append(notes.tobytes())
    pq.write_table(pa.table(rows, schema=schema), str(path))


def write_bank(prefix: str, rng: np.random.Generator) -> None:
    """Synthetic one-shot bank with an acoustically DISTINCT signature per
    pitch (log-spaced fundamental + per-pitch tone/noise mix and decay): with
    near-identical per-pitch timbres the exact-pitch metric saturates at the
    class level (the model cannot hear the difference), which is a data
    artifact rather than a model limit."""
    from adt_str_tpu.synth.bank import save_bank_hdf5

    max_len = int(1.28 * SR)
    t = np.arange(max_len) / SR
    entries = {}
    bank_pitches = sorted(set(mapped_pitches()))
    for idx, pitch in enumerate(bank_pitches):
        f0 = 70.0 * (1.45 ** idx)  # log-spaced fundamentals, 70 Hz .. ~2.9 kHz
        # tone fraction stays >= 0.5 so the fundamental is audible through the
        # noise for every pitch (noise-dominated mixes mask f0 and collapse
        # exact-pitch discrimination to the class level)
        tone = 0.5 + 0.045 * ((idx * 5) % 11)
        decay_lo, decay_hi = 4 + 3 * (idx % 4), 12 + 6 * (idx % 4)
        entries[pitch] = {}
        for bin_name in ("gold", "100-90", "90-80"):
            waves = []
            for _ in range(8):
                n = int(rng.integers(max_len // 4, max_len))
                w = np.exp(-t[:n] * rng.uniform(decay_lo, decay_hi)) * (
                    tone * np.sin(2 * np.pi * f0 * t[:n])
                    + (1.0 - tone) * rng.normal(size=n)
                )
                waves.append(w.astype(np.float32))
            entries[pitch][bin_name] = waves
    save_bank_hdf5(f"{prefix}@{SR}.hdf5", entries, SR)


def render_eval_parquet(
    path: Path, bank_prefix: str, n_items: int, rng: np.random.Generator
) -> None:
    """Held-out eval set: fresh note lists rendered through the bank (new
    timbre/mixup draws), ENST parquet schema (text_parser.py:312-320)."""
    import jax
    import jax.numpy as jnp
    import pyarrow as pa
    import pyarrow.parquet as pq

    from adt_str_tpu.config import SynthConfig
    from adt_str_tpu.synth.bank import load_bank_hdf5
    from adt_str_tpu.synth.render import SynthStatics, render_batch

    bank = load_bank_hdf5(f"{bank_prefix}@{SR}.hdf5", int(1.28 * SR))
    statics = SynthStatics.from_bank(bank)
    synth_cfg = SynthConfig(
        sample_rate=SR, input_sec=2.56, mixup_range=0.8, use_fx_prob=0.0,
        similarity_threshold=0.8, max_notes=64, max_oneshot_sec=1.28,
    )
    notes = np.zeros((n_items, 64, 4), np.float32)
    mask = np.zeros((n_items, 64), bool)
    for i in range(n_items):
        n = int(rng.integers(4, 32))
        onsets = np.sort(rng.uniform(0, 2.4, n))
        # >= 20 ms separation so dedup/matching is unambiguous
        onsets = np.round(onsets * 50) / 50
        onsets = np.unique(onsets)
        n = len(onsets)
        notes[i, :n] = np.stack(
            [onsets, onsets + 0.05, rng.choice(PITCHES, n), rng.integers(40, 127, n)],
            axis=1,
        )
        mask[i, :n] = True
    # render the GM-custom-MAPPED notes — exactly what the training pipeline
    # renders (LakhDataset maps before synthesis); the parquet stores the raw
    # notes and the eval dataset applies the same map to the ground truth
    from adt_str_tpu.config import TokenizerConfig
    from adt_str_tpu.domain.tokenizer import MidiTokenizer

    tok = MidiTokenizer(TokenizerConfig())
    render_notes = notes.copy()
    for i in range(n_items):
        k = int(mask[i].sum())
        if k:
            render_notes[i, :k] = tok.map_notes_to_Gm_custom(
                notes[i, :k], rng=np.random.default_rng(1)
            )
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(n_items) + 10_000)
    wavs = np.asarray(
        render_batch(
            statics, jnp.asarray(render_notes), jnp.asarray(mask), keys, synth_cfg
        )
    )

    rows = {"audio_id": [], "drummer": [], "audio": [], "sample_rate": [], "notes": []}
    for i in range(n_items):
        k = int(mask[i].sum())
        rows["audio_id"].append(f"drummer_1_{i:04d}_minus-one_val.wav")
        rows["drummer"].append("drummer_1")
        rows["audio"].append(wavs[i].astype(np.float32).tobytes())
        rows["sample_rate"].append(SR)
        rows["notes"].append(notes[i, :k].astype(np.float32).tobytes())
    schema = pa.schema(
        [("audio_id", pa.string()), ("drummer", pa.string()), ("audio", pa.binary()),
         ("sample_rate", pa.int32()), ("notes", pa.binary())]
    )
    pq.write_table(pa.table(rows, schema=schema), str(path))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--segments", type=int, default=40_000)
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--eval-only", action="store_true",
                    help="skip data gen + training; --out must hold a finished run")
    ap.add_argument("--eval-items", type=int, default=128)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import yaml

    if args.eval or args.eval_only:
        # the held-out render runs in this process on the CPU backend: it is
        # tiny (one batch) and must not contend with / depend on the device
        # the train/eval subprocesses use
        import jax

        jax.config.update("jax_platforms", "cpu")

    td = Path(args.out or tempfile.mkdtemp(prefix="adt_val_"))
    td.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    data_dir = td / "lakh"
    data_dir.mkdir(exist_ok=True)
    if not args.eval_only:
        print(f"writing {args.segments} synthetic segments + bank under {td} ...")
        write_lakh_parquet(data_dir / "A.parquet", args.segments, rng)
        write_bank(str(td / "oneshot"), rng)

    cfg = {
        "shared": {"input_sec": 2.56, "time_res": 0.01, "win_length": 2048,
                   "sample_rate": SR},
        "model": {"enc_layers": 4, "dec_layers": 4, "nhead": 6, "d_query": 128,
                  "dropout": 0.1, "tgt_vocab_size": 1400, "n_mels": 128,
                  "compute_dtype": "bfloat16", "use_pallas_mel": True},
        "tokenizer": {"ADTOF_mapping": False, "BOS_token": 2, "EOS_token": 3,
                      "pad_token": 1, "silence_token": 0, "add_velocity": True},
        "training": {"batch_size": args.batch_size,
                     # enough epochs that max_steps governs, not the epoch cap
                     "num_epochs": -(-args.steps * args.batch_size // args.segments),
                     "learning_rate": 1e-4, "warmup_ratio": 0.1,
                     "weight_decay": 1e-5, "max_grad_norm": 1.0,
                     "max_steps": args.steps},
        "TrainDatasetConfig": {"dataset_path": str(data_dir), "dataset_name": "Lakh",
                               "partitions": None, "empty_tokens_percentage": 0.05,
                               "random_velocity_prob": 0.5, "max_tokens": 256},
        "synthetiser": {"oneshot_path": str(td / "oneshot"),
                        "similarity_threshold": 0.8, "mixup_range": 0.8,
                        "use_fx_prob": 0.3, "max_notes": 128,
                        "max_oneshot_sec": 1.28},
        "logging": {"output_dir": str(td / "out"), "logging_steps": 100,
                    "save_every_n_steps": 1000},
        "checkpoint": {"max_checkpoints": 2, "auto_resume": False},
        "experiment": {"seed": 0, "run_name": "validation", "use_wandb": False},
    }
    cfg_path = td / "validation.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    if args.eval_only:
        dt, ok = 0.0, True
    else:
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, str(REPO / "train.py"), str(cfg_path)],
            cwd=str(REPO),
            env={**os.environ, "PYTHONUNBUFFERED": "1"},
        )
        dt = time.perf_counter() - t0
        ok = proc.returncode == 0
    result = {
        "ok": ok,
        "steps": args.steps,
        "batch_size": args.batch_size,
        "wall_s": dt,
        "steps_per_sec_incl_startup": (args.steps / dt) if dt else None,
        "out_dir": str(td),
    }

    if ok and (args.eval or args.eval_only):
        from adt_str_tpu.training.checkpoint import latest_checkpoint

        rng_eval = np.random.default_rng(777)
        eval_parquet = td / "eval.parquet"
        print(f"rendering {args.eval_items} held-out eval items ...")
        render_eval_parquet(eval_parquet, str(td / "oneshot"), args.eval_items, rng_eval)
        ckpt = latest_checkpoint(td / "out" / "validation")
        eval_cfg = {
            "shared": cfg["shared"],
            "model": cfg["model"],
            "tokenizer": cfg["tokenizer"],
            "EvalDatasetConfig": {
                "dataset_path": str(eval_parquet), "dataset_name": "ENST",
                "minus_one": False, "splits": None, "drummers": None,
            },
            "inference": {
                "checkpoint_path": ckpt, "batch_size": 16, "max_length": 256,
                "use_beam_search": False,
                "output_path": str(td / "eval_out"),
            },
            "logging": {"log_level": "INFO"},
        }
        eval_yaml = td / "eval.yaml"
        eval_yaml.write_text(yaml.safe_dump(eval_cfg))
        eproc = subprocess.run(
            [sys.executable, str(REPO / "eval.py"), str(eval_yaml)],
            cwd=str(REPO),
            env={**os.environ, "PYTHONUNBUFFERED": "1"},
        )
        result["eval_ok"] = eproc.returncode == 0
        metrics_path = td / "eval_out" / "metrics.json"
        if metrics_path.exists():
            result["eval_metrics"] = json.loads(metrics_path.read_text())["all"]

    print(json.dumps(result))
    (td / "validation_result.json").write_text(json.dumps(result, indent=2) + "\n")
    # gate on EVERY stage that ran: an eval.py crash must fail the round trip
    sys.exit(0 if ok and result.get("eval_ok", True) else 1)


if __name__ == "__main__":
    main()
