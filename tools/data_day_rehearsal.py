"""Data-day rehearsal: the FULL augmentation-to-eval chain through the real
CLIs, one command, end to end (VERDICT r4 #2).

The reference documents its data day as a fixed pipeline
(`/root/reference/DATASET_AUGMENTATION_PIPELINE.md:5-24` + `README.md`
training/eval sections):

    midi_parser -> CLAP curation -> copy originals -> HDF5 pack
                -> train -> eval

Every stage here is tested in isolation elsewhere; what this tool pins is
the thing stage tests cannot — INTERFACE drift between stages (file layouts,
config keys, checkpoint formats) — by synthesizing a raw corpus from nothing
and running each real CLI as a subprocess, exactly the commands a user would
type when real corpora land:

    1. scripts/midi_parser.py               (Lakh MIDI tree -> parquet)
    2. scripts/augment_data_with_clap.py    (CLAP curation -> binned tree)
    3. scripts/copy_originals_to_augmented.py (gold consolidation)
    4. scripts/convert_augmented_to_hdf5.py (binned tree -> one-shot HDF5)
    5. train.py                             (setting-1-analogue YAML)
    6. eval.py                              (ENST-style parquet -> metrics)

The synthesized corpus is constructed to be LEARNABLE (distinct per-class
timbres, few pitches, the learnability-test protocol at SR 4000) so stage 6
ends with a real assertion: onset F1 > threshold on a held-out render. Per-
stage wall times + the final metrics land in tools/data_day_rehearsal.json.

When real corpora land, this file is the runbook: point --root at them and
every command is already proven to compose.

Usage: python tools/data_day_rehearsal.py [--workdir DIR] [--steps 300]
       [--threshold 0.75] [--keep]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SR = 4000           # training/eval audio rate (learnability-test geometry)
CLAP_SR = 48_000    # curation encode rate (CLAP's native geometry)
INPUT_SEC = 0.64
PITCHES = [35, 38, 42]  # kick, snare, closed hat — distinct timbre families
MAX_TOKENS = 24

MODEL_SECTION = dict(
    enc_layers=2, dec_layers=2, nhead=2, d_query=24, dropout=0.0,
    tgt_vocab_size=1400, n_mels=32, compute_dtype="float32", max_positions=64,
)
SHARED = dict(input_sec=INPUT_SEC, time_res=0.01, win_length=256, sample_rate=SR)
TOKENIZER = dict(ADTOF_mapping=False, BOS_token=2, EOS_token=3, pad_token=1,
                 silence_token=0, add_velocity=True)


# --------------------------------------------------------------- corpus synth

def _one_shot(rng: np.random.Generator, pitch: int, k: int, sr: int) -> np.ndarray:
    """A ~0.2 s one-shot with a per-class timbre family: low decaying sine
    (kick), mid two-partial hit (snare), noise burst (hat). `k` varies the
    draw inside the family so the bank has intra-class diversity."""
    n = int(0.2 * sr)
    t = np.arange(n) / sr
    if pitch == 35:
        f0 = 55.0 + 6 * k
        w = np.sin(2 * np.pi * f0 * t * (1 - 0.3 * t)) * np.exp(-18 * t)
    elif pitch == 38:
        f0 = 190.0 + 15 * k
        w = (np.sin(2 * np.pi * f0 * t) + 0.5 * np.sin(2 * np.pi * 1.7 * f0 * t))
        w = w * np.exp(-25 * t) + 0.25 * rng.normal(size=n) * np.exp(-40 * t)
    else:
        w = rng.normal(size=n) * np.exp(-60 * t)
    return (0.8 * w / max(np.max(np.abs(w)), 1e-9)).astype(np.float32)


def synth_corpus(raw: Path, rng: np.random.Generator) -> dict:
    """Lakh-style MIDI tree + unstructured sample pack + reference-class
    tree + a tiny (but REAL) HF CLAP checkpoint directory."""
    from adt_str_tpu.utils.audio_io import write_wav
    from adt_str_tpu.utils.midi_io import write_midi

    # 1. Lakh MIDI tree: partition dirs like the real dump (lakh/A/xxx.mid)
    midi_root = raw / "lakh"
    (midi_root / "A").mkdir(parents=True)
    songs = []
    for i in range(12):
        n = int(rng.integers(2, 5))
        onsets = np.sort(np.round(rng.uniform(0.0, 0.5, n), 2))
        notes = np.stack(
            [onsets, onsets + 0.05, rng.choice(PITCHES, n),
             rng.integers(60, 127, n)], axis=1,
        ).astype(np.float64)
        write_midi(midi_root / "A" / f"song_{i:03d}.mid", notes, is_drum=True)
        songs.append(notes)

    # 2. reference-class tree: <root>/<gm_class>/<k>.wav (curation.py layout)
    ref_root = raw / "reference"
    for p in PITCHES:
        d = ref_root / str(p)
        d.mkdir(parents=True)
        for k in range(3):
            write_wav(d / f"ref_{p}_{k}.wav", _one_shot(rng, p, k, SR), SR)

    # 3. unstructured sample pack (nested vendor-style dirs, mixed content)
    pack_root = raw / "sample_pack"
    for j in range(18):
        sub = pack_root / f"vendor_{j % 3}" / f"kit_{j % 2}"
        sub.mkdir(parents=True, exist_ok=True)
        p = PITCHES[j % len(PITCHES)]
        write_wav(sub / f"shot_{j:02d}.wav", _one_shot(rng, p, j % 5, SR), SR)

    # 4. tiny CLAP checkpoint dir: REAL transformers ClapModel (the exact
    # geometry tests/test_curation_sharded.py proves against the JAX towers),
    # saved as config.json + pytorch_model.bin — what ClapWrapper.from_dir
    # loads. Weights are random: curation correctness never depends on WHERE
    # the pack samples bin (training reads only the gold bin below).
    import torch
    from transformers import ClapAudioConfig, ClapConfig, ClapModel, ClapTextConfig

    audio_cfg = ClapAudioConfig(
        window_size=4, num_mel_bins=64, spec_size=256, patch_size=4,
        patch_stride=[4, 4], hidden_size=16, projection_dim=32,
        depths=[2, 2], num_attention_heads=[2, 4], enable_fusion=True,
        patch_embeds_hidden_size=8, aff_block_r=4,
    )
    text_cfg = ClapTextConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=48, projection_dim=32,
    )
    clap_cfg = ClapConfig.from_text_audio_configs(text_cfg, audio_cfg,
                                                  projection_dim=32)
    torch.manual_seed(0)
    model = ClapModel(clap_cfg).eval()
    clap_dir = raw / "clap_tiny"
    clap_dir.mkdir()
    clap_cfg.to_json_file(clap_dir / "config.json")
    torch.save(model.state_dict(), clap_dir / "pytorch_model.bin")

    return {
        "midi_root": str(midi_root),
        "ref_root": str(ref_root),
        "pack_root": str(pack_root),
        "clap_dir": str(clap_dir),
        "n_songs": len(songs),
    }


# ----------------------------------------------------------------- CLI driver

def _run_cli(args: list[str], env_extra: dict | None = None,
             timeout: int = 1800) -> float:
    """Run one pipeline CLI as a subprocess, return wall seconds."""
    env = dict(os.environ)
    env.update(env_extra or {})
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, *args], cwd=ROOT, env=env,
        capture_output=True, text=True, timeout=timeout,
    )
    dt = time.perf_counter() - t0
    if proc.returncode != 0:
        raise RuntimeError(
            f"stage failed ({' '.join(args)}):\n"
            f"--- stdout ---\n{proc.stdout[-3000:]}\n"
            f"--- stderr ---\n{proc.stderr[-3000:]}"
        )
    return dt


def _yaml_dump(d: dict, path: Path) -> Path:
    import yaml

    path.write_text(yaml.safe_dump(d))
    return path


def build_eval_parquet(hdf5_prefix: str, train_parquet: Path,
                       out_parquet: Path, n_clips: int = 8) -> None:
    """ENST-style eval set: the PARSED parquet's note content, re-rendered
    through the framework's OWN renderer (bank from the packed HDF5, fresh
    timbre/mixup draws under a held-out key). This is the learnability-test
    protocol (tests/test_learnability.py) run across the file formats the
    pipeline produced: transcription of a fresh render of trained content —
    the strongest correctness signal the chain can give without real
    corpora."""
    import jax
    import pyarrow as pa
    import pyarrow.parquet as pq

    from adt_str_tpu.config import SynthConfig
    from adt_str_tpu.synth.bank import load_bank_hdf5
    from adt_str_tpu.synth.render import SynthStatics, pad_notes, render_batch

    seg_tbl = pq.read_table(train_parquet, columns=["notes"])
    all_notes = [
        np.frombuffer(b.as_py(), np.float32).reshape(-1, 4)
        for b in seg_tbl["notes"]
    ][:n_clips]
    bank = load_bank_hdf5(f"{hdf5_prefix}@{SR}.hdf5", max_len=int(0.25 * SR),
                          n_allowed_bins=1)  # gold only, like training
    statics = SynthStatics.from_bank(bank)
    synth_cfg = SynthConfig(
        sample_rate=SR, input_sec=INPUT_SEC, mixup_range=0.2, use_fx_prob=0.0,
        similarity_threshold=1.0, max_notes=8, max_oneshot_sec=0.25,
    )
    B = len(all_notes)
    notes_arr = np.zeros((B, 8, 4), np.float32)
    mask = np.zeros((B, 8), bool)
    for i, notes in enumerate(all_notes):
        notes_arr[i], mask[i] = pad_notes(notes[:8], 8)
    keys = jax.random.split(jax.random.PRNGKey(424242), B)  # held-out draws
    wavs = np.asarray(render_batch(
        statics, notes_arr, mask, keys, synth_cfg))

    rows = {"audio_id": [], "drummer": [], "audio": [], "sample_rate": [],
            "notes": []}
    for i in range(B):
        rows["audio_id"].append(f"drummer_1_clip_{i}.wav")
        rows["drummer"].append("drummer_1")
        rows["audio"].append(wavs[i].astype(np.float32).tobytes())
        rows["sample_rate"].append(SR)
        rows["notes"].append(
            notes_arr[i][mask[i]].astype(np.float32).tobytes())
    schema = pa.schema([
        pa.field("audio_id", pa.string()), pa.field("drummer", pa.string()),
        pa.field("audio", pa.binary()), pa.field("sample_rate", pa.int32()),
        pa.field("notes", pa.binary()),
    ])
    pq.write_table(pa.table(rows, schema=schema), out_parquet)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=None,
                    help="working root (default: a fresh temp dir)")
    ap.add_argument("--steps", type=int, default=300,
                    help="train steps (learnability protocol: 250-400)")
    ap.add_argument("--threshold", type=float, default=0.75,
                    help="final onset-F1 gate on the held-out eval set")
    ap.add_argument("--keep", action="store_true",
                    help="keep the workdir (default: delete on success)")
    ap.add_argument("--num-bins", type=int, default=10)
    args = ap.parse_args()

    work = Path(args.workdir) if args.workdir else Path(
        tempfile.mkdtemp(prefix="data_day_"))
    work.mkdir(parents=True, exist_ok=True)
    raw = work / "raw"
    if raw.exists():
        shutil.rmtree(raw)
    raw.mkdir()
    rng = np.random.default_rng(0)
    times: dict[str, float] = {}
    print(f"data-day rehearsal: workdir={work}")

    t0 = time.perf_counter()
    corpus = synth_corpus(raw, rng)
    times["0_synthesize_corpus"] = time.perf_counter() - t0
    print(f"  [0] corpus synthesized in {times['0_synthesize_corpus']:.1f}s "
          f"({corpus['n_songs']} songs, {len(PITCHES)} classes)")

    # ---- 1. MIDI -> parquet -------------------------------------------------
    dump = work / "parsed"
    cfg1 = _yaml_dump(
        {"shared": SHARED,
         "preprocess": {"midi_root": corpus["midi_root"], "dump_path": str(dump),
                        "partitions": ["A"], "n_jobs": 1,
                        "dataset_name": "lakh_matched"}},
        work / "make_dataset.yaml")
    times["1_midi_parser"] = _run_cli(["scripts/midi_parser.py", str(cfg1)])
    parquets = list((dump / "lakh_matched").glob("*.parquet"))
    assert parquets, "midi_parser produced no parquet"
    print(f"  [1] midi_parser: {times['1_midi_parser']:.1f}s -> {parquets}")

    # ---- 2. CLAP curation ---------------------------------------------------
    cfg2 = _yaml_dump(
        {"shared": {"sample_rate": CLAP_SR},
         "clap_config": {"model_name": corpus["clap_dir"], "batch_size": 8,
                         "sample_pack_root": corpus["pack_root"],
                         "reference_root": corpus["ref_root"]}},
        work / "clap.yaml")
    times["2_clap_curation"] = _run_cli(
        ["scripts/augment_data_with_clap.py", str(cfg2),
         "--num_bins", str(args.num_bins)])
    augmented = Path(corpus["ref_root"] + "_clap_augmented")
    assert augmented.is_dir(), f"curation did not create {augmented}"
    print(f"  [2] clap curation: {times['2_clap_curation']:.1f}s -> {augmented}")

    # ---- 3. gold consolidation ---------------------------------------------
    times["3_copy_originals"] = _run_cli(
        ["scripts/copy_originals_to_augmented.py", corpus["ref_root"]])
    golds = list(augmented.glob("*/gold/*.wav"))
    assert len(golds) == 3 * len(PITCHES), f"gold bins wrong: {golds}"
    print(f"  [3] copy originals: {times['3_copy_originals']:.1f}s "
          f"({len(golds)} gold one-shots)")

    # ---- 4. HDF5 pack -------------------------------------------------------
    prefix = str(work / "oneshots")
    times["4_hdf5_pack"] = _run_cli(
        ["scripts/convert_augmented_to_hdf5.py", str(augmented), prefix,
         "--sample_rate", str(SR), "--overwrite"])
    hdf5_path = Path(f"{prefix}@{SR}.hdf5")
    assert hdf5_path.exists(), f"packer did not write {hdf5_path}"
    print(f"  [4] hdf5 pack: {times['4_hdf5_pack']:.1f}s -> {hdf5_path}")

    # ---- 5. train -----------------------------------------------------------
    run_dir = work / "run"
    cfg5 = _yaml_dump(
        {"shared": SHARED,
         "model": MODEL_SECTION,
         "tokenizer": TOKENIZER,
         "synthetiser": {"oneshot_path": prefix, "similarity_threshold": 1.0,
                         "mixup_range": 0.2, "use_fx_prob": 0.0,
                         "max_notes": 8, "max_oneshot_sec": 0.25},
         "TrainDatasetConfig": {"dataset_path": str(dump / "lakh_matched"),
                                "dataset_name": "Lakh", "max_tokens": MAX_TOKENS,
                                "empty_tokens_percentage": 0.0,
                                "random_velocity_prob": 0.0,
                                "shuffle_buffer": 64, "seed": 0},
         "training": {"batch_size": 8, "learning_rate": 1e-3,
                      "warmup_ratio": 0.05, "num_epochs": 10_000,
                      "max_steps": args.steps, "mixed_precision": "no",
                      "gradient_accumulation_steps": 1},
         "logging": {"output_dir": str(run_dir), "logging_steps": 100},
         "checkpoint": {"max_checkpoints": 1},
         "experiment": {"seed": 0, "run_name": "data_day_rehearsal"}},
        work / "train.yaml")
    times["5_train"] = _run_cli(["train.py", str(cfg5)], timeout=3600)
    from adt_str_tpu.training.checkpoint import latest_checkpoint

    # the trainer nests checkpoints under the experiment run name
    ckpt = latest_checkpoint(run_dir / "data_day_rehearsal")
    assert ckpt and (Path(ckpt) / "model.safetensors").exists(), \
        f"train.py left no loadable checkpoint in {run_dir}"
    print(f"  [5] train ({args.steps} steps): {times['5_train']:.1f}s -> {ckpt}")

    # ---- 6. eval ------------------------------------------------------------
    t0 = time.perf_counter()
    eval_parquet = work / "enst_eval.parquet"
    build_eval_parquet(prefix, parquets[0], eval_parquet)
    out_dir = work / "results"
    cfg6 = _yaml_dump(
        {"shared": SHARED,
         "model": MODEL_SECTION,
         "tokenizer": TOKENIZER,
         "EvalDatasetConfig": {"dataset_path": str(eval_parquet),
                               "dataset_name": "ENST", "minus_one": False},
         "inference": {"checkpoint_path": str(ckpt), "batch_size": 8,
                       "max_length": MAX_TOKENS, "use_beam_search": False,
                       "output_path": str(out_dir)}},
        work / "eval.yaml")
    _run_cli(["eval.py", str(cfg6), "-e"])
    times["6_eval"] = time.perf_counter() - t0  # parquet build + eval CLI
    metrics = json.loads((out_dir / "metrics.json").read_text())
    f1 = float(metrics["all"]["f_measure"])
    print(f"  [6] eval: {times['6_eval']:.1f}s -> F1={f1:.3f} "
          f"(P={metrics['all']['precision']:.3f} "
          f"R={metrics['all']['recall']:.3f})")

    report = {
        "workdir": str(work),
        "protocol": {
            "sample_rate": SR, "input_sec": INPUT_SEC, "pitches": PITCHES,
            "train_steps": args.steps, "threshold": args.threshold,
            "backend": os.environ.get("JAX_PLATFORMS", "(default)"),
        },
        "stage_wall_seconds": {k: round(v, 2) for k, v in times.items()},
        "total_wall_seconds": round(sum(times.values()), 2),
        "final_metrics": metrics["all"],
        "passed": f1 > args.threshold,
    }
    out = Path(__file__).with_name("data_day_rehearsal.json")
    out.write_text(json.dumps(report, indent=1) + "\n")
    print(json.dumps(report, indent=1))
    if not report["passed"]:
        raise SystemExit(
            f"FAIL: end-of-chain F1 {f1:.3f} <= threshold {args.threshold}")
    if not args.keep and args.workdir is None:
        shutil.rmtree(work, ignore_errors=True)
    print("data-day rehearsal PASSED")


if __name__ == "__main__":
    main()
