"""CLI integration tests: inference.py and eval.py end-to-end via subprocess
(tiny model checkpoint + synthetic data, pinned to CPU)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import yaml

import jax

from adt_str_tpu.config import ModelConfig
from adt_str_tpu.models import adt
from adt_str_tpu.training.checkpoint import export_safetensors
from adt_str_tpu.utils.audio_io import write_wav
from adt_str_tpu.utils.midi_io import read_midi

REPO = Path(__file__).resolve().parent.parent
SR = 4000

MODEL_SECTION = dict(
    enc_layers=1, dec_layers=1, nhead=2, d_query=16, dropout=0.0,
    tgt_vocab_size=1400, n_mels=16, compute_dtype="float32", max_positions=64,
)
SHARED = dict(input_sec=0.64, time_res=0.01, win_length=256, sample_rate=SR)


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    ckpt = tmp_path_factory.mktemp("ckpt")
    cfg = ModelConfig(**MODEL_SECTION, **SHARED)
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    export_safetensors(params, ckpt / "model.safetensors")
    return str(ckpt)


def _run(args, cwd=REPO):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, *args], cwd=cwd, env=env, capture_output=True, text=True,
        timeout=600,
    )


@pytest.mark.slow
def test_inference_cli(tmp_path, checkpoint_dir):
    wav_path = tmp_path / "in.wav"
    rng = np.random.default_rng(0)
    write_wav(wav_path, (rng.normal(size=int(1.5 * SR)) * 0.1).astype(np.float32), SR)

    cfg = {
        "shared": SHARED,
        "model": MODEL_SECTION,
        "tokenizer": {"ADTOF_mapping": False, "BOS_token": 2, "EOS_token": 3,
                      "pad_token": 1, "silence_token": 0, "add_velocity": True},
        "inference": {"checkpoint_path": checkpoint_dir, "max_length": 12},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    out_dir = tmp_path / "out"
    proc = _run(["inference.py", str(wav_path), str(cfg_path), "-o", str(out_dir)])
    assert proc.returncode == 0, proc.stderr[-2000:]
    midi_path = out_dir / "in.mid"
    assert midi_path.exists()
    # random-weight model may or may not emit notes; the MIDI must parse
    instruments = read_midi(midi_path)
    assert isinstance(instruments, list)


@pytest.mark.slow
def test_eval_cli(tmp_path, checkpoint_dir):
    # tiny ENST-style parquet
    rng = np.random.default_rng(1)
    rows = {"audio_id": [], "drummer": [], "audio": [], "sample_rate": [], "notes": []}
    for i in range(3):
        audio = (rng.normal(size=int(0.64 * SR)) * 0.2).astype(np.float32)
        notes = np.array([[0.1, 0.2, 38, 100]], dtype=np.float32)
        rows["audio_id"].append(f"drummer_1_{i}_minus-one_x.wav")
        rows["drummer"].append("drummer_1")
        rows["audio"].append(audio.tobytes())
        rows["sample_rate"].append(SR)
        rows["notes"].append(notes.tobytes())
    schema = pa.schema([
        pa.field("audio_id", pa.string()), pa.field("drummer", pa.string()),
        pa.field("audio", pa.binary()), pa.field("sample_rate", pa.int32()),
        pa.field("notes", pa.binary()),
    ])
    parquet = tmp_path / "enst.parquet"
    pq.write_table(pa.table(rows, schema=schema), parquet)

    out_dir = tmp_path / "results"
    cfg = {
        "shared": SHARED,
        "model": MODEL_SECTION,
        "tokenizer": {"ADTOF_mapping": True, "BOS_token": 2, "EOS_token": 3,
                      "pad_token": 1, "silence_token": 0, "add_velocity": True},
        "EvalDatasetConfig": {"dataset_path": str(parquet), "dataset_name": "ENST",
                              "minus_one": True, "splits": None, "drummers": None},
        "inference": {"checkpoint_path": checkpoint_dir, "batch_size": 2,
                      "max_length": 12, "use_beam_search": False,
                      "output_path": str(out_dir)},
    }
    cfg_path = tmp_path / "eval.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    proc = _run(["eval.py", str(cfg_path), "-e"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    metrics = json.loads((out_dir / "metrics.json").read_text())
    assert "all" in metrics
    assert (out_dir / "confusion_matrix.csv").exists()


@pytest.mark.slow
def test_inference_cli_with_resynthesis(tmp_path, checkpoint_dir):
    from adt_str_tpu.synth.bank import save_bank_hdf5

    rng = np.random.default_rng(3)
    entries = {
        p: {"gold": [(np.exp(-np.arange(400) / 150) * rng.normal(size=400)).astype(np.float32)]}
        for p in range(35, 62)
    }
    bank_prefix = tmp_path / "oneshot"
    save_bank_hdf5(f"{bank_prefix}@{SR}.hdf5", entries, SR)

    wav_path = tmp_path / "in.wav"
    write_wav(wav_path, (rng.normal(size=int(1.0 * SR)) * 0.1).astype(np.float32), SR)
    cfg = {
        "shared": SHARED,
        "model": MODEL_SECTION,
        "tokenizer": {"ADTOF_mapping": False, "BOS_token": 2, "EOS_token": 3,
                      "pad_token": 1, "silence_token": 0, "add_velocity": True},
        "inference": {"checkpoint_path": checkpoint_dir, "max_length": 10},
        "synthetiser": {"oneshot_path": str(bank_prefix), "similarity_threshold": 1.0,
                        "mixup_range": 0.2, "use_fx_prob": 0.0, "max_notes": 16,
                        "max_oneshot_sec": 0.1},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out_dir = tmp_path / "out"
    proc = _run(["inference.py", str(wav_path), str(cfg_path), "-o", str(out_dir), "-s"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert (out_dir / "in.mid").exists()
    # resynthesis only produced when the (random) model emitted notes
    if "Resynthesized audio saved" in proc.stdout:
        assert (out_dir / "in_resynth.wav").exists()


def test_hdf5_packer_cli(tmp_path):
    rng = np.random.default_rng(4)
    tree = tmp_path / "augmented"
    for pitch, bin_name in [(38, "gold"), (38, "100-90"), (42, "gold")]:
        d = tree / str(pitch) / bin_name
        d.mkdir(parents=True, exist_ok=True)
        write_wav(d / f"s_{bin_name}.wav",
                  (rng.normal(size=500) * 0.3).astype(np.float32), SR)
    proc = _run([
        "scripts/convert_augmented_to_hdf5.py", str(tree), str(tmp_path / "bank"),
        "--sample_rate", str(SR),
    ])
    assert proc.returncode == 0, proc.stderr[-2000:]
    from adt_str_tpu.synth.bank import load_bank_hdf5

    bank = load_bank_hdf5(str(tmp_path / f"bank@{SR}.hdf5"), max_len=512)
    assert bank.n_samples == 3
    assert set(bank.pitches()) == {38, 42}


def test_merge_chunk_notes_dedups_across_ulp_variants():
    """Hop-mode dedup must collapse the SAME absolute grid time reached from
    different (local-grid, chunk-start) pairs: `k*0.01 + start` differs by an
    fp32 ulp for ~40% of grid points, which exact-equality np.unique keeps
    as duplicates (the bug this pins down). Non-hop mode must stay bit-exact
    (no re-quantization of reference-parity outputs)."""
    sys.path.insert(0, str(REPO))
    from inference import merge_chunk_notes

    # absolute time 0.66 s, seen as k=66/start=0 and k=2/start=0.64 — fp32
    # representations differ by one ulp (measured)
    a = np.array([[np.float32(66 * 0.01), np.float32(66 * 0.01 + 0.1), 38, 90]],
                 np.float32)
    b = np.array([[np.float32(2 * 0.01) + np.float32(0.64),
                   np.float32(2 * 0.01 + 0.1) + np.float32(0.64), 38, 90]],
                 np.float32)
    assert a[0, 0] != b[0, 0]  # the ulp divergence this test exists for
    merged = merge_chunk_notes([a, b], snap_to_grid=True)
    assert merged.shape == (1, 4)
    # snap emits the canonical float64 grid value (the whole pipeline is
    # float64 after decode for metric parity — no fp32 round-trip)
    assert merged.dtype == np.float64
    assert merged[0, 0] == 0.66
    # distinct grid times stay distinct
    c = np.array([[0.67, 0.77, 38, 90]], np.float32)
    assert merge_chunk_notes([a, c], snap_to_grid=True).shape == (2, 4)
    # non-hop path: value-exact passthrough (fp32->fp64 widening) + dedup only
    out = merge_chunk_notes([a, b], snap_to_grid=False)
    assert out.shape == (2, 4)  # ulp variants are (correctly) not merged here
    assert out.dtype == np.float64
    empty = merge_chunk_notes([], snap_to_grid=True)
    assert empty.shape == (0, 4) and empty.dtype == np.float64


@pytest.mark.slow
def test_inference_cli_hop(tmp_path, checkpoint_dir):
    """--hop_sec decodes overlapping chunks (framework addition: boundary
    notes get an uncut view); the CLI must run end to end and dedup."""
    wav_path = tmp_path / "in_hop.wav"
    rng = np.random.default_rng(2)
    write_wav(wav_path, (rng.normal(size=int(1.2 * SR)) * 0.1).astype(np.float32), SR)
    cfg = {
        "shared": SHARED,
        "model": MODEL_SECTION,
        "tokenizer": {"ADTOF_mapping": False, "BOS_token": 2, "EOS_token": 3,
                      "pad_token": 1, "silence_token": 0, "add_velocity": True},
        "inference": {"checkpoint_path": checkpoint_dir, "max_length": 12},
    }
    cfg_path = tmp_path / "cfg_hop.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out_dir = tmp_path / "out_hop"
    proc = _run(["inference.py", str(wav_path), str(cfg_path), "-o", str(out_dir),
                 "--hop_sec", "0.32"])
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert (out_dir / "in_hop.mid").exists()
