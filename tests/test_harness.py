"""End-to-end eval harness smoke test with a tiny random model."""

import json
import pytest
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import jax

from adt_str_tpu.config import (
    EvalDataConfig,
    InferenceConfig,
    ModelConfig,
    TokenizerConfig,
)
from adt_str_tpu.data.datasets import ENSTDataset
from adt_str_tpu.domain.tokenizer import MidiTokenizer
from adt_str_tpu.evaluation.harness import decode_tokens_to_notes, run_inference
from adt_str_tpu.models import adt

SR = 4000


def _make_eval_parquet(path, n_items=3):
    rng = np.random.default_rng(0)
    rows = {
        "audio_id": [], "drummer": [], "audio": [], "sample_rate": [], "notes": [],
    }
    for i in range(n_items):
        audio = (rng.normal(size=int(0.64 * SR)) * 0.2).astype(np.float32)
        notes = np.array([[0.1, 0.2, 38, 100], [0.4, 0.5, 35, 100]], dtype=np.float32)
        rows["audio_id"].append(f"drummer_1_{i}_minus-one_x.wav")
        rows["drummer"].append("drummer_1")
        rows["audio"].append(audio.tobytes())
        rows["sample_rate"].append(SR)
        rows["notes"].append(notes.tobytes())
    schema = pa.schema(
        [
            pa.field("audio_id", pa.string()),
            pa.field("drummer", pa.string()),
            pa.field("audio", pa.binary()),
            pa.field("sample_rate", pa.int32()),
            pa.field("notes", pa.binary()),
        ]
    )
    pq.write_table(pa.table(rows, schema=schema), path)


def test_run_inference_end_to_end(tmp_path):
    parquet = str(tmp_path / "enst.parquet")
    _make_eval_parquet(parquet)

    mcfg = ModelConfig(
        sample_rate=SR, win_length=256, time_res=0.01, input_sec=0.64,
        enc_layers=1, dec_layers=1, nhead=2, d_query=16, dropout=0.0,
        tgt_vocab_size=1400, n_mels=16, compute_dtype="float32", max_positions=64,
    )
    params = adt.init_params(jax.random.PRNGKey(0), mcfg)
    tok = MidiTokenizer(TokenizerConfig())
    ds = ENSTDataset(
        EvalDataConfig(dataset_path=parquet, dataset_name="ENST", sample_rate=SR),
        tok,
    )
    out_dir = str(tmp_path / "results")
    metrics = run_inference(
        params, mcfg, ds, tok,
        InferenceConfig(batch_size=2, max_length=12, use_beam_search=False,
                        output_path=out_dir),
    )
    assert "all" in metrics
    assert set(metrics["all"]) == {"precision", "recall", "f_measure"}
    assert os.path.exists(os.path.join(out_dir, "metrics.json"))
    assert os.path.exists(os.path.join(out_dir, "confusion_matrix.csv"))
    with open(os.path.join(out_dir, "metrics.json")) as f:
        saved = json.load(f)
    assert saved["all"] == metrics["all"]


@pytest.mark.slow
def test_run_inference_sharded_matches_single_device(tmp_path):
    """Mesh-sharded decode (data-parallel over the virtual 8-device mesh)
    produces identical metrics to the single-device path, including a ragged
    final batch padded up to the data-axis size."""
    from adt_str_tpu.parallel import mesh as mesh_lib

    parquet = str(tmp_path / "enst.parquet")
    _make_eval_parquet(parquet, n_items=5)
    mcfg = ModelConfig(
        sample_rate=SR, win_length=256, time_res=0.01, input_sec=0.64,
        enc_layers=1, dec_layers=1, nhead=2, d_query=16, dropout=0.0,
        tgt_vocab_size=1400, n_mels=16, compute_dtype="float32", max_positions=64,
    )
    params = adt.init_params(jax.random.PRNGKey(0), mcfg)
    tok = MidiTokenizer(TokenizerConfig())
    ds = ENSTDataset(
        EvalDataConfig(dataset_path=parquet, dataset_name="ENST", sample_rate=SR),
        tok,
    )
    # output_path=None: the config default is "results/" (reference parity),
    # which would litter the repo root when tests run from it
    icfg = InferenceConfig(
        batch_size=3, max_length=12, use_beam_search=False, output_path=None
    )
    single = run_inference(params, mcfg, ds, tok, icfg)
    mesh = mesh_lib.make_mesh(n_data=len(jax.devices()), n_model=1)
    sharded = run_inference(params, mcfg, ds, tok, icfg, mesh=mesh)
    assert single == sharded

    bcfg = InferenceConfig(
        batch_size=3, max_length=10, use_beam_search=True, beam_size=2,
        output_path=None,
    )
    b_single = run_inference(params, mcfg, ds, tok, bcfg)
    b_sharded = run_inference(params, mcfg, ds, tok, bcfg, mesh=mesh)
    assert b_single == b_sharded


def test_decode_tokens_to_notes():
    tok = MidiTokenizer(TokenizerConfig())
    # BOS t p v t p v EOS garbage
    tokens = np.array([2, 14, 338, 500, 14, 338, 500, 30, 335, 480, 3, 99, 99])
    out = decode_tokens_to_notes(tok, tokens)
    # dedup removes the duplicate row
    assert out.shape == (2, 4)
    np.testing.assert_allclose(out[:, 0], [0.1, 0.26])
