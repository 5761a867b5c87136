"""TMIDT (real-audio) training path: config-driven e2e on the CPU mesh."""

import numpy as np
import pytest
import pyarrow as pa
import pyarrow.parquet as pq

from adt_str_tpu.config import FrameworkConfig
from adt_str_tpu.training import checkpoint as ckpt_lib
from adt_str_tpu.training.trainer import train

SR = 4000


def _write_tmidt_parquet(path, n_items=40):
    rng = np.random.default_rng(0)
    rows = {"audio_id": [], "audio": [], "sample_rate": [], "notes": []}
    for i in range(n_items):
        audio = (rng.normal(size=int(0.64 * SR)) * 0.2).astype(np.float32)
        n = int(rng.integers(1, 5))
        on = np.sort(rng.uniform(0, 0.5, n))
        notes = np.stack(
            [on, on + 0.05, rng.choice([35, 38, 42, 51], n), np.full(n, 100)], axis=1
        ).astype(np.float32)
        rows["audio_id"].append(f"t{i}.mp3")
        rows["audio"].append(audio.tobytes())
        rows["sample_rate"].append(SR)
        rows["notes"].append(notes.tobytes())
    schema = pa.schema(
        [
            pa.field("audio_id", pa.string()),
            pa.field("audio", pa.binary()),
            pa.field("sample_rate", pa.int32()),
            pa.field("notes", pa.binary()),
        ]
    )
    pq.write_table(pa.table(rows, schema=schema), path)


@pytest.mark.slow
def test_tmidt_training(tmp_path):
    data = tmp_path / "tmidt.parquet"
    _write_tmidt_parquet(str(data))
    cfg = FrameworkConfig.from_dict(
        {
            "shared": {"input_sec": 0.64, "time_res": 0.01, "win_length": 256, "sample_rate": SR},
            "model": {
                "enc_layers": 1, "dec_layers": 1, "nhead": 2, "d_query": 16,
                "dropout": 0.0, "tgt_vocab_size": 1400, "n_mels": 16,
                "compute_dtype": "float32", "max_positions": 64,
            },
            # TMIDT setting uses add_velocity: false (configs/train/TMIDT.yaml)
            "tokenizer": {"add_velocity": False},
            "training": {"batch_size": 1, "num_epochs": 3, "learning_rate": 1e-3,
                         "max_steps": 3},
            "TrainDatasetConfig": {
                "dataset_path": str(data), "dataset_name": "TMIDT",
                "empty_tokens_percentage": 0.1, "random_velocity_prob": 0.5,
                "max_tokens": 24,
            },
            "logging": {"output_dir": str(tmp_path / "out"), "logging_steps": 1},
            "experiment": {"seed": 0, "run_name": "tmidt-e2e"},
        }
    )
    state = train(cfg)
    assert int(state.step) == 3
    assert ckpt_lib.latest_checkpoint(tmp_path / "out" / "tmidt-e2e") is not None

    # teacher-forced validation loss (ADTTrainer.evaluate parity)
    from adt_str_tpu.data.datasets import TMIDTDataset
    from adt_str_tpu.domain.tokenizer import MidiTokenizer
    from adt_str_tpu.training.trainer import evaluate_loss

    ds = TMIDTDataset(cfg.train_data, MidiTokenizer(cfg.tokenizer))
    loss = evaluate_loss(state.params, cfg.model, ds, batch_size=4)
    assert np.isfinite(loss) and loss > 0
