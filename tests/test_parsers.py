"""Text-parser tests (component #16): synthetic ENST / MDB / TMIDT trees ->
parquet shards consumable by the eval/train datasets."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from adt_str_tpu.config import EvalDataConfig, SharedConfig, TokenizerConfig, TrainDataConfig
from adt_str_tpu.data.datasets import MDBDataset, TMIDTDataset
from adt_str_tpu.data.parsers import (
    ENSTDrumTextParser,
    MDBDrumTextParser,
    TextParserConfig,
    TMIDTTextParser,
)
from adt_str_tpu.domain.tokenizer import MidiTokenizer
from adt_str_tpu.utils.audio_io import write_wav

SR = 4000
SHARED = SharedConfig(input_sec=0.64, time_res=0.01, win_length=256, sample_rate=SR)


def tone(sec=1.5):
    t = np.arange(int(sec * SR)) / SR
    return (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)


def test_enst_parser(tmp_path):
    root = tmp_path / "ENST"
    audio_dir = root / "drummer_1" / "audio" / "wet_mix" / "accompaniment_x"
    ann_dir = root / "drummer_1" / "annotation"
    audio_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    write_wav(audio_dir / "107_minus-one_salsa_sticks.wav", tone(), SR)
    (ann_dir / "107_minus-one_salsa_sticks.txt").write_text(
        "0.10 bd\n0.30 sd\n0.50 chh\n0.90 cr\n"
    )
    out = tmp_path / "out"
    parser = ENSTDrumTextParser(
        TextParserConfig(
            dataset_path=str(root), output_path=str(out), dataset_name="ENST",
            audio_extension="wav", shared=SHARED,
        )
    )
    parser.parse()
    shards = list((out / "ENST" / f"data@{SR}").glob("*.parquet"))
    assert shards
    table = pq.read_table(shards[0])
    assert table.num_rows >= 2  # 1.5 s audio -> 3 chunks of 0.64 s
    notes0 = np.frombuffer(table.column("notes")[0].as_py(), np.float32).reshape(-1, 4)
    # bd=35, sd=38, chh=42 within the first chunk
    assert set(notes0[:, 2].astype(int)) == {35, 38, 42}
    assert table.column("drummer")[0].as_py() == "drummer_1"


def test_mdb_parser_and_dataset(tmp_path):
    root = tmp_path / "MDB"
    audio_dir = root / "audio" / "drum_only"
    ann_dir = root / "annotations" / "subclass"
    audio_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    write_wav(audio_dir / "MusicDelta_Punk_Drum.wav", tone(), SR)
    (ann_dir / "MusicDelta_Punk_subclass.txt").write_text("0.10 KD\n0.40 SD\n")
    out = tmp_path / "out"
    MDBDrumTextParser(
        TextParserConfig(
            dataset_path=str(root), output_path=str(out), dataset_name="MDB",
            audio_extension="wav", shared=SHARED,
        )
    ).parse()
    shard_dir = out / "MDB" / f"data@{SR}"
    shards = list(shard_dir.glob("*.parquet"))
    assert shards
    table = pq.read_table(shards[0])
    assert table.column("split")[0].as_py() == 0  # Punk is split 0
    assert table.column("is_demucs_separated")[0].as_py() is False

    # shards load into the eval dataset with filters applied
    tok = MidiTokenizer(TokenizerConfig())
    ds = MDBDataset(
        EvalDataConfig(
            dataset_path=str(shard_dir), dataset_name="MDB",
            demucs_separated=False, splits=[0],
            input_sec=0.64, sample_rate=SR, win_length=256,
        ),
        tok,
    )
    assert len(ds) >= 2
    wav, notes = ds[0]
    assert notes[0, 2] == 35  # KD -> 35 (identity under GM custom)


def test_tmidt_parser_and_dataset(tmp_path):
    root = tmp_path / "TMIDT"
    ann_dir = root / "annotations" / "drums_m"
    root.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    write_wav(root / "track_01.wav", tone(), SR)
    (ann_dir / "track_01.txt").write_text("0.10 0\n0.30 1\n0.50 3\n")
    out = tmp_path / "out"
    TMIDTTextParser(
        TextParserConfig(
            dataset_path=str(root), output_path=str(out), dataset_name="TMIDT",
            audio_extension="wav", shared=SHARED, dataset_size="m",
        )
    ).parse()
    shard_dir = out / "TMIDT" / f"data@{SR}"
    shards = list(shard_dir.glob("*.parquet"))
    assert shards
    table = pq.read_table(shards[0])
    # chunks without notes are dropped (text_parser.py:166-168)
    for i in range(table.num_rows):
        notes = np.frombuffer(table.column("notes")[i].as_py(), np.float32)
        assert notes.size > 0

    tok = MidiTokenizer(TokenizerConfig(add_velocity=False))
    ds = TMIDTDataset(
        TrainDataConfig(
            dataset_path=str(shard_dir), dataset_name="TMIDT",
            empty_tokens_percentage=0.0, random_velocity_prob=0.5,
            max_tokens=32, input_sec=0.64, sample_rate=SR, win_length=256,
        ),
        tok,
    )
    ex = ds.example(0, np.random.default_rng(0))
    assert ex["wavs"].shape == (int(0.64 * SR),)
    assert ex["tokens"][0] == 2
