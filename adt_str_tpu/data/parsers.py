"""Eval/train set text parsers: TMIDT, MDB-Drums, ENST-Drums -> parquet shards.

Parity with `data_modules/text_parser.py:33-434`: identical annotation-format
handling, label->MIDI maps, split tables, chunked parquet schemas (audio as
raw float32 bytes), demucs/wet-mix/drummer filename filters, and size-based
chunk flushing.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from glob import glob
from pathlib import Path
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from adt_str_tpu.config import SharedConfig
from adt_str_tpu.domain.segmenter import Segmenter
from adt_str_tpu.utils.audio_io import load_and_resample
from adt_str_tpu.utils.mappings import (
    ENST_TO_STANDARD_MIDI,
    MDB_TO_STANDARD_MIDI,
    TMIDT_TO_STANDARD_MIDI,
)
from adt_str_tpu.utils.midi_utils import MidiUtils

MDB_FILE_SPLITS = {
    0: ["MusicDelta_Punk_Drum", "MusicDelta_CoolJazz_Drum", "MusicDelta_Disco_Drum",
        "MusicDelta_SwingJazz_Drum", "MusicDelta_Rockabilly_Drum",
        "MusicDelta_Gospel_Drum", "MusicDelta_BebopJazz_Drum"],
    1: ["MusicDelta_FunkJazz_Drum", "MusicDelta_FreeJazz_Drum", "MusicDelta_Reggae_Drum",
        "MusicDelta_LatinJazz_Drum", "MusicDelta_Britpop_Drum",
        "MusicDelta_FusionJazz_Drum", "MusicDelta_Shadows_Drum", "MusicDelta_80sRock_Drum"],
    2: ["MusicDelta_Beatles_Drum", "MusicDelta_Grunge_Drum", "MusicDelta_Zeppelin_Drum",
        "MusicDelta_ModalJazz_Drum", "MusicDelta_Country1_Drum",
        "MusicDelta_SpeedMetal_Drum", "MusicDelta_Rock_Drum", "MusicDelta_Hendrix_Drum"],
}


@dataclass
class TextParserConfig:
    dataset_path: str
    output_path: str
    dataset_name: str
    audio_extension: str
    shared: SharedConfig
    drummers: Optional[list[int]] = None
    dataset_size: str = "m"  # TMIDT: 'm' or 'l'
    drums_only: bool = True
    chunk_size_mb: int = 512
    num_audio_files: Optional[int] = None


class DrumTextParser:
    """Base: file discovery + chunked parquet writing (`text_parser.py:33-86`)."""

    def __init__(self, config: TextParserConfig):
        self.config = config
        self.shared = config.shared
        self.audio_data_files = sorted(
            glob(
                os.path.join(config.dataset_path, f"**/*.{config.audio_extension}"),
                recursive=True,
            )
        )
        self.parquet_path = os.path.join(
            config.output_path, config.dataset_name, f"data@{self.shared.sample_rate}.parquet"
        )
        os.makedirs(os.path.dirname(self.parquet_path), exist_ok=True)
        self.midi_utils = MidiUtils()
        self.segmenter = Segmenter(self.shared)
        self.chunk_size_bytes = config.chunk_size_mb * 1024 * 1024

    def _estimate_batch_size(self, batch_rows: dict) -> int:
        total = 0
        for key, values in batch_rows.items():
            if not values:
                continue
            if key in ("audio", "notes"):
                total += sum(len(v) for v in values)
            else:
                total += len(values) * 50
        return total

    def _write_chunk(self, batch_rows: dict, schema: pa.Schema, chunk_index: int) -> None:
        if not batch_rows or not any(batch_rows.values()):
            return
        base_path = self.parquet_path.replace(".parquet", "")
        os.makedirs(base_path, exist_ok=True)
        pq.write_table(
            pa.table(batch_rows, schema=schema), f"{base_path}/{chunk_index:04d}.parquet"
        )
        for key in batch_rows:
            batch_rows[key] = []


class TMIDTTextParser(DrumTextParser):
    """mp3 + `annotations/drums_{m,l}/*.txt` lines `start label` with the
    TMIDT 8-class label map; keeps chunks with notes only
    (`text_parser.py:101-183`)."""

    SCHEMA = pa.schema(
        [
            pa.field("audio_id", pa.string()),
            pa.field("audio", pa.binary()),
            pa.field("sample_rate", pa.int32()),
            pa.field("notes", pa.binary()),
        ]
    )

    def __init__(self, config: TextParserConfig):
        super().__init__(config)
        self.annotation_path = os.path.join(config.dataset_path, "annotations")
        if config.drums_only:
            self.audio_data_files = [
                f for f in self.audio_data_files if "_accomp" not in f
            ]
        self.audio_data_files = sorted(
            f
            for f in self.audio_data_files
            if os.path.exists(self._annotation_file(f))
        )
        if config.num_audio_files:
            self.audio_data_files = self.audio_data_files[: config.num_audio_files]

    def _annotation_file(self, audio_file: str) -> str:
        return os.path.join(
            self.annotation_path,
            f"drums_{self.config.dataset_size}",
            Path(audio_file).name.replace(f".{self.config.audio_extension}", ".txt"),
        )

    def parse(self) -> None:
        batch = {"audio_id": [], "audio": [], "sample_rate": [], "notes": []}
        chunk_index = 0
        for audio_file in self.audio_data_files:
            audio_id = Path(audio_file).name
            notes = []
            try:
                # annotation parse sits INSIDE the skip-on-error scope: one
                # malformed line (non-numeric field, unknown label) skips the
                # file, it must not abort the whole dataset conversion
                with open(self._annotation_file(audio_file)) as f:
                    for line in f:
                        content = line.split()
                        if content:
                            start, label = float(content[0]), int(content[1])
                            notes.append(
                                [start, start + 0.1, TMIDT_TO_STANDARD_MIDI[label], 100]
                            )
                notes = sorted(notes, key=lambda x: (x[0], x[1]))
                audio = load_and_resample(audio_file, self.shared.sample_rate)
                audio_chunks, notes_chunks = self.segmenter.chunk_audio_and_notes(
                    audio, np.array(notes, dtype=np.float32).reshape(-1, 4)
                )
            except Exception as e:  # skip unreadable/inconsistent files
                print(e)
                continue
            for audio_chunk, notes_chunk in zip(audio_chunks, notes_chunks):
                if not len(notes_chunk):
                    continue
                batch["audio_id"].append(audio_id)
                batch["audio"].append(audio_chunk.astype(np.float32).tobytes())
                batch["sample_rate"].append(self.shared.sample_rate)
                batch["notes"].append(np.asarray(notes_chunk, np.float32).tobytes())
                if self._estimate_batch_size(batch) >= self.chunk_size_bytes:
                    self._write_chunk(batch, self.SCHEMA, chunk_index)
                    chunk_index += 1
        if any(batch.values()):
            self._write_chunk(batch, self.SCHEMA, chunk_index)


class MDBDrumTextParser(DrumTextParser):
    """MDB-Drums: `drum_only`/`demucs_separated` wavs + subclass annotations,
    3 fixed genre splits, demucs flag column (`text_parser.py:191-296`)."""

    SCHEMA = pa.schema(
        [
            pa.field("audio_id", pa.string()),
            pa.field("audio", pa.binary()),
            pa.field("sample_rate", pa.int32()),
            pa.field("notes", pa.binary()),
            pa.field("split", pa.int32()),
            pa.field("is_demucs_separated", pa.bool_()),
        ]
    )

    def __init__(self, config: TextParserConfig):
        super().__init__(config)
        self.audio_data_files = sorted(
            f
            for f in self.audio_data_files
            if any(name in f for name in ["drum_only", "demucs_separated"])
            and "no_drums" not in f
        )
        self.annotation_path = os.path.join(
            config.dataset_path, "annotations", "subclass"
        )

    def get_split(self, audio_file: str) -> int:
        for split, genres in MDB_FILE_SPLITS.items():
            if any(genre in audio_file for genre in genres):
                return split
        return -1

    def parse(self) -> None:
        batch = {
            "audio_id": [], "audio": [], "sample_rate": [], "notes": [],
            "split": [], "is_demucs_separated": [],
        }
        chunk_index = 0
        for audio_file in self.audio_data_files:
            audio_id = Path(audio_file).name
            is_demucs = "_MIX_drums.wav" in audio_file
            audio_id = audio_id.replace("_MIX_drums.wav", "_Drum.wav")
            notes = []
            ann = os.path.join(
                self.annotation_path, audio_id.replace("_Drum.wav", "_subclass.txt")
            )
            with open(ann) as f:
                for line in f:
                    content = line.split()
                    if content:
                        start, label = content[0], content[1]
                        pitch = MDB_TO_STANDARD_MIDI[label]
                        if self.midi_utils.valid_note_per_instrument("drums", pitch):
                            notes.append([float(start), float(start) + 0.1, pitch, 100])
            notes = sorted(notes, key=lambda x: (x[0], x[1]))
            audio = load_and_resample(audio_file, self.shared.sample_rate)
            audio_chunks, notes_chunks = self.segmenter.chunk_audio_and_notes(
                audio, np.array(notes, dtype=np.float32).reshape(-1, 4)
            )
            for audio_chunk, notes_chunk in zip(audio_chunks, notes_chunks):
                batch["audio_id"].append(audio_id)
                batch["audio"].append(audio_chunk.astype(np.float32).tobytes())
                batch["sample_rate"].append(self.shared.sample_rate)
                batch["notes"].append(np.asarray(notes_chunk, np.float32).tobytes())
                batch["split"].append(self.get_split(audio_file))
                batch["is_demucs_separated"].append(is_demucs)
                if self._estimate_batch_size(batch) >= self.chunk_size_bytes:
                    self._write_chunk(batch, self.SCHEMA, chunk_index)
                    chunk_index += 1
        if any(batch.values()):
            self._write_chunk(batch, self.SCHEMA, chunk_index)


class ENSTDrumTextParser(DrumTextParser):
    """ENST-Drums: wet_mix wavs + per-drummer annotation txts
    (`text_parser.py:304-414`)."""

    SCHEMA = pa.schema(
        [
            pa.field("audio_id", pa.string()),
            pa.field("drummer", pa.string()),
            pa.field("audio", pa.binary()),
            pa.field("sample_rate", pa.int32()),
            pa.field("notes", pa.binary()),
        ]
    )

    def __init__(self, config: TextParserConfig):
        super().__init__(config)
        self.audio_data_files = [f for f in self.audio_data_files if "wet_mix" in f]
        if config.drummers:
            names = [f"drummer_{d}" for d in config.drummers]
            self.audio_data_files = [
                f for f in self.audio_data_files if any(d in f for d in names)
            ]
        self.audio_data_files.sort()
        # divergence: the reference pins ENST's flush threshold to
        # 8196 MB (text_parser.py:322, likely an 8192 typo) which in practice
        # buffers the whole dataset in RAM before one giant parquet write;
        # the configured chunk_size_mb is honored instead — flush boundaries
        # only change file sizes, never the concatenated dataset contents

    @staticmethod
    def _path_part(path: str, needle: str) -> str:
        for part in path.split("/"):
            if needle in part:
                return part
        return ""

    def parse(self) -> None:
        batch = {"audio_id": [], "drummer": [], "audio": [], "sample_rate": [], "notes": []}
        chunk_index = 0
        for audio_file in self.audio_data_files:
            drummer = self._path_part(audio_file, "drummer")
            file_name = Path(audio_file).name
            audio_id = f"{drummer}_{file_name}"
            text_file = os.path.join(
                self.config.dataset_path, drummer, "annotation",
                file_name.replace(".wav", ".txt"),
            )
            notes = []
            with open(text_file) as f:
                for line in f:
                    content = line.split()
                    if content:
                        start, label = content[0], content[1]
                        pitch = ENST_TO_STANDARD_MIDI[label]
                        if self.midi_utils.valid_note_per_instrument("drums", pitch):
                            notes.append([float(start), float(start) + 0.1, pitch, 100])
            notes = sorted(notes, key=lambda x: (x[0], x[1]))
            audio = load_and_resample(audio_file, self.shared.sample_rate)
            try:
                audio_chunks, notes_chunks = self.segmenter.chunk_audio_and_notes(
                    audio, np.array(notes, dtype=np.float32).reshape(-1, 4)
                )
            except ValueError as e:
                print(e)
                continue
            for audio_chunk, notes_chunk in zip(audio_chunks, notes_chunks):
                batch["audio_id"].append(audio_id)
                batch["drummer"].append(drummer)
                batch["audio"].append(audio_chunk.astype(np.float32).tobytes())
                batch["sample_rate"].append(self.shared.sample_rate)
                batch["notes"].append(np.asarray(notes_chunk, np.float32).tobytes())
                if self._estimate_batch_size(batch) >= self.chunk_size_bytes:
                    self._write_chunk(batch, self.SCHEMA, chunk_index)
                    chunk_index += 1
        if any(batch.values()):
            self._write_chunk(batch, self.SCHEMA, chunk_index)
