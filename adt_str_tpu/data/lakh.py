"""Lakh MIDI -> drum-note parquet shards.

Parity with `data_modules/midi_parser.py:21-152`: walks `lmd_matched`-style
A-Z partitions, keeps drum instruments (channel 10) only, notes as
[start, start+0.1, pitch, velocity] with pitch validity 35-81
(`midi_parser.py:116-120`), sorts by (onset, offset), segments with the
canonical Segmenter (dropping chunk-straddling notes), and writes one parquet
per partition with schema (midi_id: string, segment_number: int32,
notes: binary float32 rows) (`midi_parser.py:57-63, 98-99`).

Parallelism: optional process pool (`n_jobs`), sequential fallback — this is
host-side preprocessing, not the TPU path.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from adt_str_tpu.config import SharedConfig
from adt_str_tpu.domain.segmenter import Segmenter
from adt_str_tpu.utils.midi_io import read_midi
from adt_str_tpu.utils.midi_utils import MidiUtils

SCHEMA = pa.schema(
    [
        pa.field("midi_id", pa.string()),
        pa.field("segment_number", pa.int32()),
        pa.field("notes", pa.binary()),
    ]
)


class LakhMidiParser:
    def __init__(
        self,
        midi_root: str,
        dump_path: str,
        shared: SharedConfig,
        partitions: list[str] | None = None,
        n_jobs: int = 1,
        dataset_name: str = "lakh_matched",
    ):
        self.midi_root = midi_root
        self.dump_path = os.path.join(dump_path, dataset_name)
        os.makedirs(self.dump_path, exist_ok=True)
        all_partitions = [chr(c) for c in range(ord("A"), ord("Z") + 1)]
        if partitions is None:
            partitions = all_partitions
        for p in partitions:
            assert isinstance(p, str) and len(p) == 1 and p in all_partitions
        self.partitions = partitions
        self.n_jobs = n_jobs
        self.midi_utils = MidiUtils()
        self.segmenter = Segmenter(shared)

    def parse_midi(self, midi_file: Path) -> dict | None:
        """One MIDI file -> rows dict, or None on parse failure
        (failures skipped, midi_parser.py:72-76)."""
        try:
            instruments = read_midi(midi_file)
        except Exception:
            return None
        rows = {"midi_id": [], "segment_number": [], "notes": []}
        for inst in instruments:
            if not inst.is_drum:
                continue
            notes = [
                [n[0], n[0] + 0.1, n[2], n[3]]
                for n in inst.notes
                if self.midi_utils.valid_note_per_instrument("drums", int(n[2]))
            ]
            notes = sorted(notes, key=lambda x: (x[0], x[1]))
            if not notes:
                continue
            for i, chunk in enumerate(self.segmenter.chunk_notes(np.array(notes))):
                if len(chunk):
                    rows["midi_id"].append(midi_file.stem)
                    rows["segment_number"].append(i)
                    rows["notes"].append(
                        np.asarray(chunk, dtype=np.float32).tobytes()
                    )
        return rows

    def process_partition(self, partition: str) -> str:
        midi_files = sorted(Path(os.path.join(self.midi_root, partition)).rglob("*.mid"))
        batch = {"midi_id": [], "segment_number": [], "notes": []}

        if self.n_jobs > 1:
            from concurrent.futures import ProcessPoolExecutor

            with ProcessPoolExecutor(max_workers=self.n_jobs) as ex:
                results = ex.map(self.parse_midi, midi_files)
                for rows in results:
                    if rows:
                        for k in batch:
                            batch[k].extend(rows[k])
        else:
            for midi_file in midi_files:
                rows = self.parse_midi(midi_file)
                if rows:
                    for k in batch:
                        batch[k].extend(rows[k])

        out = os.path.join(self.dump_path, f"{partition}.parquet")
        pq.write_table(pa.table(batch, schema=SCHEMA), out)
        return out

    def create_dataset(self) -> list[str]:
        return [self.process_partition(p) for p in self.partitions]
