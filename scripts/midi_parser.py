"""Lakh MIDI -> parquet CLI (reference `data_modules/midi_parser.py`).

Usage: python scripts/midi_parser.py configs/preprocess/make_dataset.yaml
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from adt_str_tpu.config import SharedConfig, load_merged_config, make_dataclass_from
from adt_str_tpu.data.lakh import LakhMidiParser
from adt_str_tpu.utils.misc import setup_logging

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("config_path", type=str)
    args = parser.parse_args()
    setup_logging()
    cfg = load_merged_config(args.config_path)
    pre = cfg.get("preprocess", {})
    shared = make_dataclass_from(SharedConfig, cfg.get("shared", {}))
    LakhMidiParser(
        midi_root=pre["midi_root"],
        dump_path=pre["dump_path"],
        shared=shared,
        partitions=pre.get("partitions"),
        n_jobs=int(pre.get("n_jobs", 1) or 1),
        dataset_name=pre.get("dataset_name", "lakh_matched"),
    ).create_dataset()
