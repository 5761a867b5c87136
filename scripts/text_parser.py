"""Eval/train-set text parser CLI (reference `data_modules/text_parser.py`).

Usage: python scripts/text_parser.py configs/preprocess/ENST_preprocess.yaml
(the `EvalDataPreprocess.dataset_name` section selects ENST / MDB / TMIDT).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from adt_str_tpu.config import SharedConfig, load_merged_config, make_dataclass_from
from adt_str_tpu.data.parsers import (
    ENSTDrumTextParser,
    MDBDrumTextParser,
    TextParserConfig,
    TMIDTTextParser,
)
from adt_str_tpu.utils.misc import setup_logging

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("config_path", type=str)
    args = parser.parse_args()
    setup_logging()
    cfg = load_merged_config(args.config_path)
    section = cfg.get("EvalDataPreprocess", {})
    shared = make_dataclass_from(SharedConfig, cfg.get("shared", {}))
    pcfg = TextParserConfig(
        dataset_path=section["dataset_path"],
        output_path=section["output_path"],
        dataset_name=section["dataset_name"],
        audio_extension=section.get("audio_extension", "wav"),
        shared=shared,
        drummers=section.get("drummers"),
        dataset_size=section.get("dataset_size", "m"),
        drums_only=section.get("drums_only", True),
        num_audio_files=section.get("num_audio_files"),
        chunk_size_mb=section.get("chunk_size_mb", 512),
    )
    name = section["dataset_name"]
    if name == "ENST":
        ENSTDrumTextParser(pcfg).parse()
    elif name == "MDB":
        MDBDrumTextParser(pcfg).parse()
    elif name == "TMIDT":
        TMIDTTextParser(pcfg).parse()
    else:
        raise ValueError(f"Dataset name {name} not supported")
