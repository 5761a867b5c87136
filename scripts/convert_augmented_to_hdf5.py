"""Augmented tree -> one-shot HDF5 CLI (reference
`data_modules/convert_augmented_to_hdf5.py`).

Usage: python scripts/convert_augmented_to_hdf5.py <input_root> <output_prefix>
       [--sample_rate 44100] [--overwrite]

The default sample rate mirrors the reference CLI (44100,
convert_augmented_to_hdf5.py:44). NOTE: training/inference open the bank at
`<oneshot_path>@<shared.sample_rate>.hdf5` — for the setting-1 pipeline pass
`--sample_rate 24000` explicitly or the bank will not be found at train time.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from adt_str_tpu.clap.curation import convert_augmented_to_hdf5
from adt_str_tpu.utils.misc import setup_logging

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("input_root", type=str)
    parser.add_argument("output_hdf5", type=str)
    parser.add_argument("--sample_rate", type=int, default=44100)
    parser.add_argument("--overwrite", action="store_true")
    args = parser.parse_args()
    setup_logging()
    convert_augmented_to_hdf5(
        args.input_root, args.output_hdf5, args.sample_rate, args.overwrite
    )
