"""Gold-bin consolidation CLI (reference
`data_modules/copy_originals_to_augmented.py`).

Usage: python scripts/copy_originals_to_augmented.py <reference_root>
       [--augmented_root PATH]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from adt_str_tpu.clap.curation import copy_originals_to_augmented

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("reference_root", type=str)
    parser.add_argument("--augmented_root", type=str, default=None)
    args = parser.parse_args()
    copy_originals_to_augmented(args.reference_root, args.augmented_root)
