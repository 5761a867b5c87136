"""CLAP curation CLI (reference `data_modules/augment_data_with_CLAP.py`).

Usage: python scripts/augment_data_with_clap.py configs/preprocess/clap.yaml
       [--num_bins 10]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from adt_str_tpu.utils.misc import pin_jax_platform_from_env

pin_jax_platform_from_env()

from adt_str_tpu.config import ClapConfig, load_merged_config, make_dataclass_from
from adt_str_tpu.utils.misc import setup_logging


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("config_path", type=str)
    parser.add_argument("--num_bins", type=int, default=10)
    args = parser.parse_args()
    # fail fast BEFORE the CLAP model load; same rule curate_library enforces
    from adt_str_tpu.clap.curation import validate_num_bins

    try:
        validate_num_bins(args.num_bins)
    except ValueError as e:
        parser.error(str(e))

    setup_logging()
    cfg = load_merged_config(args.config_path)
    clap_cfg = make_dataclass_from(
        ClapConfig, cfg.get("clap_config", {}), cfg.get("shared", {})
    )

    from adt_str_tpu.parallel import mesh as mesh_lib

    # pod launches: bring up jax.distributed BEFORE any backend query (same
    # contract as train.py/eval.py) — without it every host believes it is a
    # single-process run, the encode never stripes, and every host races the
    # single-writer copy stage on the shared filesystem
    mesh_lib.maybe_initialize_distributed()

    import jax

    from adt_str_tpu.clap.curation import curate_library
    from adt_str_tpu.clap.model import ClapWrapper

    # from_dir derives tower archs from the checkpoint's config.json, so any
    # local CLAP checkpoint works (full htsat-fused or a small local one)
    wrapper = ClapWrapper.from_dir(clap_cfg.model_name, sample_rate=clap_cfg.sample_rate)
    mesh = mesh_lib.make_mesh() if len(jax.devices()) > 1 else None
    curate_library(
        wrapper,
        clap_cfg.sample_pack_root,
        clap_cfg.reference_root,
        sample_rate=clap_cfg.sample_rate,
        batch_size=clap_cfg.batch_size,
        num_bins=args.num_bins,
        mesh=mesh,
    )


if __name__ == "__main__":
    main()
