"""Evaluation CLI: `python eval.py configs/eval/ENSTinference.yaml [-e]`.

Same contract as the reference (`eval.py:524-539`): merged YAML drives model
checkpoint, eval dataset (ENST/MDB with filters), decoding mode, and output
paths; `-e/--exclude_ref_empty` suppresses false positives on empty-reference
items. Loads either this framework's orbax checkpoints or reference-format
safetensors/pytorch_model.bin directories.
"""

import argparse
import logging
from pathlib import Path

from adt_str_tpu.utils.misc import pin_jax_platform_from_env

pin_jax_platform_from_env()

from adt_str_tpu.config import FrameworkConfig
from adt_str_tpu.data.datasets import ENSTDataset, MDBDataset
from adt_str_tpu.domain.tokenizer import MidiTokenizer
from adt_str_tpu.evaluation.harness import run_inference
from adt_str_tpu.training.checkpoint import load_params_from_reference_checkpoint
from adt_str_tpu.utils.misc import setup_logging

logger = logging.getLogger(__name__)


def load_params(checkpoint_path: str):
    """safetensors / pytorch_model.bin (reference format, both exported by our
    trainer too) from a checkpoint directory."""
    return load_params_from_reference_checkpoint(checkpoint_path)


def main(cfg: FrameworkConfig, exclude_ref_empty: bool = False):
    setup_logging(cfg.logging.log_level)
    from adt_str_tpu.parallel import mesh as mesh_lib

    mesh_lib.maybe_initialize_distributed()
    checkpoint_path = cfg.inference.checkpoint_path
    if not checkpoint_path:
        raise ValueError("inference.checkpoint_path is required")

    logger.info("Loading model from checkpoint: %s", checkpoint_path)
    params = load_params(checkpoint_path)

    tokenizer = MidiTokenizer(cfg.tokenizer)
    assert cfg.eval_data is not None, "EvalDatasetConfig section is required"
    if cfg.eval_data.dataset_name == "ENST":
        dataset = ENSTDataset(cfg.eval_data, tokenizer)
    elif cfg.eval_data.dataset_name == "MDB":
        dataset = MDBDataset(cfg.eval_data, tokenizer)
    else:
        raise ValueError(f"Dataset name {cfg.eval_data.dataset_name} not supported")
    logger.info("Dataset size: %d", len(dataset))

    # data-parallel decode over all available devices (the reference
    # evaluates on one device, eval.py:452); multi-host runs stride each
    # global batch's rows across processes (harness.run_inference)
    import jax

    mesh = None
    if len(jax.devices()) > 1:
        mesh = mesh_lib.make_mesh(n_data=len(jax.devices()), n_model=1)
        logger.info(
            "sharding eval decode over %d devices (%d processes)",
            len(jax.devices()), jax.process_count(),
        )

    metrics = run_inference(
        params,
        cfg.model,
        dataset,
        tokenizer,
        cfg.inference,
        exclude_ref_empty=exclude_ref_empty,
        mesh=mesh,
    )
    logger.info("=" * 50)
    logger.info("RESULTS:")
    logger.info("Precision: %.4f", metrics["all"]["precision"])
    logger.info("Recall:    %.4f", metrics["all"]["recall"])
    logger.info("F1-Score:  %.4f", metrics["all"]["f_measure"])
    return metrics


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str, help="Path to config file")
    parser.add_argument(
        "-e",
        "--exclude_ref_empty",
        action="store_true",
        help="Exclude false positives when reference is empty",
    )
    args = parser.parse_args()
    main(FrameworkConfig.from_yaml(args.config), exclude_ref_empty=args.exclude_ref_empty)
