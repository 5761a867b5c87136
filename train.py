"""Training CLI: `python train.py configs/train/setting-1.yaml`.

Same entry contract as the reference (`train.py:344-354`): one positional
experiment YAML, deep-merged over `configs/config_default.yaml`. The loop
itself is `adt_str_tpu.training.trainer.train` (jit/shard_map TPU training
replacing HF Trainer + accelerate).
"""

import argparse

import jax

from adt_str_tpu.utils.misc import pin_jax_platform_from_env

pin_jax_platform_from_env()

from adt_str_tpu.config import FrameworkConfig
from adt_str_tpu.parallel import mesh as mesh_lib
from adt_str_tpu.training.trainer import train


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str)
    args = parser.parse_args(argv)
    # multi-host bring-up MUST precede any backend query (the
    # jax.default_backend() call below initializes XLA, after which
    # jax.distributed.initialize refuses to run — the CLI would silently
    # train as N independent single-host jobs; see parallel/mesh.py)
    mesh_lib.maybe_initialize_distributed()
    if jax.default_backend() != "cpu":
        # hardware RNG for dropout masks (threefry dominates the step on TPU)
        jax.config.update("jax_default_prng_impl", "rbg")
    return train(FrameworkConfig.from_yaml(args.config))


if __name__ == "__main__":
    main()
