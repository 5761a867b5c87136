"""Training CLI: `python train.py configs/train/setting-1.yaml`.

Same entry contract as the reference (`train.py:344-354`): one positional
experiment YAML, deep-merged over `configs/config_default.yaml`. The loop
itself is `adt_str_tpu.training.trainer.train` (jit/shard_map TPU training
replacing HF Trainer + accelerate).
"""

import argparse

from adt_str_tpu.config import FrameworkConfig
from adt_str_tpu.training.trainer import train

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str)
    args = parser.parse_args()
    train(FrameworkConfig.from_yaml(args.config))
