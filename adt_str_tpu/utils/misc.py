"""Misc host utilities (parity with the surviving pieces of
`utils/utils.py:116-268` not superseded by the functional model code).

`create_mask_plain`-family mask builders live in `models/transformer.py`
(additive-mask forms); device pickers are obsolete under JAX (the runtime owns
placement). What remains here: seeded file shuffling, array helpers, HDF5
segment writers, and the clamped-normal sampler (re-exported from synth.fx).
"""

from __future__ import annotations

import logging
import random
from collections import Counter
from pathlib import Path

import numpy as np


def setup_logging(log_level: str = "INFO") -> None:
    """Uniform logging format (reference train.py:144-152 / eval.py:150-158)."""
    logging.basicConfig(
        format="%(asctime)s - %(levelname)s - %(name)s - %(message)s",
        datefmt="%m/%d/%Y %H:%M:%S",
        level=getattr(logging, log_level.upper()),
        # the TPU runtime plugin installs a root handler at import time, which
        # would make a plain basicConfig a silent no-op
        force=True,
    )


def file_shuffle(files: list, seed_fix: bool) -> list:
    """Sort + optionally seed-1 shuffle (utils/utils.py:193-200)."""
    files = sorted(files, key=lambda x: str(Path(x)))
    if seed_fix:
        rng = random.Random(1)
        rng.shuffle(files)
    return files


def my_vstack(array1, array2):
    if len(array1) == 0:
        return array2
    if len(array2) == 0:
        return array1
    return np.vstack((array1, array2))


def pad_arrays(array1: np.ndarray, array2: np.ndarray):
    len1, len2 = len(array1), len(array2)
    if len1 > len2:
        array2 = np.pad(array2, (0, len1 - len2), mode="constant")
    elif len2 > len1:
        array1 = np.pad(array1, (0, len2 - len1), mode="constant")
    return array1, array2


def get_random_mode(lst, rng: random.Random | None = None):
    """Most frequent element, random among ties (utils/utils.py:218-222)."""
    counter = Counter(lst)
    max_count = max(counter.values())
    modes = [key for key, count in counter.items() if count == max_count]
    return (rng or random).choice(modes)


def create_one_hot(length: int, index: int) -> np.ndarray:
    one_hot = np.zeros(length, dtype=np.float32)
    one_hot[index] = 1.0
    return one_hot


def save_to_hdf(hf, inst_group, wav_seg, tokens) -> None:
    """Sequential seg{N} group writer (utils/utils.py:143-157)."""
    group = hf if inst_group is None else hf.require_group(inst_group)
    seg_group = group.create_group(f"seg{len(group.keys())}")
    seg_group.create_dataset("wav", data=wav_seg)
    if tokens is not None:
        seg_group.create_dataset("midi", data=tokens)


def save_to_hdf_variations(hf, inst_group, wav_seg, tokens) -> None:
    """Variant writer with 3 token variations (utils/utils.py:159-174)."""
    group = hf if inst_group is None else hf.require_group(inst_group)
    seg_group = group.create_group(f"seg{len(group.keys())}")
    seg_group.create_dataset("wav", data=wav_seg)
    if tokens is not None:
        for i in range(3):
            seg_group.create_dataset(f"midi{i}", data=tokens[i])


def pin_jax_platform_from_env() -> None:
    """Honor the JAX_PLATFORMS env var even under PJRT plugins that register
    themselves ahead of env handling (this image's `axon` plugin overrides
    the variable at interpreter startup). Must run before any JAX backend
    query; a no-op when the variable is unset or JAX is already initialized.
    Lets `JAX_PLATFORMS=cpu python train.py ...` behave as documented (the
    CLI smoke tests rely on it to stay hermetic)."""
    import os

    value = os.environ.get("JAX_PLATFORMS")
    if not value:
        return
    import jax

    try:
        jax.config.update("jax_platforms", value)
    except RuntimeError:  # pragma: no cover - backend already initialized
        pass


def enable_persistent_compilation_cache() -> None:
    """Enable JAX's persistent compilation cache under the system temp dir.

    Compiled executables are keyed by HLO hash, so reruns of the driver
    entry points (bench.py, __graft_entry__, the CLIs) skip recompilation —
    which on this image also sidesteps a flaky remote-compile tunnel once a
    healthy run has populated the cache."""
    import os
    import tempfile

    import jax

    path = os.path.join(tempfile.gettempdir(), "adt_str_tpu_jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax without the knobs
        pass
