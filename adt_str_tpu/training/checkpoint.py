"""Checkpointing: orbax save/restore + auto-resume + safetensors export.

Parity with the reference checkpoint behavior (SURVEY.md §5.4):

- save every `save_every_n_steps` under `checkpoint-epoch-{E}-step-{S}`
  (the reference's HF-Trainer directory pattern, `train.py:186`), plus a final
  save (`train.py:323`);
- `save_total_limit`-style GC keeping the newest `max_checkpoints`
  (`train.py:232`);
- auto-resume: newest `checkpoint-epoch-*-step-*` by mtime
  (`train.py:182-190`) or an explicit `resume_from_checkpoint` path;
- safetensors export/import in the reference's torch state-dict naming
  (via `models.torch_compat`) so checkpoints interoperate with the PyTorch
  reference for parity checks (`build_model.py:49-58`).
"""

from __future__ import annotations

import json
import os
import re
import shutil
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from adt_str_tpu.models.torch_compat import (
    params_from_torch_state_dict,
    params_to_torch_state_dict,
)

_CKPT_RE = re.compile(r"checkpoint-epoch-(\d+)-step-(\d+)$")


def checkpoint_name(epoch: int, step: int) -> str:
    return f"checkpoint-epoch-{epoch}-step-{step}"


def save_checkpoint(
    output_dir: str | Path,
    params: Any,
    opt_state: Any,
    step: int,
    epoch: int = 0,
    max_checkpoints: Optional[int] = None,
    export_safetensors_file: bool = True,
) -> str:
    output_dir = Path(output_dir)
    path = output_dir / checkpoint_name(epoch, step)
    # Multi-host: EVERY process must enter the orbax save (it synchronizes
    # across the jax cluster and elects the writer itself); calling it from
    # process 0 alone deadlocks its internal barrier (caught by
    # tests/test_multihost_train.py). The host-side extras (meta.json,
    # safetensors export, GC) are single-writer.
    ckptr = ocp.StandardCheckpointer()
    # jax.Arrays go to orbax as-is: it writes sharded global arrays natively,
    # so multi-host tensor-parallel params (each process holding only its
    # shards) save correctly. A host-side np.asarray here would raise on any
    # non-fully-addressable array and crash training at the first periodic
    # save (advisor finding, round 2).
    state = {"params": params, "opt_state": opt_state}
    # force=True: re-reaching a step after a rollback resume (older
    # resume_from_checkpoint while newer dirs still exist) must overwrite,
    # not crash the run with orbax's existing-directory ValueError
    ckptr.save((path / "state").absolute(), state, force=True)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        with open(path / "meta.json", "w") as f:
            json.dump({"step": int(step), "epoch": int(epoch)}, f)
        if export_safetensors_file and _host_readable(params):
            export_safetensors(params, path / "model.safetensors")
        if max_checkpoints:
            gc_checkpoints(output_dir, max_checkpoints)
    return str(path)


def _host_readable(tree: Any) -> bool:
    """True when every array leaf can be materialized on this host (needed by
    the safetensors export, which is a plain numpy write). Fully-replicated
    jax.Arrays and single-process arrays qualify; multi-host model-sharded
    params do not — the orbax state remains the authoritative checkpoint and
    the export is skipped for them."""
    ok = True
    for leaf in jax.tree.leaves(tree):
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            ok = ok and leaf.is_fully_replicated
    return ok


def gc_checkpoints(output_dir: str | Path, keep: int) -> None:
    ckpts = sorted(
        (p for p in Path(output_dir).glob("checkpoint-epoch-*-step-*") if _CKPT_RE.search(p.name)),
        key=lambda p: p.stat().st_mtime,
    )
    for p in ckpts[:-keep] if keep > 0 else []:
        shutil.rmtree(p, ignore_errors=True)


def latest_checkpoint(output_dir: str | Path) -> Optional[str]:
    """Newest checkpoint dir by mtime (auto-resume, train.py:182-190)."""
    ckpts = [
        p for p in Path(output_dir).glob("checkpoint-epoch-*-step-*") if _CKPT_RE.search(p.name)
    ]
    if not ckpts:
        return None
    return str(max(ckpts, key=lambda p: p.stat().st_mtime))


def restore_checkpoint(path: str | Path, abstract_state: Any) -> tuple[Any, Any, int, int]:
    """-> (params, opt_state, step, epoch). `abstract_state` is a matching
    pytree of arrays (e.g. freshly initialized) used as the restore template."""
    path = Path(path)
    ckptr = ocp.StandardCheckpointer()

    def _abstract(x):
        # Non-addressable leaves (multi-host sharded/replicated params)
        # restore straight onto their current sharding — a host-side
        # np.asarray would raise. Fully-addressable leaves restore as plain
        # numpy so they stay UNCOMMITTED: carrying a SingleDeviceSharding
        # here would pin e.g. optax counts to device 0 and clash with
        # mesh-sharded params inside the jitted step.
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return np.asarray(x)

    template = {
        "params": jax.tree.map(_abstract, abstract_state["params"]),
        "opt_state": jax.tree.map(_abstract, abstract_state["opt_state"]),
    }
    state = ckptr.restore((path / "state").absolute(), template)
    meta_path = path / "meta.json"
    if meta_path.exists():
        with open(meta_path) as f:
            meta = json.load(f)
        step, epoch = meta["step"], meta["epoch"]
    else:
        # a preemption between orbax finalization and the meta.json write
        # leaves a loadable state dir without meta; the directory name
        # encodes the same facts — fall back to it so auto-resume does not
        # crash-loop on a half-finalized checkpoint
        m = _CKPT_RE.search(path.name)
        if m is None:
            raise FileNotFoundError(
                f"{meta_path} missing and {path.name!r} does not follow the "
                "checkpoint-epoch-E-step-S naming"
            )
        epoch, step = int(m.group(1)), int(m.group(2))
    return state["params"], state["opt_state"], step, epoch


def export_safetensors(params: Any, path: str | Path) -> None:
    """Write reference-naming safetensors (consumable by the PyTorch side)."""
    from safetensors.numpy import save_file

    sd = params_to_torch_state_dict(params)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, str(path))


def load_params_from_reference_checkpoint(checkpoint_path: str | Path) -> Any:
    """Load model params from a reference-format checkpoint directory:
    `model.safetensors` preferred, `pytorch_model.bin` fallback
    (build_model.py:49-66, eval.py:180-225)."""
    checkpoint_path = Path(checkpoint_path)
    candidates = [
        checkpoint_path / "model.safetensors",
        checkpoint_path / "model.safetensor",
    ]
    st_path = next((p for p in candidates if p.exists()), None)
    if st_path is not None:
        from safetensors.numpy import load_file

        sd = load_file(str(st_path))
        return params_from_torch_state_dict(sd)
    bin_path = checkpoint_path / "pytorch_model.bin"
    if bin_path.exists():
        import torch

        ckpt = torch.load(str(bin_path), map_location="cpu", weights_only=True)
        for key in ("model_state_dict", "state_dict"):
            if key in ckpt:
                ckpt = ckpt[key]
                break
        sd = {k: v.numpy() for k, v in ckpt.items()}
        return params_from_torch_state_dict(sd)
    tried = ", ".join(str(p) for p in [*candidates, bin_path])
    raise FileNotFoundError(f"No checkpoint found at {checkpoint_path}. Looked for: {tried}")
