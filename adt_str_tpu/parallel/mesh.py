"""Device mesh and sharding layout.

The reference delegates all parallelism to HF Trainer/accelerate (DDP/NCCL,
SURVEY.md §2.4; `README.md:45-57`) with zero repo-level collective code. The
TPU-native equivalent: a 2-D `jax.sharding.Mesh` with axes

- `data`: batch (data parallel). Gradient reduction becomes an XLA `psum`
  over ICI inserted by pjit — the NCCL-allreduce equivalent.
- `model`: tensor parallel — FFN and attention projections are sharded
  column-wise then row-wise (Megatron layout) so each block needs a single
  reduce per residual branch; the vocab-sharded generator reduces once at the
  loss.

The flagship model is small (~65 M params), so `model=1` (pure DP) is the
default production layout; the TP axis exists, is tested on a virtual 8-device
CPU mesh, and is exercised by `__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = dict[str, Any]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_initialize_distributed() -> None:
    """Multi-host bring-up: `jax.distributed.initialize` when the standard
    cluster env vars are present (COORDINATOR_ADDRESS or a TPU pod slice).
    Single-host/single-chip runs are untouched. The reference's multi-node
    path was `accelerate launch` + NCCL (README.md:53-57); here the JAX
    runtime owns DCN coordination and the mesh spans all global devices.

    Env contract (mirrors `accelerate`'s MASTER_ADDR/RANK/WORLD_SIZE): when
    COORDINATOR_ADDRESS, NUM_PROCESSES and PROCESS_ID are all set they are
    passed explicitly (any launcher works — tests/test_multihost_bringup.py
    drives a real two-process CPU cluster this way); with only
    COORDINATOR_ADDRESS set, JAX's cluster auto-detection fills in the rest
    (TPU pod slices, SLURM, GKE)."""
    import os

    # Must not touch jax.process_count()/jax.devices() here: any backend query
    # initializes XLA and jax.distributed.initialize then refuses to run
    # (caught by tests/test_multihost_bringup.py).
    if jax.distributed.is_initialized():
        return
    addr = os.environ.get("COORDINATOR_ADDRESS")
    if not (addr or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")):
        return
    nproc = os.environ.get("NUM_PROCESSES")
    pid = os.environ.get("PROCESS_ID")
    explicit = bool(addr and nproc is not None and pid is not None)
    try:
        if explicit:
            jax.distributed.initialize(
                coordinator_address=addr,
                num_processes=int(nproc),
                process_id=int(pid),
            )
        else:
            jax.distributed.initialize()
    except Exception as e:
        # Reaching this point at all means the env signaled multi-host intent
        # (COORDINATOR_ADDRESS or MEGASCALE_*, see the gate above). A cluster
        # that fails to form must NOT silently degrade to single-host: every
        # host would train an identical independent same-seed job and clobber
        # the shared checkpoints. Classic causes: a backend query ran before
        # this call, or a partially-set env (e.g. PROCESS_ID forgotten).
        raise RuntimeError(
            "jax.distributed.initialize failed despite a multi-host env "
            "(COORDINATOR_ADDRESS/MEGASCALE set"
            + ("" if explicit else "; NUM_PROCESSES/PROCESS_ID incomplete")
            + f"): {e}"
        ) from e


def make_mesh(
    n_data: int = -1, n_model: int = 1, devices: list | None = None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data == -1:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
        f"have {len(devices)}"
    )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _attn_spec() -> Params:
    # in_proj columns hold heads (Q|K|V each d_model wide, head-major inside)
    return {
        "in_proj": {"w": P(None, MODEL_AXIS), "b": P(MODEL_AXIS)},
        "out_proj": {"w": P(MODEL_AXIS, None), "b": P()},
    }


def _ffn_spec() -> Params:
    return {
        "linear1": {"w": P(None, MODEL_AXIS), "b": P(MODEL_AXIS)},
        "linear2": {"w": P(MODEL_AXIS, None), "b": P()},
    }


def _ln_spec() -> Params:
    return {"scale": P(), "bias": P()}


def _fsdp_extend(spec: P, shape: tuple[int, ...], n_shard: int, min_size: int) -> P:
    """ZeRO-3-style extension of a TP spec: shard the largest still-free dim
    over the data axis when divisible. Small leaves (< min_size elements) stay
    replicated — the all-gather latency would exceed the memory saved."""
    size = 1
    for s in shape:
        size *= s
    if n_shard <= 1 or size < min_size:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    best, best_size = None, 0
    for d, (e, s) in enumerate(zip(entries, shape)):
        if e is None and s % n_shard == 0 and s > best_size:
            best, best_size = d, s
    if best is None:
        return spec
    entries[best] = DATA_AXIS
    return P(*entries)


def fsdp_partition_specs(params: Params, n_data: int, min_size: int = 1024) -> Params:
    """Fully-sharded (ZeRO-3) partition specs: the Megatron TP layout plus
    every parameter's largest free dimension sharded over the *data* axis.

    TPU-native FSDP needs no wrapper machinery (the reference's stack would
    reach for torch FSDP/accelerate here; this framework states a sharding and
    lets the SPMD partitioner insert the collectives): with params and Adam
    moments laid out this way, XLA all-gathers each weight just before use,
    reduce-scatters its gradient, and keeps the optimizer update fully
    sharded — per-device param+optimizer memory drops ~n_data-fold, which is
    what lets `remat`-scale models train on a pod slice."""
    specs = param_partition_specs(params)
    return jax.tree.map(
        lambda leaf, spec: _fsdp_extend(spec, np.shape(leaf), n_data, min_size),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def param_partition_specs(params: Params) -> Params:
    """PartitionSpec pytree matching the params tree (Megatron-style TP)."""

    def enc_layer(_):
        return {
            "self_attn": _attn_spec(),
            "ffn": _ffn_spec(),
            "norm1": _ln_spec(),
            "norm2": _ln_spec(),
        }

    def dec_layer(_):
        return {
            "self_attn": _attn_spec(),
            "cross_attn": _attn_spec(),
            "ffn": _ffn_spec(),
            "norm1": _ln_spec(),
            "norm2": _ln_spec(),
            "norm3": _ln_spec(),
        }

    return {
        "project_to_mel": {"w": P(), "b": P()},
        "encoder": {
            "dense": {"w": P()},
            "layers": [enc_layer(l) for l in params["encoder"]["layers"]],
            "final_ln": _ln_spec(),
        },
        "decoder": {
            # embedding replicated (1400 x 768 is tiny); generator vocab-sharded
            "embedding": P(),
            "layers": [dec_layer(l) for l in params["decoder"]["layers"]],
            "generator": {"w": P(None, MODEL_AXIS), "b": P(MODEL_AXIS)},
        },
    }


def param_shardings(mesh: Mesh, params: Params, fsdp: bool = False) -> Params:
    if fsdp:
        specs = fsdp_partition_specs(params, mesh.shape[DATA_AXIS])
    else:
        specs = param_partition_specs(params)
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params: Params, fsdp: bool = False) -> Params:
    """Place a host params pytree onto the mesh per the partition specs."""
    shardings = param_shardings(mesh, params, fsdp=fsdp)
    return jax.tree.map(jax.device_put, params, shardings)


def shard_batch(mesh: Mesh, batch: Params) -> Params:
    """Place a batch onto the mesh, sharded over the data axis.

    Multi-process: each host holds only its local rows, so the global array
    is assembled with `make_array_from_process_local_data` (the per-host
    loader already strides examples by process_index, trainer._epoch_batches);
    single-process placement is a plain device_put."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        import numpy as _np

        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, _np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
