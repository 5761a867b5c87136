"""Two-process multi-host TENSOR-PARALLEL training with checkpoint + resume.

The round-2 advisor flagged that periodic checkpointing would crash under
multi-host tensor parallelism (params sharded ACROSS processes; host-side
np.asarray raises on non-addressable arrays). The fix hands jax.Arrays
straight to orbax and restores through sharded abstract leaves; this test
proves the whole scenario live: a real two-process `jax.distributed` cluster
(2 x 2 virtual CPU devices) training on a data=2 x model=2 mesh through the
full train() path, saving mid-run, then a SECOND two-process run
auto-resuming from the sharded checkpoint and continuing.

Also asserts the safetensors export gate: under cross-process model sharding
params are not host-readable, so `model.safetensors` is skipped while the
orbax state and meta.json exist (checkpoint._host_readable).
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

SR = 8000

WORKER = r"""
import json, os, sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
from adt_str_tpu.config import FrameworkConfig
from adt_str_tpu.training.trainer import train

cfg = FrameworkConfig.from_yaml(sys.argv[1])
state = train(cfg)

# position-sensitive fingerprint over several leaves: a plain mean of one
# leaf is invariant to shard permutation/roll corruption and checks almost
# nothing about a sharded restore
import jax.numpy as jnp

def _fp(x):
    x = x.reshape(-1).astype(jnp.float32)
    w = jnp.cos(jnp.arange(x.shape[0]) * 0.1)
    return jnp.vdot(x, w)

probe = float(sum(float(jax.jit(_fp)(l)) for l in jax.tree.leaves(state.params)[:8]))
out = {"pid": jax.process_index(), "step": int(state.step), "probe": probe}
tag = sys.argv[3]
with open(os.path.join(sys.argv[2], f"tp_out_{tag}_{jax.process_index()}.json"), "w") as f:
    json.dump(out, f)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(worker, cfg_path, tmp_path, tag):
    port = _free_port()
    procs = []
    errs = []
    for pid in range(2):
        env = dict(**__import__("os").environ)
        env.update(
            COORDINATOR_ADDRESS=f"localhost:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker), str(cfg_path), str(tmp_path), tag],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    for p in procs:
        try:
            _, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-4000:]
        errs.append(err)
    return [
        json.loads((tmp_path / f"tp_out_{tag}_{pid}.json").read_text())
        for pid in range(2)
    ], errs


@pytest.mark.slow
def test_two_process_tensor_parallel_train_save_resume(tmp_path):
    sys.path.insert(0, str(Path(__file__).parent))
    from test_trainer_e2e import _bank_entries, _write_lakh_parquet  # noqa: E501

    from adt_str_tpu.synth.bank import save_bank_hdf5

    data_dir = tmp_path / "lakh"
    data_dir.mkdir()
    _write_lakh_parquet(str(data_dir / "A.parquet"), n_segments=64)
    rng = np.random.default_rng(1)
    bank_prefix = str(tmp_path / "oneshot")
    save_bank_hdf5(f"{bank_prefix}@{SR}.hdf5", _bank_entries(rng), SR)

    def cfg_dict(max_steps):
        return {
            "shared": {"input_sec": 0.64, "time_res": 0.01, "win_length": 256,
                       "sample_rate": SR},
            "model": {"enc_layers": 1, "dec_layers": 1, "nhead": 2, "d_query": 16,
                      "dropout": 0.1, "tgt_vocab_size": 1400, "n_mels": 16,
                      "compute_dtype": "float32", "max_positions": 64},
            "tokenizer": {"add_velocity": True},
            "training": {"batch_size": 2, "num_epochs": 4, "learning_rate": 1e-3,
                         "warmup_ratio": 0.1, "max_steps": max_steps},
            "TrainDatasetConfig": {"dataset_path": str(data_dir),
                                   "dataset_name": "Lakh", "partitions": None,
                                   "empty_tokens_percentage": 0.1,
                                   "random_velocity_prob": 0.5, "max_tokens": 32},
            "synthetiser": {"oneshot_path": bank_prefix, "similarity_threshold": 1.0,
                            "mixup_range": 0.5, "use_fx_prob": 0.0, "max_notes": 8,
                            "max_oneshot_sec": 0.1},
            # the point of the test: model sharded ACROSS the two processes,
            # both tensor-parallel and ZeRO-3 (params/moments also sharded
            # over the data axis) — the sharded orbax save/restore must
            # handle every layout family
            "mesh": {"model_axis": 2, "fsdp": True},
            "logging": {"output_dir": str(tmp_path / "out"), "logging_steps": 1,
                        "save_every_n_steps": 2},
            "checkpoint": {"max_checkpoints": 3, "auto_resume": True},
            "experiment": {"seed": 0, "run_name": "tp"},
        }

    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)

    cfg_path = tmp_path / "tp.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg_dict(max_steps=4)))
    outs, _ = _launch(worker, cfg_path, tmp_path, "first")
    assert outs[0]["step"] == outs[1]["step"] == 4
    np.testing.assert_allclose(outs[0]["probe"], outs[1]["probe"], rtol=1e-6)

    run_dir = tmp_path / "out" / "tp"
    ckpts = sorted(run_dir.glob("checkpoint-epoch-*-step-*"))
    assert ckpts, "periodic sharded save did not happen"
    latest = max(ckpts, key=lambda p: p.stat().st_mtime)
    # sharded orbax state + meta written; safetensors export correctly
    # SKIPPED (params are model-sharded across processes: not host-readable)
    assert (latest / "state").exists()
    assert (latest / "meta.json").exists()
    assert not (latest / "model.safetensors").exists()

    # second two-process run auto-resumes from the sharded checkpoint
    cfg_path2 = tmp_path / "tp2.yaml"
    cfg_path2.write_text(yaml.safe_dump(cfg_dict(max_steps=6)))
    outs2, errs2 = _launch(worker, cfg_path2, tmp_path, "second")
    assert outs2[0]["step"] == outs2[1]["step"] == 6
    np.testing.assert_allclose(outs2[0]["probe"], outs2[1]["probe"], rtol=1e-6)
    # run 2 must have ACTUALLY resumed (seed-determinism means a silent
    # from-scratch run would satisfy every other assertion): the trainer
    # logs the restore on every process, and a step-6 checkpoint exists
    for err in errs2:
        assert "resumed from" in err and "at step 4" in err, err[-2000:]
    assert any(
        p.name.endswith("-step-6")
        for p in run_dir.glob("checkpoint-epoch-*-step-*")
    )
    # resumed params differ from the first run's (2 extra steps trained)
    assert abs(outs2[0]["probe"] - outs[0]["probe"]) > 0.0
