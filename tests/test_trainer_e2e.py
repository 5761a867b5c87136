"""End-to-end trainer test: tiny Lakh parquet + tiny one-shot bank ->
config-driven training with on-device synthesis on the 8-device CPU mesh,
checkpoint save + auto-resume."""

import numpy as np
from pathlib import Path
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from adt_str_tpu.config import FrameworkConfig
from adt_str_tpu.data.lakh import SCHEMA
from adt_str_tpu.synth.bank import make_test_bank, save_bank_hdf5
from adt_str_tpu.training import checkpoint as ckpt_lib
from adt_str_tpu.training.trainer import train

SR = 4000


def _write_lakh_parquet(path, n_segments=48):
    rng = np.random.default_rng(0)
    rows = {"midi_id": [], "segment_number": [], "notes": []}
    for i in range(n_segments):
        n = int(rng.integers(1, 6))
        onsets = np.sort(rng.uniform(0, 0.5, n))
        pitches = rng.choice([36, 38, 42, 49], n)
        vels = rng.integers(40, 127, n)
        notes = np.stack([onsets, onsets + 0.05, pitches, vels], axis=1).astype(np.float32)
        rows["midi_id"].append(f"id{i}")
        rows["segment_number"].append(0)
        rows["notes"].append(notes.tobytes())
    pq.write_table(pa.table(rows, schema=SCHEMA), path)


def _bank_entries(rng):
    entries = {}
    for pitch in [35, 36, 38, 41, 42, 46, 48]:
        entries[pitch] = {
            "gold": [
                (np.exp(-np.arange(400) / 200) * rng.normal(size=400)).astype(np.float32)
            ]
        }
    return entries


@pytest.fixture
def train_env(tmp_path):
    data_dir = tmp_path / "lakh"
    data_dir.mkdir()
    _write_lakh_parquet(str(data_dir / "A.parquet"))
    rng = np.random.default_rng(1)
    bank_prefix = str(tmp_path / "oneshot")
    save_bank_hdf5(f"{bank_prefix}@{SR}.hdf5", _bank_entries(rng), SR)
    return {"data_dir": str(data_dir), "bank_prefix": bank_prefix, "out": str(tmp_path / "out")}


def make_cfg(env, max_steps=4):
    return FrameworkConfig.from_dict(
        {
            "shared": {"input_sec": 0.64, "time_res": 0.01, "win_length": 256, "sample_rate": SR},
            "model": {
                "enc_layers": 1, "dec_layers": 1, "nhead": 2, "d_query": 16,
                "dropout": 0.0, "tgt_vocab_size": 1400, "n_mels": 16,
                "compute_dtype": "float32", "max_positions": 64,
            },
            "tokenizer": {"ADTOF_mapping": False, "BOS_token": 2, "EOS_token": 3,
                          "pad_token": 1, "silence_token": 0, "add_velocity": True},
            "training": {"batch_size": 1, "num_epochs": 5, "learning_rate": 1e-3,
                         "warmup_ratio": 0.1, "max_steps": max_steps},
            "TrainDatasetConfig": {
                "dataset_path": env["data_dir"], "dataset_name": "Lakh",
                "partitions": None, "empty_tokens_percentage": 0.1,
                "random_velocity_prob": 0.5, "max_tokens": 32,
            },
            "synthetiser": {
                "oneshot_path": env["bank_prefix"], "similarity_threshold": 1.0,
                "mixup_range": 0.5, "use_fx_prob": 0.0, "max_notes": 8,
                "max_oneshot_sec": 0.1,
            },
            "logging": {"output_dir": env["out"], "logging_steps": 2,
                        "save_every_n_steps": 2},
            "checkpoint": {"max_checkpoints": 2, "auto_resume": True},
            "experiment": {"seed": 0, "run_name": "e2e"},
        }
    )


@pytest.mark.slow
def test_train_e2e_and_resume(train_env):
    cfg = make_cfg(train_env, max_steps=4)
    state = train(cfg)
    assert int(state.step) >= 4
    latest = ckpt_lib.latest_checkpoint(f"{train_env['out']}/e2e")
    assert latest is not None and "step-4" in latest

    # resume continues from step 4 without re-running earlier steps
    cfg2 = make_cfg(train_env, max_steps=6)
    state2 = train(cfg2)
    latest2 = ckpt_lib.latest_checkpoint(f"{train_env['out']}/e2e")
    assert "step-6" in latest2


@pytest.mark.slow
def test_train_with_tensor_parallel_mesh(train_env):
    """MeshConfig.model_axis=2 trains through the trainer on the virtual
    8-device mesh (data=4 x model=2, Megatron TP shardings)."""
    cfg = make_cfg(train_env, max_steps=2)
    cfg.experiment.run_name = "tp"
    cfg.mesh.model_axis = 2
    state = train(cfg)
    assert int(state.step) == 2


@pytest.mark.slow
def test_preemption_signal_checkpoints_and_stops(train_env):
    """SIGTERM mid-run -> the loop finishes the in-flight step, writes a
    preemption checkpoint, and exits cleanly; auto-resume then continues from
    it. The reference has no preemption handling (SURVEY.md §5.3)."""
    import os
    import signal
    import threading

    import time

    cfg = make_cfg(train_env, max_steps=500)
    cfg.experiment.run_name = "preempt"

    def fire_when_handler_installed():
        deadline = time.time() + 120
        while time.time() < deadline:
            h = signal.getsignal(signal.SIGTERM)
            if callable(h) and getattr(h, "__name__", "") == "_on_signal":
                os.kill(os.getpid(), signal.SIGTERM)
                return
            time.sleep(0.2)

    trigger = threading.Thread(target=fire_when_handler_installed, daemon=True)
    trigger.start()
    state = train(cfg)
    trigger.join(timeout=5)
    stopped_at = int(state.step)
    assert 0 < stopped_at < 500  # stopped early, after at least one step
    latest = ckpt_lib.latest_checkpoint(f"{train_env['out']}/preempt")
    assert latest is not None and f"step-{stopped_at}" in latest

    # auto-resume picks the preemption checkpoint up
    cfg2 = make_cfg(train_env, max_steps=stopped_at + 2)
    cfg2.experiment.run_name = "preempt"
    state2 = train(cfg2)
    assert int(state2.step) == stopped_at + 2


def test_checkpoint_roundtrip_and_safetensors(tmp_path, train_env):
    import jax

    from adt_str_tpu.models import adt
    from adt_str_tpu.training.optimizer import make_optimizer

    cfg = make_cfg(train_env)
    params = adt.init_params(jax.random.PRNGKey(0), cfg.model)
    tx, _ = make_optimizer(cfg.training, 10, params)
    opt_state = tx.init(params)
    out = tmp_path / "ckpts"
    path = ckpt_lib.save_checkpoint(out, params, opt_state, step=3, epoch=0)
    # reference-format safetensors sits next to the orbax state
    p2 = ckpt_lib.load_params_from_reference_checkpoint(path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # orbax restore
    rp, ro, step, epoch = ckpt_lib.restore_checkpoint(
        path, {"params": params, "opt_state": opt_state}
    )
    assert step == 3
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(rp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_gc(tmp_path, train_env):
    import time

    import jax

    from adt_str_tpu.models import adt
    from adt_str_tpu.training.optimizer import make_optimizer

    cfg = make_cfg(train_env)
    params = adt.init_params(jax.random.PRNGKey(0), cfg.model)
    tx, _ = make_optimizer(cfg.training, 10, params)
    opt_state = tx.init(params)
    out = tmp_path / "ckpts"
    for s in [1, 2, 3]:
        ckpt_lib.save_checkpoint(out, params, opt_state, step=s, max_checkpoints=2)
        time.sleep(0.05)
    remaining = sorted(p.name for p in out.glob("checkpoint-*"))
    assert remaining == ["checkpoint-epoch-0-step-2", "checkpoint-epoch-0-step-3"]


@pytest.mark.slow
def test_in_training_eval_fires_on_lakh(train_env, tmp_path):
    """eval_every_n_steps triggers periodic evaluate_loss during training on a
    Lakh (on-device-synthesis) dataset; records land in eval_history.jsonl."""
    import json

    cfg = make_cfg(train_env, max_steps=4)
    cfg.logging.eval_every_n_steps = 2
    cfg.logging.eval_batches = 2
    cfg.experiment.run_name = "e2e-eval"
    train(cfg)

    history_path = f"{train_env['out']}/e2e-eval/eval_history.jsonl"
    records = [json.loads(l) for l in open(history_path)]
    assert [r["step"] for r in records] == [2, 4]
    assert all(np.isfinite(r["eval_loss"]) and r["eval_loss"] > 0 for r in records)


@pytest.mark.slow
def test_evaluate_loss_lakh_synth_path(train_env):
    """evaluate_loss renders Lakh eval audio on device (fixed keys => the same
    params give the same loss on repeated calls)."""
    import jax

    from adt_str_tpu.data.datasets import LakhDataset
    from adt_str_tpu.domain.tokenizer import MidiTokenizer
    from adt_str_tpu.models import adt
    from adt_str_tpu.synth.bank import load_bank_hdf5
    from adt_str_tpu.synth.render import SynthStatics
    from adt_str_tpu.training.trainer import evaluate_loss

    cfg = make_cfg(train_env)
    tokenizer = MidiTokenizer(cfg.tokenizer)
    ds = LakhDataset(cfg.train_data, tokenizer, max_notes=cfg.synthetiser.max_notes)
    bank = load_bank_hdf5(
        f"{train_env['bank_prefix']}@{SR}.hdf5",
        int(cfg.synthetiser.max_oneshot_sec * SR),
    )
    statics = SynthStatics.from_bank(bank)
    params = adt.init_params(jax.random.PRNGKey(0), cfg.model)

    loss1 = evaluate_loss(
        params, cfg.model, ds, batch_size=4,
        synth_config=cfg.synthetiser, statics=statics, max_batches=2,
    )
    loss2 = evaluate_loss(
        params, cfg.model, ds, batch_size=4,
        synth_config=cfg.synthetiser, statics=statics, max_batches=2,
    )
    assert np.isfinite(loss1) and loss1 > 0
    assert loss1 == loss2  # deterministic eval stream


def test_checkpoint_overwrite_and_meta_fallback(tmp_path, train_env):
    """Re-saving an existing step overwrites (rollback-resume re-reaches old
    steps; orbax would raise on the existing dir), and a checkpoint whose
    meta.json was lost to a preemption mid-save still restores with
    step/epoch parsed from the directory name (self-review round 3)."""
    import jax

    from adt_str_tpu.models import adt
    from adt_str_tpu.training.optimizer import make_optimizer

    cfg = make_cfg(train_env)
    params = adt.init_params(jax.random.PRNGKey(0), cfg.model)
    tx, _ = make_optimizer(cfg.training, 10, params)
    opt_state = tx.init(params)
    out = tmp_path / "ckpts"
    path = ckpt_lib.save_checkpoint(out, params, opt_state, step=5, epoch=1)
    # overwrite the same step: must not raise
    path2 = ckpt_lib.save_checkpoint(out, params, opt_state, step=5, epoch=1)
    assert path == path2
    # meta.json lost: restore falls back to the directory-name encoding
    (Path(path) / "meta.json").unlink()
    rp, _, step, epoch = ckpt_lib.restore_checkpoint(
        path, {"params": params, "opt_state": opt_state}
    )
    assert (step, epoch) == (5, 1)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(rp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
