"""Training-DYNAMICS equivalence against the genuine reference trainer.

The round-2 suite proved each piece equal in isolation (forward loss, greedy/
beam decode, a single AdamW update). This test composes them: N optimization
steps on identical data through the reference's exact training semantics —
`ADTTrainer.compute_loss` (train.py:40-78), HF `Trainer.create_optimizer`
(AdamW with the LayerNorm/bias weight-decay exclusion), the scheduler resolved
by `create_training_arguments` (train.py:163-250, warmup_ratio + cosine), and
global-norm grad clipping — versus this framework's full `train()` loop, on
the same fixed batch sequence.

Asserted:
- per-step loss trajectories agree within fp-drift tolerance over all N steps;
- final parameters agree leaf-for-leaf.

A schedule off-by-one, a weight-decay-set difference, a mask/length-convention
slip, or a clip-ordering difference each produce a compounding divergence this
test catches (building it caught two real ones: warmup rounded down instead of
HF's math.ceil, and a cosine denominator of total-1-warmup vs HF's
total-warmup). Skipped when /root/reference is absent.
"""

import json
import logging
import subprocess
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import jax

from adt_str_tpu.config import FrameworkConfig
from adt_str_tpu.models import adt
from adt_str_tpu.models.torch_compat import params_to_torch_state_dict

REFERENCE = Path("/root/reference")
pytestmark = [
    pytest.mark.slow,  # 120-step torch-vs-jax replay: ~2.5 min of setup
    pytest.mark.skipif(
        not (REFERENCE / "train.py").exists(), reason="reference repo not present"
    ),
]

SR = 4000
SEED = 0
N_ITEMS = 64
BATCH = 8  # global batch: training.batch_size(1) x 8 virtual devices
N_EPOCHS = 15
N_STEPS = N_ITEMS // BATCH * N_EPOCHS  # 120

RUNNER = r"""
import importlib.util, json, sys, types
import numpy as np

spec = importlib.util.spec_from_file_location(
    "mrb", "/root/repo/tools/measure_reference_baseline.py"
)
mrb = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mrb)
mrb._install_torchaudio_stub()
mrb._install_pedalboard_stub()

# deps of reference train.py that are absent in this image
import importlib.machinery
wandb_stub = types.ModuleType("wandb")
wandb_stub.init = wandb_stub.log = wandb_stub.finish = lambda *a, **k: None
# accelerate probes importlib.util.find_spec("wandb"), which needs a real spec
wandb_stub.__spec__ = importlib.machinery.ModuleSpec("wandb", loader=None)
sys.modules["wandb"] = wandb_stub
oc_stub = types.ModuleType("omegaconf")
class _OC:  # load_config_from_yaml is imported but never called here
    @staticmethod
    def load(*a, **k):
        raise NotImplementedError
    to_container = load
oc_stub.OmegaConf = _OC
sys.modules["omegaconf"] = oc_stub

# data_modules/train_dataset.py parses argv at import time (SURVEY.md §5.6)
sys.argv = ["train.py", "unused.yaml"]
sys.path.insert(0, "/root/reference")

import torch
from config import ADTModelConfig
from model import ADTModel
from train import ADTTrainer, create_training_arguments

data = np.load(__import__("os").environ["EQ_IN"])
cfg = ADTModelConfig(**json.loads(str(data["cfg"])))
train_cfg = json.loads(str(data["train_cfg"]))
n_steps = int(data["n_steps"])

torch.manual_seed(0)
model = ADTModel(cfg)
sd = {k: torch.from_numpy(data[f"sd.{k}"]) for k in json.loads(str(data["sd_keys"]))}
missing, unexpected = model.load_state_dict(sd, strict=False)
assert not unexpected, unexpected
for k in missing:  # only non-weight buffers may be absent from the export
    assert "pos_embedding" in k or "spectrogram" in k, k

args = create_training_arguments(train_cfg)
trainer = ADTTrainer(model=model, args=args)
trainer.create_optimizer_and_scheduler(num_training_steps=n_steps)
opt, sched = trainer.optimizer, trainer.lr_scheduler

losses, lrs = [], []
for i in range(n_steps):
    inputs = {
        "wavs": torch.from_numpy(data[f"b{i}.wavs"]),
        "tokens": torch.from_numpy(data[f"b{i}.tokens"]).long(),
        "token_lengths": torch.from_numpy(data[f"b{i}.token_lengths"]).long(),
    }
    # the HF Trainer inner loop at gradient_accumulation_steps=1:
    # compute_loss -> backward -> global-norm clip -> step -> scheduler step
    loss = trainer.compute_loss(model, inputs)
    loss.backward()
    torch.nn.utils.clip_grad_norm_(model.parameters(), args.max_grad_norm)
    lrs.append(float(opt.param_groups[0]["lr"]))
    opt.step()
    sched.step()
    opt.zero_grad()
    losses.append(float(loss.detach()))

final = {k: v.detach().numpy() for k, v in model.state_dict().items()}
np.savez(
    __import__("os").environ["EQ_OUT"],
    losses=np.array(losses, np.float64),
    lrs=np.array(lrs, np.float64),
    final_keys=json.dumps(list(final.keys())),
    **{f"final.{k}": v for k, v in final.items()},
)
"""


def _write_tmidt_parquet(path: str, n_items: int = N_ITEMS) -> None:
    rng = np.random.default_rng(7)
    rows = {"audio_id": [], "audio": [], "sample_rate": [], "notes": []}
    for i in range(n_items):
        audio = (rng.normal(size=int(0.64 * SR)) * 0.2).astype(np.float32)
        n = int(rng.integers(1, 6))
        on = np.sort(rng.uniform(0, 0.5, n))
        notes = np.stack(
            [on, on + 0.05, rng.choice([35, 38, 42, 51], n), rng.integers(40, 120, n)],
            axis=1,
        ).astype(np.float32)
        rows["audio_id"].append(f"t{i}.mp3")
        rows["audio"].append(audio.tobytes())
        rows["sample_rate"].append(SR)
        rows["notes"].append(notes.tobytes())
    schema = pa.schema(
        [
            pa.field("audio_id", pa.string()),
            pa.field("audio", pa.binary()),
            pa.field("sample_rate", pa.int32()),
            pa.field("notes", pa.binary()),
        ]
    )
    pq.write_table(pa.table(rows, schema=schema), path)


def _framework_config(data_path: str, out_dir: str) -> FrameworkConfig:
    return FrameworkConfig.from_dict(
        {
            "shared": {
                "input_sec": 0.64, "time_res": 0.01,
                "win_length": 256, "sample_rate": SR,
            },
            "model": {
                "enc_layers": 2, "dec_layers": 2, "nhead": 2, "d_query": 32,
                "dropout": 0.0, "tgt_vocab_size": 1400, "n_mels": 16,
                "compute_dtype": "float32", "max_positions": 64,
            },
            "tokenizer": {"add_velocity": False},
            "training": {
                "batch_size": 1,  # x8 virtual devices -> global batch 8
                "num_epochs": N_EPOCHS,
                "learning_rate": 1e-3,
                # large enough that a wrong decay-parameter set would shift
                # final params by ~7e-3 x |param| (sum(lr)*wd) — an order of
                # magnitude above the fp-drift tolerance below
                "weight_decay": 0.1,
                "warmup_ratio": 0.1,
                "max_grad_norm": 1.0,
                "lr_scheduler_type": "cosine",
            },
            "TrainDatasetConfig": {
                "dataset_path": data_path, "dataset_name": "TMIDT",
                "empty_tokens_percentage": 0.0, "random_velocity_prob": 0.0,
                "max_tokens": 24,
            },
            "logging": {"output_dir": out_dir, "logging_steps": 1},
            "experiment": {"seed": SEED, "run_name": "dyn-eq"},
        }
    )


class _LossTap(logging.Handler):
    """Captures full-precision per-step losses from the trainer's step log
    (record args carry the raw floats; the formatted message is only %.4f)."""

    def __init__(self):
        super().__init__()
        self.losses = []

    def emit(self, record):
        if record.msg.startswith("step %d/%d loss="):
            self.losses.append(float(record.args[2]))


@pytest.fixture(scope="module")
def dynamics(tmp_path_factory):
    td = tmp_path_factory.mktemp("dyneq")
    data_path = str(td / "tmidt.parquet")
    _write_tmidt_parquet(data_path)
    cfg = _framework_config(data_path, str(td / "out"))

    # ---- our side: the real train() loop, losses tapped from its step log
    from adt_str_tpu.training import trainer as trainer_mod

    tap = _LossTap()
    trainer_mod.logger.addHandler(tap)
    try:
        state = trainer_mod.train(cfg)
    finally:
        trainer_mod.logger.removeHandler(tap)
    ours_losses = np.array(tap.losses, np.float64)
    ours_sd = params_to_torch_state_dict(jax.device_get(state.params))

    # ---- reference side: replay the identical batch sequence through the
    # genuine ADTTrainer semantics in a torch subprocess
    from adt_str_tpu.data.datasets import TMIDTDataset
    from adt_str_tpu.domain.tokenizer import MidiTokenizer

    dataset = TMIDTDataset(cfg.train_data, MidiTokenizer(cfg.tokenizer))
    batches = []
    for epoch in range(N_EPOCHS):
        rng = np.random.default_rng([SEED, epoch])
        batches.extend(dataset.batches(BATCH, rng, shuffle=True))
    assert len(batches) == N_STEPS

    init_params = adt.init_params(jax.random.PRNGKey(SEED), cfg.model)
    sd = params_to_torch_state_dict(init_params)
    ref_model_cfg = dict(
        input_sec=cfg.model.input_sec, time_res=cfg.model.time_res,
        win_length=cfg.model.win_length, sample_rate=cfg.model.sample_rate,
        enc_layers=cfg.model.enc_layers, dec_layers=cfg.model.dec_layers,
        nhead=cfg.model.nhead, d_query=cfg.model.d_query, dropout=0.0,
        tgt_vocab_size=cfg.model.tgt_vocab_size, enc_lr=1e-3, dec_lr=1e-3,
        plain=True, n_mels=cfg.model.n_mels,
    )
    ref_train_cfg = {
        "experiment": {"run_name": "dyn-eq-ref", "seed": SEED, "use_wandb": False},
        "training": {
            "num_epochs": N_EPOCHS, "batch_size": BATCH, "learning_rate": 1e-3,
            "weight_decay": 0.1, "warmup_ratio": 0.1, "max_grad_norm": 1.0,
            "optim": "adamw_torch", "lr_scheduler_type": "cosine",
            "mixed_precision": "no", "gradient_accumulation_steps": 1,
            "max_dataloader_num_workers": 0, "eval_strategy": "no",
        },
        "logging": {"output_dir": str(td / "ref_out"), "logging_steps": 1},
        "checkpoint": {},
    }
    blob = {f"sd.{k}": v for k, v in sd.items()}
    for i, b in enumerate(batches):
        blob[f"b{i}.wavs"] = b["wavs"].astype(np.float32)
        blob[f"b{i}.tokens"] = b["tokens"]
        blob[f"b{i}.token_lengths"] = b["token_lengths"]
    np.savez(
        td / "in.npz",
        cfg=json.dumps(ref_model_cfg),
        train_cfg=json.dumps(ref_train_cfg),
        sd_keys=json.dumps(list(sd.keys())),
        n_steps=N_STEPS,
        **blob,
    )
    runner = td / "runner.py"
    runner.write_text(RUNNER)
    import os

    env = dict(os.environ, EQ_IN=str(td / "in.npz"), EQ_OUT=str(td / "out.npz"))
    proc = subprocess.run(
        [sys.executable, str(runner)],
        capture_output=True, text=True, timeout=1200, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    ref = np.load(td / "out.npz")
    return ours_losses, ours_sd, ref


def test_loss_trajectories_match(dynamics):
    ours, _, ref = dynamics
    ref_losses = ref["losses"]
    assert len(ours) == N_STEPS and len(ref_losses) == N_STEPS
    delta = np.abs(ours - ref_losses)
    # fp32 drift compounds over 120 updates through two independent
    # implementations; a semantic divergence (schedule off-by-one, wrong decay
    # set, clip ordering) produces deltas orders of magnitude above this
    assert delta[:10].max() < 5e-4, delta[:10]
    assert delta.max() < 2e-2, (delta.max(), int(delta.argmax()))
    # the trajectory must actually train (not two flat lines agreeing)
    assert ours[-5:].mean() < ours[:5].mean() * 0.8


def test_final_params_match(dynamics):
    _, ours_sd, ref = dynamics
    keys = json.loads(str(ref["final_keys"]))
    checked = 0
    offenders = []
    report = []
    for k in keys:
        if k not in ours_sd:  # non-weight buffers (pos table, mel filters)
            assert "pos_embedding" in k or "spectrogram" in k, k
            continue
        a, b = ours_sd[k], ref[f"final.{k}"]
        scale = np.abs(b).max() + 1e-8
        delta = float(np.abs(np.asarray(a, np.float64) - b).max())
        # measured fp drift after 120 steps: up to 5.1e-3 absolute (2.8% of
        # leaf scale), concentrated in early decoder weights — chaotic
        # amplification of the ~2e-4-relative per-forward difference between
        # the two independent fp32 mel/transformer implementations. The
        # tolerance bounds that drift with ~2x margin; composition errors
        # (batch order, mask/length conventions, clip ordering, epoch
        # off-by-ones) produce O(0.1+) divergences. Fine-grained optimizer
        # semantics are pinned exactly by the companion tests below
        # (decay-set vs genuine HF Trainer; schedule vs genuine HF scheduler).
        tol = max(1e-2, 3e-2 * scale)
        report.append(f"{k}: max|d|={delta:.2e} tol={tol:.2e} scale={scale:.2e}")
        if delta > tol:
            offenders.append(report[-1])
        checked += 1
    assert not offenders, "\n".join(offenders + ["---- all:"] + report)
    assert checked >= 20


DECAY_RUNNER = r"""
import importlib.util, json, sys, types
import numpy as np

spec = importlib.util.spec_from_file_location(
    "mrb", "/root/repo/tools/measure_reference_baseline.py"
)
mrb = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mrb)
mrb._install_torchaudio_stub()
mrb._install_pedalboard_stub()
sys.path.insert(0, "/root/reference")

import os
import torch
from config import ADTModelConfig
from model import ADTModel
from transformers import Trainer

cfg = ADTModelConfig(**json.loads(os.environ["EQ_CFG"]))
model = ADTModel(cfg)
try:
    names = Trainer.get_decay_parameter_names(None, model)
except TypeError:  # older signature
    from transformers.pytorch_utils import ALL_LAYERNORM_LAYERS
    from transformers.trainer_pt_utils import get_parameter_names

    names = [
        n for n in get_parameter_names(model, ALL_LAYERNORM_LAYERS)
        if "bias" not in n
    ]
all_params = [n for n, _ in model.named_parameters()]
with open(os.environ["EQ_OUT"], "w") as f:
    json.dump({"decay": names, "all": all_params}, f)
"""


def test_weight_decay_set_matches_hf_trainer(tmp_path):
    """The AdamW decay mask (optimizer.decay_mask) must equal the genuine HF
    Trainer decay set (`get_decay_parameter_names`: everything except biases
    and LayerNorm parameters) name-for-name through the torch naming map —
    the exact guard the 120-step drift tolerance above is too loose for."""
    import os

    cfg = _framework_config("unused", str(tmp_path)).model
    ref_cfg = dict(
        input_sec=cfg.input_sec, time_res=cfg.time_res,
        win_length=cfg.win_length, sample_rate=cfg.sample_rate,
        enc_layers=cfg.enc_layers, dec_layers=cfg.dec_layers, nhead=cfg.nhead,
        d_query=cfg.d_query, dropout=0.0, tgt_vocab_size=cfg.tgt_vocab_size,
        enc_lr=1e-3, dec_lr=1e-3, plain=True, n_mels=cfg.n_mels,
    )
    runner = tmp_path / "decay_runner.py"
    runner.write_text(DECAY_RUNNER)
    env = dict(
        os.environ, EQ_CFG=json.dumps(ref_cfg), EQ_OUT=str(tmp_path / "out.json")
    )
    proc = subprocess.run(
        [sys.executable, str(runner)], capture_output=True, text=True,
        timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    ref = json.loads((tmp_path / "out.json").read_text())
    hf_all = set(ref["all"])
    # get_parameter_names walks _parameters dicts, which include torch
    # MultiheadAttention's q/k/v_proj_weight slots that are None when
    # qkv-same-dim (named_parameters skips them; the HF optimizer grouping
    # filters them the same way by zipping against named_parameters)
    hf_decay = set(ref["decay"]) & hf_all

    from adt_str_tpu.training.optimizer import decay_mask

    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    mask = decay_mask(params)
    flags = jax.tree.map(
        lambda m, p: np.full(np.shape(p), 1.0 if m else 0.0, np.float32),
        mask, params,
    )
    sd = params_to_torch_state_dict(jax.device_get(flags))
    ours_decay = set()
    for name, arr in sd.items():
        arr = np.asarray(arr)
        # the converter may concat/transpose leaves (e.g. q/k/v -> in_proj);
        # the mask must be constant within each exported tensor
        assert (arr == arr.flat[0]).all(), f"ambiguous mask inside {name}"
        if arr.flat[0] == 1.0:
            ours_decay.add(name)

    exported = set(sd.keys())
    assert exported == hf_all, (exported ^ hf_all)
    assert ours_decay == hf_decay, {
        "ours_only": sorted(ours_decay - hf_decay),
        "hf_only": sorted(hf_decay - ours_decay),
    }


def test_schedule_matches_hf_scheduler(tmp_path):
    """Our warmup-cosine / linear schedules equal the genuine HF scheduler
    (transformers.get_scheduler driven through TrainingArguments'
    get_warmup_steps) value-for-value at every step — including the
    warmup-steps math.ceil and the cosine denominator (both fixed this round
    after this test flagged them)."""
    import torch
    from transformers import TrainingArguments, get_scheduler

    from adt_str_tpu.config import TrainingConfig
    from adt_str_tpu.training.optimizer import make_schedule

    total = 123  # warmup_ratio*total non-integer => pins the ceil semantics
    for sched_type in ("cosine", "linear"):
        args = TrainingArguments(
            output_dir=str(tmp_path / "hf"), warmup_ratio=0.1,
            learning_rate=1e-3, lr_scheduler_type=sched_type,
        )
        param = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.AdamW([param], lr=1e-3)
        hf = get_scheduler(
            sched_type, opt,
            num_warmup_steps=args.get_warmup_steps(total),
            num_training_steps=total,
        )
        hf_lrs = []
        for _ in range(total):
            hf_lrs.append(opt.param_groups[0]["lr"])
            opt.step()
            hf.step()
        ours = make_schedule(
            TrainingConfig(
                learning_rate=1e-3, warmup_ratio=0.1,
                lr_scheduler_type=sched_type,
            ),
            total_steps=total,
        )
        ours_lrs = [float(ours(s)) for s in range(total)]
        # our schedule evaluates in float32 on device; the cosine tail's
        # tiny LRs carry ~2e-5 relative fp32 error vs HF's float64
        np.testing.assert_allclose(ours_lrs, hf_lrs, rtol=1e-4, atol=1e-10,
                                   err_msg=sched_type)


def test_reference_lr_trajectory_matches_our_schedule(dynamics):
    """The runner records the LR actually APPLIED at each of the N_STEPS
    updates, resolved through the genuine create_training_arguments ->
    TrainingArguments -> HF scheduler path of the dynamics run. Our
    schedule must match it value-for-value — the companion scheduler test
    pins make_schedule against a hand-built TrainingArguments, not against
    this resolution path (self-review round 3: the data was captured and
    never asserted)."""
    _, _, ref = dynamics
    from adt_str_tpu.training.optimizer import make_schedule

    cfg = _framework_config("unused", "unused")
    sched = make_schedule(cfg.training, N_STEPS)
    ours = [float(sched(s)) for s in range(N_STEPS)]
    # our schedule evaluates in fp32 (measured ~6e-5 relative vs HF's f64
    # lambda); semantic divergences (off-by-one, wrong warmup resolution)
    # are O(1e-2+) and still fail loudly at this tolerance
    np.testing.assert_allclose(ours, ref["lrs"], rtol=2e-4, atol=1e-9)


def test_final_param_update_magnitudes_match(dynamics):
    """Per-leaf UPDATE norms |final - init| must agree between the two
    trainers: the absolute final-params tolerance floors at 1e-2, which
    exceeds the entire 120-step update of small leaves (LN scale/bias,
    small biases) and leaves them effectively unchecked (self-review
    round 3). Init is reconstructed from the same seed the fixture used."""
    _, ours_sd, ref = dynamics
    cfg = _framework_config("unused", "unused")
    init_sd = params_to_torch_state_dict(
        adt.init_params(jax.random.PRNGKey(SEED), cfg.model)
    )
    keys = json.loads(str(ref["final_keys"]))
    checked = 0
    for k in keys:
        if k not in ours_sd:
            continue
        init = np.asarray(init_sd[k], np.float64)
        du_ours = float(np.linalg.norm(np.asarray(ours_sd[k], np.float64) - init))
        du_ref = float(np.linalg.norm(ref[f"final.{k}"].astype(np.float64) - init))
        if du_ref < 1e-7:
            assert du_ours < 1e-6, k  # a leaf the reference never touched
            continue
        ratio = du_ours / du_ref
        assert 0.8 < ratio < 1.25, (k, du_ours, du_ref, ratio)
        checked += 1
    assert checked >= 20
