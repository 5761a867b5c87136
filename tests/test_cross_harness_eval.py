"""Cross-harness METRIC-STACK equality against the genuine reference eval.

Round-3 verdict gap #2: token-for-token decode equality vs the genuine
reference model was proven (test_reference_equivalence.py), and every metric
component is unit-matched, but the genuine `/root/reference/eval.py`
`run_inference` (eval.py:308-434) had never been executed end-to-end on this
framework's outputs. This test closes that link:

1. trains a tiny model with THIS framework's synth train step (so predictions
   are non-degenerate: mostly-correct on seen items, wrong on novel/noise
   items, forced cross-pitch confusions on a mislabeled item);
2. exports it to a reference-format safetensors checkpoint directory
   (`models/torch_compat.py`);
3. writes one ENST-schema eval parquet exercising every eval-path branch:
   minus-one filtering, an empty-reference item (exclude_ref_empty both ways),
   a noise item (FPs/FNs), a deliberately mislabeled item (pass-2 confusion
   cells), a ragged final batch, and an all-short batch (the <1024-sample skip,
   eval.py:356-357);
4. runs the GENUINE reference `eval.py:run_inference` over it in a torch
   subprocess (stubs: the torchaudio mel replica from
   tools/measure_reference_baseline.py, wandb, and a mir_eval shim whose
   `transcription.match_notes` is this repo's hermetic matcher — mir_eval is
   not installed in this image; matcher fidelity itself is proven separately
   by execution against an independent maximum-matching solver in
   test_matching_independent.py and by the reference-semantics unit tests);
5. runs THIS framework's `evaluation/harness.run_inference` on the identical
   parquet with params loaded back through `load_params_from_reference_
   checkpoint`, and asserts `metrics.json` and `confusion_matrix.csv` are
   BYTE-identical for greedy, greedy+exclude_ref_empty, and beam-search runs.

Any divergence in EOS/PAD truncation, token decode, the velocity>=0 filter,
np.unique dedup, per-ADTOF-label slicing, the confusion matrix's two-pass
matching, aggregate P/R/F arithmetic, dataset filtering/ordering, batch-skip
logic, or JSON/CSV serialization fails this test. Skipped when /root/reference
is absent.

Note: the reference's own `eval.py:load_model` calls stale signatures
(`ComputeMelSpectrogram(..., device=...)`, eval.py:169-177 — SURVEY.md §7
known bug) and cannot run; the runner constructs `ADTModel(config)` directly
and loads the safetensors state dict, which is exactly what a fixed
`load_model` does, then drives the genuine `run_inference` untouched.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import jax
import jax.numpy as jnp

from adt_str_tpu.config import (
    EvalDataConfig,
    InferenceConfig,
    ModelConfig,
    SynthConfig,
    TokenizerConfig,
    TrainingConfig,
)
from adt_str_tpu.data.datasets import ENSTDataset
from adt_str_tpu.domain.tokenizer import MidiTokenizer
from adt_str_tpu.evaluation.harness import run_inference as our_run_inference
from adt_str_tpu.models import adt
from adt_str_tpu.models.torch_compat import params_to_torch_state_dict
from adt_str_tpu.parallel.train_step import init_train_state, make_synth_train_step
from adt_str_tpu.synth.bank import make_test_bank
from adt_str_tpu.synth.render import SynthStatics, pad_notes, render_batch
from adt_str_tpu.training.checkpoint import load_params_from_reference_checkpoint
from adt_str_tpu.training.optimizer import make_optimizer

REFERENCE = Path("/root/reference")
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not (REFERENCE / "eval.py").exists(), reason="reference repo not present"
    ),
]

SR = 4000
INPUT_SEC = 0.64
CHUNK = int(INPUT_SEC * SR)
MAXT = 24
MAX_DECODE = 24
BATCH_SIZE = 4
PITCHES = [35, 38, 42]
TRAIN_STEPS = 250

# (subdir, use_beam_search, exclude_ref_empty) — greedy is the metric path
# (both reference eval YAMLs set use_beam_search: false); the -e flag and the
# beam path are the other two user-reachable eval modes.
RUNS = [
    ("greedy", False, False),
    ("greedy_excl", False, True),
    ("beam", True, False),
]

RUNNER = r"""
import importlib.util, json, os, sys, types
import numpy as np

spec = importlib.util.spec_from_file_location(
    "mrb", "/root/repo/tools/measure_reference_baseline.py"
)
mrb = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mrb)
mrb._install_torchaudio_stub()
mrb._install_pedalboard_stub()

# the mrb stub provides MelSpectrogram only; eval_dataset also needs
# transforms.Resample. The fixture parquet is written at the config sample
# rate, so identity (same-rate) resampling is the only case exercised.
import torch as _torch


class _IdentityResample(_torch.nn.Module):
    def __init__(self, orig_freq, new_freq):
        super().__init__()
        assert orig_freq == new_freq, (orig_freq, new_freq)

    def forward(self, x):
        return x


sys.modules["torchaudio.transforms"].Resample = _IdentityResample
sys.modules["torchaudio"].transforms.Resample = _IdentityResample

import importlib.machinery
wandb_stub = types.ModuleType("wandb")
wandb_stub.init = wandb_stub.log = wandb_stub.finish = lambda *a, **k: None
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

# mir_eval is not installed in this image. The shim's match_notes is this
# repo's hermetic matcher (numpy/C++, no jax import at module level) — the
# matcher's own fidelity is proven elsewhere; this run proves every OTHER
# link of the reference metric stack against our harness.
sys.path.insert(0, "/root/repo")
from adt_str_tpu.ops.matching import match_notes as _match_notes

mir_stub = types.ModuleType("mir_eval")
trans_stub = types.ModuleType("mir_eval.transcription")


def _shim(ref_intervals, ref_pitches, est_intervals, est_pitches,
          onset_tolerance=0.05, pitch_tolerance=50.0, offset_ratio=0.2,
          **kw):
    return _match_notes(
        np.asarray(ref_intervals), np.asarray(ref_pitches),
        np.asarray(est_intervals), np.asarray(est_pitches),
        onset_tolerance=onset_tolerance, pitch_tolerance=pitch_tolerance,
        offset_ratio=offset_ratio,
    )


trans_stub.match_notes = _shim
mir_stub.transcription = trans_stub
sys.modules["mir_eval"] = mir_stub
sys.modules["mir_eval.transcription"] = trans_stub

sys.path.insert(0, "/root/reference")

import torch
from safetensors.torch import load_file
from config import ADTModelConfig
from model import ADTModel
from modules.midi_tokenizer import MidiTokenizer, MidiTokenizerConfig
from data_modules.eval_dataset import ENSTDataset, ENSTDatasetConfig
import eval as ref_eval  # /root/reference/eval.py

spec_path = os.environ["XH_SPEC"]
spec = json.loads(open(spec_path).read())

cfg = ADTModelConfig(**spec["model_cfg"])
torch.manual_seed(0)
model = ADTModel(cfg)
sd = load_file(spec["ckpt_dir"] + "/model.safetensors")
missing, unexpected = model.load_state_dict(sd, strict=False)
assert not unexpected, unexpected
for k in missing:  # only non-weight buffers may be absent from the export
    assert "pos_embedding" in k or "spectrogram" in k, k
model.eval()

tokenizer = MidiTokenizer(MidiTokenizerConfig(**spec["tok_cfg"]))
ds_cfg = ENSTDatasetConfig(**spec["ds_cfg"])
dataset = ENSTDataset(ds_cfg, tokenizer)
assert len(dataset) == spec["expect_items"], len(dataset)

for name, use_beam, exclude in spec["runs"]:
    out_dir = os.path.join(spec["out_root"], name)
    os.makedirs(out_dir, exist_ok=True)
    dl = dataset.get_dataloader(
        batch_size=spec["batch_size"], shuffle=False, num_workers=0
    )
    metrics = ref_eval.run_inference(
        model=model,
        dataloader=dl,
        device=torch.device("cpu"),
        tokenizer=tokenizer,
        beam_size=spec["beam_size"],
        use_beam_search=use_beam,
        output_path=out_dir,
        max_decode_length=spec["max_decode"],
        exclude_ref_empty=exclude,
    )
    # exactly the reference CLI's serialization (eval.py:508-509)
    with open(out_dir + "/metrics.json", "w") as f:
        json.dump(metrics, f)
print("RUNNER_OK")
"""


def _tiny_config() -> ModelConfig:
    return ModelConfig(
        input_sec=INPUT_SEC,
        time_res=0.01,
        win_length=256,
        sample_rate=SR,
        enc_layers=2,
        dec_layers=2,
        nhead=2,
        d_query=24,
        dropout=0.0,
        tgt_vocab_size=528,  # covers velocity tokens 400..527
        n_mels=32,
        compute_dtype="float32",
        max_positions=64,
        use_pallas_mel=False,
    )


def _make_notes(rng: np.random.Generator, n: int) -> np.ndarray:
    onsets = np.sort(np.round(rng.uniform(0.0, 0.5, n), 2))
    return np.stack(
        [
            onsets,
            onsets + 0.05,
            rng.choice(PITCHES, n).astype(np.float64),
            rng.integers(60, 127, n).astype(np.float64),
        ],
        axis=1,
    ).astype(np.float32)


@pytest.fixture(scope="module")
def harness_outputs(tmp_path_factory):
    td = tmp_path_factory.mktemp("xharness")
    cfg = _tiny_config()
    tok_cfg = TokenizerConfig()  # add_velocity=True, ADTOF_mapping=False
    tok = MidiTokenizer(tok_cfg)
    rng = np.random.default_rng(0)

    # ---- synth statics (the learnability recipe, test_learnability.py)
    bank = make_test_bank(
        rng, PITCHES, sample_rate=SR, max_len=SR // 4, n_per_bin=2, bins=["gold"]
    )
    statics = SynthStatics.from_bank(bank)
    synth_cfg = SynthConfig(
        sample_rate=SR, input_sec=INPUT_SEC, mixup_range=0.2, use_fx_prob=0.0,
        similarity_threshold=1.0, max_notes=8, max_oneshot_sec=0.25,
    )

    # ---- overfit a tiny model on 8 fixed note sets
    B = 8
    train_notes = [_make_notes(rng, int(rng.integers(1, 4))) for _ in range(B)]
    notes_arr = np.zeros((B, 8, 4), np.float32)
    mask = np.zeros((B, 8), bool)
    tokens = np.full((B, MAXT), 1, np.int64)
    lengths = np.zeros(B, np.int64)
    for i, notes in enumerate(train_notes):
        t, l = tok.encode_padded(notes, MAXT)
        tokens[i], lengths[i] = t, l
        notes_arr[i], mask[i] = pad_notes(notes, 8)
    lengths = lengths - (lengths == lengths.max())  # collate quirk
    batch = {
        "notes": jnp.asarray(notes_arr), "note_mask": jnp.asarray(mask),
        "tokens": jnp.asarray(tokens), "token_lengths": jnp.asarray(lengths),
    }
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(
        TrainingConfig(learning_rate=1e-3, warmup_ratio=0.05),
        total_steps=TRAIN_STEPS, params=params,
    )
    step = make_synth_train_step(cfg, synth_cfg, statics, tx)
    state = init_train_state(params, tx)
    for i in range(TRAIN_STEPS):
        state, m = step(state, batch, jax.random.PRNGKey(i))
    assert float(m["loss"]) < 1.0, float(m["loss"])

    # ---- export a reference-format checkpoint directory
    ckpt_dir = td / "ckpt"
    ckpt_dir.mkdir()
    from safetensors.numpy import save_file

    sd = params_to_torch_state_dict(jax.device_get(state.params))
    save_file({k: np.asarray(v) for k, v in sd.items()},
              str(ckpt_dir / "model.safetensors"))

    # ---- eval parquet (ENST schema) exercising every eval-path branch
    def render(notes: np.ndarray, seed: int) -> np.ndarray:
        arr, msk = pad_notes(notes, 8)
        wav = render_batch(
            statics, jnp.asarray(arr[None]), jnp.asarray(msk[None]),
            jax.random.PRNGKey(seed)[None], synth_cfg,
        )
        return np.asarray(wav[0], np.float32)

    items = []  # (audio_id, drummer, audio, notes)
    for i, notes in enumerate(train_notes):  # mostly-correct predictions
        items.append((f"1{i:02d}_minus-one_seen{i}_sticks", "drummer_1",
                      render(notes, 1000 + i), notes))
    for i in range(2):  # novel note sets: imperfect predictions
        notes = _make_notes(rng, int(rng.integers(2, 5)))
        items.append((f"2{i:02d}_minus-one_novel{i}_sticks", "drummer_2",
                      render(notes, 2000 + i), notes))
    # mislabeled: audio renders pitch 38, GT claims pitch 35 at the same
    # onsets — forces pass-2 cross-pitch confusion cells
    mis = _make_notes(rng, 3)
    mis[:, 2] = 38.0
    mis_gt = mis.copy()
    mis_gt[:, 2] = 35.0
    items.append(("210_minus-one_mislabeled_sticks", "drummer_2",
                  render(mis, 3000), mis_gt))
    # empty reference with confident predictions: exclude_ref_empty pivot
    items.append(("211_minus-one_emptyref_sticks", "drummer_3",
                  render(train_notes[0], 4000),
                  np.zeros((0, 4), np.float32)))
    # noise audio: garbage predictions vs real GT (FPs + FNs)
    items.append(("212_minus-one_noise_sticks", "drummer_3",
                  (rng.normal(size=CHUNK) * 0.3).astype(np.float32),
                  _make_notes(rng, 3)))
    # minus-one filter: this item must be dropped by BOTH harnesses
    items.append(("213_full-take_filtered_sticks", "drummer_3",
                  render(train_notes[1], 5000), train_notes[1]))
    # four short items: the final all-short batch is skipped (<1024 samples)
    for i in range(4):
        items.append((f"3{i:02d}_minus-one_short{i}_sticks", "drummer_4",
                      (rng.normal(size=800) * 0.1).astype(np.float32),
                      _make_notes(rng, 2)))

    schema = pa.schema(
        [
            pa.field("audio_id", pa.string()),
            pa.field("drummer", pa.string()),
            pa.field("audio", pa.binary()),
            pa.field("sample_rate", pa.int32()),
            pa.field("notes", pa.binary()),
        ]
    )
    table = pa.table(
        {
            "audio_id": [it[0] for it in items],
            "drummer": [it[1] for it in items],
            "audio": [it[2].tobytes() for it in items],
            "sample_rate": [SR] * len(items),
            "notes": [it[3].tobytes() for it in items],
        },
        schema=schema,
    )
    parquet_path = td / "enst_eval.parquet"
    pq.write_table(table, parquet_path)
    n_kept = len(items) - 1  # minus the filtered item

    # ---- our side: checkpoint -> harness.run_inference, one dir per mode
    loaded_params = load_params_from_reference_checkpoint(ckpt_dir)
    eval_cfg = EvalDataConfig(
        input_sec=INPUT_SEC, time_res=0.01, win_length=256, sample_rate=SR,
        dataset_path=str(parquet_path), dataset_name="ENST",
        drummers=None, minus_one=True, splits=None,
    )
    dataset = ENSTDataset(eval_cfg, tok)
    assert len(dataset) == n_kept
    ours_root = td / "ours"
    for name, use_beam, exclude in RUNS:
        out_dir = ours_root / name
        our_run_inference(
            loaded_params,
            cfg,
            dataset,
            tok,
            InferenceConfig(
                batch_size=BATCH_SIZE, max_length=MAX_DECODE, beam_size=3,
                use_beam_search=use_beam, output_path=str(out_dir),
            ),
            exclude_ref_empty=exclude,
        )

    # ---- reference side: the genuine eval.py run_inference, same ckpt/parquet
    ref_root = td / "ref"
    ref_root.mkdir()
    spec = {
        "model_cfg": dict(
            input_sec=cfg.input_sec, time_res=cfg.time_res,
            win_length=cfg.win_length, sample_rate=cfg.sample_rate,
            enc_layers=cfg.enc_layers, dec_layers=cfg.dec_layers,
            nhead=cfg.nhead, d_query=cfg.d_query, dropout=0.0,
            tgt_vocab_size=cfg.tgt_vocab_size, enc_lr=1e-4, dec_lr=1e-4,
            plain=True, n_mels=cfg.n_mels,
        ),
        "tok_cfg": dict(
            ADTOF_mapping=tok_cfg.ADTOF_mapping, BOS_token=tok_cfg.BOS_token,
            EOS_token=tok_cfg.EOS_token, pad_token=tok_cfg.pad_token,
            silence_token=tok_cfg.silence_token,
            add_velocity=tok_cfg.add_velocity,
        ),
        "ds_cfg": dict(
            input_sec=INPUT_SEC, time_res=0.01, win_length=256,
            sample_rate=SR, dataset_path=str(parquet_path),
            dataset_name="ENST", drummers=None, minus_one=True, splits=None,
        ),
        "ckpt_dir": str(ckpt_dir),
        "out_root": str(ref_root),
        "runs": RUNS,
        "batch_size": BATCH_SIZE,
        "beam_size": 3,
        "max_decode": MAX_DECODE,
        "expect_items": n_kept,
    }
    spec_path = td / "spec.json"
    spec_path.write_text(json.dumps(spec))
    runner = td / "runner.py"
    runner.write_text(RUNNER)
    import os

    env = dict(os.environ, XH_SPEC=str(spec_path))
    proc = subprocess.run(
        [sys.executable, str(runner)], capture_output=True, text=True,
        timeout=1800, env=env, cwd=str(td),
    )
    assert proc.returncode == 0 and "RUNNER_OK" in proc.stdout, proc.stderr[-5000:]
    return ours_root, ref_root


def _read(root: Path, run: str, fname: str) -> str:
    p = root / run / fname
    assert p.exists(), p
    return p.read_text()


@pytest.mark.parametrize("run", [r[0] for r in RUNS])
def test_metrics_json_identical(harness_outputs, run):
    ours_root, ref_root = harness_outputs
    ours = _read(ours_root, run, "metrics.json")
    ref = _read(ref_root, run, "metrics.json")
    # parsed equality first (actionable diff), then byte equality (serialization)
    assert json.loads(ours) == json.loads(ref), run
    assert ours == ref, run


@pytest.mark.parametrize("run", [r[0] for r in RUNS])
def test_confusion_csv_identical(harness_outputs, run):
    ours_root, ref_root = harness_outputs
    ours = _read(ours_root, run, "confusion_matrix.csv")
    ref = _read(ref_root, run, "confusion_matrix.csv")
    assert ours == ref, run


def test_metrics_are_nontrivial(harness_outputs):
    """Guard against vacuous equality: the greedy run must produce a mixed
    confusion picture (some TPs, some FNs, some FPs) and per-label rows."""
    ours_root, _ = harness_outputs
    m = json.loads(_read(ours_root, "greedy", "metrics.json"))
    assert 0.05 < m["all"]["f_measure"] < 1.0, m["all"]
    assert 0.0 < m["all"]["precision"] < 1.0 or 0.0 < m["all"]["recall"] < 1.0
    labels = [k for k in m if k != "all"]
    assert len(labels) >= 3, labels  # BD/SD/HH at minimum
    # exclude_ref_empty must actually change the numbers (the empty-ref item
    # has confident predictions) — otherwise that branch proved nothing
    m_excl = json.loads(_read(ours_root, "greedy_excl", "metrics.json"))
    assert m_excl["all"]["precision"] > m["all"]["precision"]
