"""End-to-end equivalence against the *genuine* reference implementation.

Runs `/root/reference/model.py` (the actual PyTorch research code, executed in
a subprocess with the torchaudio-replica stub from
tools/measure_reference_baseline.py) with weights exported from our JAX model
via `params_to_torch_state_dict`, and asserts:

- teacher-forced loss parity (`ADTModel.forward`, model.py:240-258),
- greedy `sample` token-for-token equality (model.py:260-324),
- `beam_search` token-for-token equality (model.py:326-500) — the
  vectorized lax.while_loop beam vs the reference's python dict-of-beams.

The generator weights are sharpened (x4) after random init so decode
decisions are far from ties; layer-level numeric parity is established
separately in test_model_parity.py. Skipped when /root/reference is absent.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adt_str_tpu.config import ModelConfig
from adt_str_tpu.models import adt
from adt_str_tpu.models.decode import beam_search_decode, greedy_decode
from adt_str_tpu.models.torch_compat import params_to_torch_state_dict

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not (REFERENCE / "model.py").exists(), reason="reference repo not present"
)

MAX_LEN = 16
BEAM = 3

RUNNER = r"""
import importlib.util, json, sys
import numpy as np

spec = importlib.util.spec_from_file_location(
    "mrb", "/root/repo/tools/measure_reference_baseline.py"
)
mrb = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mrb)
mrb._install_torchaudio_stub()
mrb._install_pedalboard_stub()
sys.path.insert(0, "/root/reference")

import torch
from config import ADTModelConfig
from model import ADTModel
from utils.utils import create_mask_plain

data = np.load(sys.argv[1])
cfg = ADTModelConfig(**json.loads(str(data["cfg"])))
torch.manual_seed(0)
model = ADTModel(cfg)
sd = {k: torch.from_numpy(data[f"sd.{k}"]) for k in json.loads(str(data["sd_keys"]))}
missing, unexpected = model.load_state_dict(sd, strict=False)
assert not unexpected, unexpected
for k in missing:  # only non-weight buffers may be absent from the export
    assert "pos_embedding" in k or "spectrogram" in k, k
model.eval()

src = torch.from_numpy(data["wave"])
tokens = torch.from_numpy(data["tokens"]).long()
lengths = torch.from_numpy(data["lengths"]).long()
tgt_input, labels = tokens[:, :-1], tokens[:, 1:]
_, tgt_padding_mask = create_mask_plain(tgt_input.size(1), lengths, "cpu")
max_len, beam = int(data["max_len"]), int(data["beam"])
with torch.no_grad():
    loss = model(
        src=src, tgt=tgt_input, tgt_mask=None,
        tgt_padding_mask=tgt_padding_mask, labels=labels,
    )
    greedy = model.sample(src, None, None, max_length=max_len)
    beam_out = model.beam_search(
        src, None, None, beam_size=beam, max_length=max_len,
        start_token=2, end_token=3, length_penalty=1.0,
    )
np.savez(
    sys.argv[2], loss=float(loss), greedy=greedy.numpy(), beam=beam_out.numpy()
)
"""


def _tiny_config() -> ModelConfig:
    return ModelConfig(
        input_sec=0.64,
        time_res=0.01,
        win_length=256,
        sample_rate=4000,
        enc_layers=2,
        dec_layers=2,
        nhead=2,
        d_query=16,
        dropout=0.0,
        tgt_vocab_size=48,
        n_mels=16,
        compute_dtype="float32",
        max_positions=64,
        use_pallas_mel=False,
    )


def _truncate_at_eos(row: np.ndarray) -> list[int]:
    """Eval convention: keep tokens up to (excluding) the first EOS/PAD
    (eval.py:379-381); position 0 is BOS."""
    out = []
    for t in row[1:]:
        if t in (1, 3):
            break
        out.append(int(t))
    return out


@pytest.fixture(scope="module")
def reference_outputs(tmp_path_factory):
    cfg = _tiny_config()
    params = adt.init_params(jax.random.PRNGKey(11), cfg)
    # sharpen decode decisions away from random-init ties
    params["decoder"]["generator"]["w"] = params["decoder"]["generator"]["w"] * 4.0
    params["decoder"]["generator"]["b"] = params["decoder"]["generator"]["b"] * 4.0

    rng = np.random.default_rng(5)
    B = 4
    wave = (rng.normal(size=(B, cfg.chunk_samples)) * 0.2).astype(np.float32)
    tokens = np.full((B, 12), 1, dtype=np.int64)
    for i in range(B):
        n = int(rng.integers(5, 11))
        tokens[i, 0] = 2
        tokens[i, 1 : n - 1] = rng.integers(4, cfg.tgt_vocab_size, n - 2)
        tokens[i, n - 1] = 3
    lengths = (tokens != 1).sum(axis=1).astype(np.int64)
    lengths = lengths - (lengths == lengths.max()).astype(np.int64)

    sd = params_to_torch_state_dict(params)
    ref_cfg = dict(
        input_sec=cfg.input_sec,
        time_res=cfg.time_res,
        win_length=cfg.win_length,
        sample_rate=cfg.sample_rate,
        enc_layers=cfg.enc_layers,
        dec_layers=cfg.dec_layers,
        nhead=cfg.nhead,
        d_query=cfg.d_query,
        dropout=0.0,
        tgt_vocab_size=cfg.tgt_vocab_size,
        enc_lr=1e-4,
        dec_lr=1e-4,
        plain=True,
        n_mels=cfg.n_mels,
    )
    td = tmp_path_factory.mktemp("refbeam")
    blob = {f"sd.{k}": v for k, v in sd.items()}
    np.savez(
        td / "in.npz",
        wave=wave,
        tokens=tokens,
        lengths=lengths,
        cfg=json.dumps(ref_cfg),
        sd_keys=json.dumps(list(sd.keys())),
        max_len=MAX_LEN,
        beam=BEAM,
        **blob,
    )
    runner = td / "runner.py"
    runner.write_text(RUNNER)
    proc = subprocess.run(
        [sys.executable, str(runner), str(td / "in.npz"), str(td / "out.npz")],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    ref = np.load(td / "out.npz")
    return cfg, params, wave, tokens, lengths, ref


def test_forward_loss_matches_reference(reference_outputs):
    cfg, params, wave, tokens, lengths, ref = reference_outputs
    ours = float(
        adt.forward_loss(
            params,
            jnp.asarray(wave),
            jnp.asarray(tokens, jnp.int32),
            jnp.asarray(lengths, jnp.int32),
            cfg,
        )
    )
    np.testing.assert_allclose(ours, float(ref["loss"]), rtol=2e-4)


def test_greedy_sample_matches_reference(reference_outputs):
    cfg, params, wave, _, _, ref = reference_outputs
    ours = np.asarray(greedy_decode(params, jnp.asarray(wave), cfg, MAX_LEN))
    # non-emptiness guard: if every row EOS'd immediately, token-for-token
    # equality would be a vacuous [] == [] and pin nothing
    assert sum(len(_truncate_at_eos(ours[i])) for i in range(wave.shape[0])) >= 8
    for i in range(wave.shape[0]):
        assert _truncate_at_eos(ours[i]) == _truncate_at_eos(ref["greedy"][i]), i


def test_beam_search_matches_reference(reference_outputs):
    cfg, params, wave, _, _, ref = reference_outputs
    ours = np.asarray(
        beam_search_decode(
            params, jnp.asarray(wave), cfg, beam_size=BEAM, max_length=MAX_LEN,
            length_penalty=1.0,
        )
    )
    assert sum(len(_truncate_at_eos(ours[i])) for i in range(wave.shape[0])) >= 8
    for i in range(wave.shape[0]):
        assert _truncate_at_eos(ours[i]) == _truncate_at_eos(ref["beam"][i]), i
