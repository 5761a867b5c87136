"""End-to-end learnability: overfit a tiny model on a fixed batch where audio
is synthesized on device from the same notes the tokens encode, then verify
greedy decoding transcribes a *freshly synthesized* render (new timbres/mixup
draws) of those notes.

This is the strongest correctness signal in the suite: it exercises the
synthesis renderer, mel frontend, masks/loss, optimizer, KV-cache decoding,
tokenizer round-trip, and the metric stack in one closed loop. (The flagship
model on real TPU reaches loss 6e-4 and onset F1 = 1.000 under the same
protocol in 400 steps.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adt_str_tpu.config import ModelConfig, SynthConfig, TokenizerConfig, TrainingConfig
from adt_str_tpu.domain.tokenizer import MidiTokenizer
from adt_str_tpu.evaluation.harness import decode_tokens_to_notes
from adt_str_tpu.evaluation.metrics import compute_metrics
from adt_str_tpu.models import adt
from adt_str_tpu.models import decode as dec
from adt_str_tpu.parallel.train_step import init_train_state, make_synth_train_step
from adt_str_tpu.synth.bank import make_test_bank
from adt_str_tpu.synth.render import SynthStatics, pad_notes, render_batch
from adt_str_tpu.training.optimizer import make_optimizer

SR = 4000


@pytest.mark.slow
def test_overfit_and_transcribe():
    cfg = ModelConfig(
        input_sec=0.64, time_res=0.01, win_length=256, sample_rate=SR,
        enc_layers=2, dec_layers=2, nhead=2, d_query=24, dropout=0.0,
        tgt_vocab_size=1400, n_mels=32, compute_dtype="float32", max_positions=64,
    )
    tok = MidiTokenizer(TokenizerConfig())
    rng = np.random.default_rng(0)
    bank = make_test_bank(rng, [35, 38, 42], sample_rate=SR, max_len=SR // 4,
                          n_per_bin=2, bins=["gold"])
    statics = SynthStatics.from_bank(bank)
    synth_cfg = SynthConfig(
        sample_rate=SR, input_sec=0.64, mixup_range=0.2, use_fx_prob=0.0,
        similarity_threshold=1.0, max_notes=8, max_oneshot_sec=0.25,
    )

    B, MAXT = 8, 24
    notes_arr = np.zeros((B, 8, 4), np.float32)
    mask = np.zeros((B, 8), bool)
    tokens = np.full((B, MAXT), 1, np.int64)
    lengths = np.zeros(B, np.int64)
    for i in range(B):
        n = int(rng.integers(1, 4))
        onsets = np.sort(np.round(rng.uniform(0, 0.5, n), 2))
        notes = np.stack(
            [onsets, onsets + 0.05, rng.choice([35, 38, 42], n),
             rng.integers(60, 127, n)], axis=1,
        ).astype(np.float32)
        t, l = tok.encode_padded(notes, MAXT)
        tokens[i], lengths[i] = t, l
        notes_arr[i], mask[i] = pad_notes(notes, 8)
    lengths = lengths - (lengths == lengths.max())
    batch = {
        "notes": jnp.asarray(notes_arr), "note_mask": jnp.asarray(mask),
        "tokens": jnp.asarray(tokens), "token_lengths": jnp.asarray(lengths),
    }

    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(
        TrainingConfig(learning_rate=1e-3, warmup_ratio=0.05), total_steps=250,
        params=params,
    )
    step = make_synth_train_step(cfg, synth_cfg, statics, tx)
    state = init_train_state(params, tx)
    first = last = None
    for i in range(250):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        if i == 0:
            first = float(m["loss"])
    last = float(m["loss"])
    assert last < first * 0.05, (first, last)

    # transcribe a FRESH render of the same notes (new timbre/mixup draws)
    keys = jax.random.split(jax.random.PRNGKey(9999), B)
    wavs = render_batch(statics, batch["notes"], batch["note_mask"], keys, synth_cfg)
    pred = np.asarray(dec.greedy_decode(state.params, wavs, cfg, max_length=MAXT))
    TP = FN = FP = 0
    for i in range(B):
        gt = notes_arr[i][mask[i]]
        pn = decode_tokens_to_notes(tok, pred[i])
        tp, fn, fp = compute_metrics(gt, pn)
        TP, FN, FP = TP + tp, FN + fn, FP + fp
    precision = TP / max(TP + FP, 1)
    recall = TP / max(TP + FN, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    # 0.9, not 0.6: the flagship protocol hits F1=1.000 on TPU (DESIGN.md);
    # a 0.6 bar would pass a model that silently drops a whole pitch class
    # (P~1, R~2/3 -> F1~0.8) and pin only "more than half right"
    assert f1 > 0.9, (precision, recall, f1)
