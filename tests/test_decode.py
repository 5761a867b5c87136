"""Decoding tests: KV-cache greedy must match the naive full-prefix re-run
(the reference's algorithm, model.py:300-322) token for token."""

import numpy as np

import jax
import jax.numpy as jnp

from adt_str_tpu.config import ModelConfig
from adt_str_tpu.models import adt, decode
from adt_str_tpu.models import transformer as T


def tiny_config(**kw):
    defaults = dict(
        sample_rate=4000,
        win_length=256,
        time_res=0.01,
        input_sec=0.64,
        enc_layers=2,
        dec_layers=2,
        nhead=2,
        d_query=16,
        dropout=0.0,
        tgt_vocab_size=40,
        n_mels=16,
        compute_dtype="float32",
        max_positions=64,
    )
    defaults.update(kw)
    return ModelConfig(**defaults)


def naive_greedy(params, wave, cfg, max_length, bos=2, eos=3):
    """Reference algorithm: re-run the full decoder on the whole prefix each
    step, argmax the last position, freeze finished rows at EOS."""
    memory = adt.encode(params, jnp.asarray(wave), cfg)
    B = wave.shape[0]
    generated = np.full((B, 1), bos, dtype=np.int64)
    finished = np.zeros(B, dtype=bool)
    for _ in range(max_length - 1):
        seq_len = generated.shape[1]
        logits = adt.decode_logits(
            params,
            jnp.asarray(generated),
            memory,
            cfg,
            self_mask=T.causal_mask_additive(seq_len),
        )
        next_tok = np.asarray(jnp.argmax(logits[:, -1, :], axis=-1))
        next_tok = np.where(finished, eos, next_tok)
        generated = np.concatenate([generated, next_tok[:, None]], axis=1)
        finished = finished | (next_tok == eos)
        if finished.all():
            break
    return generated


def test_greedy_kv_cache_matches_naive():
    cfg = tiny_config()
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    wave = rng.normal(size=(3, cfg.chunk_samples)).astype(np.float32) * 0.1
    max_len = 24
    fast = np.asarray(
        decode.greedy_decode(params, jnp.asarray(wave), cfg, max_length=max_len)
    )
    slow = naive_greedy(params, wave, cfg, max_len)
    # compare up to the naive length; fast output is EOS-filled beyond
    L = slow.shape[1]
    np.testing.assert_array_equal(fast[:, :L], slow)
    assert (fast[:, L:] == 3).all()


def test_greedy_rows_freeze_after_eos():
    cfg = tiny_config()
    params = adt.init_params(jax.random.PRNGKey(1), cfg)
    wave = np.zeros((2, cfg.chunk_samples), dtype=np.float32)
    out = np.asarray(decode.greedy_decode(params, jnp.asarray(wave), cfg, max_length=16))
    for row in out:
        eos_pos = np.where(row == 3)[0]
        if len(eos_pos):
            assert (row[eos_pos[0] :] == 3).all()


def test_beam_size_1_matches_greedy():
    cfg = tiny_config()
    params = adt.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(1)
    wave = rng.normal(size=(2, cfg.chunk_samples)).astype(np.float32) * 0.1
    greedy = np.asarray(
        decode.greedy_decode(params, jnp.asarray(wave), cfg, max_length=16)
    )
    beam = np.asarray(
        decode.beam_search_decode(
            params, jnp.asarray(wave), cfg, beam_size=1, max_length=16
        )
    )
    np.testing.assert_array_equal(beam, greedy)


def test_beam_search_shapes_and_bos():
    cfg = tiny_config()
    params = adt.init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(2)
    wave = rng.normal(size=(2, cfg.chunk_samples)).astype(np.float32) * 0.1
    out = np.asarray(
        decode.beam_search_decode(
            params, jnp.asarray(wave), cfg, beam_size=3, max_length=20
        )
    )
    assert out.shape == (2, 20)
    assert (out[:, 0] == 2).all()


def test_beam_score_not_worse_than_greedy():
    """The beam-1 hypothesis score must never exceed the best beam-4 score."""
    cfg = tiny_config()
    params = adt.init_params(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(3)
    wave = rng.normal(size=(1, cfg.chunk_samples)).astype(np.float32) * 0.1

    def seq_logprob(tokens):
        memory = adt.encode(params, jnp.asarray(wave), cfg)
        tokens = tokens[tokens != 1]
        stop = np.where(tokens == 3)[0]
        tokens = tokens[: stop[0] + 1] if len(stop) else tokens
        inp = jnp.asarray(tokens[None, :-1])
        logits = adt.decode_logits(
            params, inp, memory, cfg, self_mask=T.causal_mask_additive(inp.shape[1])
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        lp = float(
            sum(logp[0, i, tokens[i + 1]] for i in range(len(tokens) - 1))
        )
        return lp / (len(tokens) ** 1.0)

    greedy = np.asarray(decode.greedy_decode(params, jnp.asarray(wave), cfg, max_length=16))[0]
    beam = np.asarray(
        decode.beam_search_decode(params, jnp.asarray(wave), cfg, beam_size=4, max_length=16)
    )[0]
    assert seq_logprob(beam) >= seq_logprob(greedy) - 1e-4


def test_transcribe_sharded_matches_single_device(rng):
    """inference.transcribe over the virtual 8-device mesh (chunk-level data
    parallelism, incl. padding a non-divisible chunk count) must produce the
    identical note list as the single-device path."""
    from adt_str_tpu.config import FrameworkConfig
    from adt_str_tpu.domain.tokenizer import MidiTokenizer
    from adt_str_tpu.parallel import mesh as mesh_lib
    from inference import transcribe

    cfg = FrameworkConfig.from_dict(
        {
            "shared": {"input_sec": 0.64, "time_res": 0.01, "win_length": 256,
                       "sample_rate": 4000},
            "model": {"enc_layers": 1, "dec_layers": 1, "nhead": 2, "d_query": 16,
                      "dropout": 0.0, "tgt_vocab_size": 1400, "n_mels": 16,
                      "compute_dtype": "float32", "max_positions": 64},
            "tokenizer": {"ADTOF_mapping": False, "BOS_token": 2, "EOS_token": 3,
                          "pad_token": 1, "silence_token": 0, "add_velocity": True},
            "inference": {"max_length": 10, "batch_size": 4},
        }
    )
    params = adt.init_params(jax.random.PRNGKey(2), cfg.model)
    params["decoder"]["generator"]["w"] = params["decoder"]["generator"]["w"] * 4.0
    tok = MidiTokenizer(cfg.tokenizer)
    # 5 chunks of audio (not divisible by 8 devices)
    wave = (rng.normal(size=5 * cfg.shared.chunk_samples - 100) * 0.3).astype(np.float32)

    single = transcribe(params, cfg, wave, tok)
    mesh = mesh_lib.make_mesh(n_data=len(jax.devices()), n_model=1)
    sharded = transcribe(params, cfg, wave, tok, mesh=mesh)
    np.testing.assert_array_equal(single, sharded)
