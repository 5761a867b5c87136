"""Numerical parity of the JAX transformer against torch layers with copied
weights (eval mode, fp32). This is the architecture-parity evidence standing in
for the reference's `nn.TransformerEncoder/Decoder` stacks (model.py:100-190)."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from adt_str_tpu.config import ModelConfig, TokenizerConfig
from adt_str_tpu.models import adt
from adt_str_tpu.models import transformer as T
from adt_str_tpu.models.torch_compat import (
    params_from_torch_state_dict,
    params_to_torch_state_dict,
)

D, H, FF = 64, 4, 128


def sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def test_encoder_layer_matches_torch():
    torch.manual_seed(0)
    layer = nn.TransformerEncoderLayer(
        d_model=D, nhead=H, dim_feedforward=FF, dropout=0.0,
        activation="gelu", batch_first=True, norm_first=False,
    ).eval()
    sd = sd_numpy(layer)
    p = {
        "self_attn": {
            "in_proj": {
                "w": jnp.asarray(sd["self_attn.in_proj_weight"].T),
                "b": jnp.asarray(sd["self_attn.in_proj_bias"]),
            },
            "out_proj": {
                "w": jnp.asarray(sd["self_attn.out_proj.weight"].T),
                "b": jnp.asarray(sd["self_attn.out_proj.bias"]),
            },
        },
        "ffn": {
            "linear1": {"w": jnp.asarray(sd["linear1.weight"].T), "b": jnp.asarray(sd["linear1.bias"])},
            "linear2": {"w": jnp.asarray(sd["linear2.weight"].T), "b": jnp.asarray(sd["linear2.bias"])},
        },
        "norm1": {"scale": jnp.asarray(sd["norm1.weight"]), "bias": jnp.asarray(sd["norm1.bias"])},
        "norm2": {"scale": jnp.asarray(sd["norm2.weight"]), "bias": jnp.asarray(sd["norm2.bias"])},
    }
    x = np.random.default_rng(1).normal(size=(2, 10, D)).astype(np.float32)
    ref = layer(torch.from_numpy(x)).detach().numpy()
    ours = np.asarray(
        T.encoder_layer_forward(p, jnp.asarray(x), H, 0.0, None, False)
    )
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


def _tiny_config(**kw):
    defaults = dict(
        sample_rate=4000,
        win_length=256,
        time_res=0.01,
        input_sec=0.64,
        enc_layers=2,
        dec_layers=2,
        nhead=4,
        d_query=16,
        dropout=0.0,
        tgt_vocab_size=1400,
        n_mels=32,
        compute_dtype="float32",
    )
    defaults.update(kw)
    return ModelConfig(**defaults)


def test_decoder_stack_matches_torch_with_converted_weights():
    """Full decoder stack parity via the torch_compat state-dict converter,
    exercising causal masks and cross attention."""
    torch.manual_seed(0)
    cfg = _tiny_config()
    d = cfg.d_model

    dec_layer = nn.TransformerDecoderLayer(
        d_model=d, nhead=cfg.nhead, dim_feedforward=cfg.ffn_dim, dropout=0.0,
        activation="gelu", batch_first=True, norm_first=False,
    )
    torch_dec = nn.TransformerDecoder(dec_layer, num_layers=cfg.dec_layers).eval()
    emb = nn.Embedding(cfg.tgt_vocab_size, d)
    gen = nn.Linear(d, cfg.tgt_vocab_size)

    sd = {f"decoder.decoder.{k}": v.detach().numpy() for k, v in torch_dec.state_dict().items()}
    sd["decoder.tgt_tok_emb.embedding.weight"] = emb.weight.detach().numpy()
    sd["decoder.generator.weight"] = gen.weight.detach().numpy()
    sd["decoder.generator.bias"] = gen.bias.detach().numpy()
    # minimal encoder side so the converter sees a full state dict
    enc_layer = nn.TransformerEncoderLayer(
        d_model=d, nhead=cfg.nhead, dim_feedforward=cfg.ffn_dim, dropout=0.0,
        activation="gelu", batch_first=True, norm_first=False,
    )
    torch_enc = nn.TransformerEncoder(enc_layer, num_layers=cfg.enc_layers).eval()
    sd.update({f"encoder.encoder.{k}": v.detach().numpy() for k, v in torch_enc.state_dict().items()})
    dense = nn.Linear(d, d, bias=False)
    proj = nn.Linear(cfg.n_mels, d)
    ln = nn.LayerNorm(d)
    sd["encoder.dense_layer.weight"] = dense.weight.detach().numpy()
    sd["encoder.layer_norm.weight"] = ln.weight.detach().numpy()
    sd["encoder.layer_norm.bias"] = ln.bias.detach().numpy()
    sd["project_to_mel.weight"] = proj.weight.detach().numpy()
    sd["project_to_mel.bias"] = proj.bias.detach().numpy()

    params = params_from_torch_state_dict(sd)

    rng = np.random.default_rng(2)
    B, Ttok, S = 2, 12, 20
    tokens = rng.integers(0, cfg.tgt_vocab_size, (B, Ttok))
    memory = rng.normal(size=(B, S, d)).astype(np.float32)

    # torch reference: emb*sqrt(d) + sinusoidal PE -> decoder -> generator
    pe = T.sinusoidal_positions(cfg.max_positions, d)
    tgt_in = emb(torch.from_numpy(tokens)).detach().numpy() * np.sqrt(d) + pe[None, :Ttok]
    causal = torch.triu(torch.ones(Ttok, Ttok, dtype=torch.bool), diagonal=1)
    float_mask = torch.zeros(Ttok, Ttok).masked_fill_(causal, -1e4)
    ref_out = torch_dec(
        torch.from_numpy(tgt_in.astype(np.float32)),
        torch.from_numpy(memory),
        tgt_mask=float_mask,
    )
    ref_logits = gen(ref_out).detach().numpy()

    ours = np.asarray(
        adt.decode_logits(
            params,
            jnp.asarray(tokens),
            jnp.asarray(memory),
            cfg,
            self_mask=T.causal_mask_additive(Ttok),
        )
    )
    np.testing.assert_allclose(ours, ref_logits, atol=5e-4, rtol=1e-4)


def test_roundtrip_state_dict():
    cfg = _tiny_config()
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    sd = params_to_torch_state_dict(params)
    params2 = params_from_torch_state_dict(sd)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(4, 9, 50)).astype(np.float32)
    labels = rng.integers(0, 50, (4, 9))
    labels[0, 5:] = 1  # PAD
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits).reshape(-1, 50),
        torch.from_numpy(labels).reshape(-1),
        ignore_index=1,
    ).item()
    ours = float(adt.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_full_forward_loss_runs_and_is_finite():
    cfg = _tiny_config()
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    B = 2
    wave = rng.normal(size=(B, cfg.chunk_samples)).astype(np.float32) * 0.1
    tokens = np.full((B, 16), 1, dtype=np.int64)
    tokens[:, 0] = 2
    tokens[0, 1:5] = [10, 338, 450, 3]
    tokens[1, 1:3] = [0, 3]
    lengths = np.array([5, 3])
    loss = adt.forward_loss(
        params,
        jnp.asarray(wave),
        jnp.asarray(tokens),
        jnp.asarray(lengths),
        cfg,
    )
    assert np.isfinite(float(loss))
    assert float(loss) > 0


def test_collate_token_lengths_quirk():
    lengths = jnp.asarray([5, 7, 7, 3])
    out = adt.collate_token_lengths(lengths)
    np.testing.assert_array_equal(np.asarray(out), [5, 6, 6, 3])


def test_multihot_embedding_matches_plain_on_onehot():
    """The legacy plain=False matmul embedding (reference model.py:13-39)
    equals the plain lookup when fed exact one-hot rows."""
    cfg = ModelConfig(
        input_sec=0.64, time_res=0.01, win_length=256, sample_rate=4000,
        enc_layers=1, dec_layers=1, nhead=2, d_query=8, dropout=0.0,
        tgt_vocab_size=32, n_mels=8, compute_dtype="float32", max_positions=16,
    )
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray([[2, 5, 7, 3]], jnp.int32)
    plain = adt.embed_tokens(params, tokens, cfg)
    onehot = jax.nn.one_hot(tokens, cfg.tgt_vocab_size, dtype=jnp.float32)
    multi = adt.embed_tokens(params, onehot, cfg)
    np.testing.assert_allclose(np.asarray(multi), np.asarray(plain), rtol=1e-6)


def test_dropout_distribution_and_scale():
    from adt_str_tpu.models.transformer import dropout

    x = jnp.ones((500, 200))
    y = np.asarray(dropout(x, 0.25, jax.random.PRNGKey(0), True))
    keep_frac = (y != 0).mean()
    assert abs(keep_frac - 0.75) < 0.01
    np.testing.assert_allclose(y[y != 0], 1.0 / 0.75, rtol=1e-5)
    # eval mode / zero rate are identity
    np.testing.assert_array_equal(np.asarray(dropout(x, 0.25, None, False)), np.asarray(x))


def test_dropout_custom_vjp_mask_consistency():
    """The regenerating custom VJP must apply the *identical* mask in forward
    and backward (residual is only the key)."""
    from adt_str_tpu.models.transformer import dropout

    x = jnp.ones((64, 129))
    key = jax.random.PRNGKey(3)
    y, vjp = jax.vjp(lambda x: dropout(x, 0.25, key, True), x)
    (dx,) = vjp(jnp.ones_like(y))
    # forward kept exactly where backward passes gradient, with the same scale
    np.testing.assert_array_equal(np.asarray(y), np.asarray(dx))
    kept = np.asarray(y) != 0
    np.testing.assert_allclose(np.asarray(y)[kept], 1.0 / 0.75, rtol=1e-6)


def test_dropout_mask_row_statistics():
    """Pins the hash-mask quality properties that cheap hash variants break.

    Measured failure mode (round 3, BENCHMARKS.md): dropping the second
    murmur round saves ~1-3 ms/step on chip but maps row offsets to
    hash-space offsets, producing (a) near-duplicate mask rows (|corr| up to
    0.995 at resonant row pairs), (b) strong short-lag autocorrelation
    (0.75 at lag 4), and (c) a collapse of the per-row keep-rate variance
    to ~0.06x binomial (the masks become low-discrepancy instead of iid).
    All three are invisible to mean/scale tests; this test measures them at
    an FFN-hidden-like shape so a future "faster hash" cannot silently
    regress mask quality."""
    from adt_str_tpu.models.transformer import _hash_mask, _seed_from_key

    keep = 0.5  # worst case for all three statistics
    rows, cols = 2048, 3072
    seed = _seed_from_key(jax.random.PRNGKey(11))
    m = np.asarray(_hash_mask((rows, cols), seed, keep))
    mf = m.astype(np.float32) - keep

    # (c) per-row keep-rate spread ~ binomial (iid ratio 1.0; broken: 0.04)
    sd_ratio = m.mean(axis=1).std() / np.sqrt(keep * (1 - keep) / cols)
    assert 0.7 < sd_ratio < 1.4, sd_ratio

    # (a) no near-duplicate rows: adjacent pairs + a deterministic sample
    rng = np.random.default_rng(0)
    pairs = [(i, i + 1) for i in range(rows - 1)]
    pairs += [tuple(sorted(rng.choice(rows, 2, replace=False))) for _ in range(500)]
    denom = keep * (1 - keep) * cols
    cmax = max(abs(float(mf[i] @ mf[j])) / denom for i, j in pairs)
    assert cmax < 0.4, cmax  # production hash measures <= ~0.17; broken: 0.99

    # (b) short-lag and col-stride autocorrelation of the flat mask
    flat = mf.reshape(-1)
    n = flat.size
    for lag in list(range(1, 17)) + [cols, 2 * cols]:
        c = abs(float(flat[:-lag] @ flat[lag:])) / (keep * (1 - keep) * (n - lag))
        assert c < 0.1, (lag, c)  # production: <= ~0.005; broken: 0.75 @ lag 4


def test_dropout_masks_decorrelated_across_keys():
    """Different PRNG keys (as produced by per-site jax.random.split) must
    yield ~independent masks, and the hash must not alias across adjacent
    flat indices (drop runs should be short)."""
    from adt_str_tpu.models.transformer import dropout

    x = jnp.ones((512, 257))
    ya = np.asarray(dropout(x, 0.5, jax.random.PRNGKey(7), True)) != 0
    yb = np.asarray(dropout(x, 0.5, jax.random.split(jax.random.PRNGKey(7))[0], True)) != 0
    agree = (ya == yb).mean()  # independent 50% masks agree ~50%
    assert 0.47 < agree < 0.53, agree
    # row-to-row correlation within one mask (adjacent counter blocks)
    flat = ya.reshape(-1)
    shifted_agree = (flat[1:] == flat[:-1]).mean()
    assert 0.47 < shifted_agree < 0.53, shifted_agree
