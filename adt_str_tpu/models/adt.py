"""ADT seq2seq model: log-mel -> encoder -> autoregressive token decoder.

Capability parity with the reference `ADTModel` (`model.py:193-258`):

- waveform -> fp32 log-mel island -> `project_to_mel` Linear(n_mels, d_model)
  (model.py:224-226, 248-249);
- Encoder (model.py:100-135): bias-free dense layer -> sinusoidal PE ->
  dropout -> `enc_layers` post-norm transformer layers -> LayerNorm -> dropout;
- Decoder (model.py:138-190): token embedding * sqrt(d_model) -> PE ->
  dropout -> `dec_layers` post-norm decoder layers -> generator
  Linear(d_model, vocab);
- fp32 cross-entropy with `ignore_index=PAD(1)` and nan_to_num on logits
  (model.py:228-238);
- teacher forcing contract: `tgt_input = tokens[:, :-1]`,
  `labels = tokens[:, 1:]` (train.py:56-57), causal + padding additive masks.

TPU design: pure functions over an explicit params pytree; bf16 compute with
fp32 params/loss; static shapes throughout; decoding lives in
`adt_str_tpu.models.decode` (KV-cache `lax.while_loop`, unlike the reference's
re-run-the-whole-prefix loop at model.py:300-322).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from adt_str_tpu.config import ModelConfig
from adt_str_tpu.models import transformer as T
from adt_str_tpu.ops.mel import MelFrontendParams, log_mel_spectrogram

Params = dict[str, Any]

PAD_TOKEN = 1  # loss ignore_index (model.py:237)


def mel_params(config: ModelConfig) -> MelFrontendParams:
    return MelFrontendParams(
        sample_rate=config.sample_rate,
        win_length=config.win_length,
        hop_length=int(config.time_res * config.sample_rate),
        n_mels=config.n_mels,
    )


def init_params(key: jax.Array, config: ModelConfig) -> Params:
    d, ff = config.d_model, config.ffn_dim
    keys = jax.random.split(key, 6 + config.enc_layers + config.dec_layers)
    k_proj, k_dense, k_emb, k_gen = keys[0], keys[1], keys[2], keys[3]
    enc_keys = keys[6 : 6 + config.enc_layers]
    dec_keys = keys[6 + config.enc_layers :]
    return {
        "project_to_mel": T.linear_init(k_proj, config.n_mels, d),
        "encoder": {
            "dense": T.linear_init(k_dense, d, d, bias=False),
            "layers": [T.encoder_layer_init(k, d, ff) for k in enc_keys],
            "final_ln": T.layernorm_init(d),
        },
        "decoder": {
            # torch nn.Embedding init: N(0, 1)
            "embedding": jax.random.normal(k_emb, (config.tgt_vocab_size, d), jnp.float32),
            "layers": [T.decoder_layer_init(k, d, ff) for k in dec_keys],
            "generator": T.linear_init(k_gen, d, config.tgt_vocab_size),
        },
    }


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


def _pe_table(config: ModelConfig) -> jnp.ndarray:
    return jnp.asarray(T.sinusoidal_positions(config.max_positions, config.d_model))


def encode(
    params: Params,
    wave: jnp.ndarray,
    config: ModelConfig,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jnp.ndarray:
    """(B, samples) waveform -> (B, frames, d_model) encoder memory."""
    compute = jnp.dtype(config.compute_dtype)
    # Pallas kernels only lower on TPU backends; fall back to the XLA path on
    # CPU (tests / dry runs) even when the config enables the fused kernel.
    if config.use_pallas_mel and jax.default_backend() not in ("cpu",):
        from adt_str_tpu.ops.pallas_mel import pallas_log_mel

        mel = pallas_log_mel(wave, mel_params(config))
    else:
        mel = log_mel_spectrogram(wave, mel_params(config))
    x = T.linear(params["project_to_mel"], mel.astype(compute))
    enc = params["encoder"]
    x = T.linear(enc["dense"], x)
    x = x + _pe_table(config)[None, : x.shape[1], :].astype(compute)
    n_layers = len(enc["layers"])
    keys = jax.random.split(rng, n_layers + 2) if rng is not None else [None] * (n_layers + 2)
    x = T.dropout(x, config.dropout, keys[0], train)
    use_flash = config.use_flash_attention and jax.default_backend() != "cpu"
    use_pffn = config.use_pallas_ffn and jax.default_backend() != "cpu"

    def _layer(p_layer, x, k):
        return T.encoder_layer_forward(
            p_layer, x, config.nhead, config.dropout, k, train,
            use_flash=use_flash, use_pallas_ffn=use_pffn,
        )

    if config.remat and train:
        # identical math; activations recomputed in backward (config.remat)
        _layer = jax.checkpoint(_layer)
    for p_layer, k in zip(enc["layers"], keys[1 : 1 + n_layers]):
        x = _layer(p_layer, x, k)
    x = T.layer_norm(enc["final_ln"], x)
    x = T.dropout(x, config.dropout, keys[-1], train)
    return x


def embed_tokens(params: Params, tokens: jnp.ndarray, config: ModelConfig) -> jnp.ndarray:
    """Plain embedding lookup * sqrt(d_model) (model.py:42-49, plain=True).

    Multi-hot tokens (B, T, vocab) implement the reference's legacy
    `plain=False` `TokenEmbedding` matmul variant (model.py:13-39) — dead in
    the reference (its trainer feeds ids and `sample`/`beam_search` assert
    plain, model.py:283-285,353-355) but kept for capability parity."""
    compute = jnp.dtype(config.compute_dtype)
    emb = params["decoder"]["embedding"].astype(compute)
    scale = jnp.asarray(math.sqrt(config.d_model), compute)
    if tokens.ndim == 3:  # multi-hot (plain=False)
        return tokens.astype(compute) @ emb * scale
    if not config.plain:
        raise NotImplementedError(
            "plain=False needs multi-hot (B, T, vocab) inputs (model.py:13-39)"
        )
    return emb[tokens] * scale


def decode_logits(
    params: Params,
    tgt_tokens: jnp.ndarray,
    memory: jnp.ndarray,
    config: ModelConfig,
    self_mask: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    positions: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(B, T) tokens + (B, S, d) memory -> (B, T, vocab) logits."""
    compute = jnp.dtype(config.compute_dtype)
    dec = params["decoder"]
    x = embed_tokens(params, tgt_tokens, config)
    pe = _pe_table(config).astype(compute)
    if positions is None:
        x = x + pe[None, : x.shape[1], :]
    else:
        x = x + pe[positions]
    n_layers = len(dec["layers"])
    keys = jax.random.split(rng, n_layers + 1) if rng is not None else [None] * (n_layers + 1)
    x = T.dropout(x, config.dropout, keys[0], train)
    use_flash = config.use_flash_attention and jax.default_backend() != "cpu"
    use_pffn = config.use_pallas_ffn and jax.default_backend() != "cpu"
    mem = memory.astype(compute)

    def _layer(p_layer, x, mem, self_mask, k):
        return T.decoder_layer_forward(
            p_layer,
            x,
            mem,
            config.nhead,
            config.dropout,
            k,
            train,
            self_mask=self_mask,
            use_flash=use_flash,
            use_pallas_ffn=use_pffn,
        )

    if config.remat and train:
        # identical math; activations recomputed in backward (config.remat)
        _layer = jax.checkpoint(_layer)
    for p_layer, k in zip(dec["layers"], keys[1:]):
        x = _layer(p_layer, x, mem, self_mask, k)
    return T.linear(dec["generator"], x)


def cross_entropy_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, reduction: str = "mean"
):
    """fp32 CE over non-PAD labels, nan_to_num'd logits (model.py:228-238).

    reduction="mean": the reference's token-masked mean (model.py:228-238).
    reduction="sum": `(nll_sum, n_valid)` — lets a sharded caller form the
    EXACT global token-weighted mean by summing both terms across shards
    (parallel/train_step.py) instead of averaging per-shard means."""
    logits = logits.astype(jnp.float32)
    logits = jnp.nan_to_num(logits, nan=0.0, posinf=1e4, neginf=-1e4)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    valid = (labels != PAD_TOKEN).astype(jnp.float32)
    s, n = jnp.sum(nll * valid), jnp.sum(valid)
    if reduction == "sum":
        return s, n
    return s / jnp.maximum(n, 1.0)


def forward_loss(
    params: Params,
    wave: jnp.ndarray,
    tokens: jnp.ndarray,
    token_lengths: jnp.ndarray,
    config: ModelConfig,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    reduction: str = "mean",
):
    """Full training forward: teacher forcing + causal/padding masks -> loss.

    `token_lengths` follows the reference collate convention
    (train_dataset.py:41-56): valid lengths with rows equal to the batch max
    already decremented by one. `reduction` as in `cross_entropy_loss`.
    """
    tgt_input = tokens[:, :-1]
    labels = tokens[:, 1:]
    seq_len = tgt_input.shape[1]
    k_enc, k_dec = jax.random.split(rng) if rng is not None else (None, None)
    memory = encode(params, wave, config, k_enc, train)
    mask = T.causal_mask_additive(seq_len)
    if token_lengths is not None:
        mask = mask + T.padding_mask_additive(token_lengths, seq_len)
    logits = decode_logits(
        params, tgt_input, memory, config, self_mask=mask, rng=k_dec, train=train
    )
    return cross_entropy_loss(logits, labels, reduction=reduction)


def collate_token_lengths(lengths: jnp.ndarray) -> jnp.ndarray:
    """Reference collate quirk (train_dataset.py:47-51): lengths equal to the
    batch max are decremented by 1. Vectorized / jittable."""
    return lengths - (lengths == lengths.max()).astype(lengths.dtype)
