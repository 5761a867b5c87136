"""Functional transformer encoder/decoder blocks.

Architecture parity with the reference model (`model.py:100-190`): post-norm
(`norm_first=False`) PyTorch `TransformerEncoderLayer`/`TransformerDecoderLayer`
semantics — residual -> LayerNorm ordering, exact-erf GELU FFN, combined QKV
projection, additive float masks (0 / -1e4) instead of boolean -inf masks for
bf16 safety (reference model.py:173-181).

Everything is a pure function over a params pytree (nested dicts of jnp
arrays). No module framework: params are explicit so pjit sharding rules,
KV-cache decoding, and torch-checkpoint conversion stay trivial.

Precision policy (TPU): params fp32, matmuls/activations in `compute_dtype`
(default bf16), softmax and LayerNorm statistics in fp32.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

NEG_MASK = -1e4  # additive mask value (reference model.py:177)


# --------------------------------------------------------------------- init

def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def linear_init(key, d_in, d_out, bias=True, dtype=jnp.float32) -> Params:
    """torch.nn.Linear default init: U(-1/sqrt(d_in), 1/sqrt(d_in)).

    Weight stored as (d_in, d_out) — note: transposed vs torch's (out, in) —
    so forward is `x @ w` with no transpose on the MXU.
    """
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    p = {"w": _uniform(kw, (d_in, d_out), bound, dtype)}
    if bias:
        p["b"] = _uniform(kb, (d_out,), bound, dtype)
    return p


def layernorm_init(dim, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def attention_init(key, d_model, dtype=jnp.float32) -> Params:
    """torch.nn.MultiheadAttention init: xavier-uniform in_proj, zero biases on
    in_proj and out_proj, Linear-default out_proj weight."""
    k1, k2 = jax.random.split(key)
    xavier = math.sqrt(6.0 / (d_model + 3 * d_model))
    return {
        "in_proj": {
            "w": _uniform(k1, (d_model, 3 * d_model), xavier, dtype),
            "b": jnp.zeros((3 * d_model,), dtype),
        },
        "out_proj": {
            "w": _uniform(k2, (d_model, d_model), 1.0 / math.sqrt(d_model), dtype),
            "b": jnp.zeros((d_model,), dtype),
        },
    }


def ffn_init(key, d_model, d_ff, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "linear1": linear_init(k1, d_model, d_ff, dtype=dtype),
        "linear2": linear_init(k2, d_ff, d_model, dtype=dtype),
    }


def encoder_layer_init(key, d_model, d_ff, dtype=jnp.float32) -> Params:
    ka, kf = jax.random.split(key)
    return {
        "self_attn": attention_init(ka, d_model, dtype),
        "ffn": ffn_init(kf, d_model, d_ff, dtype),
        "norm1": layernorm_init(d_model, dtype),
        "norm2": layernorm_init(d_model, dtype),
    }


def decoder_layer_init(key, d_model, d_ff, dtype=jnp.float32) -> Params:
    ka, kc, kf = jax.random.split(key, 3)
    return {
        "self_attn": attention_init(ka, d_model, dtype),
        "cross_attn": attention_init(kc, d_model, dtype),
        "ffn": ffn_init(kf, d_model, d_ff, dtype),
        "norm1": layernorm_init(d_model, dtype),
        "norm2": layernorm_init(d_model, dtype),
        "norm3": layernorm_init(d_model, dtype),
    }


# ------------------------------------------------------------------ forward

def linear(p: Params, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    dtype = dtype or x.dtype
    y = x.astype(dtype) @ p["w"].astype(dtype)
    if "b" in p:
        y = y + p["b"].astype(dtype)
    return y


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm with fp32 statistics (torch computes in input dtype; fp32 here
    is the TPU-safe choice and matches within bf16 tolerance)."""
    orig = x.dtype
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(orig)


# Counter-based dropout-mask hash (full murmur3 finalizer, two-word seed).
_HASH_GOLDEN = np.uint32(0x9E3779B9)
_HASH_M1 = np.uint32(0x85EBCA6B)
_HASH_M2 = np.uint32(0xC2B2AE35)


def _hash_mask(shape, seed: jnp.ndarray, keep: float) -> jnp.ndarray:
    """Boolean keep-mask from a fusable counter-based hash.

    `jax.random.bits` lowers to XLA's RngBitGenerator, which cannot enter
    loop fusions — every mask then costs a full HBM roundtrip of the masked
    tensor (measured 8.7 ms of the 74.9 ms flagship model step). This hash is
    plain iota + integer elementwise ops, so XLA fuses mask generation into
    the surrounding elementwise/matmul-epilogue fusions and the mask never
    touches HBM (74.9 -> 70.2 ms).

    `seed` is BOTH 32-bit words of the PRNG key (shape (2,), each already
    scalar-scrambled by `_seed_from_key`): the mask is a function of the full
    64-bit key, so bitwise mask reuse across layers/steps needs a 64-bit
    collision — a 32-bit seed alone would birthday-collide within ~1e6 draws
    of a long run (advisor finding, round 2). The per-element pipeline stays
    at 6 integer ops (the hash runs over the largest tensors in the model —
    every extra op here is measurable VPU time); the expensive murmur3 fmix
    runs on the two SCALAR words instead, where it is free."""
    n = 1
    for d in shape:
        n *= int(d)
    idx = jax.lax.iota(jnp.uint32, n).reshape(shape)
    h = idx * _HASH_GOLDEN + seed[0]
    h = h ^ (h >> 16)
    h = h * _HASH_M1
    h = h ^ seed[1]
    h = h ^ (h >> 15)
    return h < jnp.uint32(min(int(keep * 2**32), 2**32 - 1))


def _fmix32(h: jnp.ndarray) -> jnp.ndarray:
    """murmur3 scalar finalizer (full diffusion; runs on scalars only)."""
    h = h ^ (h >> 16)
    h = h * _HASH_M1
    h = h ^ (h >> 13)
    h = h * _HASH_M2
    h = h ^ (h >> 16)
    return h


def _seed_from_key(key: jax.Array) -> jnp.ndarray:
    """Both words of the key, each fully scrambled (shape (2,) uint32)."""
    d = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    return jnp.stack([_fmix32(d[0] * _HASH_GOLDEN), _fmix32(d[-1] + _HASH_GOLDEN)])


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _dropout_regen(x: jnp.ndarray, keep: float, key: jax.Array) -> jnp.ndarray:
    m = _hash_mask(x.shape, _seed_from_key(key), keep)
    return jnp.where(m, x * (1.0 / keep), 0.0).astype(x.dtype)


def _dropout_regen_fwd(x, keep, key):
    return _dropout_regen(x, keep, key), key


def _dropout_regen_bwd(keep, key, g):
    m = _hash_mask(g.shape, _seed_from_key(key), keep)
    dx = jnp.where(m, g * (1.0 / keep), 0.0).astype(g.dtype)
    return (dx, None)


_dropout_regen.defvjp(_dropout_regen_fwd, _dropout_regen_bwd)


def dropout(x: jnp.ndarray, rate: float, key: Optional[jax.Array], train: bool) -> jnp.ndarray:
    """Inverted dropout, tuned for TPU: masking was the single largest
    non-matmul cost of the flagship train step (17 ms of 83 ms with the naive
    formulation; tools/profile_step.py ablations). Two measured wins:

    - a counter-based hash mask (`_hash_mask`) instead of an XLA
      RngBitGenerator draw: the hash is pure elementwise integer ops, so it
      fuses into neighboring fusions and the mask never materializes in HBM
      (74.9 -> 70.2 ms model step; uint8 RNG draws were the previous best);
    - a custom VJP whose only residual is the PRNG key: the backward pass
      regenerates the identical mask instead of storing/loading ~1 GB of
      mask residuals per step (measured 83.4 -> 74.9 ms when introduced on
      top of uint8 draws)."""
    if not train or rate == 0.0 or key is None:
        return x
    return _dropout_regen(x, 1.0 - rate, key)


def split_heads(x: jnp.ndarray, nhead: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, nhead, d // nhead).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    train: bool = False,
) -> jnp.ndarray:
    """(B,H,Tq,hd) x (B,H,Tk,hd) scaled dot-product attention; `mask` is an
    additive float mask broadcastable to (B,H,Tq,Tk); softmax in fp32.

    Attention-probability dropout matches torch nn.MultiheadAttention, which
    drops attn weights with the layer's dropout rate in train mode."""
    head_dim = q.shape[-1]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(head_dim)
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    probs = dropout(probs, dropout_rate, dropout_key, train)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _fused_attention_ok(q: jnp.ndarray, train: bool, dropout_rate: float) -> bool:
    """Fused kernel applies when attention-prob dropout is inactive and the
    head dim is lane-aligned (the kernel has no prob-dropout support; the
    XLA path keeps exact torch-style regularization during training)."""
    return (not train or dropout_rate == 0.0) and q.shape[-1] % 128 == 0


def multihead_attention(
    p: Params,
    query: jnp.ndarray,
    key_value: jnp.ndarray,
    nhead: int,
    mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    train: bool = False,
    use_flash: bool = False,
) -> jnp.ndarray:
    d_model = query.shape[-1]
    w = p["in_proj"]["w"].astype(query.dtype)
    b = p["in_proj"]["b"].astype(query.dtype)
    q = query @ w[:, :d_model] + b[:d_model]
    k = key_value @ w[:, d_model : 2 * d_model] + b[d_model : 2 * d_model]
    v = key_value @ w[:, 2 * d_model :] + b[2 * d_model :]
    qh, kh, vh = split_heads(q, nhead), split_heads(k, nhead), split_heads(v, nhead)
    if use_flash and _fused_attention_ok(qh, train, dropout_rate):
        out = _flash_attention(qh, kh, vh, mask)
    else:
        out = attention_core(qh, kh, vh, mask, dropout_rate, dropout_key, train)
    return linear(p["out_proj"], merge_heads(out))


def _flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, mask: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """Pad (Tq, Tk) to sublane multiples, run the fused kernel, slice back.
    Padded keys are masked additively; padded query rows are discarded."""
    from adt_str_tpu.ops.pallas_attention import fused_attention

    B, H, Tq, hd = q.shape
    Tk = k.shape[2]
    T = max(-(-max(Tq, Tk) // 8) * 8, 8)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, T - Tq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, T - Tk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, T - Tk), (0, 0)))
    pad_keys = jnp.where(jnp.arange(T) >= Tk, NEG_MASK, 0.0).astype(jnp.float32)
    m3 = jnp.broadcast_to(pad_keys, (B, T, T))
    if mask is not None:
        user = jnp.broadcast_to(
            mask.astype(jnp.float32), (mask.shape[0], 1, Tq, Tk)
        )[:, 0]
        user = jnp.pad(user, ((0, 0), (0, T - Tq), (0, T - Tk)))
        m3 = m3 + user  # (1, T, T) or (B, T, T) broadcasts over (B, T, T)
    interpret = jax.default_backend() == "cpu"
    out = fused_attention(qp, kp, vp, m3, interpret)
    return out[:, :, :Tq, :]


def _fused_ffn_ok(x: jnp.ndarray, train: bool, rate: float, key) -> bool:
    """The fused FFN kernel covers the training configuration (dropout
    active, lane-aligned dims); other cases keep the measured-fine XLA path."""
    return (
        train and rate > 0.0 and key is not None
        # lane-aligned d_model (and hence d_ff = 4*d_model)
        and x.shape[-1] % 128 == 0
    )


def ffn_dropout_block(
    p: Params, x: jnp.ndarray, rate: float, key_h, key_o, interpret: bool = False
) -> jnp.ndarray:
    """`dropout(linear2(dropout(gelu(linear1(x)))))` via the fused Pallas
    kernel (ops/pallas_ffn.py): the (N, d_ff) hidden stays in VMEM and the
    dropout masks are the same counter-hash stream as `dropout` would draw
    for the same keys."""
    from adt_str_tpu.ops.pallas_ffn import fused_ffn_dropout

    b, t, d = x.shape
    seeds = jnp.concatenate([_seed_from_key(key_h), _seed_from_key(key_o)])
    seeds_f = jax.lax.bitcast_convert_type(seeds, jnp.float32).reshape(1, 4)
    out = fused_ffn_dropout(
        p["linear1"]["w"], p["linear1"]["b"], p["linear2"]["w"], p["linear2"]["b"],
        x.reshape(b * t, d), seeds_f, 1.0 - rate, 1.0 - rate, interpret,
    )
    return out.reshape(b, t, d)


def ffn_forward(p: Params, x: jnp.ndarray, dropout_rate, key, train) -> jnp.ndarray:
    # torch activation="gelu" is the exact erf GELU.
    # NOTE(r3): a memory-lean custom VJP that saved only the gelu
    # pre-activation and recomputed the dropped hidden in backward was built
    # and MEASURED SLOWER (12.63 -> 12.34 steps/s): on XLA:TPU dot operands
    # must materialize in HBM, so the recomputed (B,T,d_ff) chains became
    # extra materializations instead of saved ones. The default residuals
    # (pre + dropped hidden) are already the XLA-optimal choice; only a
    # Pallas kernel that keeps the hidden in VMEM tiles can beat it.
    h = jax.nn.gelu(linear(p["linear1"], x), approximate=False)
    h = dropout(h, dropout_rate, key, train)
    return linear(p["linear2"], h)


def encoder_layer_forward(
    p: Params,
    x: jnp.ndarray,
    nhead: int,
    dropout_rate: float,
    key: Optional[jax.Array],
    train: bool,
    mask: Optional[jnp.ndarray] = None,
    use_flash: bool = False,
    use_pallas_ffn: bool = False,
) -> jnp.ndarray:
    keys = jax.random.split(key, 4) if key is not None else (None,) * 4
    attn = multihead_attention(
        p["self_attn"], x, x, nhead, mask, dropout_rate, keys[3], train,
        use_flash=use_flash,
    )
    x = layer_norm(p["norm1"], x + dropout(attn, dropout_rate, keys[0], train))
    if use_pallas_ffn and _fused_ffn_ok(x, train, dropout_rate, keys[1]):
        ff_drop = ffn_dropout_block(p["ffn"], x, dropout_rate, keys[1], keys[2])
    else:
        ff = ffn_forward(p["ffn"], x, dropout_rate, keys[1], train)
        ff_drop = dropout(ff, dropout_rate, keys[2], train)
    x = layer_norm(p["norm2"], x + ff_drop)
    return x


def decoder_layer_forward(
    p: Params,
    x: jnp.ndarray,
    memory: jnp.ndarray,
    nhead: int,
    dropout_rate: float,
    key: Optional[jax.Array],
    train: bool,
    self_mask: Optional[jnp.ndarray] = None,
    cross_mask: Optional[jnp.ndarray] = None,
    use_flash: bool = False,
    use_pallas_ffn: bool = False,
) -> jnp.ndarray:
    keys = jax.random.split(key, 6) if key is not None else (None,) * 6
    attn = multihead_attention(
        p["self_attn"], x, x, nhead, self_mask, dropout_rate, keys[4], train,
        use_flash=use_flash,
    )
    x = layer_norm(p["norm1"], x + dropout(attn, dropout_rate, keys[0], train))
    cross = multihead_attention(
        p["cross_attn"], x, memory, nhead, cross_mask, dropout_rate, keys[5], train,
        use_flash=use_flash,
    )
    x = layer_norm(p["norm2"], x + dropout(cross, dropout_rate, keys[1], train))
    if use_pallas_ffn and _fused_ffn_ok(x, train, dropout_rate, keys[2]):
        ff_drop = ffn_dropout_block(p["ffn"], x, dropout_rate, keys[2], keys[3])
    else:
        ff = ffn_forward(p["ffn"], x, dropout_rate, keys[2], train)
        ff_drop = dropout(ff, dropout_rate, keys[3], train)
    x = layer_norm(p["norm3"], x + ff_drop)
    return x


# ---------------------------------------------------------------- positional

def sinusoidal_positions(maxlen: int, d_model: int) -> np.ndarray:
    """Sinusoidal table identical to the reference `PositionalEncoding`
    (model.py:52-62): interleaved sin/cos with den = exp(-2i ln(1e4)/d)."""
    den = np.exp(-np.arange(0, d_model, 2) * math.log(10000.0) / d_model)
    pos = np.arange(maxlen)[:, None]
    table = np.zeros((maxlen, d_model), dtype=np.float32)
    table[:, 0::2] = np.sin(pos * den)
    table[:, 1::2] = np.cos(pos * den)
    return table


def causal_mask_additive(seq_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, 1, T, T) additive causal mask: 0 on/below diagonal, -1e4 above."""
    mask = jnp.triu(jnp.full((seq_len, seq_len), NEG_MASK, dtype=dtype), k=1)
    return mask[None, None, :, :]


def padding_mask_additive(lengths: jnp.ndarray, seq_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """(B, 1, 1, T) additive key-padding mask from valid lengths
    (position >= length masked), matching `create_mask_plain`
    (utils/utils.py:36-57) + the additive conversion at model.py:178-181."""
    pos = jnp.arange(seq_len)
    pad = pos[None, :] >= lengths[:, None]
    return jnp.where(pad, NEG_MASK, 0.0).astype(dtype)[:, None, None, :]
