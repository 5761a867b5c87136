"""CLAP text tower (RoBERTa encoder) in JAX.

Weight-compatible reimplementation of HF `ClapTextModel` +
`ClapModel.text_projection` (behind the reference's
`ClapWrapper.get_text_features`, `modules/clap_encoder.py:26-84`).

Architecture (ClapTextConfig defaults = roberta-base): 12 post-LN layers,
hidden 768, heads 12, FFN 3072 GELU, learned absolute positions with the
RoBERTa padding-offset indexing (`position = cumsum(mask)*mask + pad_idx`),
tanh pooler over the first token, projection MLP 768 -> 512 -> 512 (ReLU),
L2-normalized. Inference mode only (no dropout).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@dataclass(frozen=True)
class ClapTextArch:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_positions: int = 514
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-12
    projection_dim: int = 512


def _linear(p, x):
    return x @ p["w"] + p["b"]


def _layer_norm(p, x, eps):
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def create_position_ids(input_ids: jnp.ndarray, padding_idx: int) -> jnp.ndarray:
    """RoBERTa position ids: padded tokens keep padding_idx, others count up
    from padding_idx+1 (`create_position_ids_from_input_ids`)."""
    mask = (input_ids != padding_idx).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + padding_idx


def text_encoder_forward(
    params: Params,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    arch: ClapTextArch = ClapTextArch(),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (sequence_output (B, T, H), pooled_output (B, H))."""
    eps = arch.layer_norm_eps
    if attention_mask is None:
        attention_mask = (input_ids != arch.pad_token_id).astype(jnp.float32)
    pos_ids = create_position_ids(input_ids, arch.pad_token_id)

    emb = params["embeddings"]
    x = (
        emb["word_embeddings"][input_ids]
        + emb["position_embeddings"][pos_ids]
        + emb["token_type_embeddings"][0][None, None, :]
    )
    x = _layer_norm(emb["LayerNorm"], x, eps)

    ext_mask = (1.0 - attention_mask[:, None, None, :]) * jnp.finfo(jnp.float32).min
    H = arch.num_heads
    hd = arch.hidden_size // H

    for layer in params["layers"]:
        def heads(t):
            b, t_len, _ = t.shape
            return t.reshape(b, t_len, H, hd).transpose(0, 2, 1, 3)

        q = heads(_linear(layer["query"], x))
        k = heads(_linear(layer["key"], x))
        v = heads(_linear(layer["value"], x))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd) + ext_mask
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        b, _, t_len, _ = ctx.shape
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t_len, arch.hidden_size)
        x = _layer_norm(
            layer["attn_out_ln"], x + _linear(layer["attn_out"], ctx), eps
        )
        h = jax.nn.gelu(_linear(layer["intermediate"], x), approximate=False)
        x = _layer_norm(layer["out_ln"], x + _linear(layer["output"], h), eps)

    pooled = jnp.tanh(_linear(params["pooler"], x[:, 0]))
    return x, pooled


@functools.partial(jax.jit, static_argnames=("arch",))
def get_text_features(
    params: Params,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    arch: ClapTextArch = ClapTextArch(),
) -> jnp.ndarray:
    """L2-normalized (B, 512) text embeddings (ClapModel.get_text_features)."""
    _, pooled = text_encoder_forward(params["text_model"], input_ids, attention_mask, arch)
    h = jax.nn.relu(_linear(params["text_projection"]["linear1"], pooled))
    feats = _linear(params["text_projection"]["linear2"], h)
    return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)


# ------------------------------------------------------------ weight import

def _t_lin(sd, prefix):
    return {
        "w": jnp.asarray(np.ascontiguousarray(sd[f"{prefix}.weight"].T)),
        "b": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def _t_ln(sd, prefix):
    return {
        "scale": jnp.asarray(sd[f"{prefix}.weight"]),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def text_params_from_torch_state_dict(
    sd, arch: ClapTextArch = ClapTextArch(), prefix: str = "text_model"
) -> Params:
    """HF ClapModel state dict (numpy values) -> text tower params tree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    layers = []
    for i in range(arch.num_layers):
        lp = f"{prefix}.encoder.layer.{i}"
        layers.append(
            {
                "query": _t_lin(sd, f"{lp}.attention.self.query"),
                "key": _t_lin(sd, f"{lp}.attention.self.key"),
                "value": _t_lin(sd, f"{lp}.attention.self.value"),
                "attn_out": _t_lin(sd, f"{lp}.attention.output.dense"),
                "attn_out_ln": _t_ln(sd, f"{lp}.attention.output.LayerNorm"),
                "intermediate": _t_lin(sd, f"{lp}.intermediate.dense"),
                "output": _t_lin(sd, f"{lp}.output.dense"),
                "out_ln": _t_ln(sd, f"{lp}.output.LayerNorm"),
            }
        )
    params: Params = {
        "text_model": {
            "embeddings": {
                "word_embeddings": jnp.asarray(
                    sd[f"{prefix}.embeddings.word_embeddings.weight"]
                ),
                "position_embeddings": jnp.asarray(
                    sd[f"{prefix}.embeddings.position_embeddings.weight"]
                ),
                "token_type_embeddings": jnp.asarray(
                    sd[f"{prefix}.embeddings.token_type_embeddings.weight"]
                ),
                "LayerNorm": _t_ln(sd, f"{prefix}.embeddings.LayerNorm"),
            },
            "layers": layers,
            "pooler": _t_lin(sd, f"{prefix}.pooler.dense"),
        }
    }
    if "text_projection.linear1.weight" in sd:
        params["text_projection"] = {
            "linear1": _t_lin(sd, "text_projection.linear1"),
            "linear2": _t_lin(sd, "text_projection.linear2"),
        }
    return params
