"""Torch checkpoint <-> JAX params conversion.

Maps the reference `ADTModel` state-dict naming scheme (model.py:193-226;
checkpoints saved by HF Trainer as safetensors/`pytorch_model.bin`,
build_model.py:49-66) onto this framework's params pytree, so reference-trained
checkpoints can be evaluated here (parity checks) and vice versa.

Works on plain numpy dicts — callers load safetensors / torch files themselves
(`adt_str_tpu.training.checkpoint` provides helpers).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


def _lin(sd: Mapping[str, np.ndarray], prefix: str, bias: bool = True) -> Params:
    p = {"w": jnp.asarray(np.ascontiguousarray(sd[f"{prefix}.weight"].T))}
    if bias:
        p["b"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


def _ln(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    return {
        "scale": jnp.asarray(sd[f"{prefix}.weight"]),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def _attn(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    return {
        "in_proj": {
            "w": jnp.asarray(np.ascontiguousarray(sd[f"{prefix}.in_proj_weight"].T)),
            "b": jnp.asarray(sd[f"{prefix}.in_proj_bias"]),
        },
        "out_proj": _lin(sd, f"{prefix}.out_proj"),
    }


def _enc_layer(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    return {
        "self_attn": _attn(sd, f"{prefix}.self_attn"),
        "ffn": {
            "linear1": _lin(sd, f"{prefix}.linear1"),
            "linear2": _lin(sd, f"{prefix}.linear2"),
        },
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
    }


def _dec_layer(sd: Mapping[str, np.ndarray], prefix: str) -> Params:
    return {
        "self_attn": _attn(sd, f"{prefix}.self_attn"),
        # torch TransformerDecoderLayer names cross attention `multihead_attn`
        "cross_attn": _attn(sd, f"{prefix}.multihead_attn"),
        "ffn": {
            "linear1": _lin(sd, f"{prefix}.linear1"),
            "linear2": _lin(sd, f"{prefix}.linear2"),
        },
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "norm3": _ln(sd, f"{prefix}.norm3"),
    }


def params_from_torch_state_dict(sd: Mapping[str, np.ndarray]) -> Params:
    """Reference ADTModel state dict (numpy values) -> params pytree."""
    n_enc = len(
        {k.split(".")[3] for k in sd if k.startswith("encoder.encoder.layers.")}
    )
    n_dec = len(
        {k.split(".")[3] for k in sd if k.startswith("decoder.decoder.layers.")}
    )
    return {
        "project_to_mel": _lin(sd, "project_to_mel"),
        "encoder": {
            "dense": _lin(sd, "encoder.dense_layer", bias=False),
            "layers": [
                _enc_layer(sd, f"encoder.encoder.layers.{i}") for i in range(n_enc)
            ],
            "final_ln": _ln(sd, "encoder.layer_norm"),
        },
        "decoder": {
            "embedding": jnp.asarray(sd["decoder.tgt_tok_emb.embedding.weight"]),
            "layers": [
                _dec_layer(sd, f"decoder.decoder.layers.{i}") for i in range(n_dec)
            ],
            "generator": _lin(sd, "decoder.generator"),
        },
    }


def params_to_torch_state_dict(params: Params) -> dict[str, np.ndarray]:
    """Inverse mapping, for safetensors export consumable by the reference."""
    sd: dict[str, np.ndarray] = {}

    def put_lin(prefix, p):
        sd[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(p["w"]).T)
        if "b" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["b"])

    def put_ln(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["scale"])
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def put_attn(prefix, p):
        sd[f"{prefix}.in_proj_weight"] = np.ascontiguousarray(
            np.asarray(p["in_proj"]["w"]).T
        )
        sd[f"{prefix}.in_proj_bias"] = np.asarray(p["in_proj"]["b"])
        put_lin(f"{prefix}.out_proj", p["out_proj"])

    put_lin("project_to_mel", params["project_to_mel"])
    put_lin("encoder.dense_layer", params["encoder"]["dense"])
    put_ln("encoder.layer_norm", params["encoder"]["final_ln"])
    for i, layer in enumerate(params["encoder"]["layers"]):
        prefix = f"encoder.encoder.layers.{i}"
        put_attn(f"{prefix}.self_attn", layer["self_attn"])
        put_lin(f"{prefix}.linear1", layer["ffn"]["linear1"])
        put_lin(f"{prefix}.linear2", layer["ffn"]["linear2"])
        put_ln(f"{prefix}.norm1", layer["norm1"])
        put_ln(f"{prefix}.norm2", layer["norm2"])
    sd["decoder.tgt_tok_emb.embedding.weight"] = np.asarray(
        params["decoder"]["embedding"]
    )
    put_lin("decoder.generator", params["decoder"]["generator"])
    for i, layer in enumerate(params["decoder"]["layers"]):
        prefix = f"decoder.decoder.layers.{i}"
        put_attn(f"{prefix}.self_attn", layer["self_attn"])
        put_attn(f"{prefix}.multihead_attn", layer["cross_attn"])
        put_lin(f"{prefix}.linear1", layer["ffn"]["linear1"])
        put_lin(f"{prefix}.linear2", layer["ffn"]["linear2"])
        put_ln(f"{prefix}.norm1", layer["norm1"])
        put_ln(f"{prefix}.norm2", layer["norm2"])
        put_ln(f"{prefix}.norm3", layer["norm3"])
    return sd
