"""CLAP audio tower (HTSAT Swin transformer) in JAX.

Weight-compatible reimplementation of HF `ClapAudioModel` +
`ClapModel.audio_projection` (the stack behind the reference's
`ClapWrapper.get_audio_features`, `modules/clap_encoder.py:21-54`), so
`laion/clap-htsat-fused` checkpoints convert directly into a JAX params tree
and batched audio-embedding inference runs as one XLA program on TPU.

Architecture (HF transformers `modeling_clap.py`, defaults =
laion/clap-htsat-fused):
- input: 4-channel fused log-mel (B, 4, 1001, 64); BatchNorm over mel bins;
- `reshape_mel2img`: bicubic time-interpolation to 1024 frames
  (align_corners=True, implemented as an exact interpolation-matrix matmul)
  then the HTSAT freq-ratio regrouping to a (256, 256) image;
- patch embed: 4x4/4 conv (+ optional fused local path: (4,12)/(4,12) conv on
  the 3 crop channels + attentional feature fusion block) -> 64x64 x 96;
- 4 Swin stages (depths [2,2,6,2], heads [4,8,16,32], window 8, shifted
  windows with relative position bias, patch merging between stages);
- final LayerNorm, HTSAT frequency regrouping, temporal average pool -> 768;
- projection MLP 768 -> 512 -> 512 (ReLU), L2-normalized.

All functions are pure (params pytree in, arrays out); dropout is inference
mode (the curation pipeline only ever runs inference).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@dataclass(frozen=True)
class ClapAudioArch:
    """Static architecture facts (ClapAudioConfig defaults = htsat-fused)."""

    window_size: int = 8
    num_mel_bins: int = 64
    spec_size: int = 256
    patch_size: int = 4
    patch_stride: int = 4
    hidden_size: int = 768
    projection_dim: int = 512
    depths: tuple[int, ...] = (2, 2, 6, 2)
    num_heads: tuple[int, ...] = (4, 8, 16, 32)
    patch_embeds_hidden_size: int = 96
    enable_fusion: bool = True
    mlp_ratio: float = 4.0
    aff_block_r: int = 4
    layer_norm_eps: float = 1e-5

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.num_mel_bins

    @property
    def grid_size(self) -> int:
        return self.spec_size // self.patch_stride

    @property
    def num_features(self) -> int:
        return int(self.patch_embeds_hidden_size * 2 ** (len(self.depths) - 1))


# ----------------------------------------------------------------- helpers

def _linear(p, x):
    return x @ p["w"] + p["b"]


def _layer_norm(p, x, eps=1e-5):
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _conv2d(p, x, stride, padding=(0, 0)):
    """NCHW conv; p['w'] is (out, in, kh, kw) torch layout."""
    return jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    ) + p["b"][None, :, None, None]


def _batch_norm(p, x, eps=1e-5):
    """Eval-mode BatchNorm2d over channel axis 1 (NCHW)."""
    scale = p["scale"] * jax.lax.rsqrt(p["var"] + eps)
    bias = p["bias"] - p["mean"] * scale
    return x * scale[None, :, None, None] + bias[None, :, None, None]


@functools.lru_cache(maxsize=8)
def _bicubic_matrix_align_corners(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) interpolation matrix reproducing torch bicubic with
    align_corners=True (cubic convolution kernel a=-0.75, edge replication)."""

    def cubic(x, a=-0.75):
        x = abs(x)
        if x <= 1:
            return (a + 2) * x**3 - (a + 3) * x**2 + 1
        if x < 2:
            return a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a
        return 0.0

    M = np.zeros((n_out, n_in), dtype=np.float64)
    scale = (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
    for i in range(n_out):
        x = i * scale
        x0 = int(np.floor(x))
        for k in range(-1, 3):
            idx = min(max(x0 + k, 0), n_in - 1)
            M[i, idx] += cubic(x - (x0 + k))
    return M.astype(np.float32)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nH*nW, ws, ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)


def window_reverse(windows: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    B = windows.shape[0] // (H * W // ws // ws)
    x = windows.reshape(B, H // ws, W // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


@functools.lru_cache(maxsize=32)
def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (ws*ws, ws*ws)


@functools.lru_cache(maxsize=32)
def _shift_attn_mask(H: int, W: int, ws: int, shift: int) -> Optional[np.ndarray]:
    """(num_windows, ws*ws, ws*ws) additive mask for shifted windows, -100 off."""
    if shift == 0:
        return None
    img = np.zeros((1, H, W, 1), dtype=np.float32)
    slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    count = 0
    for hs in slices:
        for wsl in slices:
            img[:, hs, wsl, :] = count
            count += 1
    x = img.reshape(1, H // ws, ws, W // ws, ws, 1)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    mask = windows[:, None, :] - windows[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


# ------------------------------------------------------------------- blocks

def swin_attention(p: Params, x: jnp.ndarray, num_heads: int, ws: int,
                   attn_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Windowed MSA with relative position bias. x: (nW*B, ws*ws, C)."""
    nwb, n, c = x.shape
    hd = c // num_heads

    def heads(t):
        return t.reshape(nwb, n, num_heads, hd).transpose(0, 2, 1, 3)

    q = heads(_linear(p["query"], x))
    k = heads(_linear(p["key"], x))
    v = heads(_linear(p["value"], x))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)

    rpi = _relative_position_index(ws).reshape(-1)
    bias = p["relative_position_bias_table"][rpi].reshape(n, n, num_heads)
    scores = scores + bias.transpose(2, 0, 1)[None]

    if attn_mask is not None:
        nw = attn_mask.shape[0]
        scores = scores.reshape(nwb // nw, nw, num_heads, n, n)
        scores = scores + attn_mask[None, :, None, :, :]
        scores = scores.reshape(nwb, num_heads, n, n)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(nwb, n, c)
    return _linear(p["output"], out)


def swin_layer(p: Params, x: jnp.ndarray, H: int, W: int, num_heads: int,
               ws: int, shift: int, eps: float) -> jnp.ndarray:
    """One Swin block. x: (B, H*W, C). Post-padding to window multiples is
    applied per HF maybe_pad; H, W here are already window multiples in HTSAT
    (64/32/16/8 vs window 8), and when the resolution <= window the shift is
    dropped and the window shrinks to the resolution (set by caller)."""
    B, L, C = x.shape
    shortcut = x
    x = _layer_norm(p["layernorm_before"], x, eps)
    x = x.reshape(B, H, W, C)
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    windows = window_partition(x, ws).reshape(-1, ws * ws, C)
    mask = _shift_attn_mask(H, W, ws, shift)
    mask = jnp.asarray(mask) if mask is not None else None
    attn = swin_attention(p["attention"], windows, num_heads, ws, mask)
    x = window_reverse(attn.reshape(-1, ws, ws, C), ws, H, W)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = shortcut + x.reshape(B, H * W, C)

    h = _layer_norm(p["layernorm_after"], x, eps)
    h = jax.nn.gelu(_linear(p["intermediate"], h), approximate=False)
    return x + _linear(p["output"], h)


def patch_merging(p: Params, x: jnp.ndarray, H: int, W: int, eps: float) -> jnp.ndarray:
    B, L, C = x.shape
    x = x.reshape(B, H, W, C)
    x = jnp.concatenate(
        [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
        axis=-1,
    ).reshape(B, -1, 4 * C)
    x = _layer_norm(p["norm"], x, eps)
    return x @ p["reduction_w"]


def aff_block(p: Params, hidden: jnp.ndarray, residual: jnp.ndarray) -> jnp.ndarray:
    """Attentional feature fusion (ClapAudioAFFBlock). NCHW inputs."""

    def branch(bp, x, global_pool):
        if global_pool:
            x = x.mean(axis=(2, 3), keepdims=True)
        x = _conv2d(bp["conv1"], x, (1, 1))
        x = _batch_norm(bp["bn1"], x)
        x = jax.nn.relu(x)
        x = _conv2d(bp["conv2"], x, (1, 1))
        return _batch_norm(bp["bn2"], x)

    s = hidden + residual
    fused = branch(p["local_att"], s, False) + branch(p["global_att"], s, True)
    gate = jax.nn.sigmoid(fused)
    return 2 * hidden * gate + 2 * residual * (1 - gate)


# ------------------------------------------------------------------ forward

def reshape_mel2img(x: jnp.ndarray, arch: ClapAudioArch) -> jnp.ndarray:
    """(B, C, T, F) normalized mel -> (B, C, 256, 256) HTSAT image."""
    B, C, T, F = x.shape
    spec_width = arch.spec_size * arch.freq_ratio  # 1024
    spec_height = arch.spec_size // arch.freq_ratio  # 64
    if T > spec_width or F > spec_height:
        raise ValueError("wav size should be <= the swin input size")
    if T < spec_width:
        M = jnp.asarray(_bicubic_matrix_align_corners(T, spec_width))
        x = jnp.einsum("bctf,st->bcsf", x, M)
    if F < spec_height:
        M = jnp.asarray(_bicubic_matrix_align_corners(F, spec_height))
        x = jnp.einsum("bctf,sf->bcts", x, M)
    B, C, T, F = x.shape
    x = x.reshape(B, C * arch.freq_ratio, T // arch.freq_ratio, F)
    x = x.transpose(0, 1, 3, 2)
    return x.reshape(B, C, F * arch.freq_ratio, T // arch.freq_ratio)


def patch_embed(p: Params, x: jnp.ndarray, is_longer: jnp.ndarray,
                arch: ClapAudioArch) -> jnp.ndarray:
    """(B, 4, 256, 256) -> (B, 64*64, 96)."""
    global_x = x[:, 0:1]
    out = _conv2d(p["proj"], global_x, (arch.patch_stride, arch.patch_stride))
    if arch.enable_fusion:
        # local path on the 3 crop channels; applied where is_longer, branch-
        # free via where (short items keep the global embedding)
        B = x.shape[0]
        local = x[:, 1:4].reshape(B * 3, 1, x.shape[2], x.shape[3])
        local = _conv2d(
            p["mel_conv2d"], local, (arch.patch_stride, arch.patch_stride * 3)
        )
        _, feat, h, w = local.shape
        local = local.reshape(B, 3, feat, h, w)
        local = local.transpose(0, 2, 3, 1, 4).reshape(B, feat, h, 3 * w)
        local = jnp.pad(local, ((0, 0), (0, 0), (0, 0), (0, out.shape[-1] - local.shape[-1])))
        fused = aff_block(p["fusion_model"], out, local)
        out = jnp.where(is_longer.reshape(-1, 1, 1, 1), fused, out)
    B, C, H, W = out.shape
    out = out.reshape(B, C, H * W).transpose(0, 2, 1)
    return _layer_norm(p["norm"], out, arch.layer_norm_eps)


def audio_encoder_forward(
    params: Params, input_features: jnp.ndarray, is_longer: jnp.ndarray,
    arch: ClapAudioArch = ClapAudioArch(),
) -> jnp.ndarray:
    """(B, 4, T, 64) fused log-mel + (B,) bool -> (B, 768) pooled output."""
    eps = arch.layer_norm_eps
    x = input_features.transpose(0, 3, 2, 1)  # mel bins to channel axis
    x = _batch_norm(params["batch_norm"], x)
    x = x.transpose(0, 3, 2, 1)
    x = reshape_mel2img(x, arch)
    frames_num = x.shape[2]

    h = patch_embed(params["patch_embed"], x, is_longer, arch)
    H = W = arch.grid_size
    for si, stage in enumerate(params["stages"]):
        num_heads = arch.num_heads[si]
        for li, layer in enumerate(stage["blocks"]):
            ws = min(arch.window_size, H, W)
            shift = 0 if li % 2 == 0 else arch.window_size // 2
            if min(H, W) <= arch.window_size:
                shift = 0
            h = swin_layer(layer, h, H, W, num_heads, ws, shift, eps)
        if stage.get("downsample") is not None:
            h = patch_merging(stage["downsample"], h, H, W, eps)
            H, W = H // 2, W // 2

    h = _layer_norm(params["norm"], h, eps)  # (B, H*W, 768)
    B, _, C = h.shape
    freq_shape = frames_num // (2 ** (len(arch.depths) - 1)) // arch.patch_stride
    temporal_shape = freq_shape
    h = h.transpose(0, 2, 1).reshape(B, C, freq_shape, temporal_shape)
    c_freq_bin = freq_shape // arch.freq_ratio
    h = h.reshape(B, C, freq_shape // c_freq_bin, c_freq_bin, temporal_shape)
    h = h.transpose(0, 1, 3, 2, 4).reshape(B, C, c_freq_bin, -1)
    return h.reshape(B, C, -1).mean(axis=-1)  # (B, 768)


def audio_projection(p: Params, pooled: jnp.ndarray) -> jnp.ndarray:
    h = jax.nn.relu(_linear(p["linear1"], pooled))
    return _linear(p["linear2"], h)


@functools.partial(jax.jit, static_argnames=("arch",))
def get_audio_features(
    params: Params,
    input_features: jnp.ndarray,
    is_longer: jnp.ndarray,
    arch: ClapAudioArch = ClapAudioArch(),
) -> jnp.ndarray:
    """L2-normalized (B, 512) audio embeddings (ClapModel.get_audio_features)."""
    pooled = audio_encoder_forward(params["audio_model"], input_features, is_longer, arch)
    feats = audio_projection(params["audio_projection"], pooled)
    return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)


# ------------------------------------------------------------ weight import

def _t_lin(sd, prefix):
    return {
        "w": jnp.asarray(np.ascontiguousarray(sd[f"{prefix}.weight"].T)),
        "b": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def _t_ln(sd, prefix):
    return {"scale": jnp.asarray(sd[f"{prefix}.weight"]), "bias": jnp.asarray(sd[f"{prefix}.bias"])}


def _t_conv(sd, prefix):
    return {"w": jnp.asarray(sd[f"{prefix}.weight"]), "b": jnp.asarray(sd[f"{prefix}.bias"])}


def _t_bn(sd, prefix):
    return {
        "scale": jnp.asarray(sd[f"{prefix}.weight"]),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
        "mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
        "var": jnp.asarray(sd[f"{prefix}.running_var"]),
    }


def audio_params_from_torch_state_dict(
    sd, arch: ClapAudioArch = ClapAudioArch(), prefix: str = "audio_model.audio_encoder"
) -> Params:
    """HF ClapModel state dict (numpy values) -> audio tower params tree.

    Accepts the full `ClapModel` naming (`audio_model.audio_encoder.*` +
    `audio_projection.*`).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def stage_params(si: int, depth: int, last: bool) -> Params:
        sp = f"{prefix}.layers.{si}"
        blocks = []
        for li in range(depth):
            bp = f"{sp}.blocks.{li}"
            blocks.append(
                {
                    "layernorm_before": _t_ln(sd, f"{bp}.layernorm_before"),
                    "layernorm_after": _t_ln(sd, f"{bp}.layernorm_after"),
                    "attention": {
                        "query": _t_lin(sd, f"{bp}.attention.self.query"),
                        "key": _t_lin(sd, f"{bp}.attention.self.key"),
                        "value": _t_lin(sd, f"{bp}.attention.self.value"),
                        "output": _t_lin(sd, f"{bp}.attention.output.dense"),
                        "relative_position_bias_table": jnp.asarray(
                            sd[f"{bp}.attention.self.relative_position_bias_table"]
                        ),
                    },
                    "intermediate": _t_lin(sd, f"{bp}.intermediate.dense"),
                    "output": _t_lin(sd, f"{bp}.output.dense"),
                }
            )
        stage: Params = {"blocks": blocks, "downsample": None}
        if not last:
            stage["downsample"] = {
                "norm": _t_ln(sd, f"{sp}.downsample.norm"),
                "reduction_w": jnp.asarray(
                    np.ascontiguousarray(sd[f"{sp}.downsample.reduction.weight"].T)
                ),
            }
        return stage

    pe = f"{prefix}.patch_embed"
    patch: Params = {
        "proj": _t_conv(sd, f"{pe}.proj"),
        "norm": _t_ln(sd, f"{pe}.norm"),
    }
    if arch.enable_fusion:
        patch["mel_conv2d"] = _t_conv(sd, f"{pe}.mel_conv2d")
        fm = f"{pe}.fusion_model"

        def aff_branch(bp, seq_offsets):
            c1, b1, c2, b2 = seq_offsets
            return {
                "conv1": _t_conv(sd, f"{bp}.{c1}"),
                "bn1": _t_bn(sd, f"{bp}.{b1}"),
                "conv2": _t_conv(sd, f"{bp}.{c2}"),
                "bn2": _t_bn(sd, f"{bp}.{b2}"),
            }

        patch["fusion_model"] = {
            # nn.Sequential indices: local [0,1,3,4]; global has AdaptiveAvgPool
            # at 0 so convs/bns sit at [1,2,4,5]
            "local_att": aff_branch(f"{fm}.local_att", (0, 1, 3, 4)),
            "global_att": aff_branch(f"{fm}.global_att", (1, 2, 4, 5)),
        }

    audio_model: Params = {
        "batch_norm": _t_bn(sd, f"{prefix}.batch_norm"),
        "patch_embed": patch,
        "stages": [
            stage_params(si, d, si == len(arch.depths) - 1)
            for si, d in enumerate(arch.depths)
        ],
        "norm": _t_ln(sd, f"{prefix}.norm"),
    }
    params: Params = {"audio_model": audio_model}
    if "audio_projection.linear1.weight" in sd:
        params["audio_projection"] = {
            "linear1": _t_lin(sd, "audio_projection.linear1"),
            "linear2": _t_lin(sd, "audio_projection.linear2"),
        }
    return params
