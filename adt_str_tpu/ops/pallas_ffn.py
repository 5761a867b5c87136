"""Fused FFN + dropout forward Pallas kernel (training hot path).

The transformer FFN (`ffn_forward` + the post-FFN residual dropout,
reference `model.py:100-190` torch TransformerEncoderLayer semantics:
``dropout2(linear2(dropout(gelu(linear1(x)))))``) materializes the
(B*T, 4*d_model) hidden several times per step on the XLA path because
XLA:TPU dot operands must live in HBM and the dropout custom-VJP boundary
forces its input and output to materialize as well.

Forward: one row-tile Pallas grid; computes ``pre = x @ W1 + b1`` (saved to
HBM in bf16 as the only large residual), gelu, the hidden keep-mask, the
second matmul, and the output keep-mask — the (R, d_ff) hidden never leaves
VMEM. Measured on v5e-1 at flagship shapes (N=16384, d=768): 2.09 ms vs
2.37 ms for the XLA forward.

Backward: plain XLA ops recomputing gelu and both masks from the saved bf16
``pre``. A fully-fused Pallas backward was built and measured SLOWER (7.4 ms
vs XLA's 1.3 ms at flagship shapes): the four backward dots are
MXU-compute-bound, XLA already runs them near roofline, and the per-f-block
dW accumulator windows force row tiles too small for MXU efficiency inside
the 16 MiB scoped-VMEM budget. Recompute-from-pre in XLA pays only cheap
elementwise fusions on top of the same four dots.

Masks are BIT-IDENTICAL to the XLA path's `transformer._hash_mask` (same
flat C-order index over the unpadded (N, d_ff)/(N, d) tensors, same
constants, same two-word seed), so the fused path trains with exactly the
same dropout stream as the reference-parity XLA path.

MEASURED NET RESULT (why `use_pallas_ffn` defaults to False): fwd+bwd at
flagship shapes is 4.59 ms fused vs 3.72 ms XLA — the 0.28 ms the fused
forward saves is outweighed by the backward's transcendental recompute
(erf+exp over the (N, d_ff) hidden costs ~1.2 ms of VPU time that the XLA
path avoids by reading its saved dropout output). The FFN at d_model=768 is
MXU/VPU-compute-bound, not HBM-bound; there is no bandwidth to win back.
The kernel is kept as a tested option for bandwidth-bound regimes (larger
d_model, lower arithmetic intensity per byte).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# the mask hash MUST match transformer._hash_mask bit-for-bit; import the
# constants rather than redefining them (transformer does not import this
# module at top level, so there is no cycle)
from adt_str_tpu.models.transformer import _HASH_GOLDEN, _HASH_M1, _hash_mask

_ROW_TILE = 128  # forward row tile

_SQRT_2 = math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _thresh(keep: float) -> jnp.ndarray:
    return jnp.uint32(min(int(keep * 2**32), 2**32 - 1))


def _keep_mask(row0, col0, n_rows, n_cols, row_stride, s0, s1, thresh):
    """Counter-hash keep mask for the (n_rows, n_cols) tile whose global
    top-left element is (row0, col0) of a row-major array with `row_stride`
    columns. Matches transformer._hash_mask on the full array."""
    rows = row0 + jax.lax.broadcasted_iota(jnp.uint32, (n_rows, n_cols), 0)
    cols = col0 + jax.lax.broadcasted_iota(jnp.uint32, (n_rows, n_cols), 1)
    idx = rows * jnp.uint32(row_stride) + cols
    h = idx * _HASH_GOLDEN + s0
    h = h ^ (h >> 16)
    h = h * _HASH_M1
    h = h ^ s1
    h = h ^ (h >> 15)
    return h < thresh


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7): Mosaic
    has no erf lowering; this stays well inside the kernel's bf16/f32
    tolerance vs the XLA path's exact erf."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_f32(p):
    return p * 0.5 * (1.0 + _erf(p / _SQRT_2))


def _fwd_kernel(
    seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, pre_ref,
    *, d_ff: int, d: int, keep_h: float, keep_o: float,
):
    r = pl.program_id(0)
    x = x_ref[...]  # (R, d) bf16
    pre = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    pre_b = pre.astype(pre_ref.dtype)
    pre_ref[...] = pre_b
    h = _gelu_f32(pre_b.astype(jnp.float32))
    R = x.shape[0]
    row0 = jnp.uint32(r * R)
    mh = _keep_mask(
        row0, jnp.uint32(0), R, d_ff, d_ff,
        seed_ref[0, 0], seed_ref[0, 1], _thresh(keep_h),
    )
    hd = jnp.where(mh, h * (1.0 / keep_h), 0.0).astype(x.dtype)
    out = jax.lax.dot_general(
        hd, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    mo = _keep_mask(
        row0, jnp.uint32(0), R, d, d,
        seed_ref[0, 2], seed_ref[0, 3], _thresh(keep_o),
    )
    out_ref[...] = jnp.where(mo, out * (1.0 / keep_o), 0.0).astype(out_ref.dtype)


def _pad_rows(a: jnp.ndarray, rows: int) -> jnp.ndarray:
    return a if a.shape[0] == rows else jnp.pad(a, ((0, rows - a.shape[0]), (0, 0)))


def _fwd_call(w1, b1, w2, b2, x2, seeds, keep_h, keep_o, interpret):
    n, d = x2.shape
    d_ff = w1.shape[1]
    np_rows = -(-n // _ROW_TILE) * _ROW_TILE
    xp = _pad_rows(x2, np_rows)
    grid = (np_rows // _ROW_TILE,)
    kernel = functools.partial(
        _fwd_kernel, d_ff=d_ff, d=d, keep_h=keep_h, keep_o=keep_o
    )
    cdt = x2.dtype
    out, pre = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda r: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((_ROW_TILE, d), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d_ff), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_ff), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_ff, d), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_ROW_TILE, d), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROW_TILE, d_ff), lambda r: (r, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((np_rows, d), cdt),
            jax.ShapeDtypeStruct((np_rows, d_ff), cdt),
        ),
        interpret=interpret,
    )(seeds, xp, w1.astype(cdt), b1.reshape(1, -1).astype(cdt),
      w2.astype(cdt), b2.reshape(1, -1).astype(cdt))
    return out[:n], pre, xp


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_ffn_dropout(w1, b1, w2, b2, x2, seeds_f, keep_h, keep_o, interpret=False):
    """``dropout_o(gelu(x2 @ w1 + b1).dropout_h @ w2 + b2)`` fused.

    x2: (N, d) in compute dtype; w/b: fp32 params; seeds_f: (1, 4) float32
    BITCAST of the uint32 [seed_h0, seed_h1, seed_o0, seed_o1] words (f32 so
    custom_vjp cotangents stay float; bitcast back inside). keep_*: static
    keep probabilities. Returns (N, d).
    """
    seeds = jax.lax.bitcast_convert_type(seeds_f, jnp.uint32)
    out, _, _ = _fwd_call(w1, b1, w2, b2, x2, seeds, keep_h, keep_o, interpret)
    return out


def _vjp_fwd(w1, b1, w2, b2, x2, seeds_f, keep_h, keep_o, interpret):
    seeds = jax.lax.bitcast_convert_type(seeds_f, jnp.uint32)
    out, pre, xp = _fwd_call(w1, b1, w2, b2, x2, seeds, keep_h, keep_o, interpret)
    return out, (w1, w2, xp, pre, seeds, x2.shape[0])


def _xla_mask(shape, s0, s1, keep: float) -> jnp.ndarray:
    """transformer._hash_mask over an unpadded (n, cols) array, from the two
    raw seed words (already _seed_from_key-scrambled). Delegates to the
    canonical implementation so the bit-critical hash lives in exactly two
    places: transformer._hash_mask (XLA) and _keep_mask (in-kernel, tiled
    offsets make delegation impossible there)."""
    return _hash_mask(shape, jnp.stack([s0, s1]), keep)


def _vjp_bwd(keep_h, keep_o, interpret, res, g):
    # XLA backward recomputing from the saved bf16 `pre` (see module
    # docstring: the four dots are MXU-bound and XLA runs them at roofline;
    # a Pallas backward measured 5.7x slower).
    w1, w2, xp, pre, seeds, n = res
    d = xp.shape[1]
    d_ff = w1.shape[1]
    cdt = xp.dtype
    x2 = xp[:n]
    pre32 = pre[:n].astype(jnp.float32)

    mo = _xla_mask((n, d), seeds[0, 2], seeds[0, 3], keep_o)
    g_out = jnp.where(mo, g.astype(jnp.float32) * (1.0 / keep_o), 0.0)
    g_out_b = g_out.astype(cdt)
    db2 = jnp.sum(g_out, axis=0)

    g_hd = jax.lax.dot_general(
        g_out_b, w2.astype(cdt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (n, d_ff)

    mh = _xla_mask((n, d_ff), seeds[0, 0], seeds[0, 1], keep_h)
    inv_kh = jnp.where(mh, 1.0 / keep_h, 0.0)
    # exact erf here (XLA lowers it); the kernel's A-S approximation is
    # within 1.5e-7 so fwd/bwd stay consistent to well under bf16 ulp
    phi = jnp.exp(-0.5 * pre32 * pre32) * _INV_SQRT_2PI
    cdf = 0.5 * (1.0 + jax.lax.erf(pre32 / _SQRT_2))
    g_pre = g_hd * inv_kh * (cdf + pre32 * phi)
    g_pre_b = g_pre.astype(cdt)
    hd_b = (pre32 * cdf * inv_kh).astype(cdt)
    db1 = jnp.sum(g_pre, axis=0)

    dw1 = jax.lax.dot_general(
        x2, g_pre_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw2 = jax.lax.dot_general(
        hd_b, g_out_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx = jax.lax.dot_general(
        g_pre_b, w1.astype(cdt), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(g.dtype)
    dseeds = jnp.zeros((1, 4), jnp.float32)
    return dw1, db1, dw2, db2, dx, dseeds


fused_ffn_dropout.defvjp(_vjp_fwd, _vjp_bwd)
