"""Pallas one-shot placement kernel: per-note scaled copies at sample offsets.

The core of drum rendering is "add 128 scaled one-shot copies at arbitrary
sample offsets into a 2.56 s buffer". Every XLA formulation measured poorly on
TPU: a fori_loop of dynamic-update-slices costs ~0.7 ms/iteration in loop
overhead (~90 ms/step), lane-axis `take_along_axis` gathers are pathological
in Mosaic, and frequency-domain convolution pays TPU's weak FFT throughput
(~110 ms/step; some sizes are outright UNIMPLEMENTED on this backend).

The kernel decomposes each onset as `q*128 + r`: the blend row (padded with a
128-zero tail) is rotated right by `r` with the hardware `dynamic_rotate`
(`pltpu.roll` — the tail zeros wrap to the front, so rotation == shift), then
accumulated at the lane-aligned offset `q` with a provably 128-aligned dynamic
slice. All note metadata (slot, q, r) rides in scalar-prefetch SMEM; the 27
per-instrument blend rows stay resident in VMEM for the whole segment.

Grid: (batch,). Everything else (timbre sampling, mixup blending, FX, master
gain) stays in XLA around this kernel (`synth/render.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(
    slot_ref,  # (B, MAX_NOTES) i32  scalar prefetch
    q_ref,  # (B, MAX_NOTES) i32  aligned offsets (multiples of 128)
    r_ref,  # (B, MAX_NOTES) i32  sub-lane shifts [0, 128)
    gain_ref,  # (B, 1, MAX_NOTES) f32 VMEM
    blend_ref,  # (1, N_SLOTS, L2) f32 VMEM
    out_ref,  # (1, 1, P2) f32 VMEM
    *,
    max_notes: int,
    l2: int,
):
    b = pl.program_id(0)
    out_ref[...] = jnp.zeros_like(out_ref)
    for n in range(max_notes):
        slot = slot_ref[b, n]
        q = pl.multiple_of(q_ref[b, n], LANE)
        r = r_ref[b, n]
        g = gain_ref[0, 0, n]
        row = blend_ref[0, pl.ds(slot, 1), :]  # (1, L2)
        rolled = pltpu.roll(row, r, 1)

        @pl.when(g != 0.0)
        def _():
            out_ref[0, :, pl.ds(q, l2)] = out_ref[0, :, pl.ds(q, l2)] + rolled * g


@functools.partial(jax.jit, static_argnames=("chunk_samples", "interpret"))
def place_notes(
    blend: jnp.ndarray,  # (B, N_SLOTS, L2) f32, L2 = L + 128 zero tail, L2 % 128 == 0
    slot: jnp.ndarray,  # (B, MAX_NOTES) i32 in [0, N_SLOTS)
    onset: jnp.ndarray,  # (B, MAX_NOTES) i32 sample offsets in [0, chunk)
    gain: jnp.ndarray,  # (B, MAX_NOTES) f32, 0 for masked notes
    chunk_samples: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """-> (B, chunk_samples) rendered audio (overruns clipped)."""
    B, n_slots, l2 = blend.shape
    assert l2 % LANE == 0, "blend rows must be padded to a multiple of 128"
    max_notes = slot.shape[1]
    p2 = _round_up(chunk_samples, LANE) + l2

    q = (onset // LANE) * LANE
    r = onset % LANE

    out = pl.pallas_call(
        functools.partial(_kernel, max_notes=max_notes, l2=l2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, max_notes), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, n_slots, l2), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, p2), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, p2), jnp.float32),
        interpret=interpret,
    )(
        slot.astype(jnp.int32),
        q.astype(jnp.int32),
        r.astype(jnp.int32),
        gain[:, None, :].astype(jnp.float32),
        blend.astype(jnp.float32),
    )
    return out[:, 0, :chunk_samples]
