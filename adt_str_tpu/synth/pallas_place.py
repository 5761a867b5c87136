"""Pallas one-shot placement kernel: per-note scaled copies at sample offsets.

The core of drum rendering is "add ~128 scaled one-shot copies at arbitrary
sample offsets into a 2.56 s buffer". Every XLA formulation measured poorly on
TPU: a fori_loop of dynamic-update-slices costs ~0.7 ms/iteration in loop
overhead (~90 ms/step), lane-axis `take_along_axis` gathers are pathological
in Mosaic, and frequency-domain convolution pays TPU's weak FFT throughput
(~110 ms/step; some sizes are outright UNIMPLEMENTED on this backend).

Layout is the whole game: audio lives as (rows, 128) tiles — full (8, 128)
vregs — not as 1-sublane vectors (a (1, L) layout measured ~0.5 ms *per
note*; this layout executes >1000 note-ops inside one kernel's fixed
overhead). A flat shift by `onset = q*128 + r` decomposes into
- a hardware lane rotate by `r` (`pltpu.roll(axis=1)`),
- a sublane rotate by one row for the wrapped lanes (`pltpu.roll(axis=0)`),
  selected where `lane < r` (the one-shot's zero tail rows make the wrap
  carry-in correct),
- a sublane-aligned dynamic-slice accumulation at row `q` into the output.

Note metadata (slot, q, r) rides in scalar-prefetch SMEM; the 27
per-instrument blend rows stay VMEM-resident for the whole segment. Grid:
(batch,). Everything else (timbre sampling, mixup blending, FX, master gain)
stays in XLA around this kernel (`synth/render.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
ROW_PAD = 8  # zero rows appended after the one-shot (>= 1 for the wrap carry)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(
    q_ref,  # (B, MAX_NOTES) i32 row offsets (onset // 128)
    r_ref,  # (B, MAX_NOTES) i32 lane shifts (onset % 128)
    gain_ref,  # (B, MAX_NOTES) f32 SMEM
    bnotes_ref,  # (1, NOTE_TILE, R, 128) f32 VMEM — this tile's blend rows
    out_ref,  # (1, PR, 128) f32 VMEM, revisited across note tiles
    *,
    note_tile: int,
    rows: int,
):
    # All VMEM *reads* are static: per-note blend rows are pre-gathered in XLA
    # (leading-axis row gather = clean DMA) and streamed tile-by-tile through
    # the grid. Dynamic-offset VMEM reads measured ~2 ms/note in Mosaic; the
    # dynamic-offset *accumulation* into out_ref is cheap. The note loop is
    # fully unrolled — unrolled vector blocks pipeline at <1 us/note, while a
    # `lax.fori_loop` iteration costs ~0.5 ms of loop overhead.
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
    for i in range(note_tile):
        n = t * note_tile + i
        q = q_ref[b, n]
        r = r_ref[b, n]
        g = gain_ref[b, n]

        @pl.when(g != 0.0)
        def _():
            # stream dtype may be bf16 (halves the dominant HBM traffic);
            # rotation happens in the stream dtype, accumulation in f32
            x = bnotes_ref[0, i].astype(jnp.float32)  # (rows, 128), static index
            a = pltpu.roll(x, r, 1)  # lane rotate
            c = pltpu.roll(a, 1, 0)  # row carry for wrapped lanes
            contrib = jnp.where(lane >= r, a, c) * g
            out_ref[0, pl.ds(q, rows), :] = out_ref[0, pl.ds(q, rows), :] + contrib


@functools.partial(
    jax.jit, static_argnames=("chunk_samples", "interpret", "stream_dtype")
)
def place_notes(
    blend: jnp.ndarray,  # (B, N_SLOTS, L), L % 128 == 0
    slot: jnp.ndarray,  # (B, MAX_NOTES) i32 in [0, N_SLOTS)
    onset: jnp.ndarray,  # (B, MAX_NOTES) i32 sample offsets in [0, chunk)
    gain: jnp.ndarray,  # (B, MAX_NOTES) f32, 0 for masked notes
    chunk_samples: int,
    interpret: bool = False,
    stream_dtype=jnp.float32,
) -> jnp.ndarray:
    """-> (B, chunk_samples) rendered audio (overruns clipped).

    `stream_dtype=bfloat16` halves the dominant cost — the (B, MAX_NOTES,
    rows, 128) per-note stream through HBM (~400 MB at the flagship shapes
    in f32) — while the in-kernel accumulation stays f32. bf16 quantization
    (~8 mantissa bits) sits ~-45 dB below each one-shot's peak: inaudible
    for randomized training augmentation audio (the reference renders fresh
    random mixes every step anyway; this is not a playback path).
    """
    B, n_slots, L = blend.shape
    assert L % LANE == 0, "one-shot rows must be padded to a multiple of 128"
    assert chunk_samples % LANE == 0
    max_notes = slot.shape[1]
    row_mult = 16 if stream_dtype == jnp.bfloat16 else 8  # Mosaic packed tiling
    rows = _round_up(L // LANE + ROW_PAD, row_mult)
    pr = chunk_samples // LANE + rows

    note_tile = 8
    pad_n = (-max_notes) % note_tile
    if pad_n:
        slot = jnp.pad(slot, ((0, 0), (0, pad_n)))
        onset = jnp.pad(onset, ((0, 0), (0, pad_n)))
        gain = jnp.pad(gain, ((0, 0), (0, pad_n)))
        max_notes += pad_n
    blend4 = jnp.pad(
        blend.reshape(B, n_slots, L // LANE, LANE),
        ((0, 0), (0, 0), (0, rows - L // LANE), (0, 0)),
    )
    # per-note blend rows via a one-hot MXU matmul — an XLA advanced-indexing
    # gather of the same (B, N, rows, 128) result measured ~8 s (!) on TPU,
    # the 27-way contraction runs in a few ms
    onehot = jax.nn.one_hot(slot.astype(jnp.int32), n_slots, dtype=blend4.dtype)
    # contract with (rows, lane) flattened: with the 4-D "bns,bsrl->bnrl" form
    # XLA assigns the dot output a {3,1,2,0} layout and inserts a ~1.6 ms
    # relayout copy before the kernel; the flattened form gets the default
    # layout and the reshape back to 4-D is free metadata
    bnotes = jnp.einsum(
        "bns,bsm->bnm",
        onehot,
        blend4.reshape(B, n_slots, rows * LANE),
        preferred_element_type=jnp.float32,
    ).astype(stream_dtype).reshape(B, max_notes, rows, LANE)
    # materialize bnotes before the kernel: without the barrier XLA schedules
    # the dot worse (measured ~0.7 ms/step slower) and in the 4-D-einsum era
    # fused it into the pallas block fetches outright (6 s instead of ~10 ms)
    bnotes = jax.lax.optimization_barrier(bnotes)

    q = (onset.astype(jnp.int32) // LANE).astype(jnp.int32)
    r = (onset.astype(jnp.int32) % LANE).astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(_kernel, note_tile=note_tile, rows=rows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, max_notes // note_tile),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, note_tile, rows, LANE),
                    lambda b, t, *_: (b, t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, pr, LANE), lambda b, t, *_: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, pr, LANE), jnp.float32),
        interpret=interpret,
    )(
        q,
        r,
        gain.astype(jnp.float32),
        bnotes,
    )
    return out.reshape(B, pr * LANE)[:, :chunk_samples]
