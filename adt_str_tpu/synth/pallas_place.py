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
    slot_ref,  # (B, MAX_NOTES) i32 flat blend-row ids (b*N_SLOTS + slot)
    q_ref,  # (B, MAX_NOTES) i32 row offsets (onset // 128)
    r_ref,  # (B, MAX_NOTES) i32 lane shifts (onset % 128)
    gain_ref,  # (B, MAX_NOTES) f32 SMEM
    *refs,  # note_tile x (1, R, 128) VMEM blend blocks, then out_ref
    note_tile: int,
    rows: int,
):
    # All VMEM *reads* are static: each note's blend row arrives as its own
    # gathered input block (index_map reads the slot id from scalar-prefetch
    # SMEM — the same pattern as `gather_blend`; the round-2 one-hot-matmul
    # pre-gather materialized a (B, MAX_NOTES, R, 128) stream through HBM).
    # Dynamic-offset VMEM reads measured ~2 ms/note in Mosaic; the
    # dynamic-offset *accumulation* into out_ref is cheap. The note loop is
    # fully unrolled — unrolled vector blocks pipeline at <1 us/note, while a
    # `lax.fori_loop` iteration costs ~0.5 ms of loop overhead.
    note_refs, out_ref = refs[:note_tile], refs[note_tile]
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
            x = note_refs[i][0].astype(jnp.float32)  # (rows, 128)
            a = pltpu.roll(x, r, 1)  # lane rotate
            c = pltpu.roll(a, 1, 0)  # row carry for wrapped lanes
            contrib = jnp.where(lane >= r, a, c) * g
            out_ref[0, pl.ds(q, rows), :] = out_ref[0, pl.ds(q, rows), :] + contrib


def _gather_blend_kernel(im_ref, is_ref, lam_ref, *refs, req_tile: int):
    main_refs = refs[:req_tile]
    sub_refs = refs[req_tile : 2 * req_tile]
    out_ref = refs[2 * req_tile]
    i = pl.program_id(0)
    for k in range(req_tile):
        lam = lam_ref[i * req_tile + k]
        m = main_refs[k][0].astype(jnp.float32)
        s = sub_refs[k][0].astype(jnp.float32)
        out_ref[k] = ((1.0 - lam) * m + lam * s).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "req_tile"))
def gather_blend(
    table: jnp.ndarray,  # (n_rows, L) bank, L % 128 == 0
    idx_main: jnp.ndarray,  # (N,) i32 row ids
    idx_sub: jnp.ndarray,  # (N,) i32 row ids
    lam: jnp.ndarray,  # (N,) f32 mixup weights
    interpret: bool = False,
    req_tile: int = 8,
) -> jnp.ndarray:
    """-> (N, L) mixup blends (1-lam)*table[main] + lam*table[sub].

    XLA lowers the (B, N_SLOTS) row gather of the one-shot bank to a
    row-at-a-time loop (measured 4.3 ms of the flagship render for ~200 MB
    of traffic). Here the gather is the canonical Pallas index_map-from-
    scalar-prefetch pattern: each grid step DMAs exactly the rows it needs
    straight out of HBM and writes the blends once.

    `req_tile` requests ride per grid step as separate operands so their row
    DMAs issue together. Measured on v5e (2026-08-18, 1728 draws x 2 rows of
    61 KB): the gather is PER-DMA-OVERHEAD-bound, not bandwidth-bound — and
    the overhead is address-translation state, not issue latency. Evidence:
    (a) a 30k-row (1.8 GiB) bank costs ~7 ms where the moved bytes justify
    ~0.3 ms, while a 192-row (12 MiB) bank costs ~1.3 ms for identical DMA
    counts; (b) sorting the row ids changes nothing on either; (c) manually
    issuing 8-32 concurrent `make_async_copy`s from an ANY-space table and
    waiting them together reproduces the index_map times exactly. A fixed
    ~2 us/DMA (large bank) vs ~0.4 us/DMA (small bank) serialized cost fits
    all measurements — consistent with per-DMA page translation that hits a
    warm cache only when the working set is small. Request tiling therefore
    wins only its grid-overhead share: 7.34 -> 7.05 ms at 30k rows,
    1.57 -> 1.39 ms at toy scale (kept; every other variant measured equal
    or worse). At production bank scale the render cost is dominated by
    this translation overhead; it is a property of the DMA path, not of the
    kernel formulation."""
    n_rows, L = table.shape
    assert L % LANE == 0
    rows = L // LANE
    t3 = table.reshape(n_rows, rows, LANE)
    n = idx_main.shape[0]
    req_tile = max(1, min(req_tile, n))
    pad = (-n) % req_tile
    if pad:
        idx_main = jnp.pad(idx_main, (0, pad))
        idx_sub = jnp.pad(idx_sub, (0, pad))
        lam = jnp.pad(lam, (0, pad))
    n_pad = n + pad

    def _req_index_map(which, k):
        def index_map(i, im, isub, lam):
            ids = im if which == 0 else isub
            return (ids[i * req_tile + k], 0, 0)

        return index_map

    out = pl.pallas_call(
        functools.partial(_gather_blend_kernel, req_tile=req_tile),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_pad // req_tile,),
            in_specs=[
                pl.BlockSpec(
                    (1, rows, LANE), _req_index_map(0, k), memory_space=pltpu.VMEM
                )
                for k in range(req_tile)
            ]
            + [
                pl.BlockSpec(
                    (1, rows, LANE), _req_index_map(1, k), memory_space=pltpu.VMEM
                )
                for k in range(req_tile)
            ],
            out_specs=pl.BlockSpec(
                (req_tile, rows, LANE),
                lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, rows, LANE), table.dtype),
        interpret=interpret,
    )(
        idx_main.astype(jnp.int32),
        idx_sub.astype(jnp.int32),
        lam.astype(jnp.float32),
        *([t3] * (2 * req_tile)),
    )
    return out[:n].reshape(n, L)


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
    # (B*n_slots, rows, LANE) flat blend rows; each note's row is DMA'd
    # straight into its own kernel input block by an index_map that reads the
    # flat row id from scalar-prefetch SMEM (the gather_blend pattern). The
    # round-1/2 one-hot-matmul pre-gather materialized a (B, MAX_NOTES, rows,
    # 128) stream through HBM (~190 MB write + read at flagship shapes) and
    # needed an optimization barrier; the historical notes stand: an XLA
    # advanced-indexing gather of that tensor measured ~8 s, the 4-D einsum
    # form paid a ~1.6 ms relayout.
    blend_flat = jnp.pad(
        blend.reshape(B * n_slots, L // LANE, LANE),
        ((0, 0), (0, rows - L // LANE), (0, 0)),
    ).astype(stream_dtype)
    slot_flat = (
        jnp.arange(B, dtype=jnp.int32)[:, None] * n_slots + slot.astype(jnp.int32)
    )

    q = (onset.astype(jnp.int32) // LANE).astype(jnp.int32)
    r = (onset.astype(jnp.int32) % LANE).astype(jnp.int32)

    def _note_index_map(k):
        def index_map(b, t, s_ref, q_ref, r_ref, g_ref):
            return (s_ref[b, t * note_tile + k], 0, 0)

        return index_map

    out = pl.pallas_call(
        functools.partial(_kernel, note_tile=note_tile, rows=rows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B, max_notes // note_tile),
            in_specs=[
                pl.BlockSpec(
                    (1, rows, LANE), _note_index_map(k), memory_space=pltpu.VMEM
                )
                for k in range(note_tile)
            ],
            out_specs=pl.BlockSpec(
                (1, pr, LANE), lambda b, t, *_: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, pr, LANE), jnp.float32),
        interpret=interpret,
    )(
        slot_flat,
        q,
        r,
        gain.astype(jnp.float32),
        *([blend_flat] * note_tile),
    )
    return out.reshape(B, pr * LANE)[:, :chunk_samples]
