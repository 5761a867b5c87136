"""On-device drum synthesis: note lists -> audio, fully inside XLA.

Behavioral parity with `SynthDrum.__call__` (`modules/synthetiser.py:255-292`)
redesigned for TPU static shapes:

- per-*instrument* (not per-note) main/sub timbre pair, cached for the segment
  (`synthetiser.py:275-281`): one timbre-pair draw per possible pitch per
  segment, gathered per note;
- mixup blend `(1-l)*main + l*sub` (`synthetiser.py:217-223`), blend
  peak-normalized then scaled by the exponential velocity->gain curve
  `_vel_to_vol` (base 6, min 0.1, `synthetiser.py:204-212`);
- per-instrument class gains (HH/cymbals/aux at 0.7, `VolumeMixer`,
  `synthetiser.py:104-113`) folded into the per-note gain (the reference sums
  per-instrument track buffers; since tracks are only ever scaled and summed,
  a flat weighted placement is algebraically identical);
- optional randomized FX chain with probability `use_fx_prob`
  (`synthetiser.py:154`), then peak-normalize times the master gain
  `_vel_to_vol(max velocity)` (`synthetiser.py:156,292`);
- one-shots that overrun the segment end are clipped (`synthetiser.py:232-237`);
  the render length is `chunk + bank.max_len` then truncated — identical
  clipping with static shapes.

TPU-first rendering: notes are grouped into the 27 static drum-pitch slots
(35..61); each segment scatters only per-note *gains* into per-slot impulse
trains (a few thousand scalars), and the audio is the frequency-domain
convolution `irfft(sum_p rfft(impulse_p) * rfft(blend_p))` — batched FFTs on
dense aligned arrays instead of per-note scatter loops or lane-unaligned
gathers, which are pathological on TPU (a 128-step dynamic-update-slice loop
measured ~0.7 ms/iteration plus minutes of compile).

Documented divergence from the reference: the mixup coefficient `l` is drawn
per (segment, instrument) rather than per note (`synthetiser.py:217` draws per
note). Notes of an instrument already share their timbre pair within a
segment; sharing the blend coefficient as well keeps the same augmentation
distribution family while making the blend a per-slot (not per-note) tensor.

Everything is jittable and batch-level; `render_batch` fuses into the input
side of the training step (SURVEY.md §7).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from adt_str_tpu.config import SynthConfig
from adt_str_tpu.synth.bank import N_BINS, OneShotBank, n_allowed_bins
from adt_str_tpu.synth.fx import random_fx_chain
from adt_str_tpu.utils.mappings import (
    ADTOF_INVERSE_MAPPING,
    ADTOF_LABEL_MAPPING,
    ADTOF_LUT,
)

# valid synthesis pitch range (synthetiser.py:252-253)
PITCH_LO, PITCH_HI = 35, 61
N_SLOTS = PITCH_HI - PITCH_LO + 1  # 27 static instrument slots

# per-ADTOF-class mix gains (VolumeMixer.volume_per_instrument,
# synthetiser.py:104-113)
_CLASS_GAIN = {
    "BD": 1.0,
    "SD": 1.0,
    "TT": 1.0,
    "HH": 0.7,
    "CY + RD": 0.7,
    "Cowbell": 0.7,
    "Claves": 0.7,
    "Other": 1.0,
}


def class_gain_lut() -> np.ndarray:
    """(128,) per-pitch mix gain: pitch -> ADTOF class -> gain."""
    lut = np.ones(128, dtype=np.float32)
    for pitch in range(128):
        adtof = ADTOF_LUT[pitch]
        if adtof >= 0:
            lut[pitch] = _CLASS_GAIN[ADTOF_LABEL_MAPPING[int(adtof)]]
    return lut


def adtof_member_tables() -> tuple[np.ndarray, np.ndarray]:
    """(128, 8) member-pitch table + (128,) counts for the ADTOF inverse map
    (`random_choice_timbre` picks a random member pitch first,
    synthetiser.py:193-194). Identity (count 1) for non-ADTOF pitches."""
    table = np.tile(np.arange(128, dtype=np.int32)[:, None], (1, 8))
    counts = np.ones(128, dtype=np.int32)
    for cls, members in ADTOF_INVERSE_MAPPING.items():
        table[cls, : len(members)] = members
        counts[cls] = len(members)
    return table, counts


class SynthStatics(NamedTuple):
    """Device-resident constants for rendering (bank + lookup tables)."""

    waveforms: jnp.ndarray  # (N, L)
    bin_offset: jnp.ndarray  # (128, N_BINS)
    bin_count: jnp.ndarray  # (128, N_BINS)
    class_gain: jnp.ndarray  # (128,)
    member_table: jnp.ndarray  # (128, 8)
    member_count: jnp.ndarray  # (128,)
    # leading bins materialized by the (possibly bin-capped) bank load; a
    # render whose similarity_threshold needs more bins than were loaded
    # would silently sample empty bins (silence), so `render_batch` and the
    # step factories guard n_allowed <= loaded_bins. Plain int: concrete in
    # the eager/factory checks, an inert scalar leaf under jit.
    loaded_bins: int = N_BINS

    @classmethod
    def from_bank(
        cls, bank: OneShotBank, dtype=None, hbm_limit_gib: float = 12.0
    ) -> "SynthStatics":
        """On TPU the bank is held in bf16 by default: halves the gather
        traffic per step, and at production scale it is the only layout that
        fits — a 100k-one-shot bank at 1.28 s/24 kHz is ~6 GB in bf16 vs
        ~12 GB in f32 (v5e HBM is 16 GB). bf16 quantization sits ~-45 dB
        below each one-shot's peak — inaudible for training augmentation.
        CPU (test) runs keep f32.

        Capacity is EXPLICIT, not an implicit OOM: banks above
        `hbm_limit_gib` raise with the remediation list. The production
        answer for a 1M-curated-library bank is the bin cap
        (`load_bank_hdf5(n_allowed_bins=...)`): curation assigns each file
        to ONE percentage bin, and the render only ever samples the bins the
        similarity threshold allows, so a tau=0.9 run loads gold + 10% of
        the library and a 1M-file library lands at ~6 GB bf16. The math and
        the measured alternatives (int8, sharding) are in docs/DESIGN.md
        "Bank capacity"; the reference streams rows from HDF5 per note
        (synthetiser.py:163-201) and has no such limit — at the cost of the
        per-note host I/O this framework's on-device synthesis removes."""
        import jax as _jax

        if dtype is None:
            dtype = jnp.bfloat16 if _jax.default_backend() != "cpu" else jnp.float32
        gib = (
            bank.waveforms.shape[0]
            * bank.waveforms.shape[1]
            * jnp.dtype(dtype).itemsize
            / float(1 << 30)
        )
        if gib > hbm_limit_gib:
            raise ValueError(
                f"one-shot bank is {gib:.1f} GiB in {jnp.dtype(dtype).name} "
                f"({bank.waveforms.shape[0]} rows x {bank.waveforms.shape[1]} "
                f"samples) — over the {hbm_limit_gib:.1f} GiB device budget. "
                "Remediations, in order: load only the eligible similarity "
                "bins (load_bank_hdf5(..., n_allowed_bins=n_allowed_bins("
                "similarity_threshold)) — exact, the trainer does this "
                "automatically); raise similarity_threshold (fewer bins); "
                "lower max_oneshot_sec (shorter rows); or raise "
                "hbm_limit_gib if the device actually has the headroom."
            )
        table, counts = adtof_member_tables()
        return cls(
            waveforms=jnp.asarray(bank.waveforms, dtype=dtype),
            bin_offset=jnp.asarray(bank.bin_offset),
            bin_count=jnp.asarray(bank.bin_count),
            class_gain=jnp.asarray(class_gain_lut()),
            member_table=jnp.asarray(table),
            member_count=jnp.asarray(counts),
            loaded_bins=int(bank.loaded_bins),
        )


def check_bins_loaded(statics: SynthStatics, similarity_threshold: float) -> None:
    """Raise when a render's threshold needs more similarity bins than the
    bank load materialized (`load_bank_hdf5(n_allowed_bins=...)`) — sampling
    past the cap would silently draw empty bins (silence) where the full bank
    has one-shots. No-op under jit tracing (loaded_bins is a tracer there);
    the step factories run this eagerly before building the jitted step."""
    lb = statics.loaded_bins
    if not isinstance(lb, (int, np.integer)):
        return  # tracer under jit: the factory-level check already ran
    need = n_allowed_bins(similarity_threshold)
    if need > int(lb):
        raise ValueError(
            f"similarity_threshold={similarity_threshold} samples {need} "
            f"bins but the bank was loaded with only the leading {int(lb)} "
            "(load_bank_hdf5(n_allowed_bins=...)); reload the bank with "
            f"n_allowed_bins>={need} or raise the threshold"
        )


def vel_to_vol(velocity, min_volume=0.1, max_volume=1.0, base=6.0):
    """Exponential velocity->gain curve (`_vel_to_vol`, synthetiser.py:204-212)."""
    v = jnp.clip(velocity, 0.0, 127.0) / 127.0
    vol = min_volume + (max_volume - min_volume) * (base**v - 1.0) / (base - 1.0)
    return jnp.where(velocity == 0, 0.0, vol)


def _sample_timbre_rows(
    statics: SynthStatics, key: jax.Array, n_allowed: int, adtof: bool
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(N_SLOTS,) bank-row index per drum pitch slot + (N_SLOTS,) validity
    (False when the pitch has no eligible bank bin — the caller silences such
    slots). Sequence of choices mirrors `random_choice_timbre`
    (synthetiser.py:192-202): [ADTOF member pitch] -> eligible existing bin ->
    timbre within bin.

    Gather-free by construction: XLA:TPU lowers data-dependent gathers to
    element-at-a-time loops (~1 us each — the vmapped B x N_SLOTS x 2-draw
    stage measured ~2 ms/step of pure gather loops). The static pitch range
    makes the table reads contiguous slices, the ADTOF member redirect and
    the chosen-bin count/offset reads are one-hot multiply-sums carried out
    entirely in int32 on the VPU — exact for any table value by
    construction, with no dependence on how XLA lowers fp32 dots (the
    earlier fp32-matmul formulation was exact only under a true-fp32
    lowering; tools/precision_probe.py records that XLA's choice is
    shape-dependent). Draw order and index math are unchanged, so results
    are bit-identical to the gathered formulation."""
    k_member, k_bin, k_timbre = jax.random.split(key, 3)
    sl = slice(PITCH_LO, PITCH_HI + 1)

    # array maxval -> per-slot true bound (32-bit draw: residual modulo bias
    # ~bound/2^32, vs ~bound/1e6 for the reference's random.choice-equivalent)
    if adtof:
        m = jax.random.randint(
            k_member, (N_SLOTS,), 0, jnp.maximum(statics.member_count[sl], 1)
        )
        member = statics.member_table[sl]  # (N_SLOTS, 8) static slice
        pitches = jnp.sum(
            member * jax.nn.one_hot(m, member.shape[1], dtype=member.dtype), axis=1
        )
        # exact int32 one-hot table read, fused on the VPU: 0/1 int32 mask
        # times the int32 tables, reduced over the 128 pitch rows. Integer
        # multiply-add is exact for any representable table value, so row
        # offsets of arbitrarily large banks survive verbatim — unlike an
        # fp32 MXU contraction, whose exactness depends on XLA's
        # (shape-dependent) lowering choice (tools/precision_probe.py).
        ohi = (
            pitches[:, None] == jnp.arange(128, dtype=pitches.dtype)[None, :]
        ).astype(jnp.int32)  # (N_SLOTS, 128)
        tbl = jnp.concatenate(
            [statics.bin_count, statics.bin_offset], axis=1
        )  # (128, 2*N_BINS) int32
        sel_tbl = jnp.sum(ohi[:, :, None] * tbl[None, :, :], axis=1)
        counts = sel_tbl[:, :N_BINS]
        offsets = sel_tbl[:, N_BINS:]
    else:
        counts = statics.bin_count[sl]  # (N_SLOTS, N_BINS) static slices
        offsets = statics.bin_offset[sl]

    eligible = (jnp.arange(N_BINS)[None, :] < n_allowed) & (counts > 0)
    n_eligible = eligible.sum(axis=1)
    r = jax.random.randint(k_bin, (N_SLOTS,), 0, jnp.maximum(n_eligible, 1))
    cum = jnp.cumsum(eligible.astype(jnp.int32), axis=1)
    # exactly one True per row when n_eligible > 0: cum hits r+1 at the
    # (r+1)-th eligible bin only (all-False rows select cnt=off=0, the same
    # values the gathered form read from the zero-initialized tables)
    sel = ((cum == (r + 1)[:, None]) & eligible).astype(jnp.int32)
    cnt = jnp.sum(counts * sel, axis=1)
    off = jnp.sum(offsets * sel, axis=1)
    t = jax.random.randint(k_timbre, (N_SLOTS,), 0, jnp.maximum(cnt, 1))
    return off + t, n_eligible > 0


@partial(
    jax.jit,
    static_argnames=(
        "chunk_samples",
        "sample_rate",
        "mixup_range",
        "use_fx_prob",
        "use_reverb_prob",
        "use_compression_prob",
        "use_limiter_prob",
        "n_allowed",
        "adtof",
        "pallas",
    ),
)
def render_batch_arrays(
    statics: SynthStatics,
    notes: jnp.ndarray,  # (B, MAX_NOTES, 4) [onset, offset, pitch, velocity]
    mask: jnp.ndarray,  # (B, MAX_NOTES) bool
    keys: jax.Array,  # (B,) PRNG keys
    chunk_samples: int,
    sample_rate: int,
    mixup_range: float = 0.8,
    use_fx_prob: float = 0.3,
    use_reverb_prob: float = 0.5,
    use_compression_prob: float = 0.5,
    use_limiter_prob: float = 0.5,
    n_allowed: int = 3,
    adtof: bool = False,
    pallas: str = "auto",
) -> jnp.ndarray:
    """(B, chunk_samples) batched synthesis (see module docstring).

    `pallas` selects the placement/gather implementation: "auto" uses the
    Pallas kernels on TPU and the portable FFT path elsewhere (production
    behavior); "interpret" forces the Pallas TPU path through the Pallas
    interpreter so the production kernel INTEGRATION (gather_blend +
    place_notes wiring, peak-norm folding, slot silencing) is testable on
    the CPU suite; "xla" forces the portable path."""
    B, max_notes, _ = notes.shape
    L = statics.waveforms.shape[1]
    P = chunk_samples + L  # padded conv length; overruns land in the slack

    subkeys = jax.vmap(lambda k: jax.random.split(k, 5))(keys)  # (B, 5, 2)
    k_main, k_sub, k_mix, k_usefx, k_fx = (subkeys[:, i] for i in range(5))

    main_rows, main_valid = jax.vmap(
        lambda k: _sample_timbre_rows(statics, k, n_allowed, adtof)
    )(k_main)  # (B, N_SLOTS)
    sub_rows, sub_valid = jax.vmap(
        lambda k: _sample_timbre_rows(statics, k, n_allowed, adtof)
    )(k_sub)

    # per-(segment, slot) mixup blend, peak-normalized
    lam = jax.vmap(
        lambda k: jax.random.uniform(k, (N_SLOTS, 1), maxval=mixup_range)
    )(k_mix)
    if pallas not in ("auto", "interpret", "xla"):
        raise ValueError(f"pallas must be auto|interpret|xla, got {pallas!r}")
    interpret = pallas == "interpret"
    if interpret and (chunk_samples % 128 or L % 128):
        raise ValueError(
            "pallas='interpret' needs 128-aligned chunk_samples and one-shot "
            f"length (got chunk={chunk_samples}, L={L})"
        )
    on_tpu = interpret or (
        pallas == "auto"
        and jax.default_backend() != "cpu"
        and chunk_samples % 128 == 0
    )
    if on_tpu and L % 128 == 0:
        # fused Pallas gather+blend: XLA lowers the bank row gather to a
        # row-at-a-time loop (measured 4.3 ms of the flagship render); the
        # index_map-from-scalar-prefetch kernel streams each needed row
        # once at DMA speed (~0.5 ms), independent of bank size
        from adt_str_tpu.synth.pallas_place import gather_blend

        blend = gather_blend(
            statics.waveforms,
            main_rows.reshape(-1),
            sub_rows.reshape(-1),
            lam.reshape(-1),
            interpret=interpret,
        ).reshape(B, N_SLOTS, L)
    else:
        # blend in the bank's dtype (bf16 on TPU): the gathers and the single
        # blend materialization all move 2-byte rows — the f32 formulation
        # materialized ~200 MB tensors several times per step
        main = statics.waveforms[main_rows]  # (B, N_SLOTS, L)
        sub = statics.waveforms[sub_rows]
        lam_c = lam.astype(statics.waveforms.dtype)
        blend = (1 - lam_c) * main + lam_c * sub
    peak = jnp.maximum(
        jnp.max(jnp.abs(blend).astype(jnp.float32), axis=-1), 1e-8
    )  # (B, N_SLOTS)

    # per-note gains scattered into per-slot impulse trains at onset samples
    pitch = jnp.clip(notes[..., 2].astype(jnp.int32), 0, 127)
    velocity = notes[..., 3]
    onset_sample = jnp.clip(
        (notes[..., 0] * sample_rate).astype(jnp.int32), 0, chunk_samples - 1
    )
    slot = jnp.clip(pitch - PITCH_LO, 0, N_SLOTS - 1)
    gain = vel_to_vol(velocity) * statics.class_gain[pitch]
    gain = jnp.where(mask & (pitch >= PITCH_LO) & (pitch <= PITCH_HI), gain, 0.0)
    # a slot whose timbre draw found no eligible bank bin renders SILENT: the
    # zero-initialized offset table would otherwise gather row 0 — a
    # different instrument's sample. (The reference crashes with a KeyError
    # on a missing h5 pitch group, synthetiser.py:171-201; silence is the
    # graceful equivalent and is correct in ADTOF mode, where eligibility is
    # evaluated after the member-pitch draw.)
    slot_ok = main_valid & sub_valid  # (B, N_SLOTS)
    gain = gain * jnp.take_along_axis(slot_ok, slot, axis=1).astype(gain.dtype)
    # fold the blend's peak-normalization into the per-note gain: the
    # normalized (B, N_SLOTS, L) blend tensor never needs materializing
    # (saves a ~200 MB round trip per step at the flagship shapes)
    gain = gain / jnp.take_along_axis(peak, slot, axis=1)

    if on_tpu:
        # Pallas placement kernel: hardware rotate + sublane-aligned
        # accumulation on (rows, 128) tiles (see synth/pallas_place.py for
        # why the XLA formulations lose on TPU); per-note rows stream bf16
        from adt_str_tpu.synth.pallas_place import place_notes

        l_pad = ((L + 127) // 128) * 128
        blend_padded = jnp.pad(blend, ((0, 0), (0, 0), (0, l_pad - L)))
        # interpret mode keeps the statics dtype so the integration test can
        # compare against the portable path at f32 tolerance; real TPU runs
        # stream bf16 (see place_notes docstring)
        wav = place_notes(
            blend_padded, slot, onset_sample, gain, chunk_samples,
            interpret=interpret,
            stream_dtype=statics.waveforms.dtype if interpret else jnp.bfloat16,
        )
    else:
        # portable path: per-slot impulse trains convolved in the frequency
        # domain (CPU FFTs are fast; TPU FFT throughput is poor)
        b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, max_notes))
        impulses = jnp.zeros((B, N_SLOTS, P), jnp.float32)
        impulses = impulses.at[
            b_idx.reshape(-1), slot.reshape(-1), onset_sample.reshape(-1)
        ].add(gain.reshape(-1))
        imp_f = jnp.fft.rfft(impulses, n=P, axis=-1)  # (B, N_SLOTS, F)
        blend_f = jnp.fft.rfft(blend, n=P, axis=-1)
        wav = jnp.fft.irfft(jnp.sum(imp_f * blend_f, axis=1), n=P, axis=-1)
        wav = wav[:, :chunk_samples].astype(jnp.float32)

    # randomized FX with probability use_fx_prob. A plain batch-wide
    # where-select computes the chain for EVERY row; instead the fx rows are
    # compacted (leading-axis gather = clean DMA) into a static-size buffer
    # and only that subset pays the chain. The budget scales with the draw
    # probability: mean + 6 sigma of Binomial(B, p), so overflow (extra rows
    # silently skipping FX) stays < ~1e-8 at ANY p, not just the production
    # use_fx_prob=0.3 (a fixed 0.625*B budget overflowed routinely for
    # p in (0.45, 0.55]). When the safe budget reaches B the full vmap path
    # is cheaper than the gather anyway.
    use_fx = jax.vmap(jax.random.uniform)(k_usefx) < use_fx_prob
    fx_fn = lambda w, k: random_fx_chain(
        w, sample_rate, k, use_reverb_prob, use_compression_prob, use_limiter_prob
    )
    p_fx = min(max(float(use_fx_prob), 0.0), 1.0)  # out-of-range p: clamp, not nan
    budget = min(
        B, int(np.ceil(B * p_fx + 6.0 * np.sqrt(B * p_fx * (1.0 - p_fx)))) if p_fx > 0 else 0
    )
    if use_fx_prob <= 0.0:
        pass  # chain disabled: no row can draw it
    elif budget >= B or B <= 8:
        wav_fx = jax.vmap(fx_fn)(wav, k_fx)
        wav = jnp.where(use_fx[:, None], wav_fx, wav)
    else:
        order = jnp.argsort(~use_fx)  # stable: fx rows first
        idx = order[:budget]
        sub = wav[idx]
        sub_fx = jax.vmap(fx_fn)(sub, k_fx[idx])
        sub = jnp.where(use_fx[idx][:, None], sub_fx, sub)
        wav = wav.at[idx].set(sub)

    # peak normalize x master gain; empty segments stay silent
    max_vel = jnp.max(jnp.where(mask, velocity, 0.0), axis=1)
    master = vel_to_vol(max_vel)
    wav = wav / jnp.maximum(jnp.max(jnp.abs(wav), axis=1, keepdims=True), 1e-8)
    wav = wav * master[:, None]
    any_notes = jnp.any(mask & (gain > 0), axis=1)
    return jnp.where(any_notes[:, None], wav, 0.0)


def render_batch(
    statics: SynthStatics,
    notes: jnp.ndarray,
    mask: jnp.ndarray,
    keys: jax.Array,
    config: SynthConfig,
) -> jnp.ndarray:
    """(B, chunk_samples) batch synthesis driven by a SynthConfig."""
    check_bins_loaded(statics, config.similarity_threshold)
    return render_batch_arrays(
        statics,
        notes,
        mask,
        keys,
        chunk_samples=config.chunk_samples,
        sample_rate=config.sample_rate,
        mixup_range=config.mixup_range,
        use_fx_prob=config.use_fx_prob,
        use_reverb_prob=config.use_reverb_prob,
        use_compression_prob=config.use_compression_prob,
        use_limiter_prob=config.use_limiter_prob,
        n_allowed=n_allowed_bins(config.similarity_threshold),
        adtof=config.ADTOF_mapping,
    )


def render_segment(
    statics: SynthStatics,
    notes: jnp.ndarray,  # (MAX_NOTES, 4)
    mask: jnp.ndarray,  # (MAX_NOTES,)
    key: jax.Array,
    chunk_samples: int,
    sample_rate: int,
    **kwargs,
) -> jnp.ndarray:
    """Single-segment convenience wrapper over `render_batch_arrays`."""
    return render_batch_arrays(
        statics,
        notes[None],
        mask[None],
        key[None],
        chunk_samples=chunk_samples,
        sample_rate=sample_rate,
        **kwargs,
    )[0]


def pad_notes(notes: np.ndarray, max_notes: int) -> tuple[np.ndarray, np.ndarray]:
    """Host helper: (n, 4) float notes -> fixed (max_notes, 4) + bool mask.

    Invalid rows (pitch outside 35..61 or offset < onset) raise, matching the
    reference `_valid_note` assertion (synthetiser.py:252-253, 270-271).
    """
    notes = np.asarray(notes, dtype=np.float32).reshape(-1, 4)
    if len(notes):
        valid = (
            (notes[:, 2] >= PITCH_LO)
            & (notes[:, 2] <= PITCH_HI)
            & (notes[:, 1] >= notes[:, 0])
        )
        if not valid.all():
            raise ValueError(f"Invalid note rows: {notes[~valid]}")
    n = min(len(notes), max_notes)
    out = np.zeros((max_notes, 4), dtype=np.float32)
    out[:n] = notes[:n]
    mask = np.zeros(max_notes, dtype=bool)
    mask[:n] = True
    return out, mask
