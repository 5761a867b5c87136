"""On-device drum synthesis: note lists -> audio, fully inside XLA.

Behavioral parity with `SynthDrum.__call__` (`modules/synthetiser.py:255-292`)
redesigned for TPU static shapes:

- per-*instrument* (not per-note) main/sub timbre pair, cached for the segment
  (`synthetiser.py:275-281`): one timbre-pair draw per possible pitch per
  segment, gathered per note;
- per-note mixup blend `(1-l)*main + l*sub`, `l ~ U(0, mixup_range)`
  (`synthetiser.py:217-223`), blend peak-normalized then scaled by the
  exponential velocity->gain curve `_vel_to_vol` (base 6, min 0.1,
  `synthetiser.py:204-212`);
- per-instrument class gains (HH/cymbals/aux at 0.7, `VolumeMixer`,
  `synthetiser.py:104-113`) folded into the per-note gain (the reference sums
  per-instrument track buffers; since tracks are only ever scaled and summed,
  a flat weighted scatter-add is algebraically identical);
- optional randomized FX chain with probability `use_fx_prob`
  (`synthetiser.py:154`), then peak-normalize times the master gain
  `_vel_to_vol(max velocity)` (`synthetiser.py:156,292`);
- one-shots that overrun the segment end are clipped (`synthetiser.py:232-237`);
  the render buffer is `chunk_samples + bank.max_len` then truncated, which is
  the same clipping semantics with static shapes.

Everything is a pure jittable function; `render_batch` vmaps over segments so
synthesis fuses into the input side of the training step (SURVEY.md §7).
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

    @classmethod
    def from_bank(cls, bank: OneShotBank) -> "SynthStatics":
        table, counts = adtof_member_tables()
        return cls(
            waveforms=jnp.asarray(bank.waveforms),
            bin_offset=jnp.asarray(bank.bin_offset),
            bin_count=jnp.asarray(bank.bin_count),
            class_gain=jnp.asarray(class_gain_lut()),
            member_table=jnp.asarray(table),
            member_count=jnp.asarray(counts),
        )


def vel_to_vol(velocity, min_volume=0.1, max_volume=1.0, base=6.0):
    """Exponential velocity->gain curve (`_vel_to_vol`, synthetiser.py:204-212)."""
    v = jnp.clip(velocity, 0.0, 127.0) / 127.0
    vol = min_volume + (max_volume - min_volume) * (base**v - 1.0) / (base - 1.0)
    return jnp.where(velocity == 0, 0.0, vol)


def _sample_timbre_rows(
    statics: SynthStatics, key: jax.Array, n_allowed: int, adtof: bool
) -> jnp.ndarray:
    """One bank-row index per possible pitch (0..127): the per-segment timbre
    draw. Sequence of choices mirrors `random_choice_timbre`
    (synthetiser.py:192-202): [ADTOF member pitch] -> eligible existing bin ->
    timbre within bin."""
    k_member, k_bin, k_timbre = jax.random.split(key, 3)
    pitches = jnp.arange(128)

    if adtof:
        m = jax.random.randint(k_member, (128,), 0, 1_000_000) % statics.member_count
        pitches = statics.member_table[jnp.arange(128), m]

    counts = statics.bin_count[pitches]  # (128, N_BINS)
    eligible = (jnp.arange(N_BINS)[None, :] < n_allowed) & (counts > 0)
    n_eligible = eligible.sum(axis=1)  # (128,)
    # uniform choice among eligible bins: pick the r-th eligible one
    r = jax.random.randint(k_bin, (128,), 0, 1_000_000) % jnp.maximum(n_eligible, 1)
    cum = jnp.cumsum(eligible.astype(jnp.int32), axis=1)  # rank of each bin
    bin_idx = jnp.argmax((cum == (r + 1)[:, None]) & eligible, axis=1)

    cnt = counts[jnp.arange(128), bin_idx]
    t = jax.random.randint(k_timbre, (128,), 0, 1_000_000) % jnp.maximum(cnt, 1)
    return statics.bin_offset[pitches, bin_idx] + t


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
    ),
)
def render_segment(
    statics: SynthStatics,
    notes: jnp.ndarray,  # (MAX_NOTES, 4) [onset, offset, pitch, velocity]
    mask: jnp.ndarray,  # (MAX_NOTES,) bool — valid-note rows
    key: jax.Array,
    chunk_samples: int,
    sample_rate: int,
    mixup_range: float = 0.8,
    use_fx_prob: float = 0.3,
    use_reverb_prob: float = 0.5,
    use_compression_prob: float = 0.5,
    use_limiter_prob: float = 0.5,
    n_allowed: int = 3,
    adtof: bool = False,
) -> jnp.ndarray:
    """One segment's notes -> (chunk_samples,) mixed waveform."""
    max_notes = notes.shape[0]
    L = statics.waveforms.shape[1]
    k_main, k_sub, k_mix, k_usefx, k_fx = jax.random.split(key, 5)

    main_rows = _sample_timbre_rows(statics, k_main, n_allowed, adtof)
    sub_rows = _sample_timbre_rows(statics, k_sub, n_allowed, adtof)

    pitch = jnp.clip(notes[:, 2].astype(jnp.int32), 0, 127)
    velocity = notes[:, 3]
    onset_sample = jnp.clip(
        (notes[:, 0] * sample_rate).astype(jnp.int32), 0, chunk_samples - 1
    )

    main = statics.waveforms[main_rows[pitch]]  # (MAX_NOTES, L)
    sub = statics.waveforms[sub_rows[pitch]]
    lam = jax.random.uniform(k_mix, (max_notes, 1), maxval=mixup_range)
    blend = (1.0 - lam) * main + lam * sub
    peak = jnp.max(jnp.abs(blend), axis=1, keepdims=True)
    blend = blend / jnp.maximum(peak, 1e-8)

    gain = vel_to_vol(velocity) * statics.class_gain[pitch]
    gain = jnp.where(mask, gain, 0.0)
    contrib = blend * gain[:, None]  # (MAX_NOTES, L)

    # scatter-add each note at its onset; buffer has L slack so overruns clip
    buf = jnp.zeros((chunk_samples + L,), jnp.float32)

    def add_note(i, buf):
        seg = jax.lax.dynamic_slice(buf, (onset_sample[i],), (L,))
        return jax.lax.dynamic_update_slice(buf, seg + contrib[i], (onset_sample[i],))

    buf = jax.lax.fori_loop(0, max_notes, add_note, buf)
    wav = buf[:chunk_samples]

    use_fx = jax.random.uniform(k_usefx) < use_fx_prob
    wav = jnp.where(
        use_fx,
        random_fx_chain(
            wav,
            sample_rate,
            k_fx,
            use_reverb_prob,
            use_compression_prob,
            use_limiter_prob,
        ),
        wav,
    )

    # peak normalize x master gain (instrument_mixer, synthetiser.py:156;
    # master gain = vel_to_vol of the max velocity, synthetiser.py:292)
    max_vel = jnp.max(jnp.where(mask, velocity, 0.0))
    master = vel_to_vol(max_vel)
    wav = wav / jnp.maximum(jnp.max(jnp.abs(wav)), 1e-8) * master
    # empty segment -> silence (synthetiser.py:257-258)
    return jnp.where(jnp.any(mask), wav, jnp.zeros_like(wav))


def render_batch(
    statics: SynthStatics,
    notes: jnp.ndarray,  # (B, MAX_NOTES, 4)
    mask: jnp.ndarray,  # (B, MAX_NOTES)
    keys: jax.Array,  # (B,) PRNG keys
    config: SynthConfig,
) -> jnp.ndarray:
    """(B, chunk_samples) batch synthesis (vmapped render_segment)."""
    fn = partial(
        render_segment,
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
    return jax.vmap(fn, in_axes=(None, 0, 0, 0))(statics, notes, mask, keys)


def pad_notes(notes: np.ndarray, max_notes: int) -> tuple[np.ndarray, np.ndarray]:
    """Host helper: (n, 4) float notes -> fixed (max_notes, 4) + bool mask.

    Invalid rows (pitch outside 35..61 or offset < onset) raise, matching the
    reference `_valid_note` assertion (synthetiser.py:252-253, 270-271).
    """
    notes = np.asarray(notes, dtype=np.float32).reshape(-1, 4)
    if len(notes):
        valid = (
            (notes[:, 2] >= 35) & (notes[:, 2] <= 61) & (notes[:, 1] >= notes[:, 0])
        )
        if not valid.all():
            raise ValueError(f"Invalid note rows: {notes[~valid]}")
    n = min(len(notes), max_notes)
    out = np.zeros((max_notes, 4), dtype=np.float32)
    out[:n] = notes[:n]
    mask = np.zeros(max_notes, dtype=bool)
    mask[:n] = True
    return out, mask
