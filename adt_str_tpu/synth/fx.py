"""JAX-native randomized FX chain (reverb / compressor / limiter).

TPU redesign of the reference's pedalboard (C++ JUCE) chain
(`modules/synthetiser.py:30-137`). The FX are *randomized augmentation*, so
bit-parity with JUCE is not a goal (SURVEY.md §7 "hard parts"); what is
preserved is the distributional contract: per-FX inclusion probabilities and
parameter ranges (`synthetiser.py:44-86`), and the clamped-normal sampler
(`utils/utils.py:266-268`).

TPU-native implementations (all static-shape, fusion-friendly, FFT-free —
TPU FFT throughput is poor and some sizes are unimplemented on this backend):
- Reverb: sparse-FIR echo bank — ~40 log-spaced *static* delay taps, with the
  room character (decay envelope, per-tap sign/amplitude jitter, damping
  low-pass) randomized per segment. Static delays mean every tap is a plain
  shifted add that XLA fuses; randomizing amplitudes instead of tap positions
  keeps the same perceptual family as a decaying-noise IR.
- Compressor: peak envelope computed on an 8x-decimated signal (reshape-max),
  attack/release smoothing as first-order linear recurrences via
  `lax.associative_scan` (O(log n) depth) on the short envelope, then
  repeat-upsampled; log-domain gain computer.
- Limiter: the same engine with infinite ratio and fast fixed attack.

All functions are pure, vmappable over the batch, and threaded by PRNG keys.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

N_TAPS = 40
MAX_DELAY_SEC = 0.35
ENV_DECIM = 8  # envelope decimation factor


def draw_clamped_normal(key, std, mean, high_bound, low_bound):
    """clamp(|clamp(randn*std + mean, -1, 1)| * high, low, high)
    (reference `draw_from_normal_distribution`, utils/utils.py:266-268)."""
    x = jax.random.normal(key) * std + mean
    x = jnp.clip(x, -1.0, 1.0)
    return jnp.clip(jnp.abs(x) * high_bound, low_bound, high_bound)


def ema_scan(x: jnp.ndarray, coeff: jnp.ndarray) -> jnp.ndarray:
    """First-order IIR y[t] = c*y[t-1] + (1-c)*x[t] via associative scan."""
    a = jnp.full_like(x, coeff)
    b = (1.0 - coeff) * x

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    _, y = jax.lax.associative_scan(combine, (a, b))
    return y


def _tap_delays(sr: int) -> np.ndarray:
    """Static log-spaced echo delays (samples), ~3 ms .. MAX_DELAY_SEC."""
    d = np.geomspace(0.003 * sr, MAX_DELAY_SEC * sr, N_TAPS)
    # decorrelate taps deterministically (fixed seed: delays must stay static)
    jitter = np.random.default_rng(12345).uniform(0.85, 1.15, N_TAPS)
    return np.unique((d * jitter).astype(np.int64))


def _envelope(x: jnp.ndarray, sr: int, attack_ms, release_ms) -> jnp.ndarray:
    """Peak envelope on an 8x-decimated grid, repeat-upsampled."""
    n = x.shape[-1]
    n_dec = n // ENV_DECIM
    ax = jnp.abs(x[: n_dec * ENV_DECIM]).reshape(n_dec, ENV_DECIM).max(axis=-1)
    sr_dec = sr // ENV_DECIM
    attack_coeff = jnp.exp(-1.0 / (sr_dec * jnp.maximum(attack_ms, 0.1) / 1000.0))
    release_coeff = jnp.exp(-1.0 / (sr_dec * jnp.maximum(release_ms, 1.0) / 1000.0))
    fast = ema_scan(ax, attack_coeff)
    slow = ema_scan(ax, release_coeff)
    env = jnp.maximum(fast, slow)
    env = jnp.repeat(env, ENV_DECIM, axis=-1)
    return jnp.pad(env, (0, n - env.shape[-1]), mode="edge")


def compressor(
    x: jnp.ndarray, sr: int, threshold_db, ratio, attack_ms, release_ms
) -> jnp.ndarray:
    env = _envelope(x, sr, attack_ms, release_ms)
    env_db = 20.0 * jnp.log10(env + 1e-8)
    over_db = jnp.maximum(0.0, env_db - threshold_db)
    gain_db = over_db * (1.0 / jnp.maximum(ratio, 1.0) - 1.0)
    return x * jnp.power(10.0, gain_db / 20.0)


def limiter(x: jnp.ndarray, sr: int, threshold_db) -> jnp.ndarray:
    env = _envelope(x, sr, attack_ms=1.0, release_ms=100.0)
    env_db = 20.0 * jnp.log10(env + 1e-8)
    gain_db = -jnp.maximum(0.0, env_db - threshold_db)
    return x * jnp.power(10.0, gain_db / 20.0)


def reverb(
    x: jnp.ndarray, sr: int, key, room_size, damping, wet_level, width=1.0
) -> jnp.ndarray:
    """Sparse-FIR echo-bank reverb, parameterized like pedalboard.Reverb:
    room_size sets the tail decay time, damping a one-pole wet low-pass."""
    n = x.shape[-1]
    delays = _tap_delays(sr)
    t60 = 0.25 + 1.35 * room_size  # decay time grows with room size
    tau = t60 / 6.91
    # per-segment random tap amplitudes on the decay envelope
    amps = jax.random.normal(key, (len(delays),)) * jnp.exp(
        -jnp.asarray(delays / sr) / tau
    )

    padded = jnp.pad(x, (int(delays[-1]), 0))
    wet = jnp.zeros_like(x)
    for i, d in enumerate(delays):
        start = int(delays[-1] - d)
        wet = wet + amps[i] * jax.lax.dynamic_slice_in_dim(padded, start, n)
    # damping: one-pole low-pass on the wet path, cutoff falls with damping
    cutoff = 500.0 + (1.0 - damping) * 8000.0
    coeff = jnp.exp(-2.0 * jnp.pi * cutoff / sr)
    wet = ema_scan(
        wet.reshape(-1, ENV_DECIM).mean(axis=-1), coeff ** ENV_DECIM
    )
    wet = jnp.repeat(wet, ENV_DECIM, axis=-1)[:n]
    wet = wet / (jnp.max(jnp.abs(wet)) + 1e-8) * (jnp.max(jnp.abs(x)) + 1e-8)
    return (1.0 - wet_level) * x + wet_level * wet


def random_fx_chain(
    x: jnp.ndarray,
    sr: int,
    key: jax.Array,
    use_reverb_prob: float,
    use_compression_prob: float,
    use_limiter_prob: float,
) -> jnp.ndarray:
    """Randomized chain, parameter ranges per `BoardChain` (synthetiser.py:44-86)."""
    keys = jax.random.split(key, 10)
    use_rev = jax.random.uniform(keys[0]) < use_reverb_prob
    use_comp = jax.random.uniform(keys[1]) < use_compression_prob
    use_lim = jax.random.uniform(keys[2]) < use_limiter_prob

    room = jax.random.uniform(keys[3], minval=0.2, maxval=0.8)
    damp = jax.random.uniform(keys[4], minval=0.2, maxval=0.8)
    wet = jax.random.uniform(keys[5], minval=0.1, maxval=0.4)
    y = jnp.where(use_rev, reverb(x, sr, keys[6], room, damp, wet), x)

    comp_thr = -draw_clamped_normal(keys[7], 0.15, 0.5, 10.0, 0.0)
    comp_ratio = draw_clamped_normal(keys[8], 0.15, 0.5, 10.0, 1.0)
    k_a, k_r, k_l = jax.random.split(keys[9], 3)
    comp_attack = draw_clamped_normal(k_a, 0.05, 0.1, 1000.0, 0.0)
    comp_release = draw_clamped_normal(k_r, 0.15, 0.2, 1000.0, 0.0)
    y = jnp.where(
        use_comp, compressor(y, sr, comp_thr, comp_ratio, comp_attack, comp_release), y
    )

    lim_thr = -draw_clamped_normal(k_l, 0.2, 0.4, 3.0, 0.0)
    y = jnp.where(use_lim, limiter(y, sr, lim_thr), y)
    return y
