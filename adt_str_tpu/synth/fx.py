"""JAX-native randomized FX chain (reverb / compressor / limiter).

TPU redesign of the reference's pedalboard (C++ JUCE) chain
(`modules/synthetiser.py:30-137`). The FX are *randomized augmentation*, so
bit-parity with JUCE is not a goal (SURVEY.md §7 "hard parts"); what is
preserved is the distributional contract: per-FX inclusion probabilities and
parameter ranges (`synthetiser.py:44-86`), and the clamped-normal sampler
(`utils/utils.py:266-268`).

TPU-native implementations:
- Reverb: frequency-domain convolution with a synthesized exponentially
  decaying noise impulse response; `room_size` sets the decay time, `damping`
  a first-order spectral low-pass tilt, wet/dry mix as in Freeverb. One rFFT
  multiply instead of JUCE's sequential comb/allpass banks — O(n log n),
  fully batchable.
- Compressor: attack-window max-pool envelope, release smoothing as a
  first-order linear recurrence evaluated with `lax.associative_scan`
  (O(log n) depth — no sequential sample loop), log-domain gain computer.
- Limiter: the same engine with infinite ratio and fast fixed attack.

All functions are pure, vmappable over the batch, and threaded by PRNG keys.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

IR_SECONDS = 0.7  # synthesized reverb tail length


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


def _envelope(x: jnp.ndarray, sr: int, attack_ms, release_ms) -> jnp.ndarray:
    """Peak envelope: attack-window max pooling + release EMA smoothing."""
    ax = jnp.abs(x)
    # attack: look-back max over a window of attack_ms (static upper bound 16ms
    # of window, scaled selection) — approximate with a fixed small window and
    # blend by attack coefficient
    win = max(1, int(sr * 0.005))  # 5 ms structural window
    padded = jnp.pad(ax, (win - 1, 0), constant_values=0.0)
    pooled = jax.lax.reduce_window(
        padded, 0.0, jax.lax.max, (win,), (1,), "valid"
    )
    attack_coeff = jnp.exp(-1.0 / (sr * jnp.maximum(attack_ms, 0.1) / 1000.0))
    fast = ema_scan(pooled, attack_coeff)
    release_coeff = jnp.exp(-1.0 / (sr * jnp.maximum(release_ms, 1.0) / 1000.0))
    slow = ema_scan(pooled, release_coeff)
    return jnp.maximum(fast, slow)


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
    """Noise-IR convolution reverb, parameterized like pedalboard.Reverb."""
    n = x.shape[-1]
    ir_len = int(sr * IR_SECONDS)
    t = jnp.arange(ir_len) / sr
    # decay time grows with room size: T60 in ~[0.25 s, 1.6 s]
    t60 = 0.25 + 1.35 * room_size
    tau = t60 / 6.91  # ln(10^3)
    noise = jax.random.normal(key, (ir_len,))
    ir = noise * jnp.exp(-t / tau)
    ir = ir.at[0].set(0.0)

    fft_len = 1
    while fft_len < n + ir_len:
        fft_len *= 2
    X = jnp.fft.rfft(x, n=fft_len)
    H = jnp.fft.rfft(ir, n=fft_len)
    # damping: first-order low-pass tilt, stronger damping -> lower cutoff
    freqs = jnp.fft.rfftfreq(fft_len, 1.0 / sr)
    cutoff = 500.0 + (1.0 - damping) * 8000.0
    H = H / jnp.sqrt(1.0 + (freqs / cutoff) ** 2)
    wet = jnp.fft.irfft(X * H, n=fft_len)[..., :n]
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
