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

N_TAPS = 56  # 44 taps measured too sparse for a stable Schroeder decay slope
MAX_DELAY_SEC = 1.2  # long enough to carry freeverb-scale tails (room 0.8
# rings ~2.3 s RT60; the -25 dB Schroeder point used for decay estimation
# falls inside this window across the reference's room_size range)
ENV_DECIM = 8  # envelope decimation factor
# freeverb decay calibration: mean comb loop delay in seconds (1116..1617
# samples at 44.1 kHz — sample-rate invariant time), and the JUCE parameter
# scalings feedback = 0.28*room + 0.7, wet 3x / dry 2x (tools/fx_oracle.py)
FREEVERB_LOOP_SEC = 0.0312
FREEVERB_ROOM_SCALE, FREEVERB_ROOM_OFFSET = 0.28, 0.7
WET_SCALE, DRY_SCALE = 3.0, 2.0
# wet-path RMS (relative to input RMS) at the mid-room reference, calibrated
# so the output energy-ratio distribution matches the freeverb oracle on
# drum material (see reverb() docstring)
WET_RMS_CAL = 0.25


def draw_clamped_normal(key, std, mean, high_bound, low_bound):
    """clamp(|clamp(randn*std + mean, -1, 1)| * high, low, high)
    (reference `draw_from_normal_distribution`, utils/utils.py:266-268)."""
    x = jax.random.normal(key) * std + mean
    x = jnp.clip(x, -1.0, 1.0)
    return jnp.clip(jnp.abs(x) * high_bound, low_bound, high_bound)


def ema_scan(x: jnp.ndarray, coeff: jnp.ndarray, block: int = 128) -> jnp.ndarray:
    """First-order IIR y[t] = c*y[t-1] + (1-c)*x[t], exactly, scan-free.

    The associative-scan formulation was the FX chain's hot spot (measured:
    compressor 1.8 ms + limiter 2.7 ms at B=40, dominated by the scan's
    log-depth slicing passes). This closed form runs on the MXU instead:

      y = blocks(x) @ A(c)^T  +  carry terms,   A[i,j] = (1-c) c^(i-j)

    with the per-block boundary values solved by a second tiny
    lower-triangular matmul (carry_b = sum_j c^(block*(b-1-j)) last_j) — no
    sequential dependency anywhere. Exact for any 0 <= c < 1 (far-block
    terms underflow to 0 harmlessly)."""
    n = x.shape[-1]
    nb = -(-n // block)
    xp = jnp.pad(x, (0, nb * block - n))
    xb = xp.reshape(nb, block)
    coeff = jnp.asarray(coeff, jnp.float32)
    logc = jnp.log(jnp.maximum(coeff, 1e-30))
    i = jnp.arange(block)
    delta = (i[:, None] - i[None, :]).astype(jnp.float32)
    a_mat = jnp.where(delta >= 0, (1.0 - coeff) * jnp.exp(delta * logc), 0.0)
    y_local = xb @ a_mat.T  # (nb, block)
    last = y_local[:, -1]
    b = jnp.arange(nb)
    e = (b[:, None] - 1 - b[None, :]).astype(jnp.float32)
    t_mat = jnp.where(e >= 0, jnp.exp(e * (block * logc)), 0.0)
    carries = t_mat @ last  # carry entering each block
    decay = jnp.exp((i + 1).astype(jnp.float32) * logc)
    y = y_local + decay[None, :] * carries[:, None]
    return y.reshape(-1)[:n]


def _tap_delays(sr: int) -> np.ndarray:
    """Static log-spaced echo delays (samples), ~3 ms .. MAX_DELAY_SEC."""
    d = np.geomspace(0.003 * sr, MAX_DELAY_SEC * sr, N_TAPS)
    # decorrelate taps deterministically (fixed seed: delays must stay static)
    jitter = np.random.default_rng(12345).uniform(0.85, 1.15, N_TAPS)
    return np.unique((d * jitter).astype(np.int64))


def _envelope_dec(x: jnp.ndarray, sr: int, attack_ms, release_ms) -> jnp.ndarray:
    """Peak envelope on the 8x-decimated grid (NOT upsampled)."""
    n = x.shape[-1]
    n_dec = n // ENV_DECIM
    ax = jnp.abs(x[: n_dec * ENV_DECIM]).reshape(n_dec, ENV_DECIM).max(axis=-1)
    sr_dec = sr // ENV_DECIM
    # JUCE ballistics time-constant form: cte = exp(-2*pi*1000/(sr*time_ms))
    # (juce_BallisticsFilter.cpp) transplanted to the decimated grid. The
    # round-2 exp(-1/(tau*sr)) form made attack/release ~6.3x slower than the
    # pedalboard chain being modeled (round-3 oracle-review finding).
    attack_coeff = jnp.exp(
        -2.0 * jnp.pi * 1000.0 / (sr_dec * jnp.maximum(attack_ms, 0.1))
    )
    release_coeff = jnp.exp(
        -2.0 * jnp.pi * 1000.0 / (sr_dec * jnp.maximum(release_ms, 1.0))
    )
    fast = ema_scan(ax, attack_coeff)
    slow = ema_scan(ax, release_coeff)
    return jnp.maximum(fast, slow)


def _upsample_to(g: jnp.ndarray, n: int) -> jnp.ndarray:
    g = jnp.repeat(g, ENV_DECIM, axis=-1)
    return jnp.pad(g, (0, n - g.shape[-1]), mode="edge")


def _envelope(x: jnp.ndarray, sr: int, attack_ms, release_ms) -> jnp.ndarray:
    """Peak envelope on an 8x-decimated grid, repeat-upsampled."""
    return _upsample_to(_envelope_dec(x, sr, attack_ms, release_ms), x.shape[-1])


def compressor(
    x: jnp.ndarray, sr: int, threshold_db, ratio, attack_ms, release_ms
) -> jnp.ndarray:
    # gain computed on the DECIMATED envelope, then repeat-upsampled: repeat
    # commutes with the elementwise gain computer, so this is bit-identical
    # to upsampling the envelope first but pays the log10/pow transcendentals
    # on 8x fewer elements (they were the chain's next cost after the scans)
    env = _envelope_dec(x, sr, attack_ms, release_ms)
    env_db = 20.0 * jnp.log10(env + 1e-8)
    over_db = jnp.maximum(0.0, env_db - threshold_db)
    gain_db = over_db * (1.0 / jnp.maximum(ratio, 1.0) - 1.0)
    return x * _upsample_to(jnp.power(10.0, gain_db / 20.0), x.shape[-1])


def limiter(x: jnp.ndarray, sr: int, threshold_db, release_ms=100.0) -> jnp.ndarray:
    """JUCE dsp::Limiter semantics (tools/fx_oracle.py): a fixed 4:1
    pre-compressor at -10 dB (2/200 ms) cascaded with a near-infinite-ratio
    stage at the user threshold with effectively instant attack, then a hard
    clamp to [-1, 1]. The round-2 single-stage version under-limited (peaks
    passed ~1.4 dB above threshold; with the pre-stage + instant attack the
    ceiling tracks the oracle within the envelope-decimation granularity)."""
    y = compressor(x, sr, -10.0, 4.0, 2.0, 200.0)
    # attack 0 floors to 0.1 ms in _envelope_dec => coeff ~0.04: the
    # decimated peak passes through essentially unsmoothed (instant attack
    # per window); gain computed decimated like the compressor
    env = _envelope_dec(y, sr, attack_ms=0.0, release_ms=release_ms)
    env_db = 20.0 * jnp.log10(env + 1e-8)
    gain_db = -jnp.maximum(0.0, env_db - threshold_db)
    y = y * _upsample_to(jnp.power(10.0, gain_db / 20.0), y.shape[-1])
    return jnp.clip(y, -1.0, 1.0)


def reverb(
    x: jnp.ndarray, sr: int, key, room_size, damping, wet_level, width=1.0
) -> jnp.ndarray:
    """Sparse-FIR echo-bank reverb, calibrated against Freeverb (the JUCE
    algorithm behind pedalboard.Reverb; oracle: tools/fx_oracle.py, A/B in
    tests/test_fx_distributions.py):

    - decay: amplitude time constant tau = -loop/ln(feedback) with Freeverb's
      feedback = 0.28*room_size + 0.7 and mean comb loop 31.2 ms, so the
      Schroeder RT60 tracks the oracle across the reference's room_size range
      (measured r3: ours 0.72/1.10/2.40 s vs oracle 0.62/1.01/2.28 s at
      room 0.2/0.5/0.8);
    - damping: one-pole low-pass on the wet path at FULL sample rate (the
      round-2 decimated filter capped the wet band at ~1.4 kHz regardless of
      the knob), cutoff calibrated to the oracle's wet-centroid range;
    - mix: JUCE's mono gain convention, dry 2*(1-wet), wet 3*wet*(width/2+.5),
      with the wet path RMS-matched to the dry signal (Freeverb's internal
      0.015 input gain x comb stack lands near unity RMS; the renderer
      peak-normalizes the final mix, so only the wet:dry ratio matters).
    """
    n = x.shape[-1]
    delays = _tap_delays(sr)
    d_sec = delays / sr
    feedback = FREEVERB_ROOM_SCALE * room_size + FREEVERB_ROOM_OFFSET
    tau = -FREEVERB_LOOP_SEC / jnp.log(feedback)
    # per-segment random tap amplitudes on the decay envelope; the sqrt(t)
    # factor compensates the log-spaced taps' 1/t density so the ENERGY
    # envelope (what a Schroeder RT60 measures) decays as e^(-2t/tau) like a
    # dense-IR reverb, not faster
    density_comp = np.sqrt(d_sec / d_sec[0])
    amps = (
        jax.random.normal(key, (len(delays),))
        * density_comp
        * jnp.exp(-jnp.asarray(d_sec) / tau)
    )
    # deterministic scale reference: the tap bank's RMS gain for white input
    # at the mid-room decay (room 0.5). Normalizing by a FIXED constant (not
    # the per-draw wet RMS) keeps the natural room-size -> wet-energy
    # correlation freeverb has; WET_RMS_CAL aligns the mean wet:dry energy
    # ratio with the freeverb oracle on drum material
    # (tools/fx_oracle.py A/B, tests/test_fx_distributions.py).
    tau_ref = -FREEVERB_LOOP_SEC / np.log(FREEVERB_ROOM_SCALE * 0.5 + FREEVERB_ROOM_OFFSET)
    norm_ref = float(np.sqrt(np.sum((density_comp * np.exp(-d_sec / tau_ref)) ** 2)))

    # bf16 tap accumulation: halves the HBM traffic of the 56 shifted adds
    # (this is randomized augmentation; the final mix is fp32 again)
    padded = jnp.pad(x, (int(delays[-1]), 0)).astype(jnp.bfloat16)
    wet = jnp.zeros_like(x, dtype=jnp.bfloat16)
    for i, d in enumerate(delays):
        start = int(delays[-1] - d)
        wet = wet + amps[i].astype(jnp.bfloat16) * jax.lax.dynamic_slice_in_dim(
            padded, start, n
        )
    wet = wet.astype(jnp.float32)
    # damping: one-pole low-pass on the wet path at FULL rate, cutoff falls
    # with damping (calibrated to the oracle's wet spectral centroid at
    # sr=24k: ~5.5k/5.1k/4.9k Hz for damping 0.2/0.5/0.8). The pole
    # c = exp(-2*pi*cutoff/sr) <= 0.27 across the damping range, so the IIR
    # impulse response is below -90 dB after 8 samples — an 8-tap bf16 FIR
    # is audibly exact and costs 8 fused shifted-adds instead of an
    # associative scan's log-depth HBM passes.
    cutoff = 7000.0 - 2500.0 * damping
    coeff = jnp.exp(-2.0 * jnp.pi * cutoff / sr)
    kernel = (1.0 - coeff) * jnp.power(coeff, jnp.arange(8, dtype=jnp.float32))
    wpad = jnp.pad(wet, (7, 0)).astype(jnp.bfloat16)
    damped = jnp.zeros_like(wet, dtype=jnp.bfloat16)
    for k in range(8):
        damped = damped + kernel[k].astype(jnp.bfloat16) * jax.lax.dynamic_slice_in_dim(
            wpad, 7 - k, n
        )
    wet = damped.astype(jnp.float32) * (WET_RMS_CAL / norm_ref)
    wet_gain = WET_SCALE * wet_level * (width / 2.0 + 0.5)
    return DRY_SCALE * (1.0 - wet_level) * x + wet_gain * wet


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
    k_rev, k_width = jax.random.split(keys[6])
    # width ~ U(0.6, 1.0) (synthetiser.py:49) scales the mono wet gain by
    # width/2 + 0.5 in JUCE's mono path
    width = jax.random.uniform(k_width, minval=0.6, maxval=1.0)
    y = jnp.where(use_rev, reverb(x, sr, k_rev, room, damp, wet, width), x)

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
