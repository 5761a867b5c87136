"""Host-side numpy oracle for the randomized FX chain: faithful
implementations of the algorithms behind `pedalboard`'s Reverb / Compressor /
Limiter (JUCE DSP), used ONLY by tests to A/B the TPU-native chain in
`adt_str_tpu/synth/fx.py` (reference FX construction:
`/root/reference/modules/synthetiser.py:30-137`).

The three algorithms, from their public descriptions/source:

- `Reverb` == JUCE `juce::Reverb` == Jezar's Freeverb: 8 parallel feedback
  comb filters with a one-pole damping low-pass in the feedback path, followed
  by 4 series allpasses (feedback 0.5), input gain 0.015, parameter scaling
  feedback = 0.28*room_size + 0.7, damp = 0.4*damping, wet gain 3*wet_level,
  dry gain 2*dry_level. Comb/allpass tunings are the 44.1 kHz sample counts
  scaled to the working rate.
- `Compressor` == `juce::dsp::Compressor`: peak ballistics envelope follower
  (one-pole toward |x| with separate attack/release time constants
  exp(-1/(tau*sr))), then gain (env/thr)^(1/ratio - 1) for env > thr.
- `Limiter` == `juce::dsp::Limiter`: a fixed 4:1 pre-compressor (-10 dB,
  2 ms / 200 ms) cascaded with a near-infinite-ratio stage at the user
  threshold (0.001 ms attack, user release), then a hard clamp to [-1, 1].

Everything here is filter-bank math on the host; nothing imports jax.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import lfilter

# Freeverb tunings at 44100 Hz (Jezar's constants, used verbatim by JUCE)
COMB_TUNINGS_44K = (1116, 1188, 1277, 1356, 1422, 1491, 1557, 1617)
ALLPASS_TUNINGS_44K = (556, 441, 341, 225)
FIXED_GAIN = 0.015
ROOM_SCALE, ROOM_OFFSET = 0.28, 0.7
DAMP_SCALE = 0.4
WET_SCALE, DRY_SCALE = 3.0, 2.0


def _comb(x: np.ndarray, length: int, feedback: float, damp: float) -> np.ndarray:
    """Freeverb damped feedback comb as an IIR:
    out*(1 - damp z^-1 - fb(1-damp) z^-L) = x * z^-L (1 - damp z^-1)."""
    b = np.zeros(length + 2)
    b[length] = 1.0
    b[length + 1] = -damp
    a = np.zeros(length + 1)
    a[0] = 1.0
    a[1] = -damp
    a[length] = -feedback * (1.0 - damp)
    return lfilter(b, a, x)


def _allpass(x: np.ndarray, length: int) -> np.ndarray:
    """Freeverb allpass (feedback 0.5): H = (1.5 z^-L - 1)/(1 - 0.5 z^-L)."""
    b = np.zeros(length + 1)
    b[0] = -1.0
    b[length] = 1.5
    a = np.zeros(length + 1)
    a[0] = 1.0
    a[length] = -0.5
    return lfilter(b, a, x)


def freeverb(
    x: np.ndarray,
    sr: int,
    room_size: float,
    damping: float,
    wet_level: float,
    dry_level: float | None = None,
    width: float = 1.0,
) -> np.ndarray:
    """Mono JUCE Reverb / Freeverb. `dry_level` defaults to 1 - wet_level,
    matching the reference's BoardChain draw (synthetiser.py:47-48)."""
    if dry_level is None:
        dry_level = 1.0 - wet_level
    feedback = ROOM_SCALE * room_size + ROOM_OFFSET
    damp = DAMP_SCALE * damping
    # JUCE Reverb::setSampleRate uses INTEGER division for the retuned delay
    # lengths ((tuning * intSampleRate) / 44100), not rounding
    xin = x.astype(np.float64) * FIXED_GAIN
    wet = np.zeros_like(xin)
    for t in COMB_TUNINGS_44K:
        wet += _comb(xin, max(1, (t * int(sr)) // 44100), feedback, damp)
    for t in ALLPASS_TUNINGS_44K:
        wet = _allpass(wet, max(1, (t * int(sr)) // 44100))
    # JUCE processMono: out = wet * wetLevel*3 * (width/2 + 0.5) + dry*2 * x
    wet_gain = WET_SCALE * wet_level * (width / 2.0 + 0.5)
    return (wet * wet_gain + DRY_SCALE * dry_level * x).astype(np.float64)


def ballistics_peak(x: np.ndarray, sr: int, attack_ms: float, release_ms: float) -> np.ndarray:
    """JUCE BallisticsFilter, peak mode: y = x_abs + cte*(y_prev - x_abs),
    cte = exp(expFactor / timeMs) with expFactor = -2*pi*1000/sampleRate
    (juce_BallisticsFilter.cpp calculateLimitedCte; times < 1e-3 ms clamp
    cte to 0). A plain exp(-1/(tau_s*sr)) — the round-2 version of this
    oracle — is ~6.3x SLOWER than JUCE's envelopes."""

    def cte(time_ms: float) -> float:
        return 0.0 if time_ms < 1e-3 else float(np.exp(-2.0 * np.pi * 1000.0 / sr / time_ms))

    cte_at = cte(attack_ms)
    cte_rl = cte(release_ms)
    ax = np.abs(x)
    y = np.empty_like(ax)
    prev = 0.0
    for i in range(len(ax)):
        cte = cte_at if ax[i] > prev else cte_rl
        prev = ax[i] + cte * (prev - ax[i])
        y[i] = prev
    return y


def juce_compressor(
    x: np.ndarray, sr: int, threshold_db: float, ratio: float,
    attack_ms: float, release_ms: float,
) -> np.ndarray:
    thr = 10.0 ** (threshold_db / 20.0)
    env = ballistics_peak(x, sr, attack_ms, release_ms)
    gain = np.where(env < thr, 1.0, (np.maximum(env, 1e-12) / thr) ** (1.0 / max(ratio, 1.0) - 1.0))
    return x * gain


def juce_limiter(x: np.ndarray, sr: int, threshold_db: float, release_ms: float = 100.0) -> np.ndarray:
    y = juce_compressor(x, sr, -10.0, 4.0, 2.0, 200.0)
    y = juce_compressor(y, sr, threshold_db, 1000.0, 0.001, release_ms)
    return np.clip(y, -1.0, 1.0)


# ------------------------------------------------------------- measurements

def rt60_from_ir(ir: np.ndarray, sr: int) -> float:
    """RT60 estimate from an impulse response via the Schroeder backward
    integral, extrapolated from the -5..-25 dB decay slope (T20 x 3)."""
    energy = ir.astype(np.float64) ** 2
    sch = np.cumsum(energy[::-1])[::-1]
    sch = 10.0 * np.log10(sch / (sch[0] + 1e-30) + 1e-30)
    idx5 = int(np.argmax(sch <= -5.0))
    idx25 = int(np.argmax(sch <= -25.0))
    if idx25 <= idx5:
        return 0.0
    slope = (sch[idx25] - sch[idx5]) / ((idx25 - idx5) / sr)  # dB/s, negative
    return -60.0 / slope if slope < 0 else float("inf")


def spectral_centroid(x: np.ndarray, sr: int) -> float:
    spec = np.abs(np.fft.rfft(x.astype(np.float64))) ** 2
    freqs = np.fft.rfftfreq(len(x), 1.0 / sr)
    return float((freqs * spec).sum() / (spec.sum() + 1e-30))


def gain_reduction_db(x: np.ndarray, y: np.ndarray) -> float:
    """Steady-state gain reduction over the last half of a constant-level
    burst, in dB (negative = reduction)."""
    h = len(x) // 2
    rx = np.sqrt(np.mean(x[h:] ** 2)) + 1e-30
    ry = np.sqrt(np.mean(y[h:] ** 2)) + 1e-30
    return 20.0 * float(np.log10(ry / rx))
