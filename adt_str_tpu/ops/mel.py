"""Log-mel spectrogram frontend (TPU-native).

Numerically matches the reference's `ComputeMelSpectrogram` (`model.py:68-97`),
which wraps `torchaudio.transforms.MelSpectrogram(sample_rate, n_fft=win_length,
hop_length=time_res*sr, n_mels, f_min=20, power=2)` with its defaults:

- centered STFT, reflect padding, periodic Hann window, one-sided spectrum,
  power 2, no normalization;
- HTK-scale triangular mel filterbank (`mel_scale="htk"`, `norm=None`),
  f_min=20, f_max=sr/2;
- log(mel + 1e-10), clamp to [-23, 12], min-max normalize to [0, 1]
  (model.py:91-93);
- transpose to (batch, frames, n_mels) and trim `window_pad_idxs =
  (win//2)//hop + 1` frames from the head and `window_pad_idxs + 1` from the
  tail (model.py:79,95-97).

The mel computation runs in fp32 regardless of the surrounding compute dtype,
mirroring the reference's autocast-disabled fp32 island (model.py:84-89).

Two device paths:
- `log_mel_spectrogram`: XLA path (framing gather + jnp.fft.rfft + mel matmul);
- `adt_str_tpu.ops.pallas_mel`: fused Pallas matmul-DFT kernel (window+DFT
  bases folded into MXU matmuls, mel projection and log/clamp/normalize fused).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window_periodic(win_length: int) -> np.ndarray:
    """Periodic Hann window, identical to torch.hann_window(periodic=True)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 20.0,
    f_max: float | None = None,
) -> np.ndarray:
    """(n_freqs, n_mels) HTK triangular filterbank, norm=None.

    Same construction as torchaudio's `melscale_fbanks` defaults used by the
    reference (`model.py:71-78`): FFT bin frequencies linspace(0, sr//2),
    mel-spaced points between f_min and f_max, triangle = max(0,
    min(up_slope, down_slope)).
    """
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down_slopes = -slopes[:, :-2] / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))
    return fb.astype(np.float32)


@dataclass(frozen=True)
class MelFrontendParams:
    """Static constants of the frontend, derived from SharedConfig numbers.

    `log_mode`:
      - "norm": reference ADT chain — ln(mel+floor), clamp [-23, 12],
        min-max normalize to [0, 1] (model.py:91-93);
      - "db": CLAP preprocessing chain — 10*log10(max(mel, floor)), no
        clamp/normalize (HF `power_to_db` with top_db=None).
    """

    sample_rate: int
    win_length: int
    hop_length: int
    n_mels: int
    f_min: float = 20.0
    f_max: float | None = None
    log_floor: float = 1e-10
    clamp_lo: float = -23.0
    clamp_hi: float = 12.0
    log_mode: str = "norm"

    @property
    def n_fft(self) -> int:
        return self.win_length

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def window_pad_idxs(self) -> int:
        # model.py:79
        return int((self.win_length / 2) // self.hop_length + 1)

    def n_frames(self, n_samples: int) -> int:
        # centered STFT: 1 + n_samples // hop
        return 1 + n_samples // self.hop_length

    def out_frames(self, n_samples: int) -> int:
        return self.n_frames(n_samples) - 2 * self.window_pad_idxs - 1

    @classmethod
    def from_config(cls, cfg) -> "MelFrontendParams":
        return cls(
            sample_rate=cfg.sample_rate,
            win_length=cfg.win_length,
            hop_length=int(cfg.time_res * cfg.sample_rate),
            n_mels=getattr(cfg, "n_mels", 128),
        )


def frame_signal(wave: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, n_fft) centered frames with reflect padding."""
    pad = n_fft // 2
    padded = jnp.pad(wave, [(0, 0)] * (wave.ndim - 1) + [(pad, pad)], mode="reflect")
    n_frames = 1 + wave.shape[-1] // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return padded[..., idx]


@partial(jax.jit, static_argnames=("params", "trim"))
def log_mel_spectrogram(
    wave: jnp.ndarray,
    params: MelFrontendParams,
    trim: bool = True,
) -> jnp.ndarray:
    """(B, T) float wave -> (B, frames, n_mels) normalized log-mel in [0, 1].

    fp32 island (reference model.py:84-89); XLA fuses the elementwise tail into
    the mel matmul.
    """
    wave = wave.astype(jnp.float32)
    window = jnp.asarray(hann_window_periodic(params.win_length))
    fb = jnp.asarray(
        mel_filterbank(
            params.n_freqs, params.n_mels, params.sample_rate, params.f_min,
            params.f_max,
        )
    )
    frames = frame_signal(wave, params.n_fft, params.hop_length) * window
    spec = jnp.fft.rfft(frames, n=params.n_fft, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2  # (B, frames, n_freqs)
    # true fp32 dot on TPU (default would be one bf16 MXU pass, ~2e-3 rel
    # err — this path's contract is torch.stft-parity, tests/test_mel.py)
    mel = jnp.matmul(power, fb, precision="highest")  # (B, frames, n_mels)
    if params.log_mode == "db":
        logmel = 10.0 * jnp.log10(jnp.maximum(mel, params.log_floor))
    else:
        logmel = jnp.log(mel + params.log_floor)
        logmel = jnp.clip(logmel, params.clamp_lo, params.clamp_hi)
        logmel = (logmel - params.clamp_lo) / (params.clamp_hi - params.clamp_lo)
    if trim:
        p = params.window_pad_idxs
        logmel = logmel[:, p : logmel.shape[1] - (p + 1), :]
    return logmel
