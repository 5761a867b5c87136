"""CLAP feature extraction (fused log-mel preprocessing), numpy.

Replicates HF `ClapFeatureExtractor` (defaults = laion/clap-htsat-fused:
48 kHz, n_fft 1024, hop 480, 64 mels, f_max 14 kHz, dB log-mel, `fusion`
truncation, `repeatpad` padding) without a torch/transformers dependency, so
the curation pipeline (`modules/clap_encoder.py:21-24` via ClapProcessor in
the reference) is hermetic.

Semantics:
- short audio (<= 10 s): repeat + zero-pad to 10 s, one log-mel, stacked 4x,
  `is_longer=False`;
- long audio: full log-mel; 3 random crops + a bilinear-downsampled full mel
  stacked as 4 channels, `is_longer=True` (`_random_mel_fusion`);
- HF batch quirk: when no item is longer, one random item is flagged longer
  (feature_extraction_clap.py `__call__`); reproduced behind
  `replicate_hf_longer_quirk` (default False — it only injects noise).
"""

from __future__ import annotations

import numpy as np

from adt_str_tpu.ops.mel import hann_window_periodic, mel_filterbank

SAMPLE_RATE = 48_000
N_FFT = 1024
HOP = 480
N_MELS = 64
F_MIN = 0.0
F_MAX = 14_000.0
MAX_LENGTH_S = 10
MAX_SAMPLES = MAX_LENGTH_S * SAMPLE_RATE


def _log_mel_db(waveform: np.ndarray, fb: np.ndarray) -> np.ndarray:
    """(T,) -> (frames, 64) dB log-mel, matching HF `spectrogram(...,
    power=2.0, log_mel='dB')`: centered reflect-padded STFT, Hann window,
    power_to_db with amin=1e-10 and no top_db."""
    window = hann_window_periodic(N_FFT)
    pad = N_FFT // 2
    padded = np.pad(waveform.astype(np.float64), (pad, pad), mode="reflect")
    n_frames = 1 + len(waveform) // HOP
    idx = np.arange(n_frames)[:, None] * HOP + np.arange(N_FFT)[None, :]
    frames = padded[idx] * window
    spec = np.fft.rfft(frames, axis=-1)
    power = np.abs(spec) ** 2  # (frames, 513)
    mel = power @ fb  # (frames, 64)
    return (10.0 * np.log10(np.maximum(mel, 1e-10))).astype(np.float32)


def _bilinear_resize(mel: np.ndarray, out_t: int, out_f: int) -> np.ndarray:
    """align_corners=False bilinear (torch F.interpolate default)."""

    def axis_matrix(n_in, n_out):
        M = np.zeros((n_out, n_in))
        scale = n_in / n_out
        for i in range(n_out):
            x = (i + 0.5) * scale - 0.5
            x0 = int(np.floor(x))
            w = x - x0
            a = min(max(x0, 0), n_in - 1)
            b = min(max(x0 + 1, 0), n_in - 1)
            M[i, a] += 1 - w
            M[i, b] += w
        return M

    Mt = axis_matrix(mel.shape[0], out_t)
    Mf = axis_matrix(mel.shape[1], out_f)
    return (Mt @ mel @ Mf.T).astype(np.float32)


def _clap_mel_params():
    from adt_str_tpu.ops.mel import MelFrontendParams

    return MelFrontendParams(
        sample_rate=SAMPLE_RATE, win_length=N_FFT, hop_length=HOP,
        n_mels=N_MELS, f_min=F_MIN, f_max=F_MAX, log_mode="db",
    )


def _device_mel(wave):
    import jax

    from adt_str_tpu.ops.mel import log_mel_spectrogram

    if jax.default_backend() != "cpu":
        from adt_str_tpu.ops.pallas_mel import pallas_log_mel

        return pallas_log_mel(wave, _clap_mel_params(), trim=False)
    return log_mel_spectrogram(wave, _clap_mel_params(), trim=False)


def device_log_mel_db(waveforms) -> "np.ndarray":
    """Batched dB log-mel on the accelerator for fixed 10 s inputs
    (B, 480000) -> (B, 1001, 64). Uses the Pallas matmul-DFT kernel on TPU
    and the XLA path elsewhere — this is the throughput path for
    minutes-scale curation of ~1M one-shots (SURVEY.md §6 north star)."""
    import jax.numpy as jnp

    wave = jnp.asarray(np.asarray(waveforms, dtype=np.float32))
    return np.asarray(_device_mel(wave))


# Negative result (measured, kept for the record): repeat-padding short clips
# ON DEVICE — shipping only the true samples and expanding with a
# `take_along_axis(w, t mod len)` gather — cut H2D bytes 5-10x but made the
# encode stage ~7x *slower* end to end: per-element lane-axis gathers are
# pathological on TPU (the same Mosaic lesson as synth/pallas_place.py's
# war story). Host repeat-pad + full 10 s transfer is the right call: on a
# real TPU VM the padded batch moves over PCIe in ~8 ms; only this dev
# image's ~20 MB/s tunnel made transfer look like the bottleneck.


class ClapFeatureExtractor:
    def __init__(self, rng: np.random.Generator | None = None,
                 replicate_hf_longer_quirk: bool = False,
                 use_device: bool = False):
        self.fb = mel_filterbank(N_FFT // 2 + 1, N_MELS, SAMPLE_RATE, F_MIN, F_MAX)
        self.rng = rng or np.random.default_rng(0)
        self.replicate_hf_longer_quirk = replicate_hf_longer_quirk
        self.use_device = use_device

    def _one(self, waveform: np.ndarray) -> tuple[np.ndarray, bool]:
        waveform = np.asarray(waveform, dtype=np.float64).reshape(-1)
        if len(waveform) > MAX_SAMPLES:
            mel = _log_mel_db(waveform, self.fb)
            chunk_frames = MAX_SAMPLES // HOP + 1
            total_frames = mel.shape[0]
            if chunk_frames == total_frames:
                return np.stack([mel] * 4), False
            # 3 random crops from thirds + bilinear-shrunk full mel
            ranges = np.array_split(np.arange(0, total_frames - chunk_frames + 1), 3)
            idxs = [
                int(self.rng.choice(r)) if len(r) else 0 for r in ranges
            ]
            crops = [mel[i : i + chunk_frames] for i in idxs]
            shrink = _bilinear_resize(mel, chunk_frames, N_MELS)
            return np.stack([shrink, *crops]), True
        mel = _log_mel_db(self._pad_short(waveform), self.fb)
        return np.stack([mel] * 4), False

    def _pad_short(self, waveform: np.ndarray) -> np.ndarray:
        """repeatpad + zero pad to 10 s (short-audio branch of `_one`; the
        single home of this bit-critical padding for both host and device
        paths)."""
        waveform = np.asarray(waveform, dtype=np.float64).reshape(-1)
        if len(waveform) == 0:  # zero-length input: silence, not a crash
            return np.zeros(MAX_SAMPLES)
        if len(waveform) < MAX_SAMPLES:
            n_repeat = int(MAX_SAMPLES / len(waveform))
            waveform = np.tile(waveform, max(n_repeat, 1))
            waveform = np.pad(waveform, (0, MAX_SAMPLES - len(waveform)))
        return waveform

    def __call__(self, audios: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
        """-> (input_features (B, 4, 1001, 64) f32, is_longer (B,) bool)."""
        lens = [np.asarray(a).reshape(-1).shape[0] for a in audios]
        if self.use_device and all(n <= MAX_SAMPLES for n in lens):
            padded = np.stack([self._pad_short(a) for a in audios])
            mel = device_log_mel_db(padded)  # (B, 1001, 64)
            mels = np.repeat(mel[:, None, :, :], 4, axis=1)
            longer = [False] * len(audios)
        else:
            mels, longer = zip(*(self._one(a) for a in audios))
            mels = np.stack(mels)
            longer = list(longer)
        if self.replicate_hf_longer_quirk and not any(longer):
            longer[int(self.rng.integers(0, len(longer)))] = True
        return np.asarray(mels, dtype=np.float32), np.asarray(longer, dtype=bool)
