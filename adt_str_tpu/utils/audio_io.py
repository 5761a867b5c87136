"""Host audio I/O + resampling.

Replaces the reference's torchaudio calls (`utils/audio_utils.py:10-24`,
torchaudio.load/save + `T.Resample`) without a torchaudio dependency:

- WAV read/write via scipy.io.wavfile (PCM and float formats);
- other container formats (mp3, m4a, ...) via an ffmpeg subprocess when
  available (the reference's TMIDT preprocessing reads mp3 through
  torchaudio's ffmpeg backend);
- resampling via polyphase filtering (`scipy.signal.resample_poly`), the same
  algorithm family as torchaudio's kaiser-windowed sinc resampler;
- peak normalization (`utils/audio_utils.py:23-24`).

Resampling is host-side by design: dataset shards are stored at the target
rate (parsers resample once at preprocessing time), so nothing on the TPU
path ever resamples.
"""

from __future__ import annotations

import math
import shutil
import subprocess
import tempfile
from pathlib import Path

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def read_wav(path: str | Path) -> tuple[np.ndarray, int]:
    """-> (float32 mono-or-(C,T) waveform in [-1, 1], sample_rate)."""
    sr, data = wavfile.read(str(path))
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:
        data = data.T  # (C, T)
    return data, sr


def write_wav(path: str | Path, wave: np.ndarray, sample_rate: int) -> None:
    wave = np.asarray(wave, dtype=np.float32)
    if wave.ndim == 2:
        wave = wave.T
    wavfile.write(str(path), sample_rate, wave)


def _load_via_ffmpeg(path: str | Path, target_sr: int | None) -> tuple[np.ndarray, int]:
    if shutil.which("ffmpeg") is None:
        raise RuntimeError(
            f"Cannot decode {path}: not a WAV file and ffmpeg is unavailable"
        )
    with tempfile.NamedTemporaryFile(suffix=".wav") as tmp:
        cmd = ["ffmpeg", "-y", "-i", str(path)]
        if target_sr:
            cmd += ["-ar", str(target_sr)]
        cmd += ["-f", "wav", tmp.name]
        subprocess.run(cmd, check=True, capture_output=True)
        return read_wav(tmp.name)


def resample(wave: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampler (torchaudio `T.Resample` equivalent)."""
    if orig_sr == target_sr:
        return np.asarray(wave, dtype=np.float32)
    g = math.gcd(int(orig_sr), int(target_sr))
    out = resample_poly(
        np.asarray(wave, dtype=np.float64), target_sr // g, orig_sr // g, axis=-1
    )
    return out.astype(np.float32)


def normalize(wave: np.ndarray) -> np.ndarray:
    """Peak normalize (reference divides by max abs with no epsilon,
    `utils/audio_utils.py:23-24`; an epsilon guards the all-zero case)."""
    peak = np.abs(wave).max()
    return wave / max(peak, 1e-8)


def load_and_resample(path: str | Path, target_sr: int | None) -> np.ndarray:
    """Load any audio file -> mono float32, resampled (utils/audio_utils.py:10-15)."""
    path = Path(path)
    if path.suffix.lower() == ".wav":
        wave, sr = read_wav(path)
    else:
        wave, sr = _load_via_ffmpeg(path, None)
    if wave.ndim == 2:
        wave = wave.mean(axis=0)
    if target_sr is None or sr == target_sr:
        return wave.astype(np.float32)
    return resample(wave, sr, target_sr)
