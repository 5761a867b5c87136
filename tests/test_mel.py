"""Golden tests for the log-mel frontend against a torch.stft reference.

torchaudio is not available in this image; torch.stft *is* (torchaudio's
Spectrogram is a thin wrapper over it with center=True, reflect padding,
periodic Hann, power=2). The full reference chain (mel fbank -> log -> clamp ->
normalize -> trim) is reproduced in torch here and compared element-wise.
"""

import numpy as np
import pytest
import torch

from adt_str_tpu.config import SharedConfig
from adt_str_tpu.ops.mel import (
    MelFrontendParams,
    frame_signal,
    hann_window_periodic,
    log_mel_spectrogram,
    mel_filterbank,
)

SR = 24000
PARAMS = MelFrontendParams(sample_rate=SR, win_length=2048, hop_length=240, n_mels=128)


def torch_reference_logmel(wave_np: np.ndarray, params: MelFrontendParams, trim=True):
    """Reference chain per model.py:68-97, using torch.stft + our fbank."""
    wave = torch.from_numpy(wave_np).float()
    window = torch.hann_window(params.win_length, periodic=True)
    spec = torch.stft(
        wave,
        n_fft=params.n_fft,
        hop_length=params.hop_length,
        win_length=params.win_length,
        window=window,
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    power = spec.abs() ** 2  # (B, n_freqs, frames)
    fb = torch.from_numpy(
        mel_filterbank(params.n_freqs, params.n_mels, params.sample_rate)
    )
    mel = torch.matmul(fb.T, power)  # (B, n_mels, frames)
    logmel = torch.log(mel + 1e-10).clamp(-23, 12)
    logmel = (logmel + 23) / 35
    logmel = logmel.permute(0, 2, 1)  # (B, frames, n_mels)
    if trim:
        p = params.window_pad_idxs
        logmel = logmel[:, p : -(p + 1), :]
    return logmel.numpy()


@pytest.fixture(scope="module")
def wave():
    rng = np.random.default_rng(42)
    t = np.arange(int(2.56 * SR)) / SR
    # mixture of tones + noise + a click, batch of 2
    w0 = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 3000 * t)
        + 0.05 * rng.normal(size=t.shape)
    )
    w1 = rng.normal(size=t.shape) * 0.1
    w1[1000:1100] += 0.9
    return np.stack([w0, w1]).astype(np.float32)


def test_shapes(wave):
    out = np.asarray(log_mel_spectrogram(wave, PARAMS))
    # 61440 samples -> 257 frames; trim 5 head + 6 tail -> 246
    assert PARAMS.window_pad_idxs == 5
    assert out.shape == (2, 246, 128)


def test_framing_matches_torch(wave):
    frames = np.asarray(frame_signal(wave, PARAMS.n_fft, PARAMS.hop_length))
    # torch.stft frame f covers padded[f*hop : f*hop+n_fft] with reflect pad
    pad = PARAMS.n_fft // 2
    padded = np.pad(wave, ((0, 0), (pad, pad)), mode="reflect")
    for f in [0, 1, 100, 256]:
        np.testing.assert_array_equal(
            frames[:, f], padded[:, f * PARAMS.hop_length : f * PARAMS.hop_length + 2048]
        )


def test_logmel_matches_torch_reference(wave):
    ours = np.asarray(log_mel_spectrogram(wave, PARAMS))
    ref = torch_reference_logmel(wave, PARAMS)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=0)


def test_output_range(wave):
    out = np.asarray(log_mel_spectrogram(wave, PARAMS))
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        hann_window_periodic(2048),
        torch.hann_window(2048, periodic=True).numpy(),
        atol=5e-7,
    )


def test_filterbank_properties():
    fb = mel_filterbank(1025, 128, SR)
    assert fb.shape == (1025, 128)
    assert fb.min() >= 0
    # every filter has nonzero support and unit-free triangular peak <= 1
    assert (fb.sum(axis=0) > 0).all()
    assert fb.max() <= 1.0 + 1e-6
    # filters are ordered in frequency: argmax increases monotonically
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()


def test_silence_maps_to_zero():
    silent = np.zeros((1, int(2.56 * SR)), dtype=np.float32)
    out = np.asarray(log_mel_spectrogram(silent, PARAMS))
    # log(1e-10) = -23.03 clamps to -23 -> normalized 0
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_from_config():
    p = MelFrontendParams.from_config(
        SharedConfig(sample_rate=24000, time_res=0.01, win_length=2048)
    )
    assert p.hop_length == 240 and p.n_freqs == 1025
    assert p.out_frames(61440) == 246


def test_filterbank_matches_independent_htk_construction():
    """Pin mel_filterbank against a from-the-textbook scalar-loop HTK
    construction written here (NOT shared code): the full-chain torch test
    above builds its reference mel projection from the module's own
    filterbank, so the filterbank itself needs an independent oracle
    (self-review round 3). Also pins the f_min=20 default (model.py:74)."""
    import math

    n_freqs, n_mels, sr, f_min = 129, 16, 8000, 20.0
    fb = mel_filterbank(n_freqs, n_mels, sr, f_min=f_min)

    def hz2mel(f):
        return 2595.0 * math.log10(1.0 + f / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    freqs = [(sr // 2) * i / (n_freqs - 1) for i in range(n_freqs)]
    lo_m, hi_m = hz2mel(f_min), hz2mel(sr / 2.0)
    pts = [mel2hz(lo_m + (hi_m - lo_m) * k / (n_mels + 1)) for k in range(n_mels + 2)]
    expected = np.zeros((n_freqs, n_mels))
    for m in range(n_mels):
        lo, c, hi = pts[m], pts[m + 1], pts[m + 2]
        for i, f in enumerate(freqs):
            expected[i, m] = max(0.0, min((f - lo) / (c - lo), (hi - f) / (hi - c)))
    np.testing.assert_allclose(fb, expected, atol=1e-5)
    # the default f_min is part of the torchaudio-parity contract
    np.testing.assert_array_equal(fb, mel_filterbank(n_freqs, n_mels, sr))
