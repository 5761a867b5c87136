"""Pallas mel kernel vs XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from adt_str_tpu.ops.mel import MelFrontendParams, log_mel_spectrogram
from adt_str_tpu.ops.pallas_mel import pallas_log_mel

PARAMS = MelFrontendParams(sample_rate=8000, win_length=512, hop_length=80, n_mels=64)


@pytest.fixture(scope="module")
def wave():
    rng = np.random.default_rng(0)
    t = np.arange(int(1.28 * 8000)) / 8000
    w0 = 0.6 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.normal(size=t.shape)
    w1 = rng.normal(size=t.shape) * 0.1
    return np.stack([w0, w1]).astype(np.float32)


def test_pallas_matches_xla_path(wave):
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(wave), PARAMS))
    out = np.asarray(pallas_log_mel(jnp.asarray(wave), PARAMS, interpret=True))
    assert out.shape == ref.shape
    # bf16 DFT bases: ~1e-2 worst-case absolute tolerance on the [0,1] output,
    # sub-1e-3 mean error
    np.testing.assert_allclose(out, ref, atol=1e-2, rtol=0)
    assert np.abs(out - ref).mean() < 5e-4


def test_pallas_silence(wave):
    silent = np.zeros_like(wave)
    out = np.asarray(pallas_log_mel(jnp.asarray(silent), PARAMS, interpret=True))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)
