"""Fused Pallas log-mel kernel: windowed DFT matmul -> power -> mel ->
log/clamp/normalize in one kernel.

TPU-first design (GEMM-native DFT): instead of an FFT, the windowed DFT is two
MXU matmuls against precomputed bases `C[n, k] = hann[n]*cos(2*pi*k*n/N)` and
`S[n, k] = -hann[n]*sin(...)` (bf16 storage, fp32 accumulation). Power,
mel projection, and the log/clamp/normalize tail all fuse into the same
kernel, so the 1025-bin power spectrum never round-trips through HBM (the XLA
path materializes it: (B, 257, 1025) f32 = 67 MB per 64-batch).

Framing happens outside the kernel as an XLA gather: hop=240 is not a
multiple of the 128-lane tile, and Mosaic cannot issue lane-unaligned dynamic
VMEM loads — framed input costs one extra HBM pass (~134 MB @ 64-batch,
<0.2 ms on v5e) and keeps the kernel's memory access perfectly blocked.

Numerics match `ops.mel.log_mel_spectrogram` (and therefore torchaudio's
MelSpectrogram as used at reference model.py:68-97) to ~1e-2 worst-case /
<1e-3 mean on the [0, 1]-normalized output (bf16 bases); golden tests compare
both paths.

Grid: (frame_tiles, freq_tiles) over flattened (B*frames, n_fft) input, with
the mel accumulator revisited across freq_tiles (K-blocked matmul
accumulation); the elementwise tail runs on the last freq tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adt_str_tpu.ops.mel import (
    MelFrontendParams,
    frame_signal,
    hann_window_periodic,
    mel_filterbank,
)

TILE_FRAMES = 128
TILE_FREQ = 384  # 1025 -> padded 1152 = 3 x 384


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=4)
def _constants(params: MelFrontendParams):
    """(C, S, M): windowed cos/sin DFT bases (n_fft, K_pad) bf16 and mel
    filterbank (K_pad, n_mels) f32, zero-padded on the freq axis."""
    n_fft = params.n_fft
    k = params.n_freqs
    k_pad = _round_up(k, TILE_FREQ)
    window = hann_window_periodic(n_fft).astype(np.float64)
    n = np.arange(n_fft)[:, None]
    freqs = np.arange(k)[None, :]
    angle = 2.0 * np.pi * freqs * n / n_fft
    C = np.zeros((n_fft, k_pad), np.float32)
    S = np.zeros((n_fft, k_pad), np.float32)
    C[:, :k] = (np.cos(angle) * window[:, None]).astype(np.float32)
    S[:, :k] = (-np.sin(angle) * window[:, None]).astype(np.float32)
    M = np.zeros((k_pad, params.n_mels), np.float32)
    M[:k] = mel_filterbank(
        k, params.n_mels, params.sample_rate, params.f_min, params.f_max
    )
    return C.astype(jnp.bfloat16), S.astype(jnp.bfloat16), M


def _kernel(
    frames_ref,  # (TILE_FRAMES, n_fft) bf16
    c_ref,  # (n_fft, TILE_FREQ) bf16
    s_ref,  # (n_fft, TILE_FREQ) bf16
    m_ref,  # (TILE_FREQ, n_mels) f32
    out_ref,  # (TILE_FRAMES, n_mels) f32
    *,
    n_freq_tiles: int,
    log_floor: float,
    clamp_lo: float,
    clamp_hi: float,
    db_mode: bool,
):
    ki = pl.program_id(1)
    frames = frames_ref[:, :]
    a = jnp.dot(frames, c_ref[:, :], preferred_element_type=jnp.float32)
    b = jnp.dot(frames, s_ref[:, :], preferred_element_type=jnp.float32)
    power = a * a + b * b  # (TILE_FRAMES, TILE_FREQ)
    partial = jnp.dot(power, m_ref[:, :], preferred_element_type=jnp.float32)

    @pl.when(ki == 0)
    def _():
        out_ref[:, :] = partial

    @pl.when(ki > 0)
    def _():
        out_ref[:, :] = out_ref[:, :] + partial

    @pl.when(ki == n_freq_tiles - 1)
    def _():
        mel = out_ref[:, :]
        if db_mode:
            out_ref[:, :] = 10.0 * jnp.log(jnp.maximum(mel, log_floor)) / np.log(10.0)
        else:
            logmel = jnp.clip(jnp.log(mel + log_floor), clamp_lo, clamp_hi)
            out_ref[:, :] = (logmel - clamp_lo) / (clamp_hi - clamp_lo)


@functools.partial(jax.jit, static_argnames=("params", "trim", "interpret"))
def pallas_log_mel(
    wave: jnp.ndarray,
    params: MelFrontendParams,
    trim: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, T) waveform -> (B, frames, n_mels) normalized log-mel in [0, 1]."""
    wave = wave.astype(jnp.float32)
    B, T = wave.shape
    n_fft = params.n_fft
    n_frames = params.n_frames(T)

    frames = frame_signal(wave, n_fft, params.hop_length)  # (B, F, n_fft) f32
    frames = frames.reshape(B * n_frames, n_fft).astype(jnp.bfloat16)
    rows_pad = _round_up(B * n_frames, TILE_FRAMES)
    frames = jnp.pad(frames, ((0, rows_pad - frames.shape[0]), (0, 0)))
    n_freq_tiles = _round_up(params.n_freqs, TILE_FREQ) // TILE_FREQ

    C, S, M = (jnp.asarray(x) for x in _constants(params))
    kernel = functools.partial(
        _kernel,
        n_freq_tiles=n_freq_tiles,
        log_floor=params.log_floor,
        clamp_lo=params.clamp_lo,
        clamp_hi=params.clamp_hi,
        db_mode=params.log_mode == "db",
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows_pad, params.n_mels), jnp.float32),
        grid=(rows_pad // TILE_FRAMES, n_freq_tiles),
        in_specs=[
            pl.BlockSpec(
                (TILE_FRAMES, n_fft), lambda fi, ki: (fi, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_fft, TILE_FREQ), lambda fi, ki: (0, ki), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_fft, TILE_FREQ), lambda fi, ki: (0, ki), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TILE_FREQ, params.n_mels),
                lambda fi, ki: (ki, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (TILE_FRAMES, params.n_mels), lambda fi, ki: (fi, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * n_fft * (2 * n_freq_tiles * TILE_FREQ)
            + 2 * rows_pad * n_freq_tiles * TILE_FREQ * params.n_mels,
            bytes_accessed=rows_pad * n_fft * 2
            + 2 * n_fft * n_freq_tiles * TILE_FREQ * 2
            + rows_pad * params.n_mels * 4,
            transcendentals=rows_pad * params.n_mels,
        ),
        interpret=interpret,
    )(frames, C, S, M)

    out = out[: B * n_frames].reshape(B, n_frames, params.n_mels)
    if trim:
        p = params.window_pad_idxs
        out = out[:, p : out.shape[1] - (p + 1), :]
    return out
