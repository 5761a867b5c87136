"""Placement-kernel tests (interpret mode on CPU) vs a numpy oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adt_str_tpu.synth.pallas_place import gather_blend, place_notes


def oracle(blend, slot, onset, gain, chunk):
    B, S, L = blend.shape
    ref = np.zeros((B, chunk + L + 4096), np.float32)
    for b in range(B):
        for n in range(slot.shape[1]):
            if gain[b, n] == 0:
                continue
            o = onset[b, n]
            ref[b, o : o + L] += blend[b, slot[b, n]] * gain[b, n]
    return ref[:, :chunk]


@pytest.mark.parametrize("seed", [0, 1])
def test_place_notes_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    B, S, L, N, C = 2, 4, 256, 11, 1280
    blend = rng.normal(size=(B, S, L)).astype(np.float32)
    slot = rng.integers(0, S, (B, N)).astype(np.int32)
    onset = rng.integers(0, C, (B, N)).astype(np.int32)
    gain = rng.uniform(0.2, 1.0, (B, N)).astype(np.float32)
    gain[0, 3] = 0.0
    out = np.asarray(
        place_notes(
            jnp.asarray(blend), jnp.asarray(slot), jnp.asarray(onset),
            jnp.asarray(gain), C, interpret=True,
        )
    )
    np.testing.assert_allclose(out, oracle(blend, slot, onset, gain, C), atol=1e-5)


def test_place_notes_edges():
    """Onset 0, onset at the last sample (full clip), overlapping notes."""
    B, S, L, C = 1, 1, 128, 512
    blend = np.ones((B, S, L), np.float32)
    slot = np.zeros((B, 3), np.int32)
    onset = np.array([[0, C - 1, 64]], np.int32)
    gain = np.array([[1.0, 2.0, 0.5]], np.float32)
    out = np.asarray(
        place_notes(jnp.asarray(blend), jnp.asarray(slot), jnp.asarray(onset),
                    jnp.asarray(gain), C, interpret=True)
    )
    np.testing.assert_allclose(out, oracle(blend, slot, onset, gain, C), atol=1e-6)
    # the note at C-1 contributes exactly one sample before clipping
    assert out[0, C - 1] == pytest.approx(2.0)
    assert out[0, 0] == pytest.approx(1.0)
    assert out[0, 64] == pytest.approx(1.0 + 0.5)


def test_place_notes_empty():
    out = np.asarray(
        place_notes(
            jnp.zeros((1, 2, 128)), jnp.zeros((1, 4), jnp.int32),
            jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 4)), 256, interpret=True,
        )
    )
    assert (out == 0).all()


@pytest.mark.parametrize(
    "n_rows,n_req,req_tile",
    [
        (37, 13, 8),  # n_req not a multiple of req_tile (padding path)
        (192, 64, 8),  # production-shaped
        (50, 8, 16),  # req_tile > n_req (clamped to n_req)
        (21, 6, 1),  # degenerate one-request tile
    ],
)
def test_gather_blend_matches_oracle(n_rows, n_req, req_tile):
    """The request-tiled bank gather+mixup kernel vs fancy indexing."""
    rng = np.random.default_rng(n_rows + n_req)
    L = 256
    table = rng.normal(size=(n_rows, L)).astype(np.float32)
    im = rng.integers(0, n_rows, n_req).astype(np.int32)
    isub = rng.integers(0, n_rows, n_req).astype(np.int32)
    lam = rng.uniform(0, 0.8, n_req).astype(np.float32)
    out = np.asarray(
        gather_blend(
            jnp.asarray(table), jnp.asarray(im), jnp.asarray(isub),
            jnp.asarray(lam), interpret=True, req_tile=req_tile,
        )
    )
    ref = (1 - lam[:, None]) * table[im] + lam[:, None] * table[isub]
    assert out.shape == (n_req, L)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_place_notes_bf16_stream():
    """bf16 per-note streaming (the TPU production path) stays within bf16
    quantization of the f32 oracle."""
    rng = np.random.default_rng(7)
    B, S, L, N, C = 2, 4, 256, 11, 1280
    blend = rng.normal(size=(B, S, L)).astype(np.float32)
    slot = rng.integers(0, S, (B, N)).astype(np.int32)
    onset = rng.integers(0, C, (B, N)).astype(np.int32)
    gain = rng.uniform(0.2, 1.0, (B, N)).astype(np.float32)
    out = np.asarray(
        place_notes(
            jnp.asarray(blend), jnp.asarray(slot), jnp.asarray(onset),
            jnp.asarray(gain), C, interpret=True, stream_dtype=jnp.bfloat16,
        )
    )
    ref = oracle(blend, slot, onset, gain, C)
    # bf16 has ~2-3 significant decimal digits; contributions accumulate in f32
    np.testing.assert_allclose(out, ref, atol=0.05, rtol=0.02)
    assert np.abs(out - ref).max() > 0  # actually quantized (not silently f32)
