"""Fused attention kernel (interpret mode) vs the reference XLA attention —
forward values and gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adt_str_tpu.ops.pallas_attention import fused_attention

B, H, T, D = 2, 3, 32, 128


def reference(q, k, v, mask=None):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(D)
    if mask is not None:
        s = s + mask[:, None, :, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("with_mask", [False, True])
def test_forward_matches_reference(with_mask, rng):
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32)) for _ in range(3)
    )
    mask = None
    if with_mask:
        causal = np.triu(np.full((T, T), -1e4, np.float32), k=1)
        mask = jnp.asarray(np.broadcast_to(causal, (B, T, T)).copy())
    out = fused_attention(q, k, v, mask, True)
    ref = reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("with_mask", [False, True])
def test_gradients_match_reference(with_mask, rng):
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32)) for _ in range(3)
    )
    mask = None
    if with_mask:
        causal = np.triu(np.full((T, T), -1e4, np.float32), k=1)
        mask = jnp.asarray(np.broadcast_to(causal, (B, T, T)).copy())

    def loss_fused(q, k, v):
        return (fused_attention(q, k, v, mask, True) ** 2).sum()

    def loss_ref(q, k, v):
        return (reference(q, k, v, mask) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3)


def test_bf16_runs(rng):
    q = jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32)).astype(jnp.bfloat16)
    out = fused_attention(q, q, q, None, True)
    assert out.dtype == jnp.bfloat16
    ref = reference(q.astype(jnp.float32), q.astype(jnp.float32), q.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref), atol=0.05
    )
