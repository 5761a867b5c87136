"""Fused FFN+dropout kernel vs the XLA path (interpret mode, CPU).

The kernel must reproduce `dropout(linear2(dropout(gelu(linear1(x)))))`
with the SAME counter-hash mask stream for the same PRNG keys — values
agree elementwise (not just in distribution), and so do all gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adt_str_tpu.models import transformer as T

D = 384  # % 128 == 0 and 4*D % (3*128) == 0 (ff block divisibility)
B, T_LEN = 2, 57  # N = 114: exercises row padding (not a multiple of 128)
RATE = 0.35


def _setup():
    key = jax.random.PRNGKey(7)
    kp, kx, kh, ko = jax.random.split(key, 4)
    p = T.ffn_init(kp, D, 4 * D)
    x = jax.random.normal(kx, (B, T_LEN, D), jnp.float32)
    return p, x, kh, ko


def _xla_path(p, x, kh, ko):
    ff = T.ffn_forward(p, x, RATE, kh, True)
    return T.dropout(ff, RATE, ko, True)


def _fused_path(p, x, kh, ko):
    return T.ffn_dropout_block(p, x, RATE, kh, ko, interpret=True)


def test_fused_ffn_forward_matches_xla():
    p, x, kh, ko = _setup()
    ref = np.asarray(_xla_path(p, x, kh, ko))
    out = np.asarray(_fused_path(p, x, kh, ko))
    # identical masks -> identical zero pattern
    np.testing.assert_array_equal(out == 0.0, ref == 0.0)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_fused_ffn_grads_match_xla():
    p, x, kh, ko = _setup()

    def loss_ref(p, x):
        return jnp.sum(jnp.sin(_xla_path(p, x, kh, ko)))

    def loss_fused(p, x):
        return jnp.sum(jnp.sin(_fused_path(p, x, kh, ko)))

    gp_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(p, x)
    gp_out, gx_out = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(gx_out, gx_ref, rtol=1e-4, atol=1e-4)
    for name in ("linear1", "linear2"):
        for leaf in ("w", "b"):
            np.testing.assert_allclose(
                gp_out[name][leaf], gp_ref[name][leaf],
                rtol=1e-4, atol=1e-4, err_msg=f"{name}/{leaf}",
            )


def test_fused_ffn_layer_gate():
    """The layer only takes the fused path in training with dropout active
    and block-divisible dims; otherwise behavior is the plain XLA path."""
    p, x, kh, ko = _setup()
    assert T._fused_ffn_ok(x, True, RATE, kh)
    assert not T._fused_ffn_ok(x, False, RATE, kh)
    assert not T._fused_ffn_ok(x, True, 0.0, kh)
    assert not T._fused_ffn_ok(x, True, RATE, None)
    assert not T._fused_ffn_ok(x[..., : D // 2], True, RATE, kh)


@pytest.mark.parametrize("dtype", [jnp.bfloat16])
def test_fused_ffn_bf16_close(dtype):
    """Compute-dtype (bf16) path stays within bf16 tolerance of the XLA
    path (same masks, different rounding points)."""
    p, x, kh, ko = _setup()
    xb = x.astype(dtype)
    ref = np.asarray(_xla_path(p, xb, kh, ko), np.float32)
    out = np.asarray(_fused_path(p, xb, kh, ko), np.float32)
    scale = np.maximum(np.abs(ref), 1.0)
    np.testing.assert_allclose(out / scale, ref / scale, atol=0.06)
