"""Serving-export tests: the serialized `jax.export` artifact must reproduce
the direct KV-cache greedy decode exactly (tools/export_serving.py; framework
addition — the reference has no deployable artifact, it re-runs torch code,
model.py:260-324)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adt_str_tpu.config import ModelConfig
from adt_str_tpu.models import adt, decode as decode_lib


def tiny_config(**kw):
    defaults = dict(
        sample_rate=4000,
        win_length=256,
        time_res=0.01,
        input_sec=0.64,
        enc_layers=2,
        dec_layers=2,
        nhead=2,
        d_query=16,
        dropout=0.0,
        tgt_vocab_size=40,
        n_mels=16,
        compute_dtype="float32",
        max_positions=64,
    )
    defaults.update(kw)
    return ModelConfig(**defaults)


def _setup():
    cfg = tiny_config()
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    wavs = (rng.normal(size=(3, cfg.chunk_samples)) * 0.1).astype(np.float32)
    return cfg, params, wavs


def test_exported_artifact_round_trip_matches_direct_decode():
    from jax import export as jexport

    from tools.export_serving import build_exported

    cfg, params, wavs = _setup()
    exp = build_exported(params, cfg, max_length=12, batch_size=3)
    rehydrated = jexport.deserialize(exp.serialize())
    got = np.asarray(rehydrated.call(jnp.asarray(wavs)))
    want = np.asarray(decode_lib.greedy_decode(params, wavs, cfg, max_length=12))
    np.testing.assert_array_equal(got, want)
    assert got.shape == (3, 12) and got.dtype == np.int32
    # every row starts at BOS; EOS-filled after finish is the decode contract
    assert (got[:, 0] == 2).all()


@pytest.mark.slow
def test_poly_batch_export_serves_multiple_batch_sizes():
    from jax import export as jexport

    from tools.export_serving import build_exported

    cfg, params, _ = _setup()
    exp = build_exported(params, cfg, max_length=10, batch_size=None)
    rehydrated = jexport.deserialize(exp.serialize())
    rng = np.random.default_rng(2)
    for b in (1, 4):
        wavs = (rng.normal(size=(b, cfg.chunk_samples)) * 0.1).astype(np.float32)
        got = np.asarray(rehydrated.call(jnp.asarray(wavs)))
        want = np.asarray(decode_lib.greedy_decode(params, wavs, cfg, max_length=10))
        np.testing.assert_array_equal(got, want)


def test_artifact_is_standalone_bytes():
    """The serialized blob alone (no params, no model code objects) must be
    callable after deserialization — weights are embedded constants."""
    from jax import export as jexport

    from tools.export_serving import build_exported

    cfg, params, wavs = _setup()
    blob = build_exported(params, cfg, max_length=8, batch_size=3).serialize()
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000
    del params
    rehydrated = jexport.deserialize(bytes(blob))
    out = np.asarray(rehydrated.call(jnp.asarray(wavs)))
    assert out.shape == (3, 8)
