"""Tokenizer unit + property tests (encode/decode round-trip on the 10 ms grid)."""

import numpy as np
import pytest

from adt_str_tpu.config import TokenizerConfig
from adt_str_tpu.domain.tokenizer import MidiTokenizer


def make_tok(**kw):
    return MidiTokenizer(TokenizerConfig(**kw))


def test_vocab_layout_simple_encode():
    tok = make_tok(add_velocity=True)
    notes = np.array([[0.0, 0.1, 38, 100], [1.23, 1.33, 42, 64]], dtype=np.float32)
    tokens = tok.notes_to_adt_tokens(notes)
    # BOS, t0=4, p=338, v=500, t=127, p=342, v=464, EOS
    assert tokens.tolist() == [2, 4, 338, 500, 127, 342, 464, 3]


def test_encode_without_velocity():
    tok = make_tok(add_velocity=False)
    notes = np.array([[0.5, 0.6, 35, 90]], dtype=np.float32)
    assert tok.notes_to_adt_tokens(notes).tolist() == [2, 54, 335, 3]


def test_empty_tokens():
    tok = make_tok()
    assert tok.empty_adt_tokens().tolist() == [2, 0, 3]


def test_time_token_range_assert():
    tok = make_tok()
    notes = np.array([[3.0, 3.1, 38, 100]], dtype=np.float32)
    with pytest.raises(AssertionError):
        tok.notes_to_adt_tokens(notes)


def test_roundtrip_property(rng):
    tok = make_tok(add_velocity=True)
    for _ in range(50):
        n = rng.integers(1, 30)
        onsets = np.sort(rng.integers(0, 295, n)) / 100.0
        pitches = rng.integers(35, 61, n)
        vels = rng.integers(1, 127, n)
        notes = np.stack(
            [onsets, onsets + 0.1, pitches, vels], axis=1
        ).astype(np.float32)
        encoded = tok.notes_to_adt_tokens(notes)
        decoded = tok.decode(encoded)
        # Decoded onset tick equals the reference quantization
        # trunc(float32(onset) * 100) exactly (modules/midi_tokenizer.py:54),
        # i.e. within one 10 ms tick of the original float onset.
        expect_ticks = np.trunc(notes[:, 0] * np.float32(100.0)).astype(np.int64)
        np.testing.assert_allclose(decoded[:, 0], expect_ticks / 100.0, atol=1e-6)
        np.testing.assert_allclose(decoded[:, 0], notes[:, 0], atol=0.0100001)
        np.testing.assert_array_equal(decoded[:, 2], notes[:, 2])
        np.testing.assert_array_equal(decoded[:, 3], notes[:, 3])
        np.testing.assert_allclose(decoded[:, 1], decoded[:, 0] + 0.1, atol=1e-6)


def test_roundtrip_no_velocity_defaults_100(rng):
    tok = make_tok(add_velocity=False)
    notes = np.array([[0.11, 0.21, 38, 64], [0.5, 0.6, 42, 80]], dtype=np.float32)
    decoded = tok.decode(tok.notes_to_adt_tokens(notes))
    np.testing.assert_array_equal(decoded[:, 3], [100, 100])


def test_decode_skips_dangling_pitch():
    tok = make_tok()
    # pitch token at position without a preceding time token is dropped
    decoded = tok.decode([2, 338, 3])
    assert decoded.size == 0


def test_decode_truncate_at_eos():
    tok = make_tok()
    t = tok.truncate_at_eos(np.array([2, 4, 338, 3, 7, 340]))
    assert t.tolist() == [2, 4, 338]
    t = tok.truncate_at_eos(np.array([2, 4, 338, 1, 7]))
    assert t.tolist() == [2, 4, 338]


def test_map_notes_gm_custom():
    tok = make_tok(ADTOF_mapping=False)
    notes = np.array(
        [[0, 0.1, 43, 10], [0, 0.1, 57, 10], [0, 0.1, 81, 10]], dtype=np.float32
    )
    mapped = tok.map_notes_to_Gm_custom(notes)
    np.testing.assert_array_equal(mapped[:, 2], [41, 46, 60])


def test_map_notes_adtof():
    tok = make_tok(ADTOF_mapping=True)
    notes = np.array(
        [[0, 0.1, 36, 10], [0, 0.1, 44, 10], [0, 0.1, 49, 10]], dtype=np.float32
    )
    mapped = tok.map_notes_to_Gm_custom(notes)
    # 36->36->BD(35); 44->43(pedal hh)->HH(42); 49->46(crash)->CY+RD(48)
    np.testing.assert_array_equal(mapped[:, 2], [35, 42, 48])


def test_map_notes_invalid_pitch_raises():
    tok = make_tok()
    with pytest.raises(KeyError):
        tok.map_notes_to_Gm_custom(np.array([[0, 0.1, 20, 10]], dtype=np.float32))


def test_random_velocity_range(rng):
    tok = make_tok()
    notes = np.array([[0, 0.1, 38, 5]] * 200, dtype=np.float32)
    mapped = tok.map_notes_to_Gm_custom(notes, random_velocity=True, rng=rng)
    assert mapped[:, 3].min() >= 10 and mapped[:, 3].max() <= 126


def test_encode_padded_static_shape():
    tok = make_tok(add_velocity=True)
    notes = np.array([[0.0, 0.1, 38, 100]], dtype=np.float32)
    tokens, length = tok.encode_padded(notes, max_tokens=16)
    assert tokens.shape == (16,)
    assert length == 5
    assert tokens[:5].tolist() == [2, 4, 338, 500, 3]
    assert (tokens[5:] == 1).all()


def test_encode_padded_overflow_drops_whole_notes():
    tok = make_tok(add_velocity=True)
    n = 20
    notes = np.stack(
        [np.arange(n) / 100, np.arange(n) / 100 + 0.1, np.full(n, 38), np.full(n, 99)],
        axis=1,
    ).astype(np.float32)
    tokens, length = tok.encode_padded(notes, max_tokens=17)
    # (17-2)//3 = 5 notes -> 1 + 15 + 1 = 17 tokens
    assert length == 17
    assert tokens[-1] == 3
    decoded = tok.decode(tokens[:length])
    assert decoded.shape[0] == 5
