import numpy as np
import pytest

from adt_str_tpu.config import SharedConfig
from adt_str_tpu.domain.segmenter import Segmenter


def make_seg():
    return Segmenter(SharedConfig(input_sec=2.56, sample_rate=24000))


def test_chunk_notes_basic():
    seg = make_seg()
    notes = np.array(
        [
            [0.5, 0.6, 38, 100],
            [2.5, 2.6, 42, 90],  # straddles 2.56 boundary -> dropped
            [3.0, 3.1, 35, 80],
        ],
        dtype=np.float32,
    )
    chunks = seg.chunk_notes(notes)
    assert len(chunks) == 2
    assert chunks[0].shape[0] == 1
    np.testing.assert_allclose(chunks[0][0, :2], [0.5, 0.6], atol=1e-6)
    assert chunks[1].shape[0] == 1
    np.testing.assert_allclose(chunks[1][0, 0], 3.0 % 2.56, atol=1e-5)


def test_chunk_notes_boundary_drop():
    seg = make_seg()
    notes = np.array([[2.55, 2.65, 38, 100]], dtype=np.float32)
    chunks = seg.chunk_notes(notes)
    assert all(c.shape[0] == 0 for c in chunks)


def test_chunk_audio_and_notes():
    seg = make_seg()
    sr = 24000
    audio = np.random.default_rng(0).normal(size=int(5.0 * sr)).astype(np.float32)
    notes = np.array([[0.1, 0.2, 38, 100], [3.0, 3.1, 42, 90]], dtype=np.float32)
    audio_chunks, note_chunks = seg.chunk_audio_and_notes(audio, notes)
    assert len(audio_chunks) == len(note_chunks) == 2
    assert len(audio_chunks[0]) == seg.config.chunk_samples
    assert note_chunks[0].shape[0] == 1 and note_chunks[1].shape[0] == 1


def test_chunk_audio_pad_tail():
    seg = make_seg()
    audio = np.zeros(int(3.0 * 24000), dtype=np.float32)
    audio_chunks, _ = seg.chunk_audio_and_notes(audio, np.zeros((0, 4)), pad_tail=True)
    assert all(len(c) == seg.config.chunk_samples for c in audio_chunks)


def test_annotation_past_audio_raises():
    seg = make_seg()
    audio = np.zeros(int(1.0 * 24000), dtype=np.float32)
    notes = np.array([[5.0, 5.1, 38, 100]], dtype=np.float32)
    with pytest.raises(ValueError):
        seg.chunk_audio_and_notes(audio, notes)


def test_chunk_wave_canonical():
    """chunk_wave is THE audio-only chunker behind inference.py and the
    youtube pipeline: zero-padded chunks, true pre-pad lengths, hop overlap,
    and one silent chunk for empty input."""
    from adt_str_tpu.domain.segmenter import chunk_wave

    wav = np.arange(2500, dtype=np.float32)
    triples = chunk_wave(wav, 1000)
    assert [(s, t) for s, _, t in triples] == [(0, 1000), (1000, 1000), (2000, 500)]
    assert all(len(c) == 1000 for _, c, _ in triples)
    np.testing.assert_array_equal(triples[2][1][500:], 0.0)
    np.testing.assert_array_equal(triples[2][1][:500], wav[2000:])
    # hop overlap
    starts = [s for s, _, _ in chunk_wave(wav, 1000, 500)]
    assert starts == [0, 500, 1000, 1500, 2000]
    # empty input: one silent chunk, true_len 0
    triples = chunk_wave(np.zeros(0, np.float32), 1000)
    assert len(triples) == 1 and triples[0][2] == 0
    np.testing.assert_array_equal(triples[0][1], 0.0)
