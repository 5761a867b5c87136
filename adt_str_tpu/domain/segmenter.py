"""Canonical audio/note chunker.

The reference carries three chunker implementations
(`modules/segmenter.py:11-45`, `inference.py:35-48`,
`scripts/youtube_drum_pipeline.py:93-112`); this is the single canonical one,
vectorized, preserving the reference's data semantics:

- notes whose onset and offset land in *different* chunks are dropped
  (`modules/segmenter.py:23,42` — `if on_idx == off_idx`), keeping dataset
  parity with reference-built shards;
- onset/offset are re-based modulo the chunk length;
- audio chunking pads the final chunk with zeros (inference convention,
  `inference.py:42-46`) or leaves it ragged (preprocessing convention,
  `modules/segmenter.py:29` `tensor.split`), selected by `pad_tail`;
- `chunk_audio_and_notes` raises when annotations extend past the audio
  (`modules/segmenter.py:38-41`).
"""

from __future__ import annotations

import numpy as np

from adt_str_tpu.config import SharedConfig


class Segmenter:
    def __init__(self, config: SharedConfig):
        self.config = config

    def _assign(self, notes: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Per-note chunk index + re-based [onset, offset, pitch, vel] rows,
        keeping only notes fully inside one chunk."""
        sec = self.config.input_sec
        onset, offset = notes[:, 0], notes[:, 1]
        on_idx = (onset // sec).astype(np.int64)
        off_idx = (offset // sec).astype(np.int64)
        keep = on_idx == off_idx
        rebased = notes.copy()
        rebased[:, 0] = onset % sec
        rebased[:, 1] = offset % sec
        return on_idx, keep, rebased

    def chunk_notes(self, notes: np.ndarray) -> list[np.ndarray]:
        """Split a note list into `input_sec` chunks (`modules/segmenter.py:11-25`).

        Chunk count is `max_offset // input_sec + 1`, matching the reference's
        mock-audio length derivation.
        """
        notes = np.asarray(notes, dtype=np.float32)
        n_chunks = int(notes[:, 1].max() // self.config.input_sec) + 1
        on_idx, keep, rebased = self._assign(notes)
        return [
            rebased[keep & (on_idx == c)].reshape(-1, 4) for c in range(n_chunks)
        ]

    def chunk_audio_and_notes(
        self,
        audio: np.ndarray,
        notes: np.ndarray,
        pad_tail: bool = False,
    ) -> tuple[list[np.ndarray], list[np.ndarray]]:
        """Split 1-D audio + notes into aligned chunks (`modules/segmenter.py:27-45`)."""
        audio = np.asarray(audio)
        assert audio.ndim == 1, "audio must be a 1D array"
        samples = self.config.chunk_samples
        n_chunks = max(1, -(-len(audio) // samples))
        audio_chunks = []
        for c in range(n_chunks):
            chunk = audio[c * samples : (c + 1) * samples]
            if pad_tail and len(chunk) < samples:
                chunk = np.pad(chunk, (0, samples - len(chunk)))
            audio_chunks.append(chunk)

        notes = np.asarray(notes, dtype=np.float32).reshape(-1, 4)
        notes_chunks: list[np.ndarray] = [
            np.zeros((0, 4), dtype=np.float32) for _ in range(n_chunks)
        ]
        if len(notes):
            on_idx, keep, rebased = self._assign(notes)
            if on_idx.max(initial=0) > n_chunks - 1:
                raise ValueError(
                    f"onset index {int(on_idx.max())} exceeds number of chunks "
                    f"{n_chunks}: annotations are not consistent with the audio length."
                )
            for c in range(n_chunks):
                notes_chunks[c] = rebased[keep & (on_idx == c)].reshape(-1, 4)
        return audio_chunks, notes_chunks


def chunk_wave(
    wave: np.ndarray, chunk_samples: int, hop_samples: int | None = None
) -> list[tuple[int, np.ndarray, int]]:
    """1-D wave -> [(start_sample, chunk, true_len)] — the one audio-only
    chunker behind `inference.py:transcribe` and the YouTube pipeline.

    Every chunk is zero-padded to `chunk_samples` (inference convention,
    reference `inference.py:42-46`); `hop_samples` < `chunk_samples` gives
    overlapping chunks (reference `youtube_drum_pipeline.py:93-112`);
    `true_len` is the pre-pad sample count so callers can skip stub tails.
    An empty wave yields one silent chunk (a transcription request always
    decodes at least once)."""
    wave = np.asarray(wave, dtype=np.float32).reshape(-1)
    hop = hop_samples or chunk_samples
    out: list[tuple[int, np.ndarray, int]] = []
    start = 0
    n = len(wave)
    while start < n:
        piece = wave[start : start + chunk_samples]
        true_len = len(piece)
        if true_len < chunk_samples:
            piece = np.pad(piece, (0, chunk_samples - true_len))
        out.append((start, piece, true_len))
        start += hop
    if not out:
        out.append((0, np.zeros(chunk_samples, np.float32), 0))
    return out
