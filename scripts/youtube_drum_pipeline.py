"""End-to-end demo: YouTube (or local audio) -> Demucs drums stem -> ADT
transcription -> MIDI + resynthesized preview.

Parity with the reference `scripts/youtube_drum_pipeline.py:278-406`:
yt-dlp download (subprocess), Demucs separation (subprocess), chunked model
inference with optional overlap hop, ADTOF<->GM note remapping, validity
filter (35 <= pitch <= 60 after inverse mapping), MIDI export and one-shot
preview rendering.

TPU redesign: every chunk decodes in one batched KV-cache decode call instead
of the reference's per-chunk Python loop.

Usage:
  python scripts/youtube_drum_pipeline.py --url <youtube-url> --config cfg.yaml
  python scripts/youtube_drum_pipeline.py --input-audio song.wav --config cfg.yaml
"""

from __future__ import annotations

import argparse
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from adt_str_tpu.utils.misc import pin_jax_platform_from_env

pin_jax_platform_from_env()

from adt_str_tpu.config import FrameworkConfig
from adt_str_tpu.domain.tokenizer import MidiTokenizer
from adt_str_tpu.evaluation.harness import decode_tokens_to_notes
from adt_str_tpu.utils.audio_io import load_and_resample, normalize, write_wav
from adt_str_tpu.utils.mappings import (
    ADTOF_INVERSE_MAPPING,
    GM_CUSTOM_TO_GM_STANDARD,
)


def download_youtube(url: str, out_dir: Path) -> Path:
    """yt-dlp -> wav (subprocess; yt-dlp must be installed)."""
    if shutil.which("yt-dlp") is None:
        raise RuntimeError("yt-dlp not found — install it or pass --input-audio")
    out_dir.mkdir(parents=True, exist_ok=True)
    template = str(out_dir / "%(id)s.%(ext)s")
    subprocess.run(
        ["yt-dlp", "-x", "--audio-format", "wav", "-o", template, url],
        check=True,
    )
    wavs = sorted(out_dir.glob("*.wav"), key=lambda p: p.stat().st_mtime)
    if not wavs:
        raise FileNotFoundError(f"No WAV produced in {out_dir}")
    return wavs[-1]


def chunk_audio(wav: np.ndarray, chunk_samples: int, hop_samples: int | None = None):
    """(start, chunk, true_len) triples with overlap support
    (youtube_drum_pipeline.py:93-112); delegates to the canonical chunker.
    `true_len` is the unpadded sample count — the reference's
    `min_audio_samples` skip tests `numel()` AFTER zero-padding (`:136`,
    always chunk_samples, dead code); the pre-pad length makes its evident
    intent implementable."""
    from adt_str_tpu.domain.segmenter import chunk_wave

    return chunk_wave(wav, chunk_samples, hop_samples)


def run_model_on_chunks(
    params, cfg: FrameworkConfig, tokenizer: MidiTokenizer, wav: np.ndarray,
    hop_sec: float | None = None, min_audio_samples: int = 1024,
) -> np.ndarray:
    import jax.numpy as jnp

    from adt_str_tpu.models import decode as decode_lib

    sr = cfg.shared.sample_rate
    chunk_samples = cfg.shared.chunk_samples
    hop_samples = int(hop_sec * sr) if hop_sec else None
    # skip stub tail chunks with almost no real audio (reference intent;
    # its own check ran on the post-pad length and could never fire)
    pairs = [
        (s, c) for s, c, true_len in chunk_audio(wav, chunk_samples, hop_samples)
        if true_len >= min_audio_samples
    ]
    if not pairs:
        return np.zeros((0, 4), dtype=np.float32)
    starts = np.array([s for s, _ in pairs])
    chunks = np.stack([c for _, c in pairs]).astype(np.float32)

    if cfg.inference.use_beam_search:
        tokens = decode_lib.beam_search_decode(
            params, jnp.asarray(chunks), cfg.model,
            beam_size=cfg.inference.beam_size, max_length=int(cfg.inference.max_length),
            start_token=tokenizer.BOS_token, end_token=tokenizer.EOS_token,
        )
    else:
        tokens = decode_lib.greedy_decode(
            params, jnp.asarray(chunks), cfg.model,
            max_length=int(cfg.inference.max_length),
            start_token=tokenizer.BOS_token, end_token=tokenizer.EOS_token,
        )
    tokens = np.asarray(tokens)
    all_notes = []
    for i, start in enumerate(starts):
        notes = decode_tokens_to_notes(tokenizer, tokens[i])
        if len(notes):
            notes[:, 0:2] += start / sr
            all_notes.append(notes)
    from adt_str_tpu.evaluation.harness import merge_chunk_notes

    # snap under hop: the reference's own overlap dedup leaks fp32-ulp
    # duplicates (youtube_drum_pipeline.py:160-176; see merge_chunk_notes)
    return merge_chunk_notes(all_notes, snap_to_grid=hop_samples is not None)


def remap_notes_for_synth(notes: np.ndarray, adtof: bool, rng: np.random.Generator) -> np.ndarray:
    """ADTOF class -> random member GM-custom pitch; validity filter 35-60
    (youtube_drum_pipeline.py:180-214)."""
    if len(notes) == 0:
        return notes
    notes = notes.copy()
    if adtof:
        pitches = []
        for p in notes[:, 2].astype(int):
            members = ADTOF_INVERSE_MAPPING.get(p, [p])
            pitches.append(int(rng.choice(members)))
        notes[:, 2] = pitches
    keep = (notes[:, 2] >= 35) & (notes[:, 2] <= 60)
    return notes[keep]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--url", type=str, default=None)
    parser.add_argument("--input-audio", type=str, default=None)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--output-dir", type=str, default="youtube_pipeline_output")
    parser.add_argument("--hop-sec", type=float, default=None)
    parser.add_argument("--skip-demucs", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    if not args.url and not args.input_audio:
        parser.error("one of --url / --input-audio is required")

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    cfg = FrameworkConfig.from_yaml(args.config)
    from adt_str_tpu.training.checkpoint import load_params_from_reference_checkpoint

    params = load_params_from_reference_checkpoint(cfg.inference.checkpoint_path)
    tokenizer = MidiTokenizer(cfg.tokenizer)

    audio_path = Path(args.input_audio) if args.input_audio else download_youtube(args.url, out_dir)
    if not args.skip_demucs:
        from adt_str_tpu.data.demucs_separate import separate_drums

        [audio_path] = separate_drums([str(audio_path)], str(out_dir / "demucs"))

    wav = normalize(load_and_resample(audio_path, cfg.shared.sample_rate))
    notes = run_model_on_chunks(params, cfg, tokenizer, wav, hop_sec=args.hop_sec)
    print(f"Transcribed {len(notes)} notes")

    synth_notes = remap_notes_for_synth(notes, cfg.tokenizer.ADTOF_mapping, rng)
    from adt_str_tpu.utils.drum_render import render_drum_preview

    preview, _ = render_drum_preview(
        synth_notes,
        num_samples=len(wav),
        sample_rate=cfg.shared.sample_rate,
        midi_path=out_dir / "predicted_drums.mid",
    )
    write_wav(out_dir / "synthesized_drums.wav", preview, cfg.shared.sample_rate)
    print(f"Wrote {out_dir/'predicted_drums.mid'} and {out_dir/'synthesized_drums.wav'}")


if __name__ == "__main__":
    main()
