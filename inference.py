"""Single-file transcription CLI:
`python inference.py <audio> <config.yaml> [-o outdir] [-s]`.

Same contract as the reference (`inference.py:51-153`): load audio, resample
to the configured rate, mono-mix, split into `input_sec` chunks (zero-padded
tail), greedy-decode each chunk, shift note times by chunk start, dedup, write
a MIDI file; `-s` resynthesizes the transcription through the drum
synthesizer.

TPU redesign: all chunks decode in ONE batched call (the reference loops
chunk-by-chunk, inference.py:103-120) and MIDI export uses the framework's own
SMF writer (the reference's `pretty_midi.PrettyMidi` call is a typo that
crashes at runtime, inference.py:16 — documented divergence).
"""

import argparse
import os
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from adt_str_tpu.utils.misc import pin_jax_platform_from_env

pin_jax_platform_from_env()

from adt_str_tpu.config import FrameworkConfig
from adt_str_tpu.domain.tokenizer import MidiTokenizer
from adt_str_tpu.evaluation.harness import decode_tokens_to_notes, merge_chunk_notes
from adt_str_tpu.models import decode as decode_lib
from adt_str_tpu.training.checkpoint import load_params_from_reference_checkpoint
from adt_str_tpu.utils.audio_io import load_and_resample, write_wav
from adt_str_tpu.utils.midi_io import write_midi


def chunk_audio(wave: np.ndarray, chunk_samples: int) -> tuple[np.ndarray, np.ndarray]:
    """1-D wave -> (chunks (N, chunk_samples) zero-padded, start_samples (N,));
    thin view over the canonical chunker (domain.segmenter.chunk_wave)."""
    from adt_str_tpu.domain.segmenter import chunk_wave

    triples = chunk_wave(wave, chunk_samples)
    chunks = np.stack([c for _, c, _ in triples])
    starts = np.array([s for s, _, _ in triples])
    return chunks, starts


def transcribe(
    params, cfg: FrameworkConfig, wave: np.ndarray, tokenizer: MidiTokenizer,
    mesh=None, hop_sec: float | None = None,
) -> np.ndarray:
    """Chunked greedy transcription; with `mesh`, the chunks decode
    data-parallel across the mesh's data axis (the reference's long-audio
    strategy is sequential per-chunk decoding on one device,
    inference.py:98-120).

    `hop_sec` < input_sec gives overlapping chunks (framework addition; the
    reference's single-file CLI has no hop, its youtube pipeline does):
    notes near a chunk boundary are seen by a chunk that does not cut them.
    Use a multiple of the 10 ms token grid so overlap duplicates land on the
    same global grid and the row-level dedup removes them."""
    if hop_sec:
        from adt_str_tpu.domain.segmenter import chunk_wave

        triples = chunk_wave(wave, cfg.shared.chunk_samples,
                             int(hop_sec * cfg.shared.sample_rate))
        chunks = np.stack([c for _, c, _ in triples])
        starts = np.array([s for s, _, _ in triples])
    else:
        chunks, starts = chunk_audio(wave, cfg.shared.chunk_samples)
    n_real = len(chunks)
    wavs_dev = jnp.asarray(chunks)
    if mesh is not None:
        import jax

        from adt_str_tpu.parallel import mesh as mesh_lib

        n_data = mesh.shape[mesh_lib.DATA_AXIS]
        pad = (-n_real) % n_data
        if pad:
            chunks = np.concatenate(
                [chunks, np.zeros((pad, chunks.shape[1]), np.float32)]
            )
        wavs_dev = jax.device_put(
            jnp.asarray(chunks), mesh_lib.batch_sharding(mesh)
        )
        params = mesh_lib.shard_params(mesh, params)
        # shard_map'd decoder: each device decodes its own chunk rows
        # (models/decode.py "mesh decode")
        tokens = decode_lib.greedy_decode_sharded(
            params, wavs_dev, cfg.model, mesh,
            max_length=int(cfg.inference.max_length),
            start_token=tokenizer.BOS_token,
            end_token=tokenizer.EOS_token,
        )
    else:
        tokens = decode_lib.greedy_decode(
            params,
            wavs_dev,
            cfg.model,
            max_length=int(cfg.inference.max_length),
            start_token=tokenizer.BOS_token,
            end_token=tokenizer.EOS_token,
        )
    tokens = np.asarray(tokens)[:n_real]
    all_notes = []
    for i, start in enumerate(starts):
        notes = decode_tokens_to_notes(tokenizer, tokens[i])
        if len(notes):
            notes[:, 0:2] += start / cfg.shared.sample_rate
            all_notes.append(notes)
    return merge_chunk_notes(all_notes, snap_to_grid=hop_sec is not None)


def main() -> None:
    parser = argparse.ArgumentParser(description="ADT inference")
    parser.add_argument("input_path", type=str)
    parser.add_argument("config_path", type=str)
    parser.add_argument("-o", "--output_path", type=str, default="outputs/")
    parser.add_argument("-s", "--synthetise_transcription", action="store_true")
    parser.add_argument(
        "--hop_sec", type=float, default=None,
        help="overlap hop in seconds (< input_sec): boundary notes are seen "
        "by an uncut chunk; use a multiple of 0.01 so duplicates dedup",
    )
    args = parser.parse_args()

    os.makedirs(args.output_path, exist_ok=True)
    input_stem = Path(args.input_path).stem

    cfg = FrameworkConfig.from_yaml(args.config_path)
    # validate everything the run needs BEFORE the (possibly minutes-long)
    # transcription: a missing section must not surface as an AttributeError
    # at the end of the pipeline
    if cfg.inference is None or not cfg.inference.checkpoint_path:
        raise SystemExit(
            "config needs an `inference:` section with `checkpoint_path` set"
        )
    if args.synthetise_transcription and cfg.synthetiser is None:
        raise SystemExit(
            "-s/--synthetise_transcription needs a `synthetiser:` section "
            "(oneshot_path etc.) in the config"
        )
    params = load_params_from_reference_checkpoint(cfg.inference.checkpoint_path)
    tokenizer = MidiTokenizer(cfg.tokenizer)

    print(f"Loading audio: {args.input_path}")
    wave = load_and_resample(args.input_path, cfg.shared.sample_rate)
    import jax

    from adt_str_tpu.parallel import mesh as mesh_lib

    mesh = None
    if len(jax.devices()) > 1:
        mesh = mesh_lib.make_mesh(n_data=len(jax.devices()), n_model=1)
        print(f"Decoding chunks over {len(jax.devices())} devices")
    notes = transcribe(params, cfg, wave, tokenizer, mesh=mesh, hop_sec=args.hop_sec)

    midi_path = os.path.join(args.output_path, f"{input_stem}.mid")
    write_midi(midi_path, notes, is_drum=True)
    print(f"Transcription saved to: {midi_path} ({len(notes)} notes)")

    if args.synthetise_transcription and len(notes):
        import jax

        from adt_str_tpu.synth.bank import load_bank_hdf5, n_allowed_bins
        from adt_str_tpu.synth.render import SynthStatics, pad_notes, render_batch

        print("Synthesizing transcription...")
        synth = cfg.synthetiser
        bank_path = f"{synth.oneshot_path}@{synth.sample_rate}.hdf5"
        bank = load_bank_hdf5(
            bank_path, int(synth.max_oneshot_sec * synth.sample_rate),
            n_allowed_bins=n_allowed_bins(synth.similarity_threshold),
        )
        statics = SynthStatics.from_bank(bank)
        # render chunk-by-chunk on the input_sec grid
        from adt_str_tpu.domain.segmenter import Segmenter

        seg = Segmenter(cfg.shared)
        chunks = seg.chunk_notes(notes)
        padded, masks = zip(*(pad_notes(c, synth.max_notes) for c in chunks))
        keys = jax.random.split(jax.random.PRNGKey(0), len(chunks))
        wavs = np.asarray(
            render_batch(
                statics, jnp.asarray(np.stack(padded)), jnp.asarray(np.stack(masks)),
                keys, synth,
            )
        )
        resynth = wavs.reshape(-1)
        out = os.path.join(args.output_path, f"{input_stem}_resynth.wav")
        write_wav(out, resynth, synth.sample_rate)
        print(f"Resynthesized audio saved to: {out}")


if __name__ == "__main__":
    main()
