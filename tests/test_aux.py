"""Aux-subsystem tests: preview renderer, hdf5 inspector, misc utils,
youtube-pipeline helpers."""

import numpy as np

from adt_str_tpu.utils import misc
from adt_str_tpu.utils.audio_io import read_wav, write_wav
from adt_str_tpu.utils.drum_render import (
    render_drum_preview,
    synthesize_drums_procedural,
    velocity_to_midi,
)
from adt_str_tpu.utils.inspect_hdf5 import build_group_tree
from adt_str_tpu.utils.midi_io import read_midi

SR = 8000


def test_velocity_to_midi():
    assert velocity_to_midi(0.5) == 64
    assert velocity_to_midi(100) == 100
    assert velocity_to_midi(0.0) == 1
    assert velocity_to_midi(300) == 127


def test_preview_render_with_bank(tmp_path):
    bank = tmp_path / "bank"
    (bank / "38").mkdir(parents=True)
    t = np.arange(SR // 4) / SR
    shot = (np.exp(-t * 20) * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    write_wav(bank / "38" / "snare.wav", shot, SR)

    notes = np.array([[0.1, 0.2, 38, 100], [0.5, 0.6, 99, 100]], dtype=np.float32)
    midi_path = tmp_path / "out.mid"
    wav, mode = render_drum_preview(
        notes, num_samples=SR, sample_rate=SR, midi_path=midi_path, bank_dir=str(bank)
    )
    assert mode == "oneshot"
    assert np.abs(wav).max() <= 0.98 + 1e-6
    # the known pitch rendered, the unknown pitch was silent
    assert np.abs(wav[int(0.1 * SR) : int(0.3 * SR)]).max() > 0
    assert np.abs(wav[int(0.55 * SR) :]).max() == 0
    # MIDI written and parseable
    inst = read_midi(midi_path)[0]
    assert inst.is_drum and len(inst.notes) == 2


def test_missing_bank_is_silent(tmp_path):
    notes = np.array([[0.0, 0.1, 38, 100]], dtype=np.float32)
    wav = synthesize_drums_procedural(notes, SR, SR, bank_dir=str(tmp_path / "nope"))
    assert (wav == 0).all()


def test_inspect_hdf5_tree(tmp_path):
    import h5py

    path = tmp_path / "t.h5"
    with h5py.File(path, "w") as f:
        f.create_dataset("38/gold/a", data=np.zeros(4))
        f.create_dataset("38/gold/b", data=np.zeros(4))
        f.create_dataset("42/gold/c", data=np.zeros(4))
    with h5py.File(path, "r") as f:
        tree = build_group_tree(f)
    assert tree["_datasets"] == 3
    assert tree["_children"]["38"]["_datasets"] == 2


def test_misc_utils():
    assert misc.file_shuffle(["b", "a", "c"], seed_fix=True) == misc.file_shuffle(
        ["c", "a", "b"], seed_fix=True
    )
    a, b = misc.pad_arrays(np.ones(3), np.ones(5))
    assert len(a) == len(b) == 5
    assert misc.my_vstack([], np.ones((2, 2))).shape == (2, 2)
    oh = misc.create_one_hot(4, 2)
    assert oh.tolist() == [0, 0, 1, 0]


def test_youtube_pipeline_helpers():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from youtube_drum_pipeline import chunk_audio, remap_notes_for_synth

    wav = np.ones(2500, dtype=np.float32)
    pairs = chunk_audio(wav, 1000)
    assert [s for s, _, _ in pairs] == [0, 1000, 2000]
    assert all(len(c) == 1000 for _, c, _ in pairs)
    # true (pre-pad) lengths drive the min_audio_samples skip
    assert [t for _, _, t in pairs] == [1000, 1000, 500]
    # overlap hop
    pairs = chunk_audio(wav, 1000, 500)
    assert [s for s, _, _ in pairs][:3] == [0, 500, 1000]

    rng = np.random.default_rng(0)
    notes = np.array([[0.0, 0.1, 42, 100], [0.2, 0.3, 61, 90]], dtype=np.float32)
    out = remap_notes_for_synth(notes, adtof=True, rng=rng)
    # HH class maps to one of its members; 61 ("Other") members are 53-60 so it
    # stays only if within 35-60
    assert (out[:, 2] >= 35).all() and (out[:, 2] <= 60).all()


def test_read_midi_overlapping_same_pitch_note_ons(tmp_path):
    """Two note-ons of one pitch before a single note-off: both notes are
    kept and both end at the off tick (pretty_midi semantics; a single-slot
    tracker dropped the first drum hit — self-review round 3)."""
    import struct

    track = bytes(
        [0x00, 0x99, 38, 100,   # t=0     ch9 on  pitch38 vel100
         0x3C, 0x99, 38, 80,    # t=60    second on, same pitch
         0x3C, 0x89, 38, 0,     # t=120   one off
         0x00, 0xFF, 0x2F, 0x00]
    )
    data = (
        b"MThd" + struct.pack(">IHHH", 6, 0, 1, 480)
        + b"MTrk" + struct.pack(">I", len(track)) + track
    )
    path = tmp_path / "overlap.mid"
    path.write_bytes(data)
    inst = read_midi(path)[0]
    assert inst.is_drum
    notes = sorted((round(n[0], 4), round(n[1], 4), n[2], n[3]) for n in inst.notes)
    # 480 tpb at default 500000 us/beat: tick 60 = 0.0625 s, tick 120 = 0.125 s
    assert notes == [(0.0, 0.125, 38.0, 100.0), (0.0625, 0.125, 38.0, 80.0)]


def test_read_midi_zero_length_hits_discarded(tmp_path):
    """pretty_midi deletes the tracking key when a note-off lands exactly on
    every open note's start tick: the zero-length hit is discarded and a
    later redundant off must NOT materialize a phantom note."""
    import struct

    track = bytes(
        [0x00, 0x99, 38, 100,   # t=0    on
         0x00, 0x89, 38, 0,     # t=0    off at the same tick: discard
         0x3C, 0x89, 38, 0,     # t=60   redundant off: no phantom note
         0x00, 0xFF, 0x2F, 0x00]
    )
    data = (
        b"MThd" + struct.pack(">IHHH", 6, 0, 1, 480)
        + b"MTrk" + struct.pack(">I", len(track)) + track
    )
    path = tmp_path / "zerolen.mid"
    path.write_bytes(data)
    assert read_midi(path) == []
