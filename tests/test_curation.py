"""Curation pipeline tests (stub encoder — no CLAP weights needed)."""

import numpy as np
import pytest

from adt_str_tpu.clap.curation import (
    assign_classes,
    convert_augmented_to_hdf5,
    copy_originals_to_augmented,
    curate_library,
    score_to_bin_label,
    sort_paths_by_parent_folder,
)
from adt_str_tpu.synth.bank import load_bank_hdf5
from adt_str_tpu.utils.audio_io import write_wav

SR = 8000


class StubWrapper:
    """Deterministic 'embeddings': 8-dim spectral-band energies, L2-normed."""

    def get_audio_features(self, audios):
        out = []
        for a in audios:
            a = np.asarray(a).reshape(-1)
            spec = np.abs(np.fft.rfft(a, n=256))
            bands = spec[: 256 // 2].reshape(8, -1).sum(axis=1)
            out.append(bands / (np.linalg.norm(bands) + 1e-8))
        return np.stack(out)


def tone(freq, sec=0.2, sr=SR):
    t = np.arange(int(sec * sr)) / sr
    return (0.8 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_score_to_bin_label():
    assert score_to_bin_label(0.95) == "100-90"
    assert score_to_bin_label(0.81) == "100-90"  # pct 91
    assert score_to_bin_label(0.75) == "90-80"
    assert score_to_bin_label(-1.0) == "10-0"
    assert score_to_bin_label(1.0) == "100-90"
    assert score_to_bin_label(0.3, num_bins=5) == "80-60"


def test_sort_paths_by_parent_folder():
    paths = ["/x/40/b.wav", "/x/35/a.wav", "/x/421/c.wav", "/x/misc/d.wav"]
    out = sort_paths_by_parent_folder(paths)
    assert [p.split("/")[2] for p in out] == ["35", "40", "421", "misc"]


def test_assignment_matches_reference_global_sort(rng):
    """argmax-class assignment == the reference's global-descending-sort
    first-occurrence algorithm (augment_data_with_CLAP.py:150-188)."""
    U = rng.normal(size=(50, 16)).astype(np.float32)
    C = rng.normal(size=(5, 16)).astype(np.float32)
    idx, score = assign_classes(U, C)

    # reference algorithm
    u_n = U / np.linalg.norm(U, axis=1, keepdims=True)
    c_n = C / np.linalg.norm(C, axis=1, keepdims=True)
    scores = []
    for ci in range(len(C)):
        sims = u_n @ c_n[ci]
        for si, s in enumerate(sims):
            scores.append((ci, si, float(s)))
    scores.sort(key=lambda x: x[2], reverse=True)
    seen = {}
    for ci, si, s in scores:
        if si not in seen:
            seen[si] = (ci, s)
    ref_idx = np.array([seen[i][0] for i in range(len(U))])
    ref_score = np.array([seen[i][1] for i in range(len(U))])
    np.testing.assert_array_equal(idx, ref_idx)
    np.testing.assert_allclose(score, ref_score, atol=1e-5)


def test_assign_classes_sharded(rng):
    import jax

    from adt_str_tpu.parallel.mesh import make_mesh

    U = rng.normal(size=(37, 8)).astype(np.float32)  # not divisible by 8
    C = rng.normal(size=(3, 8)).astype(np.float32)
    mesh = make_mesh(n_data=8, n_model=1)
    i1, s1 = assign_classes(U, C)
    i2, s2 = assign_classes(U, C, mesh=mesh)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)


@pytest.fixture
def library_tree(tmp_path):
    """Reference tree (two classes: 35 low tone, 42 high tone) + library."""
    ref = tmp_path / "GM_ref"
    for pitch, freq in [(35, 100), (42, 3000)]:
        d = ref / str(pitch)
        d.mkdir(parents=True)
        write_wav(d / f"ref_{pitch}.wav", tone(freq), SR)
    lib = tmp_path / "library"
    lib.mkdir()
    write_wav(lib / "low1.wav", tone(110), SR)
    write_wav(lib / "low2.wav", tone(90), SR)
    write_wav(lib / "high1.wav", tone(2800), SR)
    return ref, lib


def test_curate_library_end_to_end(library_tree, tmp_path):
    ref, lib = library_tree
    out_root = curate_library(
        StubWrapper(), str(lib), str(ref), sample_rate=SR, batch_size=2
    )
    copied = sorted(p.name for p in out_root.rglob("*.wav"))
    assert copied == ["high1.wav", "low1.wav", "low2.wav"]
    # tones land under the matching class
    assert len(list((out_root / "35").rglob("low*.wav"))) == 2
    assert len(list((out_root / "42").rglob("high*.wav"))) == 1

    # gold consolidation
    copy_originals_to_augmented(str(ref), out_root)
    assert (out_root / "35" / "gold" / "ref_35.wav").exists()

    # hdf5 conversion round-trips into the synth bank loader
    h5 = convert_augmented_to_hdf5(out_root, str(tmp_path / "bank"), SR)
    bank = load_bank_hdf5(str(h5), max_len=SR)
    assert set(bank.pitches()) == {35, 42}
    assert bank.bin_count[35, 0] == 1  # gold
    assert bank.bin_count.sum() == 5


def test_curation_robust_to_corrupt_and_stray_files(library_tree, tmp_path):
    """A 1M-sample run must not abort on one bad file: corrupt wavs are
    skipped with a warning, stray dirs in the reference tree are ignored
    before the embedding pass (self-review round 3)."""
    ref, lib = library_tree
    stray = ref / "extra"
    stray.mkdir()
    write_wav(stray / "x.wav", tone(500), SR)
    unknown = ref / "90"  # numeric but not a reference class
    unknown.mkdir()
    write_wav(unknown / "y.wav", tone(500), SR)
    (lib / "corrupt.wav").write_bytes(b"RIFFnotawav" * 3)

    out_root = curate_library(
        StubWrapper(), str(lib), str(ref), sample_rate=SR, batch_size=2
    )
    copied = sorted(p.name for p in out_root.rglob("*.wav"))
    assert "corrupt.wav" not in copied
    assert {"high1.wav", "low1.wav", "low2.wav"} <= set(copied)
    assert not list(out_root.rglob("x.wav")) and not list(out_root.rglob("y.wav"))


def test_encode_files_pads_batches_and_reports_kept(library_tree):
    """Every device batch is padded to a single static batch size (one
    compile) and kept_files carries the skip-aware alignment."""
    from adt_str_tpu.clap.curation import encode_files

    _, lib = library_tree
    seen_sizes = set()

    class SizeSpy(StubWrapper):
        def get_audio_features(self, audios):
            seen_sizes.add(len(audios))
            return super().get_audio_features(audios)

    files = sorted(str(p) for p in lib.glob("*.wav"))  # 3 files, bs=2
    emb, kept = encode_files(SizeSpy(), files, SR, batch_size=2)
    assert seen_sizes == {2}
    assert kept == files
    assert emb.shape[0] == 3
