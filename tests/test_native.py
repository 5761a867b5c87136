"""Native C++ extension: build + exact parity with the python fallbacks."""

import numpy as np
import pytest

from adt_str_tpu.config import TokenizerConfig
from adt_str_tpu.domain.tokenizer import MidiTokenizer
from adt_str_tpu.native import build, native

pytestmark = pytest.mark.skipif(native() is None, reason="no C++ toolchain")


def test_builds():
    assert build() is not None


def test_decode_parity_random(rng):
    for adtof in [False, True]:
        tok = MidiTokenizer(TokenizerConfig(ADTOF_mapping=adtof))
        for _ in range(100):
            # random token soup incl. malformed streams
            n = int(rng.integers(1, 60))
            tokens = rng.integers(0, 528, n)
            ours = tok.decode(tokens)
            ref = tok._decode_python(tokens)
            assert ours.shape == ref.shape
            if ours.size:
                np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_decode_parity_wellformed(rng):
    tok = MidiTokenizer(TokenizerConfig(add_velocity=True))
    notes = np.array([[0.5, 0.6, 38, 90], [1.0, 1.1, 42, 60]], dtype=np.float32)
    tokens = tok.notes_to_adt_tokens(notes)
    np.testing.assert_allclose(tok.decode(tokens), tok._decode_python(tokens))


def test_match_parity_cardinality(rng):
    from adt_str_tpu.ops.matching import hopcroft_karp, match_notes

    mod = native()
    for _ in range(50):
        nr, ne = int(rng.integers(0, 30)), int(rng.integers(0, 30))
        ref_on = np.sort(rng.uniform(0, 3, nr))
        est_on = np.sort(rng.uniform(0, 3, ne))
        ref_pi = rng.choice([35, 38, 42, 48], nr) * 1000.0
        est_pi = rng.choice([35, 38, 42, 48], ne) * 1000.0
        ref_iv = np.stack([ref_on, ref_on + 0.1], axis=1) if nr else np.zeros((0, 2))
        est_iv = np.stack([est_on, est_on + 0.1], axis=1) if ne else np.zeros((0, 2))

        got = match_notes(ref_iv, ref_pi, est_iv, est_pi,
                          onset_tolerance=0.05, pitch_tolerance=1.0)
        # python oracle
        onset_ok = np.abs(ref_on[:, None] - est_on[None, :]) <= 0.05 if nr and ne else np.zeros((nr, ne), bool)
        with np.errstate(divide="ignore", invalid="ignore"):
            cents = 1200 * np.abs(np.log2(est_pi[None, :] / ref_pi[:, None])) if nr and ne else np.zeros((nr, ne))
        feasible = onset_ok & (cents <= 1.0)
        adj = [np.where(row)[0].tolist() for row in feasible]
        oracle = hopcroft_karp(adj, ne)
        assert len(got) == len(oracle)
        # every returned pair is feasible
        for a, b in got:
            assert feasible[a, b]


def test_match_nan_pitch_ratio_rejected():
    """A 0/0 pitch ratio gives NaN cents: mir_eval's `cents <= tol` rejects
    the pair. The native path must agree (a bare `cents > tol` is false for
    NaN and silently kept the pair — regression, self-review round 3)."""
    from adt_str_tpu.ops.matching import match_notes

    ref_iv = np.array([[0.0, 0.1]])
    est_iv = np.array([[0.01, 0.11]])
    zero = np.array([0.0])
    got = match_notes(ref_iv, zero, est_iv, zero,
                      onset_tolerance=0.05, pitch_tolerance=1.0)
    assert got == []
    mod = native()
    if mod is not None:
        got_native = mod.match_notes(
            ref_iv[:, 0], zero, est_iv[:, 0], zero, 0.05, 1.0
        )
        assert list(got_native) == []


def test_match_exact_tolerance_boundary_matches():
    """A 0.05 s onset delta computed as 0.05000000000000004 in fp64 must still
    match at onset_tolerance=0.05: mir_eval rounds distances to 12 decimals
    before comparing, and the token grid makes exact-tolerance deltas common
    (self-review round 3)."""
    from adt_str_tpu.ops.matching import match_notes

    ref_iv = np.array([[0.6, 0.7]])
    est_iv = np.array([[0.65, 0.75]])
    pi = np.array([38000.0])
    assert (0.65 - 0.6) > 0.05  # the fp64 artifact this guards against
    got = match_notes(ref_iv, pi, est_iv, pi, onset_tolerance=0.05, pitch_tolerance=1.0)
    assert got == [(0, 0)]
    mod = native()
    if mod is not None:
        got_native = mod.match_notes(ref_iv[:, 0], pi, est_iv[:, 0], pi, 0.05, 1.0)
        assert [tuple(p) for p in got_native] == [(0, 0)]
    # numpy fallback agrees (force it via the offset_ratio branch guard)
    got_np = match_notes(ref_iv, pi, est_iv, pi, onset_tolerance=0.05,
                         pitch_tolerance=1.0, offset_ratio=10.0)
    assert got_np == [(0, 0)]
