"""On-device synthesizer tests: bank, timbre sampling, rendering, FX."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adt_str_tpu.config import SynthConfig
from adt_str_tpu.synth import fx
from adt_str_tpu.synth.bank import (
    build_bank,
    load_bank_hdf5,
    make_test_bank,
    n_allowed_bins,
    save_bank_hdf5,
)
from adt_str_tpu.synth.render import (
    SynthStatics,
    class_gain_lut,
    pad_notes,
    render_batch,
    render_segment,
    vel_to_vol,
)

SR = 8000
PITCHES = [35, 38, 42, 48]


@pytest.fixture(scope="module")
def bank():
    rng = np.random.default_rng(0)
    return make_test_bank(rng, PITCHES, sample_rate=SR, max_len=SR // 2)


@pytest.fixture(scope="module")
def statics(bank):
    return SynthStatics.from_bank(bank)


def cfg(**kw):
    d = dict(sample_rate=SR, input_sec=1.28, win_length=256, time_res=0.01,
             use_fx_prob=0.0, mixup_range=0.5, similarity_threshold=0.8)
    d.update(kw)
    return SynthConfig(**d)


def test_n_allowed_bins():
    assert n_allowed_bins(1.0) == 1  # gold only
    assert n_allowed_bins(0.9) == 2
    assert n_allowed_bins(0.8) == 3
    assert n_allowed_bins(0.85) == 3  # floored to 0.8
    assert n_allowed_bins(0.0) == 11


def test_vel_to_vol_matches_reference_curve():
    # reference: min 0.1 + 0.9 * (6^(v/127) - 1) / 5; 0 for velocity 0
    assert float(vel_to_vol(0.0)) == 0.0
    np.testing.assert_allclose(float(vel_to_vol(127.0)), 1.0, rtol=1e-6)
    v = 64.0
    expect = 0.1 + 0.9 * (6 ** (v / 127) - 1) / 5
    np.testing.assert_allclose(float(vel_to_vol(v)), expect, rtol=1e-6)


def test_class_gain_lut():
    lut = class_gain_lut()
    assert lut[35] == 1.0  # BD
    assert lut[42] == pytest.approx(0.7)  # HH
    assert lut[48] == pytest.approx(0.7)  # ride -> CY+RD
    assert lut[38] == 1.0  # SD


def test_render_basic(statics):
    c = cfg()
    notes, mask = pad_notes(
        np.array([[0.1, 0.2, 35, 100], [0.5, 0.6, 42, 80]], dtype=np.float32), 16
    )
    wav = render_segment(
        statics, jnp.asarray(notes), jnp.asarray(mask), jax.random.PRNGKey(0),
        chunk_samples=c.chunk_samples, sample_rate=SR,
        mixup_range=0.5, use_fx_prob=0.0, n_allowed=3,
    )
    wav = np.asarray(wav)
    assert wav.shape == (c.chunk_samples,)
    # (near-)silence before the first onset (FFT-conv round-off only),
    # energy after it
    first = int(0.1 * SR)
    assert np.abs(wav[:first]).max() < 1e-6
    assert np.abs(wav[first:]).max() > 0.01
    # peak-normalized to the master gain vel_to_vol(100)
    np.testing.assert_allclose(
        np.abs(wav).max(), float(vel_to_vol(100.0)), rtol=1e-5
    )


def test_render_empty_is_silent(statics):
    c = cfg()
    notes, mask = pad_notes(np.zeros((0, 4), dtype=np.float32), 16)
    wav = np.asarray(
        render_segment(
            statics, jnp.asarray(notes), jnp.asarray(mask), jax.random.PRNGKey(0),
            chunk_samples=c.chunk_samples, sample_rate=SR,
        )
    )
    assert (wav == 0).all()


def test_render_clips_overrun(statics, bank):
    """A note near the end must clip at the segment boundary, not error."""
    c = cfg()
    onset = c.input_sec - 0.05
    notes, mask = pad_notes(
        np.array([[onset, onset + 0.01, 38, 100]], dtype=np.float32), 8
    )
    wav = np.asarray(
        render_segment(
            statics, jnp.asarray(notes), jnp.asarray(mask), jax.random.PRNGKey(1),
            chunk_samples=c.chunk_samples, sample_rate=SR, use_fx_prob=0.0,
        )
    )
    assert wav.shape == (c.chunk_samples,)
    assert np.abs(wav[int(onset * SR) :]).max() > 0


def test_render_batch_shapes(statics):
    c = cfg()
    B = 4
    notes = np.zeros((B, 8, 4), dtype=np.float32)
    mask = np.zeros((B, 8), dtype=bool)
    for i in range(B):
        notes[i, 0] = [0.2, 0.3, 38, 90]
        mask[i, 0] = True
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    wavs = np.asarray(
        render_batch(statics, jnp.asarray(notes), jnp.asarray(mask), keys, c)
    )
    assert wavs.shape == (B, c.chunk_samples)
    assert (np.abs(wavs).max(axis=1) > 0).all()
    # different PRNG keys -> different timbres (not bit-identical rows)
    assert not np.array_equal(wavs[0], wavs[1])


@pytest.mark.slow
def test_render_pallas_interpret_matches_portable_path():
    """The production TPU render INTEGRATION — gather_blend + place_notes
    wiring inside render_batch_arrays (peak-norm folding into gains, slot
    silencing, FX compaction on top) — matches the portable FFT path on
    identical PRNG draws. The kernels have interpret-mode unit tests
    (test_pallas_place.py); this pins the composition, which otherwise only
    runs on the real chip."""
    from adt_str_tpu.synth.render import render_batch_arrays

    rng = np.random.default_rng(3)
    bank = make_test_bank(rng, PITCHES, sample_rate=SR, max_len=512)
    statics = SynthStatics.from_bank(bank)
    B, max_notes, chunk = 4, 24, 1280
    notes = np.zeros((B, max_notes, 4), np.float32)
    mask = np.zeros((B, max_notes), bool)
    for b in range(B):
        n = int(rng.integers(4, max_notes))
        on = np.sort(rng.uniform(0, chunk / SR - 0.07, n)).astype(np.float32)
        notes[b, :n] = np.stack(
            [on, on + 0.05, rng.choice(PITCHES, n), rng.integers(1, 127, n)], 1
        )
        mask[b, :n] = True
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B))
    kw = dict(
        chunk_samples=chunk, sample_rate=SR, mixup_range=0.5,
        use_fx_prob=0.3, n_allowed=3,
    )
    out_xla = render_batch_arrays(
        statics, jnp.asarray(notes), jnp.asarray(mask), keys, pallas="xla", **kw
    )
    out_pl = render_batch_arrays(
        statics, jnp.asarray(notes), jnp.asarray(mask), keys,
        pallas="interpret", **kw
    )
    assert np.abs(np.asarray(out_xla)).max() > 0  # non-trivial render
    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_xla), atol=2e-4, rtol=1e-3
    )


def test_render_pallas_arg_validated():
    from adt_str_tpu.synth.render import render_batch_arrays

    rng = np.random.default_rng(0)
    bank = make_test_bank(rng, PITCHES, sample_rate=SR, max_len=512)
    statics = SynthStatics.from_bank(bank)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(1))
    args = (statics, jnp.zeros((1, 4, 4)), jnp.zeros((1, 4), bool), keys)
    with pytest.raises(ValueError, match="pallas"):
        render_batch_arrays(*args, chunk_samples=1280, sample_rate=SR, pallas="gpu")
    with pytest.raises(ValueError, match="128-aligned"):
        # chunk not 128-aligned: interpret mode refuses instead of silently
        # testing the portable path
        render_batch_arrays(*args, chunk_samples=1000, sample_rate=SR, pallas="interpret")


def test_pad_notes_validates():
    with pytest.raises(ValueError):
        pad_notes(np.array([[0.1, 0.2, 99, 100]], dtype=np.float32), 8)
    with pytest.raises(ValueError):
        pad_notes(np.array([[0.3, 0.1, 38, 100]], dtype=np.float32), 8)


def test_bank_hdf5_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    entries = {
        38: {"gold": [rng.normal(size=100).astype(np.float32)],
             "90-80": [rng.normal(size=50).astype(np.float32)] * 2},
        42: {"gold": [rng.normal(size=80).astype(np.float32)]},
    }
    path = str(tmp_path / "bank@8000.hdf5")
    save_bank_hdf5(path, entries, SR)
    bank = load_bank_hdf5(path, max_len=128)
    assert bank.n_samples == 4
    assert bank.bin_count[38, 0] == 1  # gold
    assert bank.bin_count[38, 2] == 2  # 90-80
    assert bank.bin_count[42, 0] == 1
    assert bank.pitches() == [38, 42]
    np.testing.assert_allclose(
        bank.waveforms[bank.bin_offset[38, 0], :100], entries[38]["gold"][0]
    )


def test_bin_capped_load_renders_identically(tmp_path):
    """Loading only the eligible similarity bins is EXACT: rows in later
    bins can never be drawn when the render's threshold allows at most
    `n_allowed` bins, so the capped bank renders bit-identical audio under
    the same keys (row indices shift; selected waveforms do not)."""
    rng = np.random.default_rng(7)
    entries = {
        p: {
            b: [rng.normal(size=int(rng.integers(64, 256))).astype(np.float32)
                for _ in range(3)]
            for b in ("gold", "100-90", "90-80", "70-60", "30-20", "10-0")
        }
        for p in PITCHES
    }
    path = str(tmp_path / "capbank@8000.hdf5")
    save_bank_hdf5(path, entries, SR)

    n_allowed = n_allowed_bins(0.8)  # 3 bins eligible
    full = load_bank_hdf5(path, max_len=256)
    capped = load_bank_hdf5(path, max_len=256, n_allowed_bins=n_allowed)
    assert capped.loaded_bins == n_allowed
    assert full.loaded_bins == 11
    # 6 bins x 3 waves per pitch in the file; only 3 bins' rows load
    assert full.n_samples == len(PITCHES) * 6 * 3
    assert capped.n_samples == len(PITCHES) * 3 * 3

    notes, mask = pad_notes(
        np.array([[0.05, 0.1, 35, 100], [0.3, 0.4, 42, 80],
                  [0.7, 0.8, 48, 120]], dtype=np.float32), 8
    )
    kw = dict(chunk_samples=cfg().chunk_samples, sample_rate=SR,
              mixup_range=0.5, use_fx_prob=0.0, n_allowed=n_allowed)
    a = np.asarray(render_segment(
        SynthStatics.from_bank(full), jnp.asarray(notes), jnp.asarray(mask),
        jax.random.PRNGKey(3), **kw,
    ))
    b = np.asarray(render_segment(
        SynthStatics.from_bank(capped), jnp.asarray(notes), jnp.asarray(mask),
        jax.random.PRNGKey(3), **kw,
    ))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a).max() > 0  # the comparison is not silence == silence


def test_render_guards_bin_cap_vs_threshold(tmp_path):
    """Rendering with a LOWER similarity_threshold than the bank load was
    capped for must raise, not silently sample empty bins (silence where the
    full bank has one-shots). The guard lives in `check_bins_loaded`, called
    eagerly by `render_batch` and the synth step factories."""
    from adt_str_tpu.config import ModelConfig, SynthConfig
    from adt_str_tpu.parallel.train_step import make_synth_eval_step
    from adt_str_tpu.synth.render import render_batch

    rng = np.random.default_rng(7)
    entries = {
        35: {b: [rng.normal(size=128).astype(np.float32)]
             for b in ("gold", "100-90", "90-80", "70-60")}
    }
    path = str(tmp_path / "guardbank@8000.hdf5")
    save_bank_hdf5(path, entries, SR)
    capped = load_bank_hdf5(path, max_len=256, n_allowed_bins=n_allowed_bins(0.9))
    statics = SynthStatics.from_bank(capped)

    notes, mask = pad_notes(np.array([[0.05, 0.1, 35, 100]], np.float32), 4)
    keys = jax.random.split(jax.random.PRNGKey(0), 1)

    def synth_cfg(thr):
        return SynthConfig(sample_rate=SR, input_sec=cfg().input_sec,
                           similarity_threshold=thr, max_notes=4,
                           max_oneshot_sec=256 / SR, use_fx_prob=0.0)

    # the loaded cap (tau=0.9 -> 2 bins) renders fine...
    out = render_batch(statics, jnp.asarray(notes[None]), jnp.asarray(mask[None]),
                       keys, synth_cfg(0.9))
    assert np.abs(np.asarray(out)).max() > 0
    # ...a looser threshold (needs 4 bins) raises at the eager call site
    with pytest.raises(ValueError, match="loaded with only the leading"):
        render_batch(statics, jnp.asarray(notes[None]), jnp.asarray(mask[None]),
                     keys, synth_cfg(0.7))
    # ...and at the jitted-step factory (inside jit the field is a tracer, so
    # the factory must catch it before tracing)
    with pytest.raises(ValueError, match="loaded with only the leading"):
        make_synth_eval_step(
            ModelConfig(enc_layers=1, dec_layers=1, nhead=2, d_query=8,
                        tgt_vocab_size=16, n_mels=8, sample_rate=SR,
                        input_sec=cfg().input_sec),
            synth_cfg(0.7), statics,
        )


def test_from_bank_guards_device_budget(bank):
    """Oversized banks raise the explicit capacity error (with remediation),
    never an implicit device OOM."""
    with pytest.raises(ValueError, match="device budget"):
        SynthStatics.from_bank(bank, hbm_limit_gib=1e-6)
    SynthStatics.from_bank(bank)  # production default accepts the test bank


def test_fx_chain_runs_and_preserves_shape():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=SR).astype(np.float32) * 0.3)
    y = fx.random_fx_chain(x, SR, jax.random.PRNGKey(0), 1.0, 1.0, 1.0)
    y = np.asarray(y)
    assert y.shape == x.shape
    assert np.isfinite(y).all()


def test_compressor_reduces_loud_parts():
    t = np.arange(SR) / SR
    x = np.sin(2 * np.pi * 100 * t).astype(np.float32)
    x[: SR // 2] *= 0.05  # quiet half, loud half
    y = np.asarray(fx.compressor(jnp.asarray(x), SR, threshold_db=-20.0,
                                 ratio=8.0, attack_ms=1.0, release_ms=50.0))
    loud_in = np.abs(x[SR // 2 + 500 :]).max()
    loud_out = np.abs(y[SR // 2 + 500 :]).max()
    quiet_out = np.abs(y[1000 : SR // 2]).max()
    assert loud_out < loud_in * 0.7  # gain reduction on loud section
    assert quiet_out > 0.03  # quiet section mostly untouched


def test_limiter_caps_peaks():
    t = np.arange(SR) / SR
    x = (np.sin(2 * np.pi * 200 * t) * 1.0).astype(np.float32)
    y = np.asarray(fx.limiter(jnp.asarray(x), SR, threshold_db=-6.0))
    assert np.abs(y).max() < np.abs(x).max()


def test_ema_scan_matches_loop():
    rng = np.random.default_rng(3)
    x = rng.normal(size=200).astype(np.float32)
    c = 0.9
    y = np.asarray(fx.ema_scan(jnp.asarray(x), c))
    ref = np.zeros_like(x)
    acc = 0.0
    for i, v in enumerate(x):
        acc = c * acc + (1 - c) * v
        ref[i] = acc
    np.testing.assert_allclose(y, ref, atol=1e-4)


def test_render_deterministic_per_key(statics):
    c = cfg()
    notes, mask = pad_notes(
        np.array([[0.1, 0.2, 35, 100], [0.4, 0.5, 42, 70]], dtype=np.float32), 8
    )
    a = np.asarray(render_segment(
        statics, jnp.asarray(notes), jnp.asarray(mask), jax.random.PRNGKey(5),
        chunk_samples=c.chunk_samples, sample_rate=SR,
    ))
    b = np.asarray(render_segment(
        statics, jnp.asarray(notes), jnp.asarray(mask), jax.random.PRNGKey(5),
        chunk_samples=c.chunk_samples, sample_rate=SR,
    ))
    np.testing.assert_array_equal(a, b)


def test_pitch_without_bank_entries_renders_silent(statics):
    """A note whose pitch has no eligible bank bin must contribute silence —
    not bank row 0, which belongs to a different instrument. (The reference
    raises KeyError on the missing h5 group, synthetiser.py:171-201.)"""
    c = cfg()
    # pitch 50 is valid GM drum range but absent from the test bank (PITCHES)
    notes, mask = pad_notes(np.array([[0.1, 0.2, 50, 120]], dtype=np.float32), 8)
    wav = np.asarray(render_segment(
        statics, jnp.asarray(notes), jnp.asarray(mask), jax.random.PRNGKey(3),
        chunk_samples=c.chunk_samples, sample_rate=SR,
    ))
    np.testing.assert_array_equal(wav, 0.0)

    # mixed with a valid note, only the valid one sounds
    notes2, mask2 = pad_notes(
        np.array([[0.1, 0.2, 50, 120], [0.3, 0.4, 38, 120]], dtype=np.float32), 8
    )
    wav2 = np.asarray(render_segment(
        statics, jnp.asarray(notes2), jnp.asarray(mask2), jax.random.PRNGKey(3),
        chunk_samples=c.chunk_samples, sample_rate=SR,
    ))
    onset_50 = int(0.1 * SR)
    # the portable FFT conv spreads ~1e-8 numerical dust across the chunk;
    # anything above that in the invalid note's window would be a real sample
    assert np.abs(wav2[onset_50 : onset_50 + 200]).max() < 1e-6
    assert np.abs(wav2).max() > 0.1


@pytest.mark.slow
def test_adtof_member_draw_renders_when_members_present():
    """ADTOF mode draws a member pitch before bin eligibility: a class pitch
    whose drawn member has bank entries must render (the missing-bin silence
    guard is evaluated AFTER the member draw). With all members of HH (42 ->
    {42,43,44,50}) present, every key renders audio."""
    c = cfg()
    rng = np.random.default_rng(4)
    bank = make_test_bank(rng, [42, 43, 44, 50], sample_rate=SR, max_len=SR // 2)
    st = SynthStatics.from_bank(bank)
    notes, mask = pad_notes(np.array([[0.1, 0.2, 42, 110]], dtype=np.float32), 8)
    for i in range(5):
        wav = np.asarray(render_segment(
            st, jnp.asarray(notes), jnp.asarray(mask), jax.random.PRNGKey(i),
            chunk_samples=c.chunk_samples, sample_rate=SR, adtof=True,
        ))
        assert np.abs(wav).max() > 0.0, i

    # with only one member present, some draws land on absent members and
    # render silent (the reference would KeyError there); others render
    bank1 = make_test_bank(rng, [42], sample_rate=SR, max_len=SR // 2)
    st1 = SynthStatics.from_bank(bank1)
    outcomes = set()
    for i in range(12):
        wav = np.asarray(render_segment(
            st1, jnp.asarray(notes), jnp.asarray(mask), jax.random.PRNGKey(i),
            chunk_samples=c.chunk_samples, sample_rate=SR, adtof=True,
        ))
        outcomes.add(bool(np.abs(wav).max() > 0.0))
    assert True in outcomes  # at least one draw hit the present member


def test_render_invariant_to_note_padding(statics):
    """Bucket-trimming the padded note dim (datasets.trim_note_bucket) must
    not change the rendered audio: masked slots contribute nothing and the
    per-segment timbre/mixup/FX draws are independent of the note dim."""
    c = cfg()
    base = np.array([[0.1, 0.2, 35, 100], [0.4, 0.5, 42, 70]], dtype=np.float32)
    key = jax.random.PRNGKey(7)

    def render(pad_to):
        notes, mask = pad_notes(base, pad_to)
        return np.asarray(render_segment(
            statics, jnp.asarray(notes), jnp.asarray(mask), key,
            chunk_samples=c.chunk_samples, sample_rate=SR,
        ))

    np.testing.assert_array_equal(render(8), render(32))


def test_collate_trims_note_bucket():
    from adt_str_tpu.data.datasets import collate

    examples = []
    for n in (3, 17):
        notes = np.zeros((128, 4), np.float32)
        mask = np.zeros(128, bool)
        mask[:n] = True
        tokens = np.full(256, 1, np.int32)
        tokens[0] = 2
        tokens[1 : 1 + n] = 300
        tokens[1 + n] = 3
        examples.append({
            "notes": notes, "note_mask": mask, "tokens": tokens,
            "token_lengths": np.int64(n + 2),
        })
    batch = collate(examples)
    assert batch["notes"].shape[1] == 32  # max count 17 -> bucket 32
    assert batch["note_mask"].shape[1] == 32
    assert batch["tokens"].shape[1] == 64  # max 19 used -> token bucket 64


@pytest.mark.slow
def test_token_trim_is_loss_exact():
    """Dropping all-PAD tail token columns must not change the teacher-forced
    loss (CE ignores PAD; masks come from true lengths)."""
    from adt_str_tpu.config import ModelConfig
    from adt_str_tpu.data.datasets import trim_token_bucket
    from adt_str_tpu.models import adt

    mcfg = ModelConfig(
        input_sec=0.64, time_res=0.01, win_length=256, sample_rate=4000,
        enc_layers=1, dec_layers=1, nhead=2, d_query=8, dropout=0.0,
        tgt_vocab_size=32, n_mels=8, compute_dtype="float32", max_positions=256,
    )
    params = adt.init_params(jax.random.PRNGKey(0), mcfg)
    rng = np.random.default_rng(3)
    B = 2
    wave = (rng.normal(size=(B, mcfg.chunk_samples)) * 0.2).astype(np.float32)
    tokens = np.full((B, 200), 1, np.int64)
    for i in range(B):
        n = int(rng.integers(6, 20))
        tokens[i, 0] = 2
        tokens[i, 1 : n - 1] = rng.integers(4, 32, n - 2)
        tokens[i, n - 1] = 3
    lengths = (tokens != 1).sum(axis=1)
    trimmed = trim_token_bucket({"tokens": tokens})["tokens"]
    assert trimmed.shape[1] == 64

    def loss(t):
        return float(adt.forward_loss(
            params, jnp.asarray(wave), jnp.asarray(t, jnp.int32),
            jnp.asarray(lengths, jnp.int32), mcfg,
        ))

    np.testing.assert_allclose(loss(trimmed), loss(tokens), rtol=1e-6)


def test_fx_chain_stable_across_keys():
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=SR).astype(np.float32) * 0.5)
    for i in range(20):
        y = np.asarray(fx.random_fx_chain(x, SR, jax.random.PRNGKey(i), 1.0, 1.0, 1.0))
        assert np.isfinite(y).all(), i
