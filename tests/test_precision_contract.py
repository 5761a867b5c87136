"""fp32 matmul-precision contract: exactness-bearing fp32 dots are HIGHEST.

XLA:TPU's DEFAULT lowering of fp32 `dot_general` is shape-dependent: at
MXU-sized shapes it uses a SINGLE bf16 pass (measured on v5e: rel err
~2.1e-3 at the FX comb-bank shapes), silently rounding both operands to 8
mantissa bits, while small dots can evaluate exactly
(tools/precision_probe.json `onehot_shape_sweep`). Every numerical contract
in this framework that is validated on the CPU backend (where dots are
always true fp32) therefore only holds on-chip if the dot either carries an
explicit `precision="highest"` or avoids fp32 dots altogether:

- the FX chain's phase-decomposed combs/allpasses/EMAs/FIRs carry
  `precision="highest"` (tests/test_fx_distributions.py asserts bit-exact
  Freeverb at damping 0, <= 0.006 dB compressor error — fp32-level claims);
- the XLA-path mel matmul (torch.stft parity island, tests/test_mel.py);
- the CLAP class-assignment similarity matmul (argmax near-ties must be
  backend-deterministic at the final dot);
- the beam ancestor score-select (bit-exact selection of fp32 scores);
- the ADTOF one-hot bank-table reads (`_sample_timbre_rows`) and the beam
  token backtrace instead run in int32 on the VPU — exact for any table
  value by construction, REMOVING them from the fp32 contract entirely
  (integer multiply-add has no precision mode to get wrong).

These tests lock the contract portably: they lower the jitted programs to
StableHLO text (the precision attribute is backend-independent) and assert
every fp32 dot_general carries HIGHEST — so a regression shows up on the
CPU test backend even though the numerical damage only manifests on TPU.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adt_str_tpu.ops.mel import MelFrontendParams, log_mel_spectrogram
from adt_str_tpu.synth import fx
from adt_str_tpu.synth.bank import N_BINS, make_test_bank
from adt_str_tpu.synth.render import SynthStatics, render_batch_arrays

SR = 8000

_DOT_RE = re.compile(r"stablehlo\.dot_general\b.*")
# the trailing type signature: `: (tensor<...>, tensor<...>) -> tensor<...>`
_SIG_RE = re.compile(
    r":\s*\(tensor<([^>]*)>,\s*tensor<([^>]*)>\)\s*->\s*tensor<([^>]*)>"
)


def _elem_type(tensor_body: str) -> str:
    """'2x3xf32' -> 'f32'; rank-0 'f32' -> 'f32'."""
    return tensor_body.split("x")[-1]


def _assert_f32_dots_highest(stablehlo_text: str, context: str) -> int:
    """Every dot_general with BOTH operands f32 must be precision HIGHEST.
    Returns the number of such dots (callers assert > 0 so an empty match
    can't silently pass). Parses the operand/result types explicitly —
    including rank-0 tensors — so an exactness-bearing dot can't silently
    fall out of coverage on a formatting quirk."""
    n_f32 = 0
    for line in stablehlo_text.splitlines():
        m = _DOT_RE.search(line)
        if m is None:
            continue
        op = m.group(0)
        sig = _SIG_RE.search(op)
        assert sig is not None, f"{context}: unparseable dot_general: {op[:160]}"
        lhs, rhs, res = (_elem_type(g) for g in sig.groups())
        # fp32 contract only: BOTH operands f32 (bf16-operand dots with f32
        # accumulation are the model's deliberate compute-dtype choice;
        # integer dots are exact at any precision)
        if not (lhs == "f32" and rhs == "f32"):
            continue
        n_f32 += 1
        assert "HIGHEST" in op, f"{context}: fp32 dot at DEFAULT precision: {op[:160]}"
    return n_f32


def test_fx_chain_dots_are_highest():
    x = jnp.zeros(2 * SR, jnp.float32)
    key = jax.random.PRNGKey(0)
    f = jax.jit(
        lambda x, k: fx.random_fx_chain(x, SR, k, 1.0, 1.0, 1.0)
    )
    txt = f.lower(x, key).as_text()
    n = _assert_f32_dots_highest(txt, "random_fx_chain")
    # combs + allpasses + FIRs + EMA locals/carries: the chain is dot-heavy
    assert n >= 10, f"expected the FX chain to lower to many fp32 dots, got {n}"


def test_full_render_program_dots_are_highest():
    """End-to-end: the production synthesis program (ADTOF int32 table
    reads + mixup + full FX) contains no fp32 dot at DEFAULT precision."""
    rng = np.random.default_rng(0)
    bank = make_test_bank(rng, [35, 38, 42], sample_rate=SR, max_len=SR // 4)
    statics = SynthStatics.from_bank(bank)
    notes = jnp.zeros((2, 8, 4), jnp.float32)
    mask = jnp.zeros((2, 8), bool)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    lowered = render_batch_arrays.lower(
        statics, notes, mask, keys,
        chunk_samples=SR, sample_rate=SR,
        use_fx_prob=1.0, use_reverb_prob=1.0, use_compression_prob=1.0,
        use_limiter_prob=1.0, adtof=True,
    )
    n = _assert_f32_dots_highest(lowered.as_text(), "render_batch_arrays")
    # all remaining fp32 dots are the FX chain's (the table reads are int32)
    assert n >= 10, f"expected FX fp32 dots in the program, got {n}"


def test_mel_xla_path_dot_is_highest():
    params = MelFrontendParams(
        sample_rate=SR, win_length=256, hop_length=80, n_mels=64
    )
    wave = jnp.zeros((1, SR), jnp.float32)
    txt = log_mel_spectrogram.lower(wave, params).as_text()
    n = _assert_f32_dots_highest(txt, "log_mel_spectrogram")
    assert n >= 1


def test_clap_assignment_dot_is_highest():
    from adt_str_tpu.clap.curation import _score_classes

    u = jnp.zeros((4, 512), jnp.float32)
    m = jnp.zeros((3, 512), jnp.float32)
    txt = _score_classes.lower(u, m).as_text()
    n = _assert_f32_dots_highest(txt, "_score_classes")
    assert n >= 1


def test_beam_decode_program_f32_dots_are_highest():
    """The bf16-compute beam program's only fp32 dots are the mel matmul
    and the ancestor score-select — each exactness-bearing. The token
    backtrace and the ancestor permutation run in integer / 0-1 arithmetic
    (exact at any precision) and are deliberately outside the contract."""
    from adt_str_tpu.config import ModelConfig
    from adt_str_tpu.models import adt
    from adt_str_tpu.models.decode import beam_search_decode

    cfg = ModelConfig(
        sample_rate=4000, win_length=256, time_res=0.01, input_sec=0.64,
        enc_layers=1, dec_layers=1, nhead=2, d_query=16, dropout=0.0,
        tgt_vocab_size=40, n_mels=16, compute_dtype="bfloat16",
        max_positions=64,
    )
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    wave = jnp.zeros((2, int(cfg.sample_rate * cfg.input_sec)), jnp.float32)
    f = jax.jit(
        lambda p, w: beam_search_decode(p, w, cfg, beam_size=2, max_length=8)
    )
    txt = f.lower(params, wave).as_text()
    n = _assert_f32_dots_highest(txt, "beam_search_decode")
    assert n >= 2, f"expected mel + ancestor-select fp32 dots, got {n}"


def test_adtof_table_reads_are_integer_exact():
    """Behavioral check: the production int32 one-hot table read reproduces
    direct indexing for offsets well past 512 (where a single-bf16-pass fp32
    dot would round) AND well past 2^24 (where even a true fp32 dot would) —
    integer multiply-add is exact for any int32 value."""
    tbl = np.zeros((128, 2 * N_BINS), np.int32)
    tbl[40, :6] = [20_000_003, 29_951, 12_345, 517, 3, 0]
    pitches = jnp.asarray([40, 41], jnp.int32)
    ohi = (
        pitches[:, None] == jnp.arange(128, dtype=pitches.dtype)[None, :]
    ).astype(jnp.int32)
    sel = jnp.sum(ohi[:, :, None] * jnp.asarray(tbl)[None, :, :], axis=1)
    np.testing.assert_array_equal(np.asarray(sel), tbl[[40, 41]])


def test_beam_backtrace_is_integer_exact():
    """The backtrace contraction (one-hot ancestry x token ids) runs in
    int32: token ids >= 512 on a 1400-token vocab survive verbatim."""
    B, T, K = 2, 4, 3
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 1400, size=(B, K, T)).astype(np.int32)
    anc_idx = rng.integers(0, K, size=(B, T))
    anc = np.eye(K, dtype=np.int32)[anc_idx]  # (B, T, K)
    got = jnp.sum(
        jnp.asarray(anc) * jnp.swapaxes(jnp.asarray(tokens), 1, 2), axis=-1
    )
    exact = np.take_along_axis(
        np.swapaxes(tokens, 1, 2), anc_idx[:, :, None], axis=2
    )[:, :, 0]
    np.testing.assert_array_equal(np.asarray(got), exact)
