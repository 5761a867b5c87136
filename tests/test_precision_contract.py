"""fp32 matmul-precision contract: exactness-bearing dots must be HIGHEST.

XLA:TPU lowers fp32 `dot_general` at DEFAULT precision to a SINGLE bf16 MXU
pass (measured on v5e: rel err ~2.1e-3 at comb-bank shapes), silently
rounding both operands to 8 mantissa bits. Every numerical contract in this
framework that is validated on the CPU backend (where dots are always true
fp32) therefore only holds on-chip if the dot carries an explicit
`precision="highest"`:

- the FX chain's phase-decomposed combs/allpasses/EMAs/FIRs
  (tests/test_fx_distributions.py asserts bit-exact Freeverb at damping 0,
  <= 0.006 dB compressor error — all fp32-level claims);
- the ADTOF one-hot bank-table reads in `_sample_timbre_rows` (row OFFSETS
  up to bank size: a bf16 pass rounds offsets past 512 to multiples of
  their exponent spacing — up to 64 rows off on a 30k bank, i.e. silently
  WRONG one-shots; the from_bank 2^24 guard assumes true-fp32 dots);
- the XLA-path mel matmul (torch.stft parity island, tests/test_mel.py);
- the CLAP class-assignment similarity matmul (argmax near-ties must be
  backend-deterministic).

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
from adt_str_tpu.synth.bank import make_test_bank
from adt_str_tpu.synth.render import SynthStatics, render_batch_arrays

SR = 8000

_DOT_RE = re.compile(r"stablehlo\.dot_general\b.*")


def _assert_f32_dots_highest(stablehlo_text: str, context: str) -> int:
    """Every dot_general whose result is f32 must be precision HIGHEST.
    Returns the number of such dots (callers assert > 0 so an empty match
    can't silently pass)."""
    n_f32 = 0
    for line in stablehlo_text.splitlines():
        m = _DOT_RE.search(line)
        if m is None:
            continue
        op = m.group(0)
        # fp32 contracts only: BOTH operands and the result must be f32
        # (bf16-operand dots with f32 accumulation are the model's
        # deliberate compute-dtype choice, not covered by this contract)
        sig = op.split(":")[-1]
        if "xbf16>" in sig or "xf32>" not in sig.split("->")[-1]:
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
    """End-to-end: the production synthesis program (ADTOF one-hot table
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
    assert n >= 12, f"expected FX + table-read fp32 dots in the program, got {n}"


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
    """The bf16-compute beam program's only fp32 dots are the mel matmul,
    the ancestor score-select, and the token backtrace — each
    exactness-bearing (the backtrace contracts TOKEN IDS: one bf16 pass
    would round ids >= 512 on a 1400-token vocab). The ancestor
    permutation einsum runs in compute dtype on 0/1 values (exact at any
    precision) and is deliberately outside the contract."""
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
    assert n >= 3, f"expected mel + select + backtrace dots, got {n}"


def test_adtof_table_reads_exact_values_via_dot():
    """Behavioral check (CPU exact either way; locks intent): the one-hot
    table-read path reproduces direct indexing for offsets well past 512,
    where a bf16-pass dot would round."""
    bin_count = np.zeros((128, 4), np.int32)
    bin_offset = np.zeros((128, 4), np.int32)
    bin_count[40] = [3, 2, 1, 0]
    bin_offset[40] = [29_951, 12_345, 517, 0]
    oh = jax.nn.one_hot(jnp.asarray([40]), 128, dtype=jnp.float32)
    off = jnp.matmul(
        oh, jnp.asarray(bin_offset, jnp.float32), precision="highest"
    ).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(off)[0], bin_offset[40])
