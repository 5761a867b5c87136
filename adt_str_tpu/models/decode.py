"""Autoregressive decoding: KV-cache greedy sampling and vectorized beam search.

Semantics parity with the reference (`model.py:260-508`):

- greedy `sample`: per-row finished mask freezing rows at EOS, early exit when
  every row finished (model.py:295-322). The reference re-runs the full decoder
  on the whole generated prefix every step with no KV cache; here decoding is a
  `lax.while_loop` over a preallocated (B, max_len) buffer with per-layer
  K/V caches and precomputed cross-attention K/V — O(T) instead of O(T^2)
  decoder work and a single XLA compilation.
- `beam_search`: length-penalty scoring `log_prob / len**penalty`
  (model.py:502-508), finished beams frozen (extend only with EOS at zero
  log-prob, preserving their score and frozen length), results padded with EOS
  to a common length (model.py:485-500). The reference loops over beams in
  Python per batch item; here all B*beam hypotheses advance in one batched
  XLA program with parent-pointer KV caches: cache rows are written once and
  never moved, and a per-position ancestor one-hot selects each beam's
  history inside the attention contraction (`_anc_attention`), eliminating
  the per-step full-cache beam reorder.

Outputs truncate identically under the eval convention (stop at first
EOS/PAD, eval.py:379-381) because frozen rows are EOS-filled.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from adt_str_tpu.config import ModelConfig
from adt_str_tpu.models import transformer as T
from adt_str_tpu.models.adt import encode

Params = dict[str, Any]


class DecoderCaches(NamedTuple):
    # self-attention caches — two layouts, see init_caches:
    #   greedy:          (L, B, H, max_len, head_dim)
    #   beam slot-inner: (L, B, H, max_len, K, head_dim)
    k_self: jnp.ndarray
    v_self: jnp.ndarray
    # precomputed cross-attention K/V: (L, B, H, S, head_dim)
    k_cross: jnp.ndarray
    v_cross: jnp.ndarray


def _proj_kv(p_attn: Params, x: jnp.ndarray, nhead: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    d = x.shape[-1]
    w = p_attn["in_proj"]["w"].astype(x.dtype)
    b = p_attn["in_proj"]["b"].astype(x.dtype)
    k = x @ w[:, d : 2 * d] + b[d : 2 * d]
    v = x @ w[:, 2 * d :] + b[2 * d :]
    return T.split_heads(k, nhead), T.split_heads(v, nhead)


def init_caches(
    params: Params,
    memory: jnp.ndarray,
    config: ModelConfig,
    max_len: int,
    beam_size: int | None = None,
) -> DecoderCaches:
    """Cross K/V are precomputed from `memory`; self caches start zeroed.

    Greedy self caches are (L, B, H, max_len, hd). Beam self caches use a
    slot-INNER layout (L, B, H, max_len, K, hd): with the slot axis adjacent
    to the contraction axes, `_anc_attention`'s two einsums are clean batched
    matmuls over batch dims (b, h) — no per-step physical transpose of the
    full cache (the slot-outer layout forced XLA to relayout ~(B*K, H, T,
    hd) twice per layer-step).

    In beam mode `memory` is the UN-repeated (B, S, d) encoder output: all K
    beams of an item share the same memory, so cross K/V are computed and
    stored ONCE per item — (L, B, H, S, hd), not (L, B*K, ...). decode_step
    reshapes the K beam queries into the query-time axis of one batched
    cross-attention per item (bit-exact: each query row's dot products and
    softmax are unchanged), cutting cross-K/V projection flops and cache
    memory/bandwidth by the beam factor."""
    compute = jnp.dtype(config.compute_dtype)
    layers = params["decoder"]["layers"]
    B = memory.shape[0]
    H, hd = config.nhead, config.d_query
    mem = memory.astype(compute)
    k_cross, v_cross = zip(*(_proj_kv(l["cross_attn"], mem, H) for l in layers))
    if beam_size is None:
        zeros = jnp.zeros((len(layers), B, H, max_len, hd), compute)
    else:
        zeros = jnp.zeros(
            (len(layers), B, H, max_len, beam_size, hd), compute
        )
    return DecoderCaches(
        k_self=zeros,
        v_self=zeros,
        k_cross=jnp.stack(k_cross),
        v_cross=jnp.stack(v_cross),
    )


def _anc_attention(
    q: jnp.ndarray,  # (B*K, H, 1, hd)
    k: jnp.ndarray,  # (B, H, T, K, hd) slot-inner cache (never beam-reordered)
    v: jnp.ndarray,  # (B, H, T, K, hd)
    anc: jnp.ndarray,  # (B, K, T, K) one-hot: slot holding beam k's position-t row
    step: jnp.ndarray,
) -> jnp.ndarray:
    """Self-attention over parent-pointer caches.

    Beam search never moves cache rows; instead each live beam knows, per
    time position, which slot's cache row belongs to its ancestry (`anc`).
    Scores are computed against every slot's row and the ancestor's one is
    selected by a one-hot contraction — one nonzero per (beam, position), so
    the selected values are bit-exact dot products, identical to attending
    over a physically reordered cache. Costs K x the (tiny) attention flops
    and zero cache traffic, vs the reorder's full-cache read+write per step.
    The cache is slot-INNER (see `init_caches`) so both einsums below have
    batch dims (b, h) leading and contraction dims trailing — XLA lowers
    them to plain batched matmuls with no physical cache relayout.
    """
    BK, H, _, hd = q.shape
    T_len = k.shape[2]
    K = anc.shape[1]
    B = BK // K
    qb = q.reshape(B, K, H, hd).transpose(0, 2, 1, 3)  # (B, H, K, hd) — tiny
    scores = jnp.einsum(
        "bhkd,bhtjd->bhktj", qb, k, preferred_element_type=jnp.float32
    ) / math.sqrt(hd)
    ancf = anc.astype(jnp.float32)  # (B, K, T, J)
    # precision='highest': fp32 dots at DEFAULT lower to one bf16 MXU pass
    # on TPU, which would round the selected fp32 scores to 8 mantissa bits
    # — the bit-exact-selection claim above must hold on-chip too. J=5
    # contraction: negligible flops either way.
    sel = jnp.einsum("bhktj,bktj->bhkt", scores, ancf, precision="highest")
    pos = jnp.arange(T_len)
    sel = sel + jnp.where(pos[None, None, None, :] > step, T.NEG_MASK, 0.0)
    probs = jax.nn.softmax(sel, axis=-1).astype(q.dtype)  # (B, H, K, T)
    # fold the ancestor selection into the value weights (multiply by the
    # 0/1 one-hot: exact); unwritten positions hold zero rows, so the
    # near-zero masked probabilities contribute exactly 0, as in the
    # contiguous-cache path
    w = probs[:, :, :, :, None] * anc[:, None].astype(q.dtype)  # (B, H, K, T, J)
    out = jnp.einsum("bhktj,bhtjd->bhkd", w, v)
    return out.transpose(0, 2, 1, 3).reshape(BK, H, 1, hd)


def decode_step(
    params: Params,
    config: ModelConfig,
    token: jnp.ndarray,  # (B,) current input token
    step: jnp.ndarray,  # scalar position of `token`
    caches: DecoderCaches,
    anc: jnp.ndarray | None = None,  # (B, K, max_len, K) beam ancestor one-hot
) -> tuple[jnp.ndarray, DecoderCaches]:
    """One incremental decoder step -> (B, vocab) logits for the next token."""
    compute = jnp.dtype(config.compute_dtype)
    dec = params["decoder"]
    H = config.nhead
    d = config.d_model
    B = token.shape[0]
    max_len = caches.k_self.shape[3]

    emb = dec["embedding"].astype(compute)[token] * jnp.asarray(math.sqrt(d), compute)
    pe = jnp.asarray(T.sinusoidal_positions(config.max_positions, d))
    x = emb + jax.lax.dynamic_slice_in_dim(pe, step, 1, axis=0).astype(compute)  # (B, d) + (1, d)
    x = x[:, None, :]  # (B, 1, d)

    # positions > step are masked in self-attention over the cache
    pos = jnp.arange(max_len)
    self_mask = jnp.where(pos[None, None, None, :] > step, T.NEG_MASK, 0.0)

    k_self, v_self = caches.k_self, caches.v_self
    for li, layer in enumerate(dec["layers"]):
        p_sa = layer["self_attn"]
        w = p_sa["in_proj"]["w"].astype(compute)
        b = p_sa["in_proj"]["b"].astype(compute)
        # one fused (d -> 3d) projection, then split: bit-exact vs three
        # sliced matmuls (each output column depends only on its own weight
        # column) and one kernel launch instead of three — the decode loop
        # is launch-bound at ~1.1 ms/step
        xw = x @ w + b
        q = T.split_heads(xw[..., :d], H)  # (B, H, 1, hd)
        k_new = T.split_heads(xw[..., d : 2 * d], H)
        v_new = T.split_heads(xw[..., 2 * d :], H)
        if anc is None:
            k_self = jax.lax.dynamic_update_slice(
                k_self, k_new[None], (li, 0, 0, step, 0)
            )
            v_self = jax.lax.dynamic_update_slice(
                v_self, v_new[None], (li, 0, 0, step, 0)
            )
            attn = T.attention_core(q, k_self[li], v_self[li], self_mask)
        else:
            # slot-inner cache layout (L, Bt, H, T, K, hd): reshape the new
            # rows (B*K, H, 1, hd) -> (Bt, H, 1, K, hd) and write one
            # position for all K slots in a single contiguous-ish update
            K = anc.shape[-1]
            Bt = B // K
            hd = k_new.shape[-1]

            def _to_slot_inner(r):
                return r[:, :, 0].reshape(Bt, K, H, hd).transpose(0, 2, 1, 3)[
                    :, :, None
                ]  # (Bt, H, 1, K, hd)

            k_self = jax.lax.dynamic_update_slice(
                k_self, _to_slot_inner(k_new)[None], (li, 0, 0, step, 0, 0)
            )
            v_self = jax.lax.dynamic_update_slice(
                v_self, _to_slot_inner(v_new)[None], (li, 0, 0, step, 0, 0)
            )
            attn = _anc_attention(q, k_self[li], v_self[li], anc, step)
        attn = T.linear(p_sa["out_proj"], T.merge_heads(attn))
        x = T.layer_norm(layer["norm1"], x + attn)

        p_ca = layer["cross_attn"]
        wc = p_ca["in_proj"]["w"].astype(compute)
        bc = p_ca["in_proj"]["b"].astype(compute)
        qc = T.split_heads(x @ wc[:, :d] + bc[:d], H)  # (B, H, 1, hd)
        if anc is None:
            cross = T.attention_core(qc, caches.k_cross[li], caches.v_cross[li], None)
        else:
            # beam: cross K/V are stored once per ITEM (Bt = B/K rows); fold
            # the K beam queries into the query-time axis of one batched
            # attention per item — each query row attends the shared memory
            # independently, so this is bit-exact vs K-fold-duplicated K/V
            K = anc.shape[-1]
            Bt = B // K
            hd_c = qc.shape[-1]
            qcb = qc[:, :, 0].reshape(Bt, K, H, hd_c).transpose(0, 2, 1, 3)
            cross = T.attention_core(
                qcb, caches.k_cross[li], caches.v_cross[li], None
            )  # (Bt, H, K, hd)
            cross = (
                cross.transpose(0, 2, 1, 3).reshape(B, H, hd_c)[:, :, None, :]
            )
        cross = T.linear(p_ca["out_proj"], T.merge_heads(cross))
        x = T.layer_norm(layer["norm2"], x + cross)

        ff = T.ffn_forward(layer["ffn"], x, 0.0, None, False)
        x = T.layer_norm(layer["norm3"], x + ff)

    logits = T.linear(dec["generator"], x)[:, 0, :]  # (B, vocab)
    return logits, DecoderCaches(k_self, v_self, caches.k_cross, caches.v_cross)


@partial(jax.jit, static_argnames=("config", "max_length", "start_token", "end_token"))
def greedy_decode(
    params: Params,
    wave: jnp.ndarray,
    config: ModelConfig,
    max_length: int = 1000,
    start_token: int = 2,
    end_token: int = 3,
) -> jnp.ndarray:
    """(B, samples) audio -> (B, max_length) tokens (EOS-filled after finish)."""
    memory = encode(params, wave, config)
    return greedy_decode_from_memory(
        params, memory, config, max_length, start_token, end_token
    )


def greedy_decode_from_memory(
    params: Params,
    memory: jnp.ndarray,
    config: ModelConfig,
    max_length: int,
    start_token: int = 2,
    end_token: int = 3,
) -> jnp.ndarray:
    B = memory.shape[0]
    caches = init_caches(params, memory, config, max_length)
    tokens = jnp.full((B, max_length), end_token, dtype=jnp.int32)
    tokens = tokens.at[:, 0].set(start_token)
    finished = jnp.zeros((B,), dtype=bool)

    def cond(state):
        step, _, finished, _ = state
        return (step < max_length - 1) & ~jnp.all(finished)

    def body(state):
        step, tokens, finished, caches = state
        logits, caches = decode_step(params, config, tokens[:, step], step, caches)
        next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_token = jnp.where(finished, end_token, next_token)
        tokens = jax.lax.dynamic_update_slice(tokens, next_token[:, None], (0, step + 1))
        finished = finished | (next_token == end_token)
        return step + 1, tokens, finished, caches

    _, tokens, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), tokens, finished, caches)
    )
    return tokens


@partial(
    jax.jit,
    static_argnames=(
        "config", "beam_size", "max_length", "start_token", "end_token",
        "length_penalty",  # branched on in `score`; traced floats would crash
    ),
)
def beam_search_decode(
    params: Params,
    wave: jnp.ndarray,
    config: ModelConfig,
    beam_size: int = 5,
    max_length: int = 1000,
    start_token: int = 2,
    end_token: int = 3,
    length_penalty: float = 1.0,
) -> jnp.ndarray:
    """Vectorized beam search -> (B, max_length) best sequences (EOS padded)."""
    memory = encode(params, wave, config)
    B, S, d = memory.shape
    V = config.tgt_vocab_size
    K = beam_size
    NEG = -1e9

    # cross K/V are computed from the UN-repeated memory (shared by all K
    # beams of an item — see init_caches); nothing is physically repeated
    caches = init_caches(params, memory, config, max_length, beam_size=K)
    # slot-local token store: row k records the token slot k consumed at each
    # position; rows are never beam-reordered (the final sequence is
    # reconstructed from the ancestor matrix)
    tokens = jnp.full((B * K, max_length), end_token, dtype=jnp.int32)
    tokens = tokens.at[:, 0].set(start_token)
    # ancestor one-hot: anc[b, k, t, j] = 1 iff beam k's position-t cache row
    # lives in slot j; starts as the identity (every slot wrote its own BOS)
    compute = jnp.dtype(config.compute_dtype)
    anc = jnp.broadcast_to(
        jnp.eye(K, dtype=compute)[None, :, None, :], (B, K, max_length, K)
    )
    # only beam 0 is live initially; others start at -inf so first expansion
    # seeds distinct hypotheses (reference starts from one beam per item)
    log_probs = jnp.tile(
        jnp.asarray([0.0] + [NEG] * (K - 1), jnp.float32), (B,)
    )  # (B*K,)
    lengths = jnp.ones((B * K,), jnp.int32)  # sequence length incl. BOS
    finished = jnp.zeros((B * K,), dtype=bool)

    def score(lp, ln):
        if length_penalty == 0.0:
            return lp
        return lp / jnp.power(ln.astype(jnp.float32), length_penalty)

    def cond(state):
        step, _, _, _, finished, _, _ = state
        return (step < max_length - 1) & ~jnp.all(finished)

    def body(state):
        step, tokens, log_probs, lengths, finished, caches, anc = state
        logits, caches = decode_step(
            params, config, tokens[:, step], step, caches, anc=anc
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)  # (B*K, V)
        # Candidate layout reproduces the reference's TIE order exactly
        # (model.py:422-457): the python loop builds candidates as [active
        # beams in rank order, each with its top-k tokens in (prob desc,
        # token asc) order] and then APPENDS finished beams; python's sort
        # is stable, so at EXACT score ties actives beat finished, earlier
        # ranks beat later, lower token ids beat higher. lax.top_k is
        # equally stable (lowest flattened index first at equal values), so
        # the flattened axis is laid out in that same order: the K*V active
        # block (rank-major, token asc; finished beams' rows all -inf — no
        # active candidates) followed by K appended finished-beam slots
        # (frozen score, implied EOS token). This removes the last beam
        # divergence vs the reference — equality holds AT ties too.
        cand_lp = log_probs[:, None] + logp  # (B*K, V)
        act_score = jnp.where(
            finished[:, None],
            NEG,
            score(cand_lp, jnp.broadcast_to((lengths + 1)[:, None], cand_lp.shape)),
        )
        fin_score = jnp.where(finished, score(log_probs, lengths), NEG)  # (B*K,)
        cand_score = jnp.concatenate(
            [act_score.reshape(B, K * V), fin_score.reshape(B, K)], axis=1
        )  # (B, K*V + K)
        _, top_idx = jax.lax.top_k(cand_score, K)  # (B, K)
        is_fin = top_idx >= K * V  # selected an appended finished-beam slot
        beam_idx = jnp.where(is_fin, top_idx - K * V, top_idx // V)
        tok_idx = jnp.where(is_fin, end_token, top_idx % V).astype(jnp.int32)
        flat_src = (jnp.arange(B)[:, None] * K + beam_idx).reshape(-1)  # (B*K,)

        # Caches and the token store stay slot-local — NO beam reorder at
        # all. The round-2 code physically permuted the self caches each
        # step (a one-hot MXU contraction; still a full cache read+write,
        # the dominant cost at ~2 GB/step for flagship shapes). Here only
        # the (B, K, T, K) ancestor matrix is permuted; the new slot's
        # next-position row points at itself.
        tokens = jax.lax.dynamic_update_slice(
            tokens, tok_idx.reshape(-1, 1), (0, step + 1)
        )
        act_lp = cand_lp.reshape(B, K * V)[
            jnp.arange(B)[:, None], jnp.minimum(top_idx, K * V - 1)
        ]  # clamped gather; finished selections overridden below
        log_probs = jnp.where(is_fin, log_probs.reshape(B, K)[
            jnp.arange(B)[:, None], beam_idx
        ], act_lp).reshape(-1)
        lengths = jnp.where(
            is_fin.reshape(-1), lengths[flat_src], lengths[flat_src] + 1
        )
        was_finished = finished[flat_src]
        finished = was_finished | (tok_idx.reshape(-1) == end_token)
        perm = jax.nn.one_hot(beam_idx, K, dtype=anc.dtype)  # (B, K, K)
        # 0/1-valued compute-dtype contraction: exact at ANY matmul
        # precision (0 and 1 are exact in bf16 and each output sums exactly
        # one nonzero product), so it is deliberately outside the fp32
        # precision contract (tests/test_precision_contract.py).
        anc = jnp.einsum("bkj,bjts->bkts", perm, anc)
        eye_row = jnp.broadcast_to(
            jnp.eye(K, dtype=anc.dtype)[None, :, None, :], (B, K, 1, K)
        )
        anc = jax.lax.dynamic_update_slice(anc, eye_row, (0, 0, step + 1, 0))
        return step + 1, tokens, log_probs, lengths, finished, caches, anc

    _, tokens, log_probs, lengths, finished, _, anc = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), tokens, log_probs, lengths, finished, caches, anc)
    )
    final_scores = score(log_probs, lengths).reshape(B, K)
    best = jnp.argmax(final_scores, axis=-1)  # (B,)
    # backtrace: position t of the best beam was consumed by slot
    # anc[b, best, t]. The one-hot x token-id contraction runs entirely in
    # int32 on the VPU — exact for any token id by construction, with no
    # dependence on how XLA lowers fp32 dots (a single-bf16-pass lowering
    # would round ids >= 512 on a 1400-token vocab; whether XLA picks that
    # lowering is shape-dependent — tools/precision_probe.py). Runs once per
    # decode; cost is nil.
    anc_best = (anc[jnp.arange(B), best] != 0).astype(jnp.int32)  # (B, T, K)
    tok_slots = tokens.reshape(B, K, max_length).astype(jnp.int32)  # (B, K, T)
    return jnp.sum(anc_best * jnp.swapaxes(tok_slots, 1, 2), axis=-1)


# ---------------------------------------------------------------- mesh decode
# Data-parallel decoding over a mesh. Decoding is purely batch-parallel, but
# its programs contain custom calls GSPMD cannot partition (the Pallas mel
# kernel on TPU, ducc-FFT on CPU) — under plain jit-with-sharded-args the
# partitioner REPLICATES those ops, all-gathering the whole batch first
# (same finding as the train step; see parallel/train_step.py module
# docstring). A data-manual shard_map makes each device decode its own rows
# with zero collectives. Wrappers are cached per (config, mesh, decode args)
# so repeated batches reuse one compiled program.

import functools as _functools

from jax.sharding import PartitionSpec as _P


@_functools.lru_cache(maxsize=None)
def _sharded_decode_fn(
    mesh,
    config: ModelConfig,
    use_beam: bool,
    beam_size: int,
    max_length: int,
    start_token: int,
    end_token: int,
    length_penalty: float,
):
    if use_beam:
        def inner(params, wave):
            return beam_search_decode(
                params, wave, config, beam_size=beam_size,
                max_length=max_length, start_token=start_token,
                end_token=end_token, length_penalty=length_penalty,
            )
    else:
        def inner(params, wave):
            return greedy_decode(
                params, wave, config, max_length=max_length,
                start_token=start_token, end_token=end_token,
            )
    return jax.jit(
        jax.shard_map(
            inner,
            mesh=mesh,
            in_specs=(_P(), _P("data")),
            out_specs=_P("data"),
            axis_names=frozenset({"data"}),
            check_vma=False,
        )
    )


def greedy_decode_sharded(
    params, wave, config: ModelConfig, mesh,
    max_length: int = 1000, start_token: int = 2, end_token: int = 3,
):
    """`greedy_decode` with each device decoding its own batch rows
    (data-manual shard_map). Batch must be divisible by the data axis."""
    fn = _sharded_decode_fn(
        mesh, config, False, 0, max_length, start_token, end_token, 0.0
    )
    return fn(params, wave)


def beam_search_decode_sharded(
    params, wave, config: ModelConfig, mesh,
    beam_size: int = 5, max_length: int = 1000,
    start_token: int = 2, end_token: int = 3, length_penalty: float = 1.0,
):
    """`beam_search_decode` with each device decoding its own batch rows."""
    fn = _sharded_decode_fn(
        mesh, config, True, beam_size, max_length, start_token, end_token,
        length_penalty,
    )
    return fn(params, wave)
