"""Measure XLA:TPU fp32 dot_general behavior at DEFAULT vs 'highest'.

Evidence artifact behind the fp32 matmul precision contract
(docs/DESIGN.md "fp32 matmul precision contract",
tests/test_precision_contract.py). Three sections:

1. `comb_bank` — relative error vs a float64 host reference at the FX
   comb-bank shapes ((5, nb, nb) x (5, nb, L), the production
   phase-decomposition sizes), plus best-of-3 timing of each precision
   vmapped over the production batch. This is the measurement that shows
   DEFAULT lowers MXU-sized fp32 dots to a single bf16 pass (~2e-3 rel err).

2. `onehot_shape_sweep` — the one-hot x integer-table contraction (the
   pattern behind the ADTOF bank-row offset read and the beam token
   backtrace) at several shapes. The round-4 probe ran only the smallest
   shape and found error 0.0 at DEFAULT — i.e. XLA's lowering choice is
   SHAPE-DEPENDENT: small dots can evaluate exactly while MXU-sized ones
   bf16-round. This sweep records where the transition happens on this
   chip, which is why the production table reads now use int32 arithmetic
   (exact by construction) instead of relying on either measurement.

3. `table_read_in_step` — the ACTUAL production table-read program:
   `_sample_timbre_rows`-shaped reads (batch 64 x 27 slots x 128 pitches x
   22 table columns, the flagship vmapped-under-jit lowering), comparing
   (a) the retired fp32-matmul formulation at DEFAULT, (b) at 'highest',
   and (c) the shipped int32 multiply-sum, each against exact host indexing.
   Table values span the realistic offset range (0..30000 bank rows).

Writes tools/precision_probe.json. Usage: python tools/precision_probe.py
(requires a TPU; on CPU the fp32 deltas are all ~0 by construction).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_best(fn, *args, iters=10, windows=2):
    import jax

    r = fn(*args)  # warmup / compile
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3  # ms


def main() -> None:
    import jax
    import jax.numpy as jnp

    out: dict = {"backend": jax.default_backend(), "device": str(jax.devices()[0])}

    # 1) comb-bank shapes: error + batch-40 timing per precision
    B, nb, L = 5, 102, 607
    rng = np.random.default_rng(0)
    t = (rng.standard_normal((B, nb, nb)) * 0.1).astype(np.float32)
    x = rng.standard_normal((B, nb, L)).astype(np.float32)
    ref = np.einsum("bkm,bml->kl", t.astype(np.float64), x.astype(np.float64))
    comb = {}
    for prec in (None, "highest"):
        f = jax.jit(
            lambda a, b, p=prec: jax.lax.dot_general(
                a, b, (((0, 2), (0, 1)), ((), ())), precision=p
            )
        )
        y = np.asarray(f(jnp.asarray(t), jnp.asarray(x)))
        rel = float(np.abs(y - ref).max() / np.abs(ref).max())
        fv = jax.jit(
            jax.vmap(
                lambda a, b, p=prec: jax.lax.dot_general(
                    a, b, (((0, 2), (0, 1)), ((), ())), precision=p
                )
            )
        )
        tb = jnp.asarray(np.repeat(t[None], 40, 0))
        xb = jnp.asarray(np.repeat(x[None], 40, 0))
        ms = _time_best(fv, tb, xb)
        comb[str(prec)] = {"rel_err": rel, "batch40_ms": round(ms, 4)}
    out["comb_bank"] = comb

    # 2) one-hot x integer table: worst integer corruption per (shape, precision)
    sweep = {}
    for rows, cols, n_sel in ((128, 8, 1), (128, 22, 27), (1024, 256, 256)):
        table = rng.integers(0, 30_000, size=(rows, cols)).astype(np.float32)
        idx = rng.integers(0, rows, size=n_sel)
        onehot = np.eye(rows, dtype=np.float32)[idx]
        exact = table[idx]
        entry = {}
        for prec in (None, "highest"):
            f = jax.jit(lambda o, m, p=prec: jnp.matmul(o, m, precision=p))
            got = np.asarray(f(jnp.asarray(onehot), jnp.asarray(table)))
            entry[str(prec)] = float(np.abs(got - exact).max())
        sweep[f"{n_sel}x{rows}@{rows}x{cols}"] = entry
    out["onehot_shape_sweep"] = sweep

    # 3) the ACTUAL production table-read lowering: batch-64 vmapped-under-jit
    # one-hot reads at _sample_timbre_rows shapes (27 slots, 128 pitches,
    # 22 = 2*N_BINS table columns), values in the realistic offset range
    BATCH, SLOTS, PITCHES, COLS = 64, 27, 128, 22
    table_i = rng.integers(0, 30_000, size=(PITCHES, COLS)).astype(np.int32)
    pitches = rng.integers(0, PITCHES, size=(BATCH, SLOTS)).astype(np.int32)
    exact = table_i[pitches]  # (BATCH, SLOTS, COLS) host int indexing

    def f32_read(p, tbl, prec):
        oh = jax.nn.one_hot(p, PITCHES, dtype=jnp.float32)
        return jnp.matmul(oh, tbl.astype(jnp.float32), precision=prec).astype(
            jnp.int32
        )

    def int32_read(p, tbl):
        ohi = (p[:, None] == jnp.arange(PITCHES, dtype=p.dtype)[None, :]).astype(
            jnp.int32
        )
        return jnp.sum(ohi[:, :, None] * tbl[None, :, :], axis=1)

    tbl_j = jnp.asarray(table_i)
    p_j = jnp.asarray(pitches)
    instep = {}
    for name, fn in (
        ("f32_default", jax.jit(jax.vmap(lambda p: f32_read(p, tbl_j, None)))),
        ("f32_highest", jax.jit(jax.vmap(lambda p: f32_read(p, tbl_j, "highest")))),
        ("int32", jax.jit(jax.vmap(lambda p: int32_read(p, tbl_j)))),
    ):
        got = np.asarray(fn(p_j))
        instep[name] = {
            "max_abs_int_error": float(np.abs(got.astype(np.int64) - exact).max()),
            "ms": round(_time_best(fn, p_j), 4),
        }
    out["table_read_in_step"] = instep

    path = Path(__file__).parent / "precision_probe.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
