"""Measure XLA:TPU fp32 dot_general behavior at DEFAULT vs 'highest'.

Evidence artifact behind the fp32 matmul precision contract
(docs/DESIGN.md "fp32 matmul precision contract",
tests/test_precision_contract.py): XLA:TPU lowers fp32 dots at DEFAULT
precision to one bf16 MXU pass. This probe measures, on the real chip:

1. relative error vs a float64 host reference at the FX comb-bank shapes
   ((5, nb, nb) x (5, nb, L), the production phase-decomposition sizes);
2. the same for a one-hot x integer-table contraction (the ADTOF bank-row
   offset read and the beam token backtrace pattern) — reporting the LARGEST
   integer-value error, which is the silent-corruption mechanism;
3. best-of-3 timing of each variant vmapped over the production batch.

Writes tools/precision_probe.json. Usage: python tools/precision_probe.py
(requires a TPU; on CPU the deltas are all ~0 by construction).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_best(fn, *args, iters=20, windows=3):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else fn(
        *args
    ).block_until_ready()
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        r.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3  # ms


def main() -> None:
    import jax
    import jax.numpy as jnp

    out: dict = {"backend": jax.default_backend(), "device": str(jax.devices()[0])}

    # 1/3) comb-bank shapes: error + batch-40 timing per precision
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

    # 2) one-hot x integer table: worst integer corruption per precision
    table = np.zeros((128, 8), np.float32)
    table[40] = [29_951, 12_345, 1_399, 517, 511, 256, 3, 0]
    onehot_rows = jnp.asarray(np.eye(128, dtype=np.float32)[40:41])
    sel = {}
    for prec in (None, "highest"):
        f = jax.jit(lambda o, m, p=prec: jnp.matmul(o, m, precision=p))
        got = np.asarray(f(onehot_rows, jnp.asarray(table)))[0]
        sel[str(prec)] = {
            "max_abs_int_error": float(np.abs(got - table[40]).max()),
            "values": got.tolist(),
        }
    out["onehot_int_table"] = sel

    path = Path(__file__).parent / "precision_probe.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
