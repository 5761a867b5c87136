"""int8 vs bf16 matmul feasibility on this chip (VERDICT round-1, Weak #3).

v5e's MXU doubles throughput for int8 (394 TOPS vs 197 bf16 TFLOPS). The
model step is already at ~96% of the bf16 roofline, so int8 on the FFN/
generator matmuls is the only remaining >10% step-time lever. This tool
answers the cheap question first: does XLA actually hit the int8 rate at the
flagship shapes? (If not, the quantized-training design work is moot.)

Shapes: FFN linear1/linear2 at bs64 (16k x 768 x 3072) and the generator
(16k x 768 x 1400). Prints ms + effective TOPS for bf16, int8, and int8
with bf16 dequant epilogue (the realistic training formulation).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def timeit(f, *a):
        out = f(*a)
        np.asarray(out.reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = f(*a)
        np.asarray(out.reshape(-1)[0])
        return (time.perf_counter() - t0) / args.steps * 1e3

    for M, K, N, label in [
        (16384, 768, 3072, "ffn linear1"),
        (16384, 3072, 768, "ffn linear2"),
        (16384, 768, 1400, "generator"),
    ]:
        flops = 2 * M * K * N
        x8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
        xb = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
        wb = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)
        scale = jnp.float32(0.01)

        @jax.jit
        def mm_bf16(x, w):
            return jax.lax.dot(x, w, preferred_element_type=jnp.float32)

        @jax.jit
        def mm_int8(x, w):
            return jax.lax.dot(x, w, preferred_element_type=jnp.int32)

        @jax.jit
        def mm_int8_dequant(x, w, s):
            acc = jax.lax.dot(x, w, preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * s).astype(jnp.bfloat16)

        t_b = timeit(mm_bf16, xb, wb)
        t_i = timeit(mm_int8, x8, w8)
        t_d = timeit(mm_int8_dequant, x8, w8, scale)
        print(
            f"{label:12s} bf16 {t_b:7.3f} ms ({flops/t_b/1e9:6.1f} T/s)   "
            f"int8 {t_i:7.3f} ms ({flops/t_i/1e9:6.1f} T/s)   "
            f"int8+dequant {t_d:7.3f} ms ({flops/t_d/1e9:6.1f} T/s)"
        )


if __name__ == "__main__":
    main()
