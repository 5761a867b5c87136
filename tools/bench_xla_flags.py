"""Sweep XLA:TPU compiler flags over the flagship synth-fused train step.

The model step sits at ~96% of the bf16 matmul roofline (docs/DESIGN.md) and
every source-level lever has been measured; what remains is compiler
scheduling. Each flag set runs `bench.py` in its own subprocess (flags are
process-global) and the best-of-3-window steps/s is recorded.

Writes tools/xla_flags_bench.json and prints one line per case.

MEASURED RESULT on this image (2026-08-18, recorded in the JSON): the axon
tunnel client's XLA build does not register the TPU backend's flag namespace
— every `--xla_tpu_*` flag dies in `parse_flags_from_env` with "Unknown
flag" before the program reaches the remote compiler, so compiler-flag
tuning is not reachable through this tunnel. On a real TPU VM (libtpu
in-process) the same flags parse; re-run the sweep there. Baseline case
(no extra flags) measured 13.864 steps/s, matching bench.py.

Usage: python tools/bench_xla_flags.py [--only baseline,lhs]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# each case: extra XLA_FLAGS appended to the environment's
CASES: dict[str, str] = {
    "baseline": "",
    # latency-hiding scheduler: overlaps collective/DMA with compute; on a
    # single chip it mainly reorders async copies around the MXU ops
    "lhs": "--xla_tpu_enable_latency_hiding_scheduler=true",
    # larger scoped-vmem lets fusions keep bigger operands resident
    "vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem_128m": "--xla_tpu_scoped_vmem_limit_kib=131072",
}
# a bad/unknown flag fails only its own subprocess and is recorded as an
# error entry — safe to extend this table speculatively


def run_case(name: str, flags: str, timeout: int) -> dict:
    env = dict(os.environ)
    base = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = f"{base} {flags}".strip()
    # flag changes alter the compiled program: do not poison the shared
    # persistent cache entry namespace (jax keys on flags, but keep it tidy)
    try:
        proc = subprocess.run(
            [sys.executable, str(REPO / "bench.py")],
            env=env, capture_output=True, text=True, timeout=timeout, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {timeout}s"}
    line = next(
        (l for l in proc.stdout.splitlines() if l.startswith("{")), None
    )
    if proc.returncode != 0 or line is None:
        return {"error": (proc.stderr or "no output")[-300:]}
    out = json.loads(line)
    return {"steps_per_sec": out["value"], "flags": flags}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, help="comma-separated case names")
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument(
        "--out", default=str(Path(__file__).parent / "xla_flags_bench.json")
    )
    args = ap.parse_args()
    names = args.only.split(",") if args.only else list(CASES)
    results: dict = {}
    for name in names:
        results[name] = run_case(name, CASES[name], args.timeout)
        print(name, results[name], flush=True)
    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")


if __name__ == "__main__":
    main()
