"""v5e-8 throughput projection: composed from measurements, not hand-waving.

The north star (BASELINE.json) asks for >5x the PyTorch reference's training
steps/sec on a v5e-8. No multi-chip hardware exists in this image, so the
claim is COMPOSED from three measured artifacts (VERDICT r4 #3):

1. **Measured single-chip step time** on the real v5e chip (`bench.py`,
   best-of-3 windows): the flagship synth-fused train step at batch 64,
   plus a batch-8 variant measured here (the per-chip batch when the
   reference's own global batch 64 is data-parallel over 8 chips).

2. **Measured communication structure** of the FLAGSHIP-shape sharded
   program: `__graft_entry__.flagship_sharded_compile` compiles the real
   768-d/4+4/vocab-1400 train step on a virtual 8-device mesh (same
   recipe the driver's dryrun uses) and extracts per-device ICI bytes per
   step from the compiled HLO (bidirectional-ring byte model per
   collective — see `_hlo_collective_bytes`).

3. **Public v5e ICI bandwidth**: 4.5e10 bytes/s per link per direction
   (jax-ml.github.io/scaling-book). The projection conservatively assumes
   a SINGLE ring axis (a v5e-8 slice is a 2x4 torus — using the second
   axis or overlapping comm with compute would only improve it) and ZERO
   compute/communication overlap.

Projected v5e-8 step time = measured single-chip step + ici_bytes / W_ici.

Two framings are reported:
- `same_global_batch_64`: the reference's own configuration (global batch
  64, `setting-1.yaml`) data-parallel over 8 chips (batch 8/chip), vs the
  reference's measured upper bound 3.256 steps/s (tools/
  measure_reference_baseline.py — 16 dataloader workers, FX stubbed,
  device step assumed free; its CPU synthesis is host-bound, so extra
  accelerators do not lift it).
- `weak_scaling_bs64_per_chip`: batch 64/chip (global 512) — the
  production configuration; reports samples/s and DP efficiency.

Usage: python tools/scaling_projection.py [--skip-tpu] [--bs64-ms MS]
Writes tools/scaling_projection.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

V5E_ICI_BYTES_PER_S = 4.5e10  # per link per direction (scaling book)
REF_STEPS_PER_SEC = 3.256  # measured reference upper bound (bench.py)
N_DEVICES = 8


def _flagship_collectives(per_device_batch: int, comm_dtype: str | None = None) -> dict:
    """Compile the flagship sharded step on a virtual 8-device CPU mesh in a
    subprocess (the axon PJRT plugin owns this interpreter's backend) and
    return the collective-bytes record."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEVICES}"
    ).strip()
    code = (
        "import jax, json; jax.config.update('jax_platforms', 'cpu'); "
        "import __graft_entry__ as g; "
        f"r = g.flagship_sharded_compile({N_DEVICES}, 1, "
        f"per_device_batch={per_device_batch}, comm_dtype={comm_dtype!r}); "
        "print('RESULT ' + json.dumps(r))"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=ROOT, env=env,
        capture_output=True, text=True, timeout=1800,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"flagship compile failed:\n{proc.stderr[-3000:]}")
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line in:\n{proc.stdout[-2000:]}")


def _measure_single_chip_ms(batch_size: int) -> float:
    """Measure the flagship synth-fused step on the real chip at
    `batch_size` (bench.py methodology: pre-staged rngs, best-of-3
    windows, host transfer drains the tunnel queue)."""
    import jax

    from adt_str_tpu.utils.misc import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config, _make_batch, make_notes
    from adt_str_tpu.config import SynthConfig, TrainingConfig
    from adt_str_tpu.data.datasets import trim_note_bucket
    from adt_str_tpu.models import adt
    from adt_str_tpu.parallel.train_step import (
        init_train_state,
        make_synth_train_step,
    )
    from adt_str_tpu.synth.bank import make_test_bank
    from adt_str_tpu.synth.render import SynthStatics
    from adt_str_tpu.training.optimizer import make_optimizer

    cfg = _flagship_config()
    rng = np.random.default_rng(0)
    bank = make_test_bank(
        rng, [35, 36, 38, 41, 42, 46, 48, 49],
        sample_rate=cfg.sample_rate, max_len=30720, n_per_bin=8,
    )
    statics = SynthStatics.from_bank(bank)
    synth_cfg = SynthConfig(
        sample_rate=cfg.sample_rate, input_sec=cfg.input_sec,
        mixup_range=0.8, use_fx_prob=0.3, similarity_threshold=0.8,
        max_notes=128, max_oneshot_sec=1.28,
    )
    params = adt.init_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(
        TrainingConfig(learning_rate=1e-4, warmup_ratio=0.1),
        total_steps=10_000, params=params,
    )
    base = _make_batch(cfg, batch_size=batch_size, max_tokens=256, make_wavs=False)
    notes, mask = make_notes(
        rng, batch_size, max_notes=128,
        pitches=[35, 36, 38, 41, 42, 46, 48], onset_hi=2.4,
    )
    trimmed = trim_note_bucket({"notes": notes, "note_mask": mask})
    batch = {
        "notes": jnp.asarray(trimmed["notes"]),
        "note_mask": jnp.asarray(trimmed["note_mask"]),
        "tokens": base["tokens"],
        "token_lengths": base["token_lengths"],
    }
    step = make_synth_train_step(cfg, synth_cfg, statics, tx)
    state = init_train_state(params, tx)
    warmup, measure, windows = 3, 20, 3
    rngs = [jax.random.PRNGKey(i) for i in range(warmup + windows * measure)]
    for i in range(warmup):
        state, metrics = step(state, batch, rngs[i])
    float(metrics["loss"])
    best = float("inf")
    k = warmup
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(measure):
            state, metrics = step(state, batch, rngs[k])
            k += 1
        final = float(metrics["loss"])
        best = min(best, time.perf_counter() - t0)
        assert np.isfinite(final)
    return best / measure * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-tpu", action="store_true",
                    help="reuse recorded step times instead of measuring")
    ap.add_argument("--bs64-ms", type=float, default=None,
                    help="override the measured bs64 single-chip ms/step")
    ap.add_argument("--bs8-ms", type=float, default=None)
    args = ap.parse_args()

    out: dict = {
        "model": "flagship setting-1 (d768, 4+4, vocab 1400, 2.56s@24kHz)",
        "assumptions": {
            "v5e_ici_bytes_per_s_per_link_per_dir": V5E_ICI_BYTES_PER_S,
            "ring_axes_used": 1,
            "compute_comm_overlap": 0.0,
            "note": "single-axis bidirectional ring on a 2x4 v5e-8 torus; "
                    "using the 2nd axis or overlap only improves these numbers",
        },
        "reference_bound_steps_per_sec": REF_STEPS_PER_SEC,
    }

    # measured single-chip step times
    if args.bs64_ms is not None:
        ms64 = args.bs64_ms
    elif args.skip_tpu:
        prev = json.loads(Path(__file__).with_name(
            "scaling_projection.json").read_text())
        ms64 = prev["measured"]["single_chip_ms_bs64"]
    else:
        ms64 = _measure_single_chip_ms(64)
    if args.bs8_ms is not None:
        ms8 = args.bs8_ms
    elif args.skip_tpu:
        ms8 = prev["measured"]["single_chip_ms_bs8"]
    else:
        ms8 = _measure_single_chip_ms(8)
    out["measured"] = {
        "single_chip_ms_bs64": round(ms64, 2),
        "single_chip_ms_bs8": round(ms8, 2),
    }

    # flagship-shape communication structure (virtual mesh, compiled HLO).
    # Two comm dtypes per framing: f32 (the exact-pmean default the
    # equivalence tests pin) and bf16 transport
    # (`training.grad_allreduce_dtype: bf16` — halves the one collective;
    # see parallel/train_step._allreduce_grads).
    framings = {}
    for name, pdb, ms in (
        ("same_global_batch_64", 8, ms8),
        ("weak_scaling_bs64_per_chip", 64, ms64),
    ):
        def project(comm_dtype):
            rec = _flagship_collectives(pdb, comm_dtype)
            if comm_dtype == "bf16":
                # the virtual-CPU backend promotes bf16 all-reduces back to
                # f32 in its compiled HLO (XLA AllReducePromotion), so byte
                # accounting for bf16 transport must read the TRACED module
                # — the program a TPU backend receives and keeps bf16
                ici = rec["ici_bytes_per_device_per_step_stablehlo"]
                shlo = rec["stablehlo_collective_bytes"]
                bf16_bytes = sum(
                    r["by_dtype"].get("bf16", 0) for r in shlo.values()
                )
                assert bf16_bytes > 0, (
                    "bf16 transport did not reach the traced program"
                )
            else:
                ici = rec["ici_bytes_per_device_per_step"]
            comm_ms = ici / V5E_ICI_BYTES_PER_S * 1e3
            step_ms = ms + comm_ms
            steps_per_sec = 1e3 / step_ms
            return {
                "collectives": rec["collectives"],
                "ici_bytes_per_device_per_step": ici,
                "projected_comm_ms": round(comm_ms, 2),
                "projected_step_ms": round(step_ms, 2),
                "projected_steps_per_sec": round(steps_per_sec, 2),
                "projected_samples_per_sec": round(
                    steps_per_sec * pdb * N_DEVICES, 1
                ),
                "dp_efficiency": round(ms / step_ms, 4),
            }

        f32 = project(None)
        framings[name] = {
            "per_device_batch": pdb,
            "global_batch": pdb * N_DEVICES,
            **f32,
            "bf16_grad_allreduce": project("bf16"),
        }
    out["framings"] = framings

    g64 = framings["same_global_batch_64"]
    out["north_star"] = {
        "claim": "v5e-8 steps/s at the reference's own global batch 64 vs "
                 "the measured reference upper bound",
        "projected_steps_per_sec": g64["projected_steps_per_sec"],
        "reference_steps_per_sec": REF_STEPS_PER_SEC,
        "speedup": round(g64["projected_steps_per_sec"] / REF_STEPS_PER_SEC, 2),
        "speedup_with_bf16_comm": round(
            g64["bf16_grad_allreduce"]["projected_steps_per_sec"]
            / REF_STEPS_PER_SEC, 2,
        ),
        "note": "the reference bound is HOST-synthesis-bound (16 workers, "
                "FX stubbed, device step free) and does not scale with "
                "accelerator count; see bench.py docstring",
    }

    path = Path(__file__).with_name("scaling_projection.json")
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
