"""Print the FX-chain vs JUCE-oracle A/B table (docs/BENCHMARKS.md).

Computes the exact quantities `tests/test_fx_distributions.py` bounds —
RT60 per room size, wet spectral centroid per damping, drum-signal
output-energy distribution, compressor static gain-reduction error, limiter
steady-state ceiling — and prints them side by side so the docs table can be
refreshed whenever either side changes (both sides moved when the envelope
ballistics were corrected to JUCE's exp(-2*pi*1000/(sr*t_ms)) form).

CPU-only (numpy oracle + the JAX chain on any backend). Writes
tools/fx_ab_report.json.

Usage: python tools/fx_ab_report.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import fx_oracle as orc
    from adt_str_tpu.synth import fx

    SR = 24000
    N = int(2.56 * SR)
    report: dict = {}

    imp = np.zeros(N, np.float32)
    imp[100] = 1.0

    # exact-topology check: at damping=0 the banded damping degenerates and
    # the phase-decomposed combs/allpasses must equal the scipy IIR oracle
    ir_o0 = orc.freeverb(imp, SR, 0.5, 0.0, 1.0, dry_level=0.0)
    ir_u0 = np.asarray(fx.reverb(jnp.asarray(imp), SR, 0.5, 0.0, 1.0))
    report["reverb_damp0_max_abs_diff"] = float(np.abs(ir_o0 - ir_u0).max())

    rt60 = {}
    for room in (0.2, 0.5, 0.8):
        ir_o = orc.freeverb(imp, SR, room, 0.5, 1.0, dry_level=0.0)
        ir_u = np.asarray(
            fx.reverb(jnp.asarray(imp), SR, room, 0.5, 1.0)
        )
        rt60[room] = {
            "ours_s": round(orc.rt60_from_ir(ir_u, SR), 3),
            "oracle_s": round(orc.rt60_from_ir(ir_o, SR), 3),
        }
    report["rt60_by_room"] = rt60

    cent = {}
    for damp in (0.2, 0.5, 0.8):
        ir_o = orc.freeverb(imp, SR, 0.5, damp, 1.0, dry_level=0.0)
        ir_u = np.asarray(
            fx.reverb(jnp.asarray(imp), SR, 0.5, damp, 1.0)
        )
        cent[damp] = {
            "ours_hz": round(orc.spectral_centroid(ir_u[100:], SR), 1),
            "oracle_hz": round(orc.spectral_centroid(ir_o[100:], SR), 1),
        }
    report["wet_centroid_by_damping"] = cent

    # drum-signal output/input RMS distribution over the reference's ranges
    rng0 = np.random.default_rng(0)
    sig = np.zeros(N, np.float32)
    for t0 in (0.1, 0.5, 0.9, 1.4, 1.9):
        i = int(t0 * SR)
        L = 4000
        sig[i : i + L] += (
            np.exp(-np.arange(L) / 800) * rng0.normal(size=L) * 0.4
        ).astype(np.float32)
    sig = np.clip(sig, -1, 1)
    rms_in = float(np.sqrt((sig**2).mean()))
    ro, ru = [], []
    for s in range(10):
        r = np.random.default_rng(s)
        room = r.uniform(0.2, 0.8)
        damp = r.uniform(0.2, 0.8)
        wet = r.uniform(0.1, 0.4)
        width = r.uniform(0.6, 1.0)
        yo = orc.freeverb(sig, SR, room, damp, wet, width=width)
        yu = np.asarray(
            fx.reverb(jnp.asarray(sig), SR, room, damp, wet, width)
        )
        ro.append(float(np.sqrt((yo**2).mean())) / rms_in)
        ru.append(float(np.sqrt((yu**2).mean())) / rms_in)
    report["energy_ratio"] = {
        "ours_mean": round(float(np.mean(ru)), 3),
        "ours_std": round(float(np.std(ru)), 3),
        "oracle_mean": round(float(np.mean(ro)), 3),
        "oracle_std": round(float(np.std(ro)), 3),
        "max_per_draw_abs_delta": round(
            float(np.abs(np.asarray(ru) - np.asarray(ro)).max()), 4
        ),
    }

    t = np.arange(N) / SR
    max_gr_err = 0.0
    for amp_db in (-12, -3, 0):
        x = (10 ** (amp_db / 20) * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        yo = orc.juce_compressor(x, SR, -6.0, 4.0, 10.0, 200.0)
        yu = np.asarray(fx.compressor(jnp.asarray(x), SR, -6.0, 4.0, 10.0, 200.0))
        max_gr_err = max(
            max_gr_err, abs(orc.gain_reduction_db(x, yu) - orc.gain_reduction_db(x, yo))
        )
    report["compressor_max_static_gr_err_db"] = round(max_gr_err, 3)

    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    h = N // 2
    yo = orc.juce_limiter(x, SR, -3.0)
    yu = np.asarray(fx.limiter(jnp.asarray(x), SR, -3.0))
    report["limiter_ceiling_db_at_thr_-3"] = {
        "ours": round(20 * float(np.log10(np.abs(yu[h:]).max())), 2),
        "oracle": round(20 * float(np.log10(np.abs(yo[h:]).max())), 2),
    }

    out = Path(__file__).parent / "fx_ab_report.json"
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
