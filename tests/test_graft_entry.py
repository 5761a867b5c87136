"""Driver-contract test for __graft_entry__.dryrun_multichip.

Round-1 failure mode (VERDICT.md Missing #1): the driver invokes
`dryrun_multichip(8)` on a host whose JAX runtime is already initialized with
a single device; the function must self-provision an 8-device virtual CPU
mesh (subprocess re-exec with the conftest recipe) rather than assert. This
test reproduces the driver environment exactly: a fresh interpreter pinned to
the CPU platform with NO device-count override, i.e. one visible device.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


import pytest


@pytest.mark.parametrize("n", [4, 8])
@pytest.mark.slow
def test_dryrun_multichip_self_provisions_virtual_mesh(n):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # strip any device-count override so the outer process sees ONE device,
    # like the driver's single-chip TPU host
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1, jax.devices(); "
        "import __graft_entry__ as g; g.dryrun_multichip({n})".format(n=n)
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr}"
    assert "synth-fused train step OK" in proc.stdout, proc.stdout
    # both production layouts must run: pure DP(+FSDP) and DP x TP (the
    # dryrun itself asserts the shardings + compiled collectives took effect)
    assert f"mesh data={n} x model=1" in proc.stdout, proc.stdout
    assert f"mesh data={n // 2} x model=2" in proc.stdout, proc.stdout
    # machine-readable perf record: timed steps + per-layout collective
    # counts from the compiled HLO (the driver stores this in MULTICHIP_r*)
    import json

    perf_lines = [
        l for l in proc.stdout.splitlines() if l.startswith("MULTICHIP_PERF ")
    ]
    assert len(perf_lines) == 1, proc.stdout
    perf = json.loads(perf_lines[0].removeprefix("MULTICHIP_PERF "))
    assert perf["n_devices"] == n
    executed = [l for l in perf["layouts"] if not l.get("compile_only")]
    flagship = [l for l in perf["layouts"] if l.get("compile_only")]
    assert len(executed) == 2
    for layout in executed:
        assert layout["per_step_ms"] > 0
        assert layout["collectives"], layout  # sharded -> collectives exist
    # FLAGSHIP-shape compile-only records: f32 always; bf16 gradient
    # transport at the production slice size (n=8). f32: compiled-HLO and
    # traced-StableHLO byte extractions must agree (cross-validates both
    # parsers); bf16: the traced module must carry bf16 collective bytes at
    # ~half the f32 total (the CPU backend's compiled HLO can't evidence
    # this — AllReducePromotion rewrites bf16 all-reduces to f32; a TPU
    # backend keeps them).
    expected = ["f32", "bf16"] if n == 8 else ["f32"]
    assert [f["comm_dtype"] for f in flagship] == expected
    f32r = flagship[0]
    assert f32r["collectives"], f32r
    assert (
        f32r["ici_bytes_per_device_per_step"]
        == f32r["ici_bytes_per_device_per_step_stablehlo"]
    )
    if n == 8:
        bf16r = flagship[1]
        shlo = bf16r["stablehlo_collective_bytes"]
        bf16_bytes = sum(r["by_dtype"].get("bf16", 0) for r in shlo.values())
        assert bf16_bytes > 0, shlo
        ratio = (
            bf16r["ici_bytes_per_device_per_step_stablehlo"]
            / f32r["ici_bytes_per_device_per_step"]
        )
        assert 0.49 < ratio < 0.52, ratio


def test_hlo_collective_counts_handles_async_tuple_types():
    """Async collective starts carry tuple result types containing spaces
    (`= (f32[4]{0}, f32[8]{0}) all-gather-start(...)`); a backend lowering
    every collective to async form must not be miscounted as 'silently
    replicated'. `-done` ops must NOT double-count."""
    import __graft_entry__ as g

    hlo = """
  %ar = f32[8]{0} all-reduce(f32[8]{0} %x), replica_groups={}
  %ag = (f32[4]{0}, f32[8]{0}) all-gather-start(f32[4]{0} %y), dimensions={0}
  %agd = f32[8]{0} all-gather-done((f32[4]{0}, f32[8]{0}) %ag)
  %cp = bf16[2]{0} collective-permute(bf16[2]{0} %z), source_target_pairs={{0,1}}
"""
    assert g._hlo_collective_counts(hlo) == {
        "all-reduce": 1,
        "all-gather": 1,
        "collective-permute": 1,
    }
