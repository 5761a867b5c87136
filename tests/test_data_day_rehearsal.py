"""Data-day rehearsal (VERDICT r4 #2): the FULL reference pipeline —
midi_parser -> CLAP curation -> copy originals -> HDF5 pack -> train -> eval
(`/root/reference/DATASET_AUGMENTATION_PIPELINE.md:5-24`) — through the real
CLIs as subprocesses, one command, ending in a real F1 assertion.

Stage tests elsewhere prove each CLI in isolation; this proves the
INTERFACES compose (file layouts, config keys, checkpoint formats) — the
classic failure mode when real corpora land.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_data_day_rehearsal_chain(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # run the chain at the documented single-device protocol: inheriting the
    # suite's --xla_force_host_platform_device_count=8 would put the train
    # stage on an 8-process virtual mesh — a 1-core host then timeshares 8
    # device threads and the 3-minute train stage blows past the timeout
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    proc = subprocess.run(
        [sys.executable, "tools/data_day_rehearsal.py",
         "--workdir", str(tmp_path / "work"),
         "--steps", "400", "--threshold", "0.75"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600,
    )
    assert proc.returncode == 0, (
        f"--- stdout ---\n{proc.stdout[-4000:]}\n"
        f"--- stderr ---\n{proc.stderr[-2000:]}"
    )
    report = json.loads((REPO / "tools" / "data_day_rehearsal.json").read_text())
    assert report["passed"] is True
    assert report["final_metrics"]["f_measure"] > 0.75
    # every stage of the reference pipeline ran and was timed
    stages = report["stage_wall_seconds"]
    assert set(stages) == {
        "0_synthesize_corpus", "1_midi_parser", "2_clap_curation",
        "3_copy_originals", "4_hdf5_pack", "5_train", "6_eval",
    }
    assert all(v > 0 for v in stages.values())
