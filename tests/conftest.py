"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-device parallelism (DP/TP over `jax.sharding.Mesh`) is tested without
TPU hardware via XLA's host-platform device splitting, per SURVEY.md §4's
"consequence" plan. Real-TPU benchmarking happens in bench.py, not tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# strip-and-replace, not append-if-absent: the suite hard-requires EXACTLY 8
# virtual devices, and an inherited --xla_force_host_platform_device_count=N
# from the launching environment (e.g. a driver that just ran
# dryrun_multichip(4)) would otherwise fail every mesh-shape assertion
xla_flags = " ".join(
    f
    for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
)
os.environ["XLA_FLAGS"] = (
    xla_flags + " --xla_force_host_platform_device_count=8"
).strip()

# The image's sitecustomize registers an `axon` TPU PJRT plugin at interpreter
# startup; an explicit config update (not just the env var) is needed to pin
# tests to the virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
