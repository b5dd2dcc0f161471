"""Test harness: force a local 8-device CPU mesh.

The container's sitecustomize registers a remote-TPU ('axon') PJRT plugin for
every process and pins jax_platforms to it; tests must run on local CPU with 8
virtual devices (the TPU-pod fake backend, SURVEY §4e), so we override the
platform before any backend is initialized.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped: every test draws from its own fixed stream, so adding
    # or reordering tests can never shift another test's random data
    return np.random.default_rng(0)
