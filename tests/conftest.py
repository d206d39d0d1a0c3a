"""Test configuration: CPU backend with a virtual 8-device mesh.

The reference tests run against the real GPU (SURVEY.md §4); our CPU rung is
the "fake backend" it lacks — Pallas kernels run in interpret mode (selected
automatically by ops/attention.py on the CPU backend) and sharding tests run
on 8 virtual CPU devices. Real-chip validation happens in bench.py.
"""

import os

# Must be set before jax imports anywhere. Overwrite, not setdefault: the
# environment presets JAX_PLATFORMS=axon (the real-chip tunnel), and the test
# suite must run on the CPU rung (bench.py owns the real chip).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU tunnel backend and rewrites
# jax_platforms to "axon,cpu"; override at the config level so tests really
# run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
