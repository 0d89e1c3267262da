"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh so sharding/collective paths are
exercised without TPU hardware (the standard JAX way to test multi-chip
programs — SURVEY §4). Must run before jax is imported anywhere.
"""
import os

# Tests default to a virtual 8-device CPU mesh. SKRX_TEST_TPU=1 runs them on
# the real TPU instead (useful to verify device numerics; the mesh-dependent
# tests will then see a single device and skip/adjust).
_USE_TPU = os.environ.get("SKRX_TEST_TPU") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    prev = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in prev:
        os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize force-registers the TPU backend via
# jax.config.update("jax_platforms", ...) which overrides the env var, so we
# override it back before any backend is initialized.
import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def synth_dataset(tmp_path_factory):
    """A small synthetic dataset dir + RSDataset, shared across tests."""
    from skrx.io import synthetic, RSDataset
    root = tmp_path_factory.mktemp("data")
    path = synthetic.make_dataset_dir(str(root), num_users=60, num_items=90,
                                      num_ratings=1500, seed=7)
    return RSDataset(path, "\t", "UIRT")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
