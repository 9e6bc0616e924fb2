"""Test configuration: run everything on CPU with an 8-device fake mesh.

The axon sitecustomize registers a single-TPU backend at interpreter start;
tests instead want a deterministic 8-device CPU platform (the documented
stand-in for multi-chip TPU testing). Backends initialize lazily, so
selecting cpu here — before any test touches jax.devices() — is sufficient.
"""

import os

import numpy as np
import pytest

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    + os.environ.get("XLA_FLAGS", "")
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
