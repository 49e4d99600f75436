"""Test config: run everything on a virtual 8-device CPU mesh so distributed logic
is exercised hermetically (the TPU analog of a fake process group — SURVEY.md §4).

NOTE: this environment pre-sets JAX_PLATFORMS=axon and a sitecustomize that
eagerly registers the TPU plugin, so env vars alone are not enough — we must also
flip jax.config after import (verified to work even post-registration).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
