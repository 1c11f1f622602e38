"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with xla_force_host_platform_device_count=8 so
sharding/collective paths are exercised without TPU hardware (the
multi-host test strategy from SURVEY.md §4).

Note: this host's sitecustomize registers a tunneled TPU backend and pins
JAX_PLATFORMS=axon before pytest starts, so the override must go through
jax.config *after* import (backends initialize lazily — this is safe as
long as no array op ran yet).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def small_interactions():
    from genrec_tpu.data import synthetic
    return synthetic.make_interactions(num_users=60, num_items=50, min_len=3,
                                       max_len=12, seed=0)
