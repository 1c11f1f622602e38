"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with XLA_FLAGS=--xla_force_host_platform_device_count=8
so sharding/collective paths are exercised without TPU hardware
(the multi-host test strategy from SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

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
