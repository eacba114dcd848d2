"""Test harness: run all JAX on a virtual 8-device CPU platform so the
multi-chip sharding paths are exercised without TPU hardware.

Must set env vars before any `import jax` anywhere: JAX_PLATFORM_NAME
(JAX_PLATFORMS alone is overridden by the axon TPU plugin in this image).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import pytest


@pytest.fixture(scope="session")
def mesh8():
    from video_dqn_tpu.parallel import make_mesh

    return make_mesh(data=4, model=2)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
