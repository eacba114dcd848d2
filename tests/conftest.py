"""Test harness: run all JAX on a virtual 8-device CPU platform so the
multi-chip sharding paths are exercised without TPU hardware.

This image's axon sitecustomize imports jax at interpreter startup, so
env vars alone are too late; jax is already imported. Backends initialize
lazily though, so forcing the platform through jax.config before the
first jax.devices() call still selects the 8-device CPU platform.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # 8 virtual devices share this image's ONE physical core, so an XLA:CPU
    # in-process collective (the train step's psum) can have participants
    # starved past the rendezvous watchdog's short default, which then
    # LOG(FATAL)s and aborts the whole test run from an Eigen worker
    # (diagnosed from a core dump: AllReduceThunk::Execute ->
    # Rendezvous -> absl LogMessage::SendToLog -> abort). The stall is
    # transient scheduler starvation, not deadlock — give it time instead
    # of dying.
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=86400"
).strip()
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert len(jax.devices()) == 8, (
    f"test harness needs 8 virtual CPU devices, got {jax.devices()}"
)


@pytest.fixture(scope="session")
def mesh8():
    from video_dqn_tpu.parallel import make_mesh

    return make_mesh(data=4, model=2)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
