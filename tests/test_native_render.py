"""Native sim-core raycaster: parity against the Python renderer (the
oracle) and the speedup that justifies its existence."""

import math
import time

import numpy as np
import pytest

from video_dqn_tpu.sim import native_render
from video_dqn_tpu.sim.fake_env import FakeNavEnv

pytestmark = pytest.mark.skipif(
    not native_render.available(), reason="libsimcore did not build"
)


def test_native_matches_python_renderer():
    env_py = FakeNavEnv(image_size=64, use_native=False)
    env_c = FakeNavEnv(image_size=64, use_native=True)
    pos = np.array([1.3, 0.0, 1.7])
    for ang in [0.0, math.pi / 3, -1.2]:
        env_py.set_agent_state(pos, ang)
        env_c.set_agent_state(pos, ang)
        o_py = env_py.get_observation()
        o_c = env_c.get_observation()
        np.testing.assert_allclose(
            o_c["depth"], o_py["depth"], atol=1e-5,
            err_msg=f"depth mismatch at ang={ang}",
        )
        # uint8 shading: identical modulo float truncation at boundaries
        diff = np.abs(o_c["rgb"].astype(int) - o_py["rgb"].astype(int))
        assert (diff <= 1).mean() > 0.999, diff.max()


def test_native_panorama_stacks():
    env = FakeNavEnv(image_size=48, use_native=True)
    env.set_agent_state(np.array([1.3, 0.0, 1.7]), 0.4)
    obs = env.get_observation(force_panorama=True)
    assert obs["rgb"].shape == (4, 48, 48, 3)
    assert obs["depth"].shape == (4, 48, 48, 1)
    # view 1 is a 90-degree left turn of view 0's scene — must differ
    assert not np.array_equal(obs["rgb"][0], obs["rgb"][1])


def test_native_is_faster():
    env_py = FakeNavEnv(image_size=224, use_native=False)
    env_c = FakeNavEnv(image_size=224, use_native=True)
    pos = np.array([1.3, 0.0, 1.7])
    env_py.set_agent_state(pos, 0.3)
    env_c.set_agent_state(pos, 0.3)
    # best-of-3 CPU time: wall-clock single shots flake when other
    # processes contend for this host's one core
    def best(env):
        times = []
        for _ in range(3):
            t0 = time.process_time()
            env.get_observation()
            times.append(time.process_time() - t0)
        return min(times)

    t_py = best(env_py)
    t_c = best(env_c)
    assert t_c < t_py, (t_c, t_py)
