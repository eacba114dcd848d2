"""Eval fixtures: a GibsonHouse-shaped stub plus episode construction on
the fake raycasting env — the asset-free counterpart of the reference's
bundled habitat-test-scenes (SURVEY.md section 4)."""

from __future__ import annotations

import numpy as np

from video_dqn_tpu.sim.fake_env import FakeNavEnv
from video_dqn_tpu.sim.gibson import CLASS_LABELS


class FakeHouse:
    """GibsonHouse stand-in: one object of every class at `goal_pos`."""

    def __init__(self, goal_pos):
        self.name = "FakeHouse"
        corners = [
            np.asarray(goal_pos) + np.array([dx, 0, dz]) * 0.2
            for dx, dz in [(1, 1), (1, -1), (-1, -1), (-1, 1)]
        ]
        self.objects = {c: [corners] for c in CLASS_LABELS}
        self.object_locations_for_habitat_dest = {c: list(corners) for c in CLASS_LABELS}
        self.num_floors = 1


class MeshHouse:
    """GibsonHouse stand-in built from a generated scene's object map
    (class -> [(x, y, z) centers]): corner polygons + destination points
    per class, like gibson_info.object_locations_for_habitat_dest
    (/root/reference/gibson_info.py:233-279)."""

    def __init__(self, name, objects, num_floors=2):
        self.name = name
        self.num_floors = num_floors
        self.objects = {}
        self.object_locations_for_habitat_dest = {}
        for cls in CLASS_LABELS:
            polys, dests = [], []
            for center in objects.get(cls, []):
                center = np.asarray(center, np.float64)
                corners = [
                    center + np.array([dx, 0, dz]) * 0.45
                    for dx, dz in [(1, 1), (1, -1), (-1, -1), (-1, 1)]
                ]
                polys.append(corners)
                dests.extend(corners)
            self.objects[cls] = polys
            self.object_locations_for_habitat_dest[cls] = dests


def make_furnished_house(size_px: int = 48, seed: int = 0,
                         allow_stairs: bool = False):
    """(env, house) on the furnished two-floor procedural house — the
    closest asset-free stand-in for a real Gibson house (rooms, doors,
    furniture objects of every target class on both floors, stairs)."""
    from video_dqn_tpu.sim.mesh_env import MeshNavEnv
    from video_dqn_tpu.sim.meshgen import furnished_house_mesh

    v, f, c, objects = furnished_house_mesh()
    env = MeshNavEnv(mesh=(v, f, c), image_size=size_px, num_floors=2,
                     seed=seed, allow_stairs=allow_stairs)
    house = MeshHouse("FurnishedHouse", objects, num_floors=2)
    return env, house


def make_env_and_episode(goal_cells=(6, 6), start_cells=(2, 2), size=32):
    """(env, house, episode-tuple) with a same-room goal in the default maze."""
    env = FakeNavEnv(image_size=size)
    goal = np.array([goal_cells[0] * env.cell, 0.0, goal_cells[1] * env.cell])
    start = np.array([start_cells[0] * env.cell, 0.0, start_cells[1] * env.cell])
    env.goals = [goal]
    env.set_agent_state(start, 0.0)
    gd = env.geodesic_distance(start, goal)
    house = FakeHouse(goal)
    ep = ("FakeHouse", 0, "toilet", gd, start, 0.0)
    return env, house, ep


def make_episode_set(n: int, size: int = 48, seed: int = 0,
                     backend: str = "fake", mesh_path=None, panorama=False,
                     fresh_envs: bool = False):
    """Generate an n-episode product workload on one shared backend env:
    random navigable starts and reachable goals, one FakeHouse per episode
    (distinct house names so the runner's house-switch logic exercises its
    real path). Returns (episodes ndarray, env_factory, house_factory) —
    plug-compatible with run_policy, mirroring the val_episodes.npy
    contract (house, floor, class, geodesic_dist, pos, rot;
    /root/reference/evaluation/runner.py:40-43,86-96)."""
    rng = np.random.default_rng(seed)
    if backend == "furnished":
        # the furnished two-floor house with REAL class objects: episodes
        # carry (floor, class) pairs whose goals are the house's own
        # object locations — the domain the self-contained learning loop
        # trains in, so model-scored workload runs are in-distribution
        from video_dqn_tpu.sim.gibson import relevant_locations

        template, house = make_furnished_house(size_px=size, seed=seed)

        def build_env(s):
            return template.clone(seed=s)

        episodes = []
        for _ in range(n):
            for _ in range(1000):
                floor = int(rng.integers(0, len(template.floor_heights)))
                cls = CLASS_LABELS[int(rng.integers(0, len(CLASS_LABELS)))]
                start, ang = template.sample_start_state(floor)
                goals = relevant_locations(
                    start, house.object_locations_for_habitat_dest[cls])
                if not goals:
                    continue
                gd = min(template.geodesic_distance(start, g) for g in goals)
                if np.isfinite(gd) and gd > 1.5:
                    break
            else:
                raise RuntimeError("could not sample a reachable episode")
            episodes.append(("FurnishedHouse", floor, cls, gd, start, ang))

        if fresh_envs:
            counter = [seed]

            def env_factory(hs, model_config, config):
                counter[0] += 1
                return build_env(counter[0])
        else:
            def env_factory(hs, model_config, config):
                return template

        return (np.array(episodes, dtype=object), env_factory,
                lambda name: house)
    if backend == "mesh":
        from video_dqn_tpu.sim.fake_env import DEFAULT_MAZE
        from video_dqn_tpu.sim.mesh_env import MeshNavEnv
        from video_dqn_tpu.sim.meshgen import maze_mesh

        if mesh_path is not None:
            template = MeshNavEnv(mesh_path=mesh_path, image_size=size,
                                  panorama=panorama, seed=seed)
        else:
            template = MeshNavEnv(mesh=maze_mesh(DEFAULT_MAZE),
                                  image_size=size, num_floors=1,
                                  panorama=panorama, seed=seed)

        def build_env(s):
            # clone shares the BVH + nav grids (a full scene reload +
            # probe sweep per batched episode would dominate the runtime)
            return template.clone(seed=s)

        env = template
    else:
        def build_env(s):
            return FakeNavEnv(image_size=size, panorama=panorama, seed=s)

        env = build_env(seed)

    episodes = []
    houses = {}
    for i in range(n):
        start, ang = env.sample_start_state(0)
        env.set_agent_state(start, ang)
        goal = env.sample_reachable_goal(0)
        gd = env.geodesic_distance(start, goal)
        cls = CLASS_LABELS[int(rng.integers(0, len(CLASS_LABELS)))]
        hn = f"House{i:04d}"
        houses[hn] = FakeHouse(goal)
        episodes.append((hn, 0, cls, gd, start, ang))

    if fresh_envs:
        # concurrent (batched) episodes cannot share an env
        counter = [seed]

        def env_factory(house, model_config, config):
            counter[0] += 1
            return build_env(counter[0])
    else:
        def env_factory(house, model_config, config):
            return env

    def house_factory(name):
        return houses[name]

    return np.array(episodes, dtype=object), env_factory, house_factory


def make_mesh_env_and_episode(goal_cells=(6, 6), start_cells=(2, 2), size=224,
                              mesh_path=None, panorama=False, seed=0,
                              allow_stairs=False):
    """(env, house, episode) on the mesh backend: either a scene file
    (PLY/OBJ via --mesh-scene) or the extruded default maze. The mesh
    counterpart of make_env_and_episode — same episode contract
    (/root/reference/evaluation/runner.py:86-96)."""
    from video_dqn_tpu.sim.mesh_env import MeshNavEnv

    if mesh_path is not None:
        env = MeshNavEnv(mesh_path=mesh_path, image_size=size,
                         panorama=panorama, seed=seed,
                         allow_stairs=allow_stairs)
        start, ang = env.sample_start_state(0)
        env.set_agent_state(start, ang)
        goal = env.sample_reachable_goal(0)
    else:
        from video_dqn_tpu.sim.fake_env import DEFAULT_MAZE
        from video_dqn_tpu.sim.meshgen import maze_mesh

        cell = 0.5
        env = MeshNavEnv(mesh=maze_mesh(DEFAULT_MAZE, cell=cell),
                         image_size=size, num_floors=1, panorama=panorama,
                         seed=seed, allow_stairs=allow_stairs)
        # cell centers: exact multiples land on wall corners in the mesh
        goal = np.array([(goal_cells[0] + 0.5) * cell, 0.0,
                         (goal_cells[1] + 0.5) * cell])
        start = np.array([(start_cells[0] + 0.5) * cell, 0.0,
                          (start_cells[1] + 0.5) * cell])
        ang = 0.0
        env.set_agent_state(start, ang)
    env.goals = [np.asarray(goal, np.float64)]
    gd = env.geodesic_distance(start, goal)
    house = FakeHouse(goal)
    ep = ("MeshHouse", 0, "toilet", gd, np.asarray(start, np.float64), ang)
    return env, house, ep
