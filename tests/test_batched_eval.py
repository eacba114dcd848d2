"""Cross-episode batched evaluation: results must be identical to the
sequential runner (same generators, only device-call batching differs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_dqn_tpu.eval import make_model_scorer, ours_evaluate
from video_dqn_tpu.eval.batched_runner import make_multiclass_scorer, run_policy_batched
from video_dqn_tpu.eval.fixtures import make_env_and_episode
from video_dqn_tpu.sim.gibson import relevant_locations
from tests.test_eval import eval_cfg

SIZE = 64


def make_model():
    from video_dqn_tpu.models.qnet import HabitatDQN

    model = HabitatDQN(action_dim=3, extra_capacity=False, panorama=False,
                       dtype=jnp.float32)
    variables = model.init(jax.random.key(3), jnp.zeros((1, 1, SIZE, SIZE, 3)), False)
    return model, variables["params"], variables.get("batch_stats", {})


def build_fixtures():
    """Two episodes in two distinct 'houses' (different goals)."""
    episodes, houses = [], {}
    for i, (gc, sc) in enumerate([((6, 6), (2, 2)), ((14, 8), (3, 9))]):
        _, house, ep = make_env_and_episode(gc, sc, size=SIZE)
        name = f"H{i}"
        episodes.append((name, *ep[1:]))
        houses[name] = house
    return episodes, houses


def fresh_env(house, config=None):
    env, _, _ = make_env_and_episode(size=SIZE)
    env.goals = []
    return env


def place(env, house, ep):
    hn, floor, class_label, goal_dist, pos, rot = ep
    loc = env.sample_start_state(int(floor))[0]
    env.goals = relevant_locations(
        loc, house.object_locations_for_habitat_dest[class_label]
    )
    env.set_agent_state(pos, rot)


def test_batched_matches_sequential(tmp_path):
    model, params, stats = make_model()
    episodes, houses = build_fixtures()

    seq_results = {}
    for i, ep in enumerate(episodes):
        env = fresh_env(None)
        place(env, houses[ep[0]], ep)
        scorer = make_model_scorer(model, params, stats, 4, image_size=SIZE)
        cfg = eval_cfg(SLAM=True, SEED=1)
        seq_results[i] = ours_evaluate(cfg, env, ep, houses[ep[0]], i, scorer)

    cfg = eval_cfg(SLAM=True, SEED=1, RESULT_LOCATION=str(tmp_path / "r"))
    scorer = make_multiclass_scorer(model, params, stats, image_size=SIZE)
    results = run_policy_batched(
        cfg, episodes, env_factory=fresh_env,
        house_factory=lambda name: houses[name],
        scorer=scorer, class_index_of=True, max_concurrent=2, debug=True,
    )
    assert set(results.keys()) == {0, 1}
    for i in range(2):
        np.testing.assert_allclose(results[i], seq_results[i], atol=1e-5)


def test_batched_writes_results(tmp_path):
    model, params, stats = make_model()
    episodes, houses = build_fixtures()
    cfg = eval_cfg(SLAM=True, SEED=1, RESULT_LOCATION=str(tmp_path / "r"))
    scorer = make_multiclass_scorer(model, params, stats, image_size=SIZE)
    run_policy_batched(
        cfg, episodes, env_factory=fresh_env,
        house_factory=lambda name: houses[name],
        scorer=scorer, class_index_of=True, max_concurrent=4,
    )
    from video_dqn_tpu.eval import display_results

    mean = display_results(cfg, quiet=True)
    assert mean is not None


def test_batched_matches_sequential_furnished_workload(tmp_path):
    """The model-scored product-workload surface (make_episode_set
    backend='furnished', fresh cloned envs, run_policy_batched) must
    match per-episode sequential evaluation — this is the exact path of
    the full 1,075-episode model-scored artifact in BASELINE.md."""
    from video_dqn_tpu.eval.fixtures import make_episode_set

    episodes, env_factory, house_factory = make_episode_set(
        2, backend="furnished", size=SIZE, fresh_envs=True)
    model, params, stats = make_model()

    def env_for(ep):
        house = house_factory(ep[0])
        env = env_factory(house, None, None)
        loc = env.sample_start_state(int(ep[1]))[0]
        env.goals = relevant_locations(
            loc, house.object_locations_for_habitat_dest[ep[2]])
        env.set_agent_state(ep[4], ep[5])
        return env, house

    from video_dqn_tpu.sim.gibson import CLASS_LABELS

    seq_results = {}
    for i, ep in enumerate(episodes):
        env, house = env_for(ep)
        scorer = make_model_scorer(model, params, stats,
                                   CLASS_LABELS.index(ep[2]),
                                   image_size=SIZE)
        cfg = eval_cfg(SLAM=True, SEED=1)
        seq_results[i] = ours_evaluate(cfg, env, ep, house, i, scorer)

    cfg = eval_cfg(SLAM=True, SEED=1, RESULT_LOCATION=str(tmp_path / "r"))
    scorer = make_multiclass_scorer(model, params, stats, image_size=SIZE)
    results = run_policy_batched(
        cfg, episodes, env_factory=lambda h, c: env_factory(h, None, c),
        house_factory=house_factory,
        scorer=scorer, class_index_of=True, max_concurrent=2, debug=True,
    )
    for i in range(2):
        np.testing.assert_allclose(results[i], seq_results[i], atol=1e-5)


def build_fixtures4():
    episodes, houses = [], {}
    coords = [((6, 6), (2, 2)), ((14, 8), (3, 9)),
              ((10, 4), (2, 10)), ((5, 12), (12, 3))]
    for i, (gc, sc) in enumerate(coords):
        _, house, ep = make_env_and_episode(gc, sc, size=SIZE)
        name = f"H{i}"
        episodes.append((name, *ep[1:]))
        houses[name] = house
    return episodes, houses


@pytest.mark.parametrize("depth", [2, 3])
def test_pipelined_matches_unpipelined(tmp_path, depth):
    """Software-pipelined cohorts (async dispatch overlapping host
    planning) must produce bit-identical per-episode results to the
    single-cohort barrier runner for any depth/cohort split."""
    model, params, stats = make_model()
    episodes, houses = build_fixtures4()
    scorer = make_multiclass_scorer(model, params, stats, image_size=SIZE)
    cfg = eval_cfg(SLAM=True, SEED=1, RESULT_LOCATION=str(tmp_path / "r"))
    base = run_policy_batched(
        cfg, episodes, env_factory=fresh_env,
        house_factory=lambda name: houses[name],
        scorer=scorer, class_index_of=True, max_concurrent=4, debug=True,
    )
    piped = run_policy_batched(
        cfg, episodes, env_factory=fresh_env,
        house_factory=lambda name: houses[name],
        scorer=scorer, class_index_of=True, max_concurrent=4,
        pipeline_depth=depth, debug=True,
    )
    assert set(piped.keys()) == set(base.keys()) == {0, 1, 2, 3}
    for i in base:
        np.testing.assert_allclose(piped[i], base[i], atol=1e-5)


def test_threaded_host_advance_matches(tmp_path):
    """host_workers>1 advances episodes' host work (SLAM/FMM/stepping) in
    a thread pool — per-episode state is instance-owned, so results must
    be bit-identical to single-threaded advance (incl. combined with
    pipelining)."""
    model, params, stats = make_model()
    episodes, houses = build_fixtures4()
    scorer = make_multiclass_scorer(model, params, stats, image_size=SIZE)
    cfg = eval_cfg(SLAM=True, SEED=1, RESULT_LOCATION=str(tmp_path / "r"))
    base = run_policy_batched(
        cfg, episodes, env_factory=fresh_env,
        house_factory=lambda name: houses[name],
        scorer=scorer, class_index_of=True, max_concurrent=4, debug=True,
    )
    threaded = run_policy_batched(
        cfg, episodes, env_factory=fresh_env,
        house_factory=lambda name: houses[name],
        scorer=scorer, class_index_of=True, max_concurrent=4,
        pipeline_depth=2, host_workers=2, debug=True,
    )
    assert set(threaded.keys()) == set(base.keys())
    for i in base:
        np.testing.assert_allclose(threaded[i], base[i], atol=1e-5)


def test_pipelined_sync_scorer_fallback(tmp_path):
    """A plain callable scorer (no .dispatch/.gather) still works under
    pipeline_depth > 1 — pipelining degrades to synchronous scoring."""
    model, params, stats = make_model()
    episodes, houses = build_fixtures()
    rich = make_multiclass_scorer(model, params, stats, image_size=SIZE)
    plain = lambda imgs, cls: rich(imgs, cls)  # strips the attributes
    cfg = eval_cfg(SLAM=True, SEED=1, RESULT_LOCATION=str(tmp_path / "r"))
    base = run_policy_batched(
        cfg, episodes, env_factory=fresh_env,
        house_factory=lambda name: houses[name],
        scorer=rich, class_index_of=True, max_concurrent=2, debug=True,
    )
    piped = run_policy_batched(
        cfg, episodes, env_factory=fresh_env,
        house_factory=lambda name: houses[name],
        scorer=plain, class_index_of=True, max_concurrent=2,
        pipeline_depth=2, debug=True,
    )
    for i in base:
        np.testing.assert_allclose(piped[i], base[i], atol=1e-5)


def test_batched_resume_skips_done_episodes(tmp_path):
    """resume=True merges the DiskLogger shards and only runs the
    missing episodes; the combined results equal a straight full run
    (episode content is fixed at fixture time, so a partial crash +
    resume is bit-identical)."""
    model, params, stats = make_model()
    episodes, houses = build_fixtures4()
    scorer = make_multiclass_scorer(model, params, stats, image_size=SIZE)
    cfg = eval_cfg(SLAM=True, SEED=1, RESULT_LOCATION=str(tmp_path / "r"))
    full = run_policy_batched(
        cfg, episodes, env_factory=fresh_env,
        house_factory=lambda name: houses[name],
        scorer=scorer, class_index_of=True, max_concurrent=4, debug=True,
    )
    # simulate a crashed run that only finished episodes 0 and 2
    cfg2 = eval_cfg(SLAM=True, SEED=1, RESULT_LOCATION=str(tmp_path / "r2"))
    partial = run_policy_batched(
        cfg2, [episodes[0], episodes[2]], env_factory=fresh_env,
        house_factory=lambda name: houses[name],
        scorer=scorer, class_index_of=True, max_concurrent=2, debug=False,
    )
    # rewrite the shards under the full run's episode indices
    import os

    from video_dqn_tpu.core import DiskLogger as DL
    from video_dqn_tpu.eval.policy_config import name_from_config

    folder = os.path.join(cfg2.RESULT_LOCATION, name_from_config(cfg2))
    for f in os.listdir(folder):
        os.remove(os.path.join(folder, f))
    lg = DL(folder)
    lg.write(0, partial[0])
    lg.write(2, partial[1])

    launched = []

    def counting_env_factory(house, config=None):
        launched.append(house)
        return fresh_env(house, config)

    resumed = run_policy_batched(
        cfg2, episodes, env_factory=counting_env_factory,
        house_factory=lambda name: houses[name],
        scorer=scorer, class_index_of=True, max_concurrent=4,
        resume=True, debug=True,
    )
    assert set(resumed.keys()) == {0, 1, 2, 3}
    for i in full:
        np.testing.assert_allclose(resumed[i], full[i], atol=1e-5)
    # only the two missing episodes were launched
    assert len(launched) == 2


def test_bucketed_scorer_identity():
    """Bucketed padding (12·2^k static shapes — O(log K) XLA programs
    instead of one per ragged batch size) must be bit-identical to
    unbucketed scoring: pad rows are sliced off."""
    model, params, stats = make_model()
    s_b = make_multiclass_scorer(model, params, stats, image_size=SIZE)
    s_n = make_multiclass_scorer(model, params, stats, image_size=SIZE,
                                 bucket=False)
    rng = np.random.default_rng(0)
    for n in (1, 5, 12, 13, 30):
        imgs = rng.integers(0, 255, (n, SIZE, SIZE, 3), dtype=np.uint8)
        cls = np.asarray(rng.integers(0, 5, n))
        out_b, out_n = s_b(imgs, cls), s_n(imgs, cls)
        assert out_b.shape == (n,)
        np.testing.assert_allclose(out_b, out_n, atol=1e-6)


def test_gather_watchdog_raises_on_stall(tmp_path):
    """A gather blocking past the timeout in steady state must raise
    loudly (device/tunnel stall) instead of hanging the workload; the
    first gather is exempt (compile/warmup)."""
    import time

    model, params, stats = make_model()
    episodes, houses = build_fixtures()
    real = make_multiclass_scorer(model, params, stats, image_size=SIZE)
    n_gathers = [0]

    def dispatch(images, cls):
        return real.dispatch(images, cls)

    def gather(handle):
        n_gathers[0] += 1
        if n_gathers[0] > 1:
            time.sleep(5.0)  # simulated tunnel stall
        return real.gather(handle)

    stalling = lambda imgs, cls: gather(dispatch(imgs, cls))
    stalling.dispatch = dispatch
    stalling.gather = gather

    cfg = eval_cfg(SLAM=True, SEED=1, RESULT_LOCATION=str(tmp_path / "r"))
    with pytest.raises(RuntimeError, match="stalled past .*resume"):
        run_policy_batched(
            cfg, episodes, env_factory=fresh_env,
            house_factory=lambda name: houses[name],
            scorer=stalling, class_index_of=True, max_concurrent=2,
            gather_timeout=1.0, debug=True,
        )


def test_gather_watchdog_passthrough_and_progress(tmp_path, capsys):
    """With a generous timeout the watchdog changes nothing (bit-identical
    results via the worker thread), and progress_every emits rate/ETA
    lines."""
    model, params, stats = make_model()
    episodes, houses = build_fixtures()
    scorer = make_multiclass_scorer(model, params, stats, image_size=SIZE)
    cfg = eval_cfg(SLAM=True, SEED=1, RESULT_LOCATION=str(tmp_path / "r"))
    base = run_policy_batched(
        cfg, episodes, env_factory=fresh_env,
        house_factory=lambda name: houses[name],
        scorer=scorer, class_index_of=True, max_concurrent=2, debug=True,
    )
    guarded = run_policy_batched(
        cfg, episodes, env_factory=fresh_env,
        house_factory=lambda name: houses[name],
        scorer=scorer, class_index_of=True, max_concurrent=2,
        gather_timeout=600.0, progress_every=1e-9, debug=True,
    )
    for i in base:
        np.testing.assert_allclose(guarded[i], base[i], atol=1e-5)
    out = capsys.readouterr().out
    assert "[batched]" in out and "ETA" in out


def test_mesh_sharded_scorer_matches_unsharded(mesh8):
    """Cross-chip eval scoring: the mesh-sharded multiclass scorer must
    produce identical scores to the single-device path, including ragged
    batches that need padding to the device count."""
    model, params, stats = make_model()
    plain = make_multiclass_scorer(model, params, stats, image_size=SIZE)
    sharded = make_multiclass_scorer(model, params, stats, image_size=SIZE,
                                     mesh=mesh8)
    rng = np.random.default_rng(0)
    for b in (3, 8, 13):  # ragged + aligned batch sizes
        imgs = rng.integers(0, 255, (b, 1, SIZE, SIZE, 3), np.uint8)
        cls = rng.integers(0, 5, b)
        np.testing.assert_allclose(
            sharded(imgs, cls), plain(imgs, cls), rtol=2e-5, atol=2e-5)


def test_run_policy_batched_with_mesh(tmp_path, mesh8):
    """End-to-end batched episodes with the mesh-sharded scorer."""
    model, params, stats = make_model()
    scorer = make_multiclass_scorer(model, params, stats, image_size=SIZE,
                                    mesh=mesh8)
    episodes, houses = build_fixtures()
    cfg = eval_cfg(SLAM=True, SEED=1, SCORE="model",
                   RESULT_LOCATION=str(tmp_path / "results"))
    results = run_policy_batched(
        cfg, episodes,
        env_factory=fresh_env,
        house_factory=lambda n: houses[n],
        scorer=scorer,
        class_index_of=True,
        max_concurrent=2,
    )
    assert len(results) == 2
    for v in results.values():
        assert 0.0 <= float(v) <= 1.0
