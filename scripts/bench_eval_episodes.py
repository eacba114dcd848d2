"""Full-episode eval throughput: sequential runner vs the cross-episode
batched runner, real Q-net scoring on the default device, fake-env
episodes (C++ renderer). Records episodes/min for BASELINE.md."""

import sys
import time

sys.path.insert(0, ".")


def main(n_episodes=8, size=224):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from video_dqn_tpu.core import get_cfg_defaults
    from video_dqn_tpu.eval import make_model_scorer, ours_evaluate
    from video_dqn_tpu.eval.batched_runner import (
        make_multiclass_scorer,
        run_policy_batched,
    )
    from video_dqn_tpu.eval.fixtures import make_env_and_episode
    from video_dqn_tpu.eval.policy_config import get_eval_defaults
    from video_dqn_tpu.models.qnet import build_qnet, init_qnet
    from video_dqn_tpu.sim.gibson import relevant_locations

    mcfg = get_cfg_defaults()
    mcfg.PANORAMA = False
    mcfg.ARCHITECTURE = "extra_capacity"
    model = build_qnet(mcfg)
    params, stats = init_qnet(model, jax.random.key(0), image_size=size)

    episodes, houses = [], {}
    rng = np.random.default_rng(0)
    for i in range(n_episodes):
        gc = (int(rng.integers(5, 16)), int(rng.integers(5, 16)))
        _, house, ep = make_env_and_episode(gc, (2, 2), size=size)
        name = f"H{i}"
        episodes.append((name, *ep[1:]))
        houses[name] = house

    def fresh_env(house, config=None):
        env, _, _ = make_env_and_episode(size=size)
        env.goals = []
        return env

    cfg = get_eval_defaults()
    cfg.SLAM = True
    cfg.SEED = 1

    # sequential
    scorer = make_model_scorer(model, params, stats, 4, image_size=size)
    t0 = time.perf_counter()
    for i, ep in enumerate(episodes):
        env = fresh_env(None)
        hn = ep[0]
        loc = env.sample_start_state(int(ep[1]))[0]
        env.goals = relevant_locations(
            loc, houses[hn].object_locations_for_habitat_dest[ep[2]]
        )
        env.set_agent_state(ep[4], ep[5])
        ours_evaluate(cfg, env, ep, houses[hn], i, scorer)
    dt_seq = time.perf_counter() - t0

    # batched
    mscorer = make_multiclass_scorer(model, params, stats, image_size=size)
    t0 = time.perf_counter()
    run_policy_batched(
        cfg, episodes, env_factory=fresh_env,
        house_factory=lambda n: houses[n], scorer=mscorer,
        class_index_of=True, max_concurrent=8, debug=True,
    )
    dt_bat = time.perf_counter() - t0
    print(
        f"sequential: {n_episodes / (dt_seq / 60):.1f} episodes/min "
        f"({dt_seq / n_episodes:.1f} s/ep); batched(8): "
        f"{n_episodes / (dt_bat / 60):.1f} episodes/min "
        f"({dt_bat / n_episodes:.1f} s/ep); speedup {dt_seq / dt_bat:.2f}x"
    )


if __name__ == "__main__":
    main()
