#!/usr/bin/env python
"""Evaluation runner CLI — public entry point parity with the reference
(`python evaluation/runner.py <config.yml> [-d] [-v]`,
/root/reference/evaluation/runner.py:99-141). The -g/-p/-s/-r/--episodes
flags are accepted for drop-in compatibility (-s/--episodes actually work
here, unlike the reference where they were parsed but dead, :117-130)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="simulate policy (TPU)")
    parser.add_argument("-g", "--gpu", default="0", help="ignored (compat)")
    parser.add_argument("-p", "--profile", action="store_true",
                        help="enable jax profiler trace")
    parser.add_argument("-d", "--debug", action="store_true",
                        help="debug mode, no writing to results files")
    parser.add_argument("-s", "--start", default=0, type=int,
                        help="episode index to start at")
    parser.add_argument("-r", "--resume", action="store_true",
                        help="skip episodes with results already on disk")
    parser.add_argument("--episodes", dest="episodes_to_run", default=None,
                        help="comma-separated episode indices")
    parser.add_argument("-v", "--visualize", action="store_true")
    parser.add_argument("--fake-env", action="store_true",
                        help="run against the built-in fake environment")
    parser.add_argument("--mesh-env", action="store_true",
                        help="run against the mesh backend (extruded maze)")
    parser.add_argument("--mesh-scene", default=None,
                        help="PLY/OBJ scene file for the mesh backend")
    parser.add_argument("--furnished-env", action="store_true",
                        help="workload runs on the furnished two-floor "
                             "house with real class-object goals (the "
                             "learning loop's training domain)")
    parser.add_argument("--workload", default=None,
                        help="run N generated episodes (product workload)")
    parser.add_argument("--batched", default=None, type=int, metavar="N",
                        help="model-scored runs only: keep N episodes in "
                             "flight with cross-episode fused (and, on a "
                             "multi-chip mesh, data-sharded) scoring")
    parser.add_argument("--pipeline-depth", default=1, type=int, metavar="D",
                        help="with --batched: split the in-flight episodes "
                             "into D cohorts and overlap one cohort's device "
                             "scoring with the others' host planning "
                             "(results are bit-identical for any D)")
    parser.add_argument("--host-workers", default=0, type=int, metavar="W",
                        help="with --batched: advance episodes' host work "
                             "(SLAM/FMM/env stepping) in W threads — scales "
                             "across cores on multi-core hosts; results are "
                             "bit-identical")
    parser.add_argument("--gather-timeout", default=900.0, type=float,
                        metavar="S",
                        help="with --batched: device-stall watchdog — a "
                             "score gather blocking past S seconds in "
                             "steady state raises loudly instead of "
                             "hanging the workload (first gather exempt "
                             "for compile/warmup); 0 disables")
    parser.add_argument("--progress-every", default=300.0, type=float,
                        metavar="S",
                        help="with --batched: print done/total, rate, and "
                             "ETA at most every S seconds; 0 disables")
    parser.add_argument("config", help="eval config yml")
    args = parser.parse_args()

    import numpy as np

    from video_dqn_tpu.eval import load_file, run_policy

    config = load_file(args.config)

    episodes = None
    if os.path.exists("evaluation/val_episodes.npy"):
        episodes = np.load("evaluation/val_episodes.npy", allow_pickle=True)
    if episodes is not None and args.episodes_to_run:
        idx = [int(i) for i in args.episodes_to_run.split(",")]
        episodes = episodes[idx]

    kwargs = {}
    if args.workload:
        # product workload: N generated episodes through the full harness
        from video_dqn_tpu.eval.fixtures import make_episode_set

        backend = ("furnished" if args.furnished_env
                   else "mesh" if (args.mesh_env or args.mesh_scene)
                   else "fake")
        size = 48
        if config.SCORE == "model" and config.MODEL_CONFIG_LOCATION:
            # render at the model's training resolution
            size = int(config.MODEL_CONFIG.TPU.IMAGE_SIZE)
        episodes, env_factory, house_factory = make_episode_set(
            int(args.workload), backend=backend, size=size,
            mesh_path=args.mesh_scene, fresh_envs=bool(args.batched))
        kwargs = {"env_factory": env_factory, "house_factory": house_factory}
    elif args.mesh_env or args.mesh_scene:
        # mesh simulator backend (real-scene path; procedural maze without
        # a scene file)
        from video_dqn_tpu.eval.fixtures import make_mesh_env_and_episode

        env, house, ep = make_mesh_env_and_episode(
            mesh_path=args.mesh_scene, allow_stairs=bool(config.STAIRS))
        episodes = np.array([ep], dtype=object)
        kwargs = {
            "env_factory": lambda h, mc, c: env,
            "house_factory": lambda name: house,
        }
    elif args.fake_env or episodes is None:
        # no licensed Gibson assets: exercise the full loop on the fake env
        from video_dqn_tpu.eval.fixtures import make_env_and_episode

        env, house, ep = make_env_and_episode()
        episodes = np.array([ep], dtype=object)
        kwargs = {
            "env_factory": lambda h, mc, c: make_env_and_episode()[0],
            "house_factory": lambda name: house,
        }

    if args.profile:
        import jax

        jax.profiler.start_trace("/tmp/jax_trace")
    if args.batched and config.SCORE == "model" and "env_factory" in kwargs:
        import jax

        from video_dqn_tpu.core.experiment import ExperimentConfig
        from video_dqn_tpu.eval import build_detector_from_config, load_eval_model
        from video_dqn_tpu.eval.batched_runner import (
            make_multiclass_scorer,
            run_policy_batched,
        )
        from video_dqn_tpu.parallel import make_mesh

        mc = ExperimentConfig(config.MODEL_CONFIG_LOCATION, resume=True,
                              tensorboard=False)
        model, params, batch_stats = load_eval_model(config, mc)
        mesh = make_mesh(len(jax.devices()), 1) if len(jax.devices()) > 1 else None
        scorer = make_multiclass_scorer(
            model, params, batch_stats, mesh=mesh,
            image_size=int(mc.TPU.IMAGE_SIZE))
        run_policy_batched(
            config, episodes,
            env_factory=lambda h, c: kwargs["env_factory"](h, mc, c),
            house_factory=kwargs["house_factory"],
            scorer=scorer, class_index_of=True,
            detector=build_detector_from_config(config),
            max_concurrent=int(args.batched),
            pipeline_depth=int(args.pipeline_depth),
            host_workers=int(args.host_workers),
            resume=args.resume,
            gather_timeout=float(args.gather_timeout),
            progress_every=float(args.progress_every),
            debug=args.debug,
        )
    else:
        if args.batched:
            print("--batched needs SCORE: model and a generated-episode "
                  "mode (--fake-env/--mesh-env/--workload); running "
                  "sequentially")
        run_policy(config, episodes=episodes, debug=args.debug,
                   visualize_every=(1 if args.visualize else 100),
                   resume=args.resume, start=args.start, **kwargs)
    if args.profile:
        import jax

        jax.profiler.stop_trace()

    from video_dqn_tpu.eval import display_results

    display_results(config)


if __name__ == "__main__":
    main()
