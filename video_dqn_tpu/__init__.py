"""video_dqn_tpu — TPU-native (JAX/XLA/Pallas/pjit) framework for learning
object-goal navigation value functions from unlabeled videos.

From-scratch rebuild (NOT a port) of the capabilities of
uiuc-robovision/video-dqn ("Semantic Visual Navigation by Watching YouTube
Videos", NeurIPS 2020). See SURVEY.md at the repo root for the structural
analysis of the reference and the layer-by-layer parity map.

Layout:
  core/      config system, experiment folders, checkpointing, logging, mesh
  models/    Flax models: ResNet18 backbone, multi-class Q-network, inverse model
  ops/       jitted numeric ops: image transforms, reward scans, geometry, FMM
  parallel/  sharding rules and mesh utilities (dp x mp over jax.sharding.Mesh)
  data/      feather schema, quadruplet assembly, batching, host->HBM prefetch
  train/     jitted double-DQN training, inverse-model training
  sim/       environment interface, fake test env, Gibson metadata
  plan/      occupancy mapping + fast-marching planning
  eval/      evaluation harness (episode runner, policy, results)
"""

__version__ = "0.1.0"


def _normalize_platforms(want):
    """Platform list to assert for a JAX_PLATFORMS env value (None/'' ->
    None = leave config alone). Accelerator-first lists get 'cpu'
    appended as a secondary backend; cpu-first lists pass through
    untouched (see _honor_platform_env)."""
    if not want:
        return None
    plats = [p.strip() for p in want.split(",") if p.strip()]
    if plats and plats[0] != "cpu" and "cpu" not in plats:
        plats.append("cpu")
    return ",".join(plats)


def _honor_platform_env():
    """Make `JAX_PLATFORMS=cpu python <any CLI>` actually select CPU.

    This container's TPU boot hook (sitecustomize -> axon.register)
    imports jax at interpreter start and calls
    ``jax.config.update("jax_platforms", "axon,cpu")`` — silently
    overriding the user's JAX_PLATFORMS env var. A CPU-requested run
    then initializes the axon TPU client anyway, which *blocks
    indefinitely* whenever another process holds the single tunnel.
    Re-assert the env var's choice here (package import runs before any
    backend init in every CLI); tests/conftest.py does the same thing
    for the test suite. No-op when JAX_PLATFORMS is unset or jax is
    absent, and harmless if backends are somehow already initialized
    (config.update only steers future inits).

    One asymmetry: when the env selects an accelerator ("axon", "tpu"),
    keep "cpu" appended as a *secondary* backend — host-pinned ops
    (ops/scans.label_video_host, dataset assembly) need
    ``jax.local_devices(backend="cpu")``, and a platform list's first
    entry still decides the default device, so this changes nothing
    else. The reverse case must stay exact: "cpu" (first) means *never
    initialize the axon client* — it blocks indefinitely whenever
    another process holds the single tunnel."""
    import os

    want = _normalize_platforms(os.environ.get("JAX_PLATFORMS"))
    if not want:
        return
    try:
        import jax

        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
    except Exception:
        pass


_honor_platform_env()
