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
