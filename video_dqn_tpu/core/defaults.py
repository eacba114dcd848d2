"""Training-config defaults.

Key-for-key parity with the reference defaults tree
(/root/reference/defaults.py:5-37) so every published experiment config
(e.g. configs/experiments/real_data/config.yml) loads unchanged, plus a
TPU section for mesh/precision knobs the reference had no equivalent of.
"""

from .config import ConfigNode

# Allowed values, checked at experiment load
# (reference: experiment_config.py:9-10,37-39).
VALID_VALUES = {"LOSS_CLIP": ["sigmoid", "rect", "none"]}


def get_cfg_defaults() -> ConfigNode:
    return ConfigNode(
        {
            "PANORAMA": True,
            "SEED": 0,
            "TRAIN_ON_GROUND_TRUTH": False,
            "DATASET": "none",
            "SUB_DATASET": "none",
            "CLASS_LABEL": "toilet",
            # 'rect' clamps Bellman targets to [0, 1]; 'sigmoid' is accepted
            # for config parity but — as in the reference, where build_model
            # computes the flag and never uses it (train_q_network.py:37,43) —
            # it does not alter the loss.
            "LOSS_CLIP": "none",
            "ARCHITECTURE": "basic",  # 'basic' | 'extra_capacity'
            "RANDOM_ACTIONS": False,
            "ONE_ACTION": False,
            "SEMANTIC_REWARDS": False,
            "DETECTION_REWARDS": False,
            "REMOVE_BEFORE_REWARD": False,
            "USE_INVERSE_ACTIONS": False,
            "VALUE_LEARNING": False,
            "PREVIOUS_IMAGES": False,
            "GAMMA": 0.9,
            "BOOTSTRAP": False,
            "BOOTSTRAP_LOCATION": "",
            "LINEAR": False,
            "LEARNING_RATE": 1e-3,
            "NUM_STEPS": int(1e5),
            "TARGET_UPDATE_INTERVAL": int(8e3),
            "CHECKPOINT_INTERVAL": int(2e3),
            "ACTION_HIDDEN_LAYERS": 1,
            "GUMBEL_TEMP": 0.1,
            # use detector confidence as reward instead of thresholded binary
            "CONFIDENCE_REWARD": False,
            "DISTRIBUTIONAL": False,
            "KL_BACKWARDS": False,
            "LOG_SIGMA": False,
            "VISUALIZATION_DATA_ROOT": "",
            # Path to a torchvision resnet18 state dict (.pth/.torch) used to
            # initialize the Q-net backbone, converted on load. The reference
            # always builds from resnet18(pretrained=True)
            # (/root/reference/archs/HabitatDQNMultiAction.py:12); this image
            # has no egress, so the path must point at a locally provided
            # file (see scripts/convert_weights.py for the source URL).
            # Empty = random init, with a loud warning when extra_capacity
            # would freeze the random BN statistics.
            "BACKBONE_WEIGHTS": "",
            # ---- TPU-native additions (no reference equivalent) ----
            "TPU": ConfigNode(
                {
                    "BATCH_SIZE": 256,          # reference trained at 16 (train_q_network.py:98)
                    "COMPUTE_DTYPE": "bfloat16",  # MXU-friendly; params stay float32
                    "MESH_DATA": -1,             # -1: all devices on the data axis
                    # Model-parallel axis. Default 1 (pure DP): the
                    # flagship head (1600->512->256->15) is far below the
                    # 128-lane tile where TP pays for its collectives —
                    # the sharding rules in parallel/sharding.py only
                    # split dims divisible by 128, so >1 is only useful
                    # for wider custom heads. dryrun_multichip still
                    # exercises a 4x2 mesh to keep the TP path compiled.
                    "MESH_MODEL": 1,
                    "REMAT": False,              # jax.checkpoint the backbone
                    "PREFETCH_DEPTH": 2,         # host->HBM double buffering
                    # training/eval frame resolution; the extra_capacity
                    # head's flatten dim depends on it (224 -> 1600/frame)
                    "IMAGE_SIZE": 224,
                    # JPEG-decode worker processes feeding the infeed
                    # (0 = decode in-process; reference used 8 DataLoader
                    # workers, train_q_network.py:98)
                    "DECODE_WORKERS": 0,
                    # decoded-frame RAM cache budget in MB (0 = off):
                    # epochs >= 2 serve uint8 frames from memory instead
                    # of re-decoding the same JPEGs every epoch
                    "DECODE_CACHE_MB": 0,
                    # HBM-resident dataset: decode every unique frame
                    # once, upload once, sample batches ON DEVICE —
                    # removes the per-step host->HBM wire entirely when
                    # the dataset fits HBM (data/device_dataset.py)
                    "DEVICE_DATASET": False,
                    # DEVICE_DATASET row-draw semantics: 'epoch' =
                    # on-device per-epoch permutation + drop_last (the
                    # reference DataLoader's shuffle semantics);
                    # 'uniform' = uniform with replacement
                    "DEVICE_SAMPLING": "epoch",
                    # shard the DEVICE_DATASET frame table along the
                    # 'data' mesh axis (1/n_data of the table per device)
                    # instead of replicating it: corpus capacity scales to
                    # AGGREGATE data-axis HBM; each step pays one
                    # psum_scatter of the batch's frames over ICI. The
                    # sample stream is bit-identical to the replicated
                    # layout (data/device_dataset.py gather rationale).
                    "SHARD_DATASET": False,
                    # DEVICE_DATASET dispatch granularity: run this many
                    # fused sampler+train steps inside ONE XLA program
                    # (lax.scan), so per-step dispatch cost vanishes.
                    # 0 = auto (largest chunk dividing every host
                    # boundary: log cadence, CHECKPOINT_INTERVAL, total
                    # steps); 1 = one dispatch per step.
                    "SCAN_CHUNK": 0,
                    # training stall watchdog (seconds; 0 = off): exit
                    # non-zero when no loop progress lands within the
                    # deadline, so a wrapper can restart with -r. Must
                    # comfortably exceed one log interval. The eval/bench
                    # twins are --gather-timeout and
                    # VDQN_BENCH_WATCHDOG_S; env override
                    # VDQN_TRAIN_WATCHDOG_S (core/watchdog.py rationale)
                    "STALL_TIMEOUT_S": 0,
                    # first-dispatch watchdog grace (seconds; 0 = auto):
                    # the first deadline must cover a cold REMOTE compile
                    # (minutes through the tunnel), so auto floors it at
                    # 2700 s on the axon/tpu backends. On CPU there is no
                    # remote compile; auto uses STALL_TIMEOUT_S directly.
                    # Set explicitly to override either way.
                    "STALL_FIRST_TIMEOUT_S": 0,
                }
            ),
        }
    )
