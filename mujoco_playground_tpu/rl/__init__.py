from mujoco_playground_tpu.rl.config import RLConfig, default_config  # noqa: F401
from mujoco_playground_tpu.rl.networks import ActorCritic  # noqa: F401
from mujoco_playground_tpu.rl import ppo  # noqa: F401
from mujoco_playground_tpu.rl import sac  # noqa: F401
from mujoco_playground_tpu.rl import td3  # noqa: F401
from mujoco_playground_tpu.rl.evaluate import (  # noqa: F401
    deterministic_policy,
    evaluate_agent,
)
from mujoco_playground_tpu.rl.random_policy import run_random_baseline  # noqa: F401
from mujoco_playground_tpu.rl.utils import compute_episode_stats  # noqa: F401
