from mujoco_playground_tpu.rl.config import RLConfig, default_config  # noqa: F401
from mujoco_playground_tpu.rl.networks import ActorCritic  # noqa: F401
