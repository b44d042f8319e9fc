from mujoco_playground_tpu.envs.ackermann_env import (  # noqa: F401
    AckermannEnv,
    EnvConfig,
    EnvState,
)
from mujoco_playground_tpu.envs.make_env import (  # noqa: F401
    list_available_mazes,
    make_ackermann_env,
)
