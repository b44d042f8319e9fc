from mujoco_playground_tpu.envs.ackermann_env import (  # noqa: F401
    AckermannEnv,
    EnvConfig,
    EnvState,
)
from mujoco_playground_tpu.envs.domain_randomization import (  # noqa: F401
    DomainRandomizedEnv,
    RandomizationConfig,
)
from mujoco_playground_tpu.envs.make_env import (  # noqa: F401
    list_available_mazes,
    make_ackermann_env,
)

# Gymnasium wrapper is optional (gymnasium itself is optional)
try:
    from mujoco_playground_tpu.envs.gym_wrapper import GymAckermannEnv  # noqa: F401
except ImportError:  # pragma: no cover
    pass
