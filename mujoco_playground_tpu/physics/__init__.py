from mujoco_playground_tpu.physics.model import Model, make_model  # noqa: F401
from mujoco_playground_tpu.physics.state import State, make_state  # noqa: F401
from mujoco_playground_tpu.physics.engine import (  # noqa: F401
    forward,
    step,
    step_batch,
)
