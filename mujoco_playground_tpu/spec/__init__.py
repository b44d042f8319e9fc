from mujoco_playground_tpu.spec.types import (  # noqa: F401
    ActuatorSpec,
    BodySpec,
    EqualitySpec,
    GeomSpec,
    JointSpec,
    ModelSpec,
    OptionSpec,
    SensorSpec,
    SiteSpec,
)
from mujoco_playground_tpu.spec.robot import ackermann_robot_v2  # noqa: F401
from mujoco_playground_tpu.spec.scene import (  # noqa: F401
    SceneSpec,
    maze_flat_scene,
    normalize_maze_map,
    open_floor_scene,
    pointmaze_scene,
    registry_maze_map,
)
