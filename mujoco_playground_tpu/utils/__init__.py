from mujoco_playground_tpu.utils.logging import MetricsLogger  # noqa: F401
from mujoco_playground_tpu.utils.profiler import (  # noqa: F401
    StepTimer,
    trace_context,
)
