from mujoco_playground_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_env_states,
)
from mujoco_playground_tpu.parallel.distributed import (  # noqa: F401
    initialize_distributed,
)
