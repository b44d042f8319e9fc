"""Multi-chip data-parallel tests on the 8-device virtual CPU mesh.

The conftest forces ``--xla_force_host_platform_device_count=8``; these tests
validate that the full PPO train step compiles and executes with the env
batch sharded across the mesh and params replicated — the same path the
driver's dryrun_multichip exercises, and the layout used on real pod slices.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_playground_tpu.envs import make_ackermann_env
from mujoco_playground_tpu.parallel import mesh as mesh_lib
from mujoco_playground_tpu.rl import ppo
from mujoco_playground_tpu.rl.config import RLConfig
from mujoco_playground_tpu.rl.networks import ActorCritic


@pytest.fixture(scope="module")
def cpu_mesh():
    devices = jax.devices("cpu")
    if len(devices) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return mesh_lib.make_mesh(devices[:8])


def test_env_batch_shards_across_mesh(cpu_mesh):
    env = make_ackermann_env("simple", solver_iterations=2, ls_iterations=2)
    B = 32
    states = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(0), B))
    states = mesh_lib.shard_env_states(states, cpu_mesh)
    assert len(states.obs.sharding.device_set) == 8
    stepped = jax.jit(env.step_autoreset_batch)(
        states, jnp.zeros((B, 2)))
    # stepping preserves the sharding layout
    assert len(stepped.obs.sharding.device_set) == 8
    assert np.isfinite(np.asarray(stepped.obs)).all()


@pytest.mark.slow
def test_sharded_train_step(cpu_mesh):
    config = RLConfig(num_envs=16, unroll_length=4, num_minibatches=2,
                      ppo_epochs=1, solver_iterations=2, ls_iterations=2)
    env = make_ackermann_env("maze", "umaze", solver_iterations=2,
                             ls_iterations=2)
    network = ActorCritic(action_size=env.action_size)
    ts = ppo.init_train_state(env, network, config, jax.random.PRNGKey(0))
    ts = mesh_lib.shard_train_state(ts, cpu_mesh)
    train_step = jax.jit(ppo.make_train_step(env, network, config))
    ts2, metrics = train_step(ts)
    jax.block_until_ready(ts2.params)
    assert len(ts2.env_states.obs.sharding.device_set) == 8
    assert np.isfinite(float(metrics["mean_reward"]))
    # params identical across devices (replicated after psum-reduced grads)
    assert len(jax.tree.leaves(ts2.params)[0].sharding.device_set) in (1, 8)
