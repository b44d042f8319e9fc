"""Smoke tests for the off-policy learners (SAC/TD3) and replay buffer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_playground_tpu.envs import make_ackermann_env
from mujoco_playground_tpu.rl import replay_buffer as rb
from mujoco_playground_tpu.rl import sac as sac_lib
from mujoco_playground_tpu.rl import td3 as td3_lib
from mujoco_playground_tpu.rl.config import RLConfig


def test_replay_buffer_ring_semantics():
    buf = rb.make_buffer(8, 3, 2)
    obs = jnp.arange(12.0).reshape(4, 3)
    act = jnp.zeros((4, 2))
    r = jnp.arange(4.0)
    buf = rb.insert(buf, obs, act, r, obs, jnp.zeros(4))
    assert int(buf.size) == 4 and int(buf.ptr) == 4
    buf = rb.insert(buf, obs + 100, act, r, obs, jnp.ones(4))
    assert int(buf.size) == 8 and int(buf.ptr) == 0
    buf = rb.insert(buf, obs + 200, act, r, obs, jnp.zeros(4))
    # wrapped: first 4 slots overwritten
    np.testing.assert_allclose(np.asarray(buf.obs[0]), np.asarray(obs[0]) + 200)
    o, a, rr, no, term = rb.sample(buf, jax.random.PRNGKey(0), 16)
    assert o.shape == (16, 3) and term.shape == (16,)


@pytest.fixture(scope="module")
def env():
    return make_ackermann_env("maze", "umaze", max_episode_steps=30,
                              solver_iterations=2, ls_iterations=2)


def _config():
    return RLConfig(num_envs=8, sac_buffer_size=1024, sac_batch_size=32,
                    sac_learning_starts=0, solver_iterations=2,
                    ls_iterations=2, max_episode_steps=30)


def test_sac_train_step(env):
    config = _config()
    init, make_step = sac_lib.make_sac(env, config, collect_steps=2,
                                       grad_steps=2)
    state = init(jax.random.PRNGKey(0))
    step = jax.jit(make_step(random_actions=False))
    state, metrics = step(state)
    state, metrics = step(state)
    assert int(state.global_step) == 32
    assert int(state.buffer.size) == 32
    assert np.isfinite(float(metrics["actor_loss"]))
    pol = sac_lib.deterministic_policy(env, state)
    a = pol(state.env_states.obs)
    assert np.abs(np.asarray(a)).max() <= 1.0


def test_td3_train_step(env):
    config = _config()
    init, make_step = td3_lib.make_td3(env, config, collect_steps=2,
                                       grad_steps=2)
    state = init(jax.random.PRNGKey(0))
    step = jax.jit(make_step(random_actions=False))
    state, metrics = step(state)
    state, metrics = step(state)
    assert int(state.global_step) == 32
    assert np.isfinite(float(metrics["mean_reward"]))
    pol = td3_lib.deterministic_policy(env, state)
    a = pol(state.env_states.obs)
    assert np.abs(np.asarray(a)).max() <= 1.0
