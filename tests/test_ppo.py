"""PPO trainer tests: GAE math, fused train step, evaluator, checkpointing."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_playground_tpu.envs import make_ackermann_env
from mujoco_playground_tpu.rl import checkpoint as ckpt_lib
from mujoco_playground_tpu.rl import ppo
from mujoco_playground_tpu.rl.config import RLConfig
from mujoco_playground_tpu.rl.evaluate import deterministic_policy, evaluate_agent
from mujoco_playground_tpu.rl.networks import ActorCritic


def test_gae_matches_reference_recursion():
    """GAE reverse scan == the textbook recursion (SB3 semantics incl.
    timeout bootstrap via final values)."""
    rng = np.random.RandomState(0)
    T, B = 12, 3
    r = rng.randn(T, B)
    v = rng.randn(T, B)
    fv = rng.randn(T, B)
    term = (rng.rand(T, B) < 0.2).astype(float)
    done = np.maximum(term, (rng.rand(T, B) < 0.2).astype(float))
    gamma, lam = 0.99, 0.95

    expected = np.zeros((T, B))
    acc = np.zeros(B)
    for t in reversed(range(T)):
        delta = r[t] + gamma * fv[t] * (1 - term[t]) - v[t]
        acc = delta + gamma * lam * (1 - done[t]) * acc
        expected[t] = acc

    out = ppo.gae(jnp.asarray(r), jnp.asarray(v), jnp.asarray(fv),
                  jnp.asarray(term), jnp.asarray(done), gamma, lam)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-10)


@pytest.fixture(scope="module")
def small_setup():
    config = RLConfig(num_envs=16, unroll_length=8, num_minibatches=4,
                      ppo_epochs=2, solver_iterations=3, ls_iterations=2,
                      max_episode_steps=50)
    env = make_ackermann_env("maze", "umaze",
                             max_episode_steps=50,
                             solver_iterations=3, ls_iterations=2)
    network = ActorCritic(action_size=env.action_size)
    ts = ppo.init_train_state(env, network, config, jax.random.PRNGKey(0))
    return env, network, config, ts


def test_train_step_runs_and_updates(small_setup):
    env, network, config, ts = small_setup
    train_step = jax.jit(ppo.make_train_step(env, network, config))
    ts2, metrics = train_step(ts)
    assert int(ts2.global_step) == config.num_envs * config.unroll_length
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"metric {k} not finite"
    # params changed
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        ts.params, ts2.params)
    assert max(jax.tree.leaves(diff)) > 0
    # second step from the updated state also works
    ts3, _ = train_step(ts2)
    assert np.isfinite(float(jax.tree.leaves(
        jax.tree.map(lambda x: jnp.abs(x).max(), ts3.params))[0]))


def test_evaluate_agent(small_setup):
    env, network, config, ts = small_setup
    stats = evaluate_agent(env, deterministic_policy(network, ts.params),
                           num_episodes=4, max_steps=30)
    assert set(stats) >= {"mean_return", "std_return", "mean_length",
                          "success_rate"}
    assert 0.0 <= stats["success_rate"] <= 1.0
    assert stats["mean_length"] <= 30


def test_checkpoint_roundtrip(tmp_path, small_setup):
    env, network, config, ts = small_setup
    path = ckpt_lib.save_checkpoint(str(tmp_path), ts, 123)
    restored = ckpt_lib.restore_checkpoint(path, ts)
    for a, b in zip(jax.tree.leaves(ts.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(ts.env_states.qpos
                                             if hasattr(ts.env_states, 'qpos')
                                             else ts.env_states.physics.qpos),
                                  np.asarray(restored.env_states.physics.qpos))


def test_running_stats_match_numpy_oracle():
    """NormState's Chan-merge running mean/var == exact numpy statistics
    over the concatenation of all folded slabs (SB3 RunningMeanStd
    semantics), and the return normalizer tracks the discounted running
    return's variance."""
    rng = np.random.RandomState(3)
    T, B, D = 7, 5, 4
    norm = ppo.init_norm_state(D, B)
    gamma = 0.9
    all_obs, all_rets = [], []
    env_ret = np.zeros(B)
    for _ in range(3):
        obs = rng.randn(T, B, D) * 3.0 + 1.5
        rew = rng.randn(T, B)
        done = (rng.rand(T, B) < 0.2).astype(np.float32)
        norm = ppo.update_norm_state(
            norm, jnp.asarray(obs), jnp.asarray(rew), jnp.asarray(done),
            gamma)
        all_obs.append(obs.reshape(-1, D))
        for t in range(T):
            # SB3 VecNormalize: returns = returns*gamma + r, sample, THEN
            # zero at episode ends
            env_ret = env_ret * gamma + rew[t]
            all_rets.append(env_ret.copy())
            env_ret = env_ret * (1 - done[t])
    cat = np.concatenate(all_obs)
    # count starts at 1e-4 (SB3), so allow that epsilon's worth of slack
    np.testing.assert_allclose(np.asarray(norm.obs_mean), cat.mean(0),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(norm.obs_var), cat.var(0),
                               rtol=1e-3, atol=1e-3)
    rets = np.stack(all_rets)
    np.testing.assert_allclose(float(norm.ret_var), rets.var(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(norm.env_returns), env_ret,
                               atol=1e-5)
    # normalization behaviors
    z = ppo.normalize_obs(norm, jnp.asarray(cat))
    assert np.asarray(z).std() < 2.0 and np.abs(np.asarray(z)).max() <= 10.0
    r = ppo.normalize_reward(norm, jnp.asarray(rng.randn(64) * 100))
    assert np.abs(np.asarray(r)).max() <= 10.0


@pytest.mark.slow
def test_normalized_train_step_runs_and_normalizes(small_setup):
    env, network, config, _ = small_setup
    import dataclasses
    config = dataclasses.replace(config, normalize_obs=True,
                                 normalize_reward=True)
    ts = ppo.init_train_state(env, network, config, jax.random.PRNGKey(1))
    assert ts.norm is not None
    train_step = jax.jit(ppo.make_train_step(env, network, config))
    ts2, metrics = train_step(ts)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"metric {k} not finite"
    # statistics moved toward the data (obs have nonzero means e.g. lidar)
    assert float(jnp.abs(ts2.norm.obs_mean).max()) > 0.1
    assert float(ts2.norm.count) > 1.0
    ts3, _ = train_step(ts2)
    assert float(ts3.norm.count) > float(ts2.norm.count)
    # eval path consumes the same normalization
    stats = evaluate_agent(
        env, deterministic_policy(network, ts3.params, norm=ts3.norm),
        num_episodes=2, rng=jax.random.PRNGKey(0), max_steps=20)
    assert np.isfinite(stats["mean_return"])
