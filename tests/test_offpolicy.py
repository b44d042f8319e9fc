"""Off-policy learner tests: numeric oracles + learning checks (SAC/TD3).

The round-1 versions only asserted shapes/finiteness.  These tests verify
the actual update math against independent numpy recomputations — the
off-policy analog of test_ppo's GAE-recursion oracle:

* tanh-Gaussian log-prob (change-of-variables correction),
* the SAC critic target  r + gamma*(1-term)*(min Q' - alpha*log pi'),
* the entropy-alpha gradient  -(E[log pi] + H_target),
* the TD3 smoothed target  r + gamma*(1-term)*min Q'(s', clip(a'+noise)),
* TD3's delayed policy updates (actor/targets move only every
  policy_delay-th critic update),
* and end-to-end learning on a 1-step continuous bandit: both learners
  must move their deterministic policy to the known optimum.

Semantics being matched: SB3 SAC/TD3 as configured by the reference
trainer (/root/reference/src/rl/train.py:108-121).
"""
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import struct

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


# --------------------------------------------------------------- numeric oracles

def test_sample_tanh_logprob_matches_numpy():
    """logp must equal Normal(pre; mean, std) log-density minus the tanh
    change-of-variables term sum(log(1 - tanh(pre)^2)), per dimension."""
    key = jax.random.PRNGKey(3)
    mean = jnp.asarray([[0.3, -1.2], [0.0, 2.0]])
    log_std = jnp.asarray([[-0.5, 0.2], [0.1, -1.0]])
    action, logp = sac_lib.sample_tanh(mean, log_std, key)

    # numpy recomputation from the same base normal draw
    eps = np.asarray(jax.random.normal(key, mean.shape, mean.dtype))
    m, ls = np.asarray(mean), np.asarray(log_std)
    std = np.exp(ls)
    pre = m + std * eps
    a_np = np.tanh(pre)
    normal_logpdf = (-0.5 * ((pre - m) / std) ** 2 - ls
                     - 0.5 * np.log(2 * np.pi))
    logp_np = np.sum(normal_logpdf - np.log(1.0 - a_np**2), axis=-1)

    np.testing.assert_allclose(np.asarray(action), a_np, atol=1e-6)
    np.testing.assert_allclose(np.asarray(logp), logp_np, atol=1e-5)


def _tiny_nets(obs_size=3, action_size=2, seed=0):
    actor = sac_lib.TanhGaussianActor(action_size=action_size, hidden=(8,))
    qnet = sac_lib.TwinQ(hidden=(8,))
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    ap = actor.init(k1, jnp.zeros(obs_size))
    qp = qnet.init(k2, jnp.zeros(obs_size), jnp.zeros(action_size))
    return actor, qnet, ap, qp


def _batch(obs_size=3, action_size=2, n=5, seed=1):
    k = jax.random.split(jax.random.PRNGKey(seed), 5)
    obs = jax.random.normal(k[0], (n, obs_size))
    action = jnp.tanh(jax.random.normal(k[1], (n, action_size)))
    reward = jax.random.normal(k[2], (n,))
    next_obs = jax.random.normal(k[3], (n, obs_size))
    terminated = (jax.random.uniform(k[4], (n,)) < 0.4).astype(jnp.float32)
    return (obs, action, reward, next_obs, terminated)


def test_sac_q_target_matches_numpy():
    actor, qnet, ap, qp = _tiny_nets()
    batch = _batch()
    log_alpha = jnp.asarray(0.37)
    key = jax.random.PRNGKey(7)
    gamma = 0.93
    got = sac_lib.q_target(actor, qnet, ap, qp, log_alpha, batch, key, gamma)

    # independent assembly of the SB3 formula from the network outputs
    _, _, reward, next_obs, terminated = batch
    mean, log_std = actor.apply(ap, next_obs)
    next_action, next_logp = sac_lib.sample_tanh(mean, log_std, key)
    tq1, tq2 = qnet.apply(qp, next_obs, next_action)
    want = (np.asarray(reward)
            + gamma * (1.0 - np.asarray(terminated))
            * (np.minimum(np.asarray(tq1), np.asarray(tq2))
               - np.exp(0.37) * np.asarray(next_logp)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
    # termination gates the bootstrap exactly
    term_rows = np.asarray(terminated) == 1.0
    np.testing.assert_allclose(np.asarray(got)[term_rows],
                               np.asarray(reward)[term_rows], rtol=1e-6)


def test_sac_alpha_gradient_closed_form():
    logp = jnp.asarray([-1.0, -2.5, 0.5])
    target_entropy = -2.0
    g = jax.grad(sac_lib.alpha_loss)(jnp.asarray(0.11), logp, target_entropy)
    want = -(float(logp.mean()) + target_entropy)
    np.testing.assert_allclose(float(g), want, rtol=1e-6)


def test_td3_q_target_matches_numpy():
    actor = td3_lib.DeterministicActor(action_size=2, hidden=(8,))
    qnet = sac_lib.TwinQ(hidden=(8,))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    ap = actor.init(k1, jnp.zeros(3))
    qp = qnet.init(k2, jnp.zeros(3), jnp.zeros(2))
    batch = _batch()
    config = RLConfig(gamma=0.95, td3_policy_noise=0.2, td3_noise_clip=0.5)
    key = jax.random.PRNGKey(9)
    got = td3_lib.q_target(actor, qnet, config, ap, qp, batch, key)

    _, action, reward, next_obs, terminated = batch
    noise = np.clip(
        0.2 * np.asarray(jax.random.normal(key, action.shape)), -0.5, 0.5)
    next_action = np.clip(np.asarray(actor.apply(ap, next_obs)) + noise,
                          -1.0, 1.0)
    tq1, tq2 = qnet.apply(qp, jnp.asarray(next_obs),
                          jnp.asarray(next_action))
    want = (np.asarray(reward)
            + 0.95 * (1.0 - np.asarray(terminated))
            * np.minimum(np.asarray(tq1), np.asarray(tq2)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


# ------------------------------------------------------- bandit learning checks

@struct.dataclass
class _BanditState:
    obs: Any
    reward: Any
    final_obs: Any
    terminated: Any


class _BanditEnv:
    """1-step continuous bandit: reward 1 - (a - 0.6)^2, always terminates.

    With terminated=1 the critic target degenerates to the reward, so the
    Q nets must regress r(a) and the actor must climb it to a* = 0.6 —
    an end-to-end learning oracle with a known optimum.
    """
    obs_size = 1
    action_size = 1

    def reset(self, rng):
        z = jnp.zeros((1,), jnp.float32)
        return _BanditState(obs=z, reward=jnp.zeros((), jnp.float32),
                            final_obs=z,
                            terminated=jnp.zeros((), jnp.float32))

    def step_autoreset_batch(self, states, action):
        r = 1.0 - (action[..., 0] - 0.6) ** 2
        return _BanditState(obs=states.obs, reward=r,
                            final_obs=states.obs,
                            terminated=jnp.ones_like(r))


def _bandit_config():
    return RLConfig(num_envs=32, sac_buffer_size=4096, sac_batch_size=64,
                    sac_learning_rate=3e-3, td3_learning_rate=3e-3,
                    sac_tau=0.05)


def test_sac_learns_bandit_optimum():
    env = _BanditEnv()
    config = _bandit_config()
    init, make_step = sac_lib.make_sac(env, config, collect_steps=2,
                                       grad_steps=10)
    state = init(jax.random.PRNGKey(0))
    step = jax.jit(make_step(random_actions=False))
    for _ in range(40):
        state, metrics = step(state)
    a = float(sac_lib.deterministic_policy(env, state)(jnp.zeros((1,)))[0])
    assert abs(a - 0.6) < 0.15, f"SAC converged to {a}, expected ~0.6"


def test_td3_learns_bandit_optimum():
    env = _BanditEnv()
    config = _bandit_config()
    init, make_step = td3_lib.make_td3(env, config, collect_steps=2,
                                       grad_steps=10,
                                       exploration_noise=0.3)
    state = init(jax.random.PRNGKey(0))
    step = jax.jit(make_step(random_actions=False))
    for _ in range(100):
        state, metrics = step(state)
    a = float(td3_lib.deterministic_policy(env, state)(jnp.zeros((1,)))[0])
    assert abs(a - 0.6) < 0.15, f"TD3 converged to {a}, expected ~0.6"


def test_td3_delayed_policy_updates():
    """Actor / targets move only on every policy_delay-th critic update."""
    env = _BanditEnv()
    config = RLConfig(num_envs=8, sac_buffer_size=512, sac_batch_size=16,
                      td3_policy_delay=2)
    init, make_step = td3_lib.make_td3(env, config, collect_steps=1,
                                       grad_steps=1)
    state = init(jax.random.PRNGKey(0))
    step = jax.jit(make_step(random_actions=False))

    def flat(p):
        return np.concatenate([np.ravel(x) for x in jax.tree.leaves(p)])

    s1, _ = step(state)      # update_count 0: 0 % 2 == 0 -> policy update
    s2, _ = step(s1)         # update_count 1: no policy update
    assert int(s1.update_count) == 1 and int(s2.update_count) == 2
    assert not np.allclose(flat(s1.actor_params), flat(state.actor_params))
    np.testing.assert_array_equal(flat(s2.actor_params),
                                  flat(s1.actor_params))
    np.testing.assert_array_equal(flat(s2.actor_target_params),
                                  flat(s1.actor_target_params))
    # critic still updates every step
    assert not np.allclose(flat(s2.q_params), flat(s1.q_params))


# ----------------------------------------------------------- env integration

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
