"""SAC as a fused on-device learner (reference trainer's --algo sac).

Hyperparameter defaults follow the reference (src/rl/train.py:108-114: lr
3e-4, buffer 100k, learning_starts 1000, batch 256, tau 0.005, gamma 0.99)
and the algorithm follows SB3 SAC: squashed-Gaussian policy, twin Q critics
with target networks, automatic entropy tuning to target -dim(A).

TPU structure: one jitted ``train_step`` = collect a chunk of env steps from
the vectorized auto-resetting env into the device replay buffer, then run G
gradient updates on sampled minibatches — a lax.scan, no host loop.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from mujoco_playground_tpu.rl import replay_buffer as rb
from mujoco_playground_tpu.rl.config import RLConfig

LOG_STD_MIN, LOG_STD_MAX = -20.0, 2.0


class TanhGaussianActor(nn.Module):
    action_size: int = 2
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs):
        x = obs
        for i, f in enumerate(self.hidden):
            x = nn.relu(nn.Dense(f, name=f"dense_{i}")(x))
        mean = nn.Dense(self.action_size, name="mean")(x)
        log_std = nn.Dense(self.action_size, name="log_std")(x)
        return mean, jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)


class TwinQ(nn.Module):
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs, action):
        def q(name):
            x = jnp.concatenate([obs, action], axis=-1)
            for i, f in enumerate(self.hidden):
                x = nn.relu(nn.Dense(f, name=f"{name}_dense_{i}")(x))
            return nn.Dense(1, name=f"{name}_out")(x)[..., 0]
        return q("q1"), q("q2")


def sample_tanh(mean, log_std, key):
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    pre = mean + std * eps
    action = jnp.tanh(pre)
    logp = jnp.sum(
        -0.5 * eps**2 - log_std - 0.5 * jnp.log(2 * jnp.pi)
        - jnp.log(jnp.maximum(1.0 - action**2, 1e-6)), axis=-1)
    return action, logp


def q_target(actor, qnet, actor_params, q_target_params, log_alpha, batch,
             key, gamma):
    """SB3 SAC critic target: r + gamma*(1-term)*(min Q' - alpha*log pi').

    Module-level so tests/test_offpolicy.py can oracle-check the exact
    function the trainer differentiates (reference semantics:
    src/rl/train.py:108-114 delegating to SB3 SAC).
    """
    obs, action, reward, next_obs, terminated = batch
    mean, log_std = actor.apply(actor_params, next_obs)
    next_action, next_logp = sample_tanh(mean, log_std, key)
    tq1, tq2 = qnet.apply(q_target_params, next_obs, next_action)
    alpha = jnp.exp(log_alpha)
    return reward + gamma * (1.0 - terminated) * (
        jnp.minimum(tq1, tq2) - alpha * next_logp)


def alpha_loss(log_alpha, logp, target_entropy):
    """Automatic entropy tuning loss: -E[log_alpha*(log pi + H_target)].

    d/d(log_alpha) = -(mean(logp) + H_target): alpha rises while the policy
    is less entropic than the target (SB3 ent_coef='auto' semantics).
    """
    return -jnp.mean(log_alpha * jax.lax.stop_gradient(logp + target_entropy))


@struct.dataclass
class SACState:
    actor_params: Any
    q_params: Any
    q_target_params: Any
    log_alpha: Any
    actor_opt: Any
    q_opt: Any
    alpha_opt: Any
    buffer: Any
    env_states: Any
    rng: Any
    global_step: Any


def make_sac(env, config: RLConfig, collect_steps: int = 4,
             grad_steps: int = 4):
    """Returns (init_fn, train_step_fn) for SAC on the vectorized env."""
    hidden = tuple(config.offpolicy_hidden_sizes)
    actor = TanhGaussianActor(action_size=env.action_size, hidden=hidden)
    qnet = TwinQ(hidden=hidden)
    a_tx = optax.adam(config.sac_learning_rate)
    q_tx = optax.adam(config.sac_learning_rate)
    al_tx = optax.adam(config.sac_learning_rate)
    target_entropy = -float(env.action_size)
    B = config.num_envs

    def init(rng) -> SACState:
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        obs0 = jnp.zeros((env.obs_size,), jnp.float32)
        act0 = jnp.zeros((env.action_size,), jnp.float32)
        actor_params = actor.init(k1, obs0)
        q_params = qnet.init(k2, obs0, act0)
        log_alpha = jnp.zeros(())
        env_states = jax.vmap(env.reset)(jax.random.split(k3, B))
        return SACState(
            actor_params=actor_params, q_params=q_params,
            q_target_params=q_params, log_alpha=log_alpha,
            actor_opt=a_tx.init(actor_params), q_opt=q_tx.init(q_params),
            alpha_opt=al_tx.init(log_alpha),
            buffer=rb.make_buffer(config.sac_buffer_size, env.obs_size,
                                  env.action_size),
            env_states=env_states, rng=rng,
            global_step=jnp.zeros((), jnp.int32))

    def collect(state: SACState, random_actions: bool):
        def body(carry, key):
            env_states, buffer = carry
            obs = env_states.obs
            if random_actions:
                action = jax.random.uniform(
                    key, (B, env.action_size), minval=-1.0, maxval=1.0)
            else:
                mean, log_std = actor.apply(state.actor_params, obs)
                action, _ = sample_tanh(mean, log_std, key)
            nxt = env.step_autoreset_batch(env_states, action)
            buffer = rb.insert(buffer, obs, action, nxt.reward,
                               nxt.final_obs, nxt.terminated)
            return (nxt, buffer), nxt.reward.mean()

        keys = jax.random.split(state.rng, collect_steps)
        (env_states, buffer), rews = jax.lax.scan(
            body, (state.env_states, state.buffer), keys)
        return env_states, buffer, rews.mean()

    def q_loss_fn(q_params, state, batch, key):
        obs, action = batch[0], batch[1]
        target = jax.lax.stop_gradient(q_target(
            actor, qnet, state.actor_params, state.q_target_params,
            state.log_alpha, batch, key, config.gamma))
        q1, q2 = qnet.apply(q_params, obs, action)
        return 0.5 * (jnp.mean((q1 - target) ** 2)
                      + jnp.mean((q2 - target) ** 2))

    def actor_loss_fn(actor_params, state, batch, key):
        obs = batch[0]
        mean, log_std = actor.apply(actor_params, obs)
        action, logp = sample_tanh(mean, log_std, key)
        q1, q2 = qnet.apply(state.q_params, obs, action)
        alpha = jnp.exp(state.log_alpha)
        return jnp.mean(alpha * logp - jnp.minimum(q1, q2)), logp

    def make_train_step(random_actions: bool = False) -> Callable:
        def train_step(state: SACState):
            rng, k_collect, k_updates = jax.random.split(state.rng, 3)
            state = state.replace(rng=k_collect)
            env_states, buffer, mean_reward = collect(state, random_actions)
            state = state.replace(env_states=env_states, buffer=buffer)

            def update(carry, key):
                st = carry
                k1, k2, k3 = jax.random.split(key, 3)
                batch = rb.sample(st.buffer, k1, config.sac_batch_size)
                qg = jax.grad(q_loss_fn)(st.q_params, st, batch, k2)
                qu, q_opt = q_tx.update(qg, st.q_opt, st.q_params)
                q_params = optax.apply_updates(st.q_params, qu)
                st = st.replace(q_params=q_params, q_opt=q_opt)

                (aloss, logp), ag = jax.value_and_grad(
                    actor_loss_fn, has_aux=True)(st.actor_params, st, batch, k3)
                au, a_opt = a_tx.update(ag, st.actor_opt, st.actor_params)
                actor_params = optax.apply_updates(st.actor_params, au)

                alpha_g = jax.grad(alpha_loss)(st.log_alpha, logp,
                                               target_entropy)
                alu, alpha_opt = al_tx.update(alpha_g, st.alpha_opt,
                                              st.log_alpha)
                log_alpha = optax.apply_updates(st.log_alpha, alu)

                q_target = jax.tree.map(
                    lambda t, o: (1 - config.sac_tau) * t + config.sac_tau * o,
                    st.q_target_params, q_params)
                return st.replace(
                    actor_params=actor_params, actor_opt=a_opt,
                    log_alpha=log_alpha, alpha_opt=alpha_opt,
                    q_target_params=q_target), aloss

            state, alosses = jax.lax.scan(
                update, state, jax.random.split(k_updates, grad_steps))
            return state.replace(
                rng=rng,
                global_step=state.global_step + collect_steps * B), dict(
                    mean_reward=mean_reward, actor_loss=alosses.mean(),
                    alpha=jnp.exp(state.log_alpha),
                    buffer_size=state.buffer.size)
        return train_step

    return init, make_train_step


def actor_hidden_of(params):
    """Tower widths inferred from an actor params tree (dense_i kernels) —
    so evaluation works for any checkpoint width, not just the config
    default (the --hidden flag makes widths run-dependent)."""
    p = params["params"]
    hs = []
    while f"dense_{len(hs)}" in p:
        hs.append(int(p[f"dense_{len(hs)}"]["kernel"].shape[-1]))
    return tuple(hs)


def deterministic_policy(env, state: SACState):
    actor = TanhGaussianActor(action_size=env.action_size,
                              hidden=actor_hidden_of(state.actor_params))

    def policy_fn(obs):
        mean, _ = actor.apply(state.actor_params, obs)
        return jnp.tanh(mean)
    return policy_fn
