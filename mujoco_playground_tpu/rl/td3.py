"""TD3 as a fused on-device learner (reference trainer's --algo td3).

Hyperparameter defaults follow the reference (src/rl/train.py:115-121) and
SB3 TD3 semantics: deterministic tanh policy + exploration noise, twin Q
critics, target policy smoothing, delayed policy updates.
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
from mujoco_playground_tpu.rl.sac import TwinQ


class DeterministicActor(nn.Module):
    action_size: int = 2
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs):
        x = obs
        for i, f in enumerate(self.hidden):
            x = nn.relu(nn.Dense(f, name=f"dense_{i}")(x))
        return jnp.tanh(nn.Dense(self.action_size, name="out")(x))


def q_target(actor, qnet, config, actor_target_params, q_target_params,
             batch, key):
    """SB3 TD3 smoothed critic target:
    r + gamma*(1-term)*min Q'(s', clip(pi_targ(s') + clipped noise)).

    Module-level so tests/test_offpolicy.py can oracle-check the exact
    function the trainer differentiates.
    """
    obs, action, reward, next_obs, terminated = batch
    noise = jnp.clip(
        config.td3_policy_noise * jax.random.normal(
            key, action.shape, action.dtype),
        -config.td3_noise_clip, config.td3_noise_clip)
    next_action = jnp.clip(
        actor.apply(actor_target_params, next_obs) + noise, -1.0, 1.0)
    tq1, tq2 = qnet.apply(q_target_params, next_obs, next_action)
    return reward + config.gamma * (1.0 - terminated) * jnp.minimum(tq1, tq2)


@struct.dataclass
class TD3State:
    actor_params: Any
    actor_target_params: Any
    q_params: Any
    q_target_params: Any
    actor_opt: Any
    q_opt: Any
    buffer: Any
    env_states: Any
    rng: Any
    global_step: Any
    update_count: Any


def make_td3(env, config: RLConfig, collect_steps: int = 4,
             grad_steps: int = 4, exploration_noise: float = 0.1):
    hidden = tuple(config.offpolicy_hidden_sizes)
    actor = DeterministicActor(action_size=env.action_size, hidden=hidden)
    qnet = TwinQ(hidden=hidden)
    a_tx = optax.adam(config.td3_learning_rate)
    q_tx = optax.adam(config.td3_learning_rate)
    B = config.num_envs

    def init(rng) -> TD3State:
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        obs0 = jnp.zeros((env.obs_size,), jnp.float32)
        act0 = jnp.zeros((env.action_size,), jnp.float32)
        actor_params = actor.init(k1, obs0)
        q_params = qnet.init(k2, obs0, act0)
        env_states = jax.vmap(env.reset)(jax.random.split(k3, B))
        return TD3State(
            actor_params=actor_params, actor_target_params=actor_params,
            q_params=q_params, q_target_params=q_params,
            actor_opt=a_tx.init(actor_params), q_opt=q_tx.init(q_params),
            buffer=rb.make_buffer(config.sac_buffer_size, env.obs_size,
                                  env.action_size),
            env_states=env_states, rng=rng,
            global_step=jnp.zeros((), jnp.int32),
            update_count=jnp.zeros((), jnp.int32))

    def make_train_step(random_actions: bool = False) -> Callable:
        def train_step(state: TD3State):
            rng, k_collect, k_updates = jax.random.split(state.rng, 3)

            def collect_body(carry, key):
                env_states, buffer = carry
                obs = env_states.obs
                if random_actions:
                    action = jax.random.uniform(
                        key, (B, env.action_size), minval=-1.0, maxval=1.0)
                else:
                    action = actor.apply(state.actor_params, obs)
                    action = jnp.clip(
                        action + exploration_noise * jax.random.normal(
                            key, action.shape, action.dtype), -1.0, 1.0)
                nxt = env.step_autoreset_batch(env_states, action)
                buffer = rb.insert(buffer, obs, action, nxt.reward,
                                   nxt.final_obs, nxt.terminated)
                return (nxt, buffer), nxt.reward.mean()

            (env_states, buffer), rews = jax.lax.scan(
                collect_body, (state.env_states, state.buffer),
                jax.random.split(k_collect, collect_steps))
            state = state.replace(env_states=env_states, buffer=buffer)

            def q_loss_fn(q_params, st, batch, key):
                target = jax.lax.stop_gradient(q_target(
                    actor, qnet, config, st.actor_target_params,
                    st.q_target_params, batch, key))
                q1, q2 = qnet.apply(q_params, batch[0], batch[1])
                return 0.5 * (jnp.mean((q1 - target) ** 2)
                              + jnp.mean((q2 - target) ** 2))

            def update(st, key):
                k1, k2 = jax.random.split(key)
                batch = rb.sample(st.buffer, k1, config.sac_batch_size)
                qg = jax.grad(q_loss_fn)(st.q_params, st, batch, k2)
                qu, q_opt = q_tx.update(qg, st.q_opt, st.q_params)
                q_params = optax.apply_updates(st.q_params, qu)
                st = st.replace(q_params=q_params, q_opt=q_opt)

                def do_policy_update(st):
                    def actor_loss_fn(actor_params):
                        a = actor.apply(actor_params, batch[0])
                        q1, _ = qnet.apply(st.q_params, batch[0], a)
                        return -jnp.mean(q1)
                    ag = jax.grad(actor_loss_fn)(st.actor_params)
                    au, a_opt = a_tx.update(ag, st.actor_opt, st.actor_params)
                    actor_params = optax.apply_updates(st.actor_params, au)
                    polyak = lambda t, o: jax.tree.map(
                        lambda a_, b_: (1 - config.sac_tau) * a_
                        + config.sac_tau * b_, t, o)
                    return st.replace(
                        actor_params=actor_params, actor_opt=a_opt,
                        actor_target_params=polyak(st.actor_target_params,
                                                   actor_params),
                        q_target_params=polyak(st.q_target_params,
                                               st.q_params))

                st = jax.lax.cond(
                    st.update_count % config.td3_policy_delay == 0,
                    do_policy_update, lambda s: s, st)
                return st.replace(update_count=st.update_count + 1), None

            state, _ = jax.lax.scan(
                update, state, jax.random.split(k_updates, grad_steps))
            return state.replace(
                rng=rng,
                global_step=state.global_step + collect_steps * B), dict(
                    mean_reward=rews.mean(), buffer_size=state.buffer.size)
        return train_step

    return init, make_train_step


def deterministic_policy(env, state: TD3State):
    from mujoco_playground_tpu.rl.sac import actor_hidden_of
    actor = DeterministicActor(action_size=env.action_size,
                               hidden=actor_hidden_of(state.actor_params))

    def policy_fn(obs):
        return actor.apply(state.actor_params, obs)
    return policy_fn
