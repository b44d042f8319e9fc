"""Evaluation harness — vectorized twin of the reference's evaluate_agent.

The reference runs N sequential episodes with ``deterministic=True`` and
reports mean/std return, episode length, and success rate (src/rl/utils.py:
20-50).  Here N episodes run in parallel (one env slot per episode), fully
on-device: each slot plays exactly one episode (no auto-reset), masked
accumulation stops at the first done.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_playground_tpu.rl import networks


def evaluate_agent(env, policy_fn: Callable, num_episodes: int = 10,
                   rng: Optional[jax.Array] = None,
                   max_steps: Optional[int] = None) -> Dict[str, float]:
    """policy_fn: obs (B, obs_size) -> action (B, 2) (deterministic)."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    max_steps = max_steps or env.config.max_episode_steps
    # a DomainRandomizedEnv is batch-bound (its per-slot models carry a
    # fixed leading axis): one episode per randomized slot
    if hasattr(env, "num_envs"):
        num_episodes = env.num_envs

    states = jax.vmap(env.reset)(jax.random.split(rng, num_episodes))

    def body(carry, _):
        states, ret, length, finished, success = carry
        action = policy_fn(states.obs)
        next_states = env.step_batch(states, action)
        live = ~finished
        ret = ret + next_states.reward * live
        length = length + live.astype(jnp.int32)
        success = success | (next_states.terminated & live)
        finished = finished | next_states.done
        return (next_states, ret, length, finished, success), ()

    init = (states,
            jnp.zeros(num_episodes), jnp.zeros(num_episodes, jnp.int32),
            jnp.zeros(num_episodes, bool), jnp.zeros(num_episodes, bool))
    (states, ret, length, finished, success), _ = jax.lax.scan(
        body, init, None, length=max_steps)

    ret, length, success = map(np.asarray, (ret, length, success))
    return dict(
        mean_return=float(ret.mean()), std_return=float(ret.std()),
        min_return=float(ret.min()), max_return=float(ret.max()),
        mean_length=float(length.mean()), std_length=float(length.std()),
        success_rate=float(success.mean()),
    )


def deterministic_policy(network, params, norm=None):
    """Greedy (mean) policy, clipped to the action space like the env does.

    ``norm`` (ppo.NormState) applies the same VecNormalize obs scaling the
    policy trained with — pass it for (and ONLY for) policies trained with
    config.normalize_obs (SB3 users eval through the saved VecNormalize).
    A reward-only NormState still carries obs statistics; feeding scaled
    obs to a policy trained on raw ones would corrupt the eval.
    """
    def policy_fn(obs):
        if norm is not None:
            from mujoco_playground_tpu.rl import ppo as _ppo
            obs = _ppo.normalize_obs(norm, obs)
        mean, _, _ = network.apply(params, obs)
        return jnp.clip(mean, -1.0, 1.0)
    return policy_fn


def random_policy(rng_holder):
    """Uniform random policy (the reference's --algo random baseline)."""
    def policy_fn(obs):
        key = rng_holder.pop()
        return jax.random.uniform(key, obs.shape[:-1] + (2,),
                                  minval=-1.0, maxval=1.0)
    return policy_fn
