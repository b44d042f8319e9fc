"""Random-policy baseline — twin of the reference's train_with_custom_algo
(src/rl/train.py:189-227): the de-facto "does the env work end-to-end"
integration check, reporting rolling mean/std/best returns.

TPU version: episodes play out in parallel lockstep with auto-reset; returns
are collected per finished episode.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def run_random_baseline(env, episodes: int = 1000, num_envs: int = 256,
                        seed: int = 0, log_every: int = 100,
                        verbose: bool = True) -> Dict[str, float]:
    rng = jax.random.PRNGKey(seed)
    rng, k = jax.random.split(rng)
    states = jax.jit(jax.vmap(env.reset))(jax.random.split(k, num_envs))

    T = 128  # steps per collection chunk

    @jax.jit
    def chunk(states, key):
        def body(carry, key):
            states, ep_ret = carry
            acts = jax.random.uniform(key, (num_envs, 2), minval=-1.0,
                                      maxval=1.0)
            states = env.step_autoreset_batch(states, acts)
            ep_ret = ep_ret + states.reward
            finished_ret = jnp.where(states.done, ep_ret, jnp.nan)
            ep_ret = jnp.where(states.done, 0.0, ep_ret)
            return (states, ep_ret), finished_ret

        (states, ep_ret), finished = jax.lax.scan(
            body, (states, jnp.zeros(num_envs)), jax.random.split(key, T))
        return states, finished

    ep_ret_carry = jnp.zeros(num_envs)
    returns = []
    while len(returns) < episodes:
        rng, k = jax.random.split(rng)
        states, finished = chunk(states, k)
        vals = np.asarray(finished)
        returns.extend(vals[np.isfinite(vals)].tolist())
        if verbose and len(returns) and len(returns) % log_every < T:
            recent = returns[-log_every:]
            print(f"Episodes {len(returns)}: avg return (last "
                  f"{len(recent)}): {np.mean(recent):.2f}")

    returns = np.asarray(returns[:episodes])
    stats = dict(mean_return=float(returns.mean()),
                 std_return=float(returns.std()),
                 best_return=float(returns.max()),
                 episodes=len(returns))
    if verbose:
        print(f"Average return: {stats['mean_return']:.2f} "
              f"± {stats['std_return']:.2f}")
        print(f"Best return: {stats['best_return']:.2f}")
    return stats
