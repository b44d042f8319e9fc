"""On-device replay buffer for off-policy learners (SAC/TD3).

The reference delegates replay to SB3's numpy buffers (host RAM, per-sample
Python indexing).  Here the buffer is a device-resident ring of arrays;
inserts are ``dynamic_update_slice`` of whole (B, ...) collection chunks and
sampling is a batched gather — no host round-trips inside the training loop.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayBuffer:
    obs: Any          # (capacity, obs_dim)
    action: Any       # (capacity, act_dim)
    reward: Any       # (capacity,)
    next_obs: Any     # (capacity, obs_dim)
    # 1.0 where the transition ended the episode by true termination
    # (timeouts bootstrap, matching SB3's handle_timeout_termination).
    terminated: Any   # (capacity,)
    ptr: Any          # scalar int32 insert cursor
    size: Any         # scalar int32 current fill


def make_buffer(capacity: int, obs_dim: int, act_dim: int,
                dtype=jnp.float32) -> ReplayBuffer:
    return ReplayBuffer(
        obs=jnp.zeros((capacity, obs_dim), dtype),
        action=jnp.zeros((capacity, act_dim), dtype),
        reward=jnp.zeros((capacity,), dtype),
        next_obs=jnp.zeros((capacity, obs_dim), dtype),
        terminated=jnp.zeros((capacity,), dtype),
        ptr=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )


def insert(buf: ReplayBuffer, obs, action, reward, next_obs,
           terminated) -> ReplayBuffer:
    """Insert a (B, ...) chunk at the cursor (capacity % B == 0 keeps the
    ring arithmetic exact)."""
    n = obs.shape[0]
    capacity = buf.obs.shape[0]
    i = buf.ptr
    zero = jnp.zeros((), buf.ptr.dtype)

    def upd(arr, x):
        return jax.lax.dynamic_update_slice(
            arr, x.astype(arr.dtype), (i,) + (zero,) * (arr.ndim - 1))

    return buf.replace(
        obs=upd(buf.obs, obs), action=upd(buf.action, action),
        reward=jax.lax.dynamic_update_slice(buf.reward,
                                            reward.astype(buf.reward.dtype),
                                            (i,)),
        next_obs=upd(buf.next_obs, next_obs),
        terminated=jax.lax.dynamic_update_slice(
            buf.terminated, terminated.astype(buf.terminated.dtype), (i,)),
        ptr=(i + n) % capacity,
        size=jnp.minimum(buf.size + n, capacity),
    )


def sample(buf: ReplayBuffer, key, batch_size: int):
    """Uniform sample of `batch_size` transitions from the filled region."""
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(buf.size, 1))
    return (buf.obs[idx], buf.action[idx], buf.reward[idx],
            buf.next_obs[idx], buf.terminated[idx])
