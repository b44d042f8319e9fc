"""Policy/value networks — the reference checkpoint's architecture in flax.

The shipped SB3 PPO checkpoints (reference rl_logs/ppo/*.zip -> policy.pth)
use separate actor/critic towers 79 -> 64 -> 64 with tanh, a linear action
head 64 -> 2, a state-independent learned log_std (2,), and a value head
64 -> 1.  Initialization matches SB3's MlpPolicy: orthogonal with gain
sqrt(2) on hidden layers, 0.01 on the action head, 1.0 on the value head,
log_std = 0.

TPU note: the MLP is tiny per-sample; throughput comes from batching — at
4096 envs the (4096, 79) x (79, 64) matmuls land on the MXU.  Width/depth are
configurable for scaled-up experiments.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

LOG_STD_MIN, LOG_STD_MAX = -20.0, 2.0


class MLPTower(nn.Module):
    features: Sequence[int]
    activation: str = "tanh"

    @nn.compact
    def __call__(self, x):
        act = dict(tanh=jnp.tanh, relu=jax.nn.relu)[self.activation]
        for i, f in enumerate(self.features):
            x = nn.Dense(f, kernel_init=nn.initializers.orthogonal(
                jnp.sqrt(2.0)), name=f"dense_{i}")(x)
            x = act(x)
        return x


class ActorCritic(nn.Module):
    """Twin-tower Gaussian actor + value critic (SB3 MlpPolicy layout)."""

    action_size: int = 2
    hidden: Sequence[int] = (64, 64)
    activation: str = "tanh"

    @nn.compact
    def __call__(self, obs):
        pi_latent = MLPTower(self.hidden, self.activation, name="pi_tower")(obs)
        vf_latent = MLPTower(self.hidden, self.activation, name="vf_tower")(obs)
        mean = nn.Dense(self.action_size,
                        kernel_init=nn.initializers.orthogonal(0.01),
                        name="action_head")(pi_latent)
        log_std = self.param("log_std", nn.initializers.zeros,
                             (self.action_size,))
        value = nn.Dense(1, kernel_init=nn.initializers.orthogonal(1.0),
                         name="value_head")(vf_latent)
        return mean, jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX), value[..., 0]


def sample_action(mean, log_std, key):
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    action = mean + std * eps
    return action, gaussian_logp(mean, log_std, action)


def gaussian_logp(mean, log_std, action):
    std = jnp.exp(log_std)
    z = (action - mean) / std
    return jnp.sum(-0.5 * z**2 - log_std - 0.5 * jnp.log(2 * jnp.pi), axis=-1)


def gaussian_entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1)
