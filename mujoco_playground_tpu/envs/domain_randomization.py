"""Domain randomization: per-env perturbations of model parameters.

The reference has no domain randomization; the BASELINE targets include
"domain-randomized envs (mass/friction/terrain) at 8192 instances".  The
TPU-native mechanism: the compiled :class:`Model` is a pytree, so selected
leaves get a leading env axis and the *same* engine code runs under
``vmap(step, in_axes=(model_axes, 0, 0))`` — no model recompilation, no
special-cased physics.

Randomized quantities (all multiplicative log-uniform scales unless noted):
  * wheel friction (tangential mu)
  * body masses + rotational inertias (consistently scaled)
  * joint damping / frictionloss / armature
  * actuator gain (servo strength)
  * floor height offset (terrain, additive)
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from mujoco_playground_tpu.envs.ackermann_env import AckermannEnv, EnvState
from mujoco_playground_tpu.physics.model import Model


@dataclasses.dataclass(frozen=True)
class RandomizationConfig:
    friction_scale: tuple = (0.7, 1.3)
    mass_scale: tuple = (0.8, 1.25)
    damping_scale: tuple = (0.7, 1.4)
    frictionloss_scale: tuple = (0.5, 2.0)
    armature_scale: tuple = (0.7, 1.4)
    actuator_gain_scale: tuple = (0.8, 1.25)
    floor_z_offset: tuple = (-0.002, 0.002)


def _log_uniform(key, shape, lo, hi, dtype):
    u = jax.random.uniform(key, shape, dtype)
    return jnp.exp(u * (jnp.log(hi) - jnp.log(lo)) + jnp.log(lo))


def randomize_model(model: Model, rng, num_envs: int,
                    config: RandomizationConfig = RandomizationConfig()
                    ) -> Model:
    """Returns a Model whose randomized leaves have a leading (num_envs,) axis."""
    dtype = model.dtype
    ks = jax.random.split(rng, 7)
    B = num_envs

    fric = _log_uniform(ks[0], (B, 1, 1), *config.friction_scale, dtype)
    mass = _log_uniform(ks[1], (B, 1), *config.mass_scale, dtype)
    damp = _log_uniform(ks[2], (B, 1), *config.damping_scale, dtype)
    floss = _log_uniform(ks[3], (B, 1), *config.frictionloss_scale, dtype)
    arma = _log_uniform(ks[4], (B, 1), *config.armature_scale, dtype)
    gain = _log_uniform(ks[5], (B, 1), *config.actuator_gain_scale, dtype)
    floor = jax.random.uniform(ks[6], (B,), dtype, *config.floor_z_offset)

    return model.replace(
        wheel_friction=model.wheel_friction[None] * fric,
        body_mass=model.body_mass[None] * mass,
        body_inertia=model.body_inertia[None, :, :] * mass[..., None],
        dof_damping=model.dof_damping[None] * damp,
        dof_frictionloss=model.dof_frictionloss[None] * floss,
        dof_armature=model.dof_armature[None] * arma,
        actuator_gain=model.actuator_gain[None] * gain,
        # scale the affine bias terms by the same factor so both servo types
        # stay consistent (position: biasprm=[0,-kp,-kv]; velocity:
        # [0,0,-kv]) — i.e. kp and kv scale together as "servo strength"
        actuator_bias=model.actuator_bias[None] * gain[..., None],
        plane_z=model.plane_z[None] * jnp.ones((B,), dtype) + floor,
    )


def model_axes(model: Model, randomized: Model) -> Model:
    """in_axes pytree: 0 for leaves with a new leading env axis, else None."""
    return jax.tree.map(
        lambda base, r: 0 if r.ndim == base.ndim + 1 else None,
        model, randomized)


class DomainRandomizedEnv:
    """Vectorized env with per-slot randomized physics.

    Wraps :class:`AckermannEnv`; each env slot gets its own model parameters
    (fixed for the slot's lifetime; call :meth:`resample` to redraw).
    """

    def __init__(self, env: AckermannEnv, num_envs: int, rng,
                 config: RandomizationConfig = RandomizationConfig()):
        self.env = env
        self.num_envs = num_envs
        self.rand_config = config
        self.obs_size = env.obs_size
        self.action_size = env.action_size
        self.config = env.config
        self.models = randomize_model(env.model, rng, num_envs, config)
        self._axes = model_axes(env.model, self.models)

    def resample(self, rng):
        self.models = randomize_model(self.env.model, rng, self.num_envs,
                                      self.rand_config)

    def reset(self, rng) -> EnvState:
        # per-env, vmap-able — the same contract as AckermannEnv.reset, so
        # the PPO/SAC/TD3 trainers and the evaluator accept a DR env
        # unchanged.  Reset is model-independent (template state); per-slot
        # physics kicks in from the first step.
        return self.env.reset(rng)

    def step_batch(self, states: EnvState, actions) -> EnvState:
        # batched fast path: batch-last smooth dynamics broadcast the
        # per-env parameters; assembly vmaps over the randomized leaves
        return self.env.step_batch(states, actions, models=self.models,
                                   base_model=self.env.model)

    def step_autoreset_batch(self, states: EnvState, actions) -> EnvState:
        # delegate so the megakernel path fuses the step, the obs/reward
        # pipeline AND the fresh-spawn auto-reset scan into one dispatch —
        # with the randomized plane_z riding as a per-env lane
        return self.env.step_autoreset_batch(states, actions,
                                             models=self.models,
                                             base_model=self.env.model)
