"""mujoco_playground_tpu — TPU-native vectorized physics-RL framework.

A from-scratch reimplementation of the capabilities of the reference
``mujoco_playground`` repo (an Ackermann-steering mobile-robot RL playground
built on the MuJoCo C engine + Gymnasium + Stable-Baselines3), redesigned
TPU-first:

* the physics layer (reference: MuJoCo C via ``mj_step``) is a pure-JAX
  generalized-coordinate rigid-body engine under ``jit``+``vmap``
  (:mod:`mujoco_playground_tpu.physics`),
* environments are stateless pytree functions with batched auto-reset
  (:mod:`mujoco_playground_tpu.envs`),
* RL is a fused on-device actor-learner (:mod:`mujoco_playground_tpu.rl`),
* scaling is a ``jax.sharding.Mesh`` over the env batch axis
  (:mod:`mujoco_playground_tpu.parallel`).
"""

__version__ = "0.1.0"

from mujoco_playground_tpu.spec import robot as robot_spec  # noqa: F401
