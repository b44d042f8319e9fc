"""Dynamic physics state pytree (replaces MuJoCo's mutable ``MjData``).

Unlike the reference — which mutates ``data.ctrl`` / reads ``data.xpos`` on a
single heap-allocated MjData (src/core/controller.py:136-140,
src/core/odometry.py:52-53) — state here is an immutable pytree: one per env,
batched by ``vmap`` over thousands of envs in lockstep.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from mujoco_playground_tpu.physics.model import Model


@struct.dataclass
class State:
    qpos: Any          # (nq,)
    qvel: Any          # (nv,)
    ctrl: Any          # (nu,)
    time: Any          # scalar
    # Derived body frames, kept in sync by forward/step (world frame).
    xpos: Any          # (nbody, 3)
    xquat: Any         # (nbody, 4)
    # Previous step's constraint-solve solution, carried as the Newton
    # initial point (MuJoCo's qacc_warmstart: mj_resetData zeroes it, every
    # mj_forward starts the solver from it).  Physics changes little in one
    # 2 ms step, so the warm Newton needs ~half the iterations for the same
    # accuracy.  Zeros at reset — for a robot at rest the converged qacc is
    # ~0, so the cold init is already close.
    qacc_warmstart: Any  # (nv,)


def make_state(model: Model, qpos=None, qvel=None) -> State:
    """Fresh state at qpos0 (or the given qpos/qvel), with FK applied."""
    from mujoco_playground_tpu.physics import kinematics

    qpos = model.qpos0 if qpos is None else jnp.asarray(qpos, model.dtype)
    qvel = (jnp.zeros(model.nv, model.dtype) if qvel is None
            else jnp.asarray(qvel, model.dtype))
    xpos, xquat = kinematics.fk(model, qpos)
    return State(qpos=qpos, qvel=qvel,
                 ctrl=jnp.zeros(model.nu, model.dtype),
                 time=jnp.zeros((), model.dtype), xpos=xpos, xquat=xquat,
                 qacc_warmstart=jnp.zeros(model.nv, model.dtype))
