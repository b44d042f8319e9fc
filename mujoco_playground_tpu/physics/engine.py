"""Physics step: forward dynamics + constraint solve + integration.

(Filled in incrementally; smooth dynamics first, constraints in solver.py.)
"""
from __future__ import annotations

import jax.numpy as jnp

from mujoco_playground_tpu.physics.model import Model
from mujoco_playground_tpu.physics.state import State


def forward(model: Model, state: State) -> State:
    raise NotImplementedError


def step(model: Model, state: State) -> State:
    raise NotImplementedError
