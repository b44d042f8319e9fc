"""Sensor readout: assemble the sensordata vector (MuJoCo layout).

For the Ackermann robot this is 77 slots: 4 wheel encoders + steering angle
(reference ackermann_robot_v2.xml:92-104) followed by 72 rangefinder beams.
Scalar sensors are pure gathers; rangefinders go through the batched raycast.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mujoco_playground_tpu.physics import raycast
from mujoco_playground_tpu.physics.model import Model
from mujoco_playground_tpu.physics.state import State


def sensordata(model: Model, state: State):
    """(nsensordata,) sensor vector for one env."""
    lidar_vals = None
    out = []
    rf_i = 0
    for kind, obj in zip(model.sensor_kinds, model.sensor_obj):
        if kind == "jointpos":
            out.append(state.qpos[obj])
        elif kind == "jointvel":
            out.append(state.qvel[obj])
        elif kind == "rangefinder":
            if lidar_vals is None:
                lidar_vals = raycast.lidar(model, state.xpos, state.xquat)
            out.append(lidar_vals[obj])
            rf_i += 1
    return jnp.stack(out)


def lidar_scan(model: Model, state: State):
    """(n_beams,) rangefinder distances only (the env's hot path)."""
    return raycast.lidar(model, state.xpos, state.xquat)
