"""Functional odometry (twin of the reference's Odometry class).

The reference tracks chassis pose relative to a reference point captured at
reset (src/core/odometry.py:46-124).  Here the reference pose is explicit
state (:class:`OdometryRef`) and all readouts are pure functions of the
physics state — vmappable, no hidden initialization order (the reference's
``is_initialized`` attribute/method collision bug has no analog here).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

from mujoco_playground_tpu.physics.mathutil import quat_to_yaw


@struct.dataclass
class OdometryRef:
    position: Any  # (3,) world position of the chassis at reset
    quat: Any      # (4,) world orientation at reset


def odometry_reset(xpos_chassis, xquat_chassis) -> OdometryRef:
    return OdometryRef(position=xpos_chassis, quat=xquat_chassis)


def calculate_odom(ref: OdometryRef, xpos_chassis, xquat_chassis):
    """Returns dict with the reference's calculate_odom keys
    (odometry.py:93-101): position diff, orientation, heading, distance."""
    diff = xpos_chassis - ref.position
    return dict(
        position=diff,
        orientation=xquat_chassis,
        heading=quat_to_yaw(xquat_chassis),
        distance=jnp.linalg.norm(diff),
        reference_position=ref.position,
        current_position=xpos_chassis,
    )


def get_distance_to_point(xpos_chassis, target_point):
    return jnp.linalg.norm(xpos_chassis - jnp.asarray(target_point))


def get_bearing_to_point(xpos_chassis, target_point):
    to_target = jnp.asarray(target_point) - xpos_chassis
    return jnp.arctan2(to_target[1], to_target[0])
