"""cmd_vel -> actuator controls: bicycle + Ackermann steering geometry.

Pure ``jnp`` twins of the reference's controllers (src/core/controller.py):
:func:`bicycle_cmd_vel_to_controls` is the one used everywhere (single
steering servo + two rear velocity actuators — controller.py:84-140);
:func:`ackermann_cmd_vel_to_controls` is the per-wheel variant for the
maze_flat scene's independent steering actuators (controller.py:27-78).

The math (branch thresholds, epsilon guards, clip bounds) matches the
reference exactly so that fixed-seed trajectories agree; branches become
``jnp.where`` so everything vmaps.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp

WHEEL_RADIUS = 0.0325
WHEELBASE = 0.20
TRACK_WIDTH = 0.174
import math

STEER_CLIP = 0.61          # actuator ctrlrange (ackermann_robot_v2.xml:116)
STEER_ANGLE_LIMIT = math.radians(35.0)  # plain float: no backend init at import
WHEEL_SPEED_CLIP = 50.0


def bicycle_cmd_vel_to_controls(linear_x, angular_z,
                                wheel_radius=WHEEL_RADIUS,
                                wheelbase=WHEELBASE,
                                track_width=TRACK_WIDTH):
    """(linear_x, angular_z) -> ctrl [steering_servo, w_left, w_right].

    Matches BicycleController.cmd_vel_to_controls + apply_cmd_vel
    (controller.py:98-140): delta = arctan(wb*omega/v) with sign-safe eps
    guard, clipped to +-35 deg; differential rear speeds from the turn radius.
    """
    v = jnp.asarray(linear_x)
    omega = jnp.asarray(angular_z)
    eps = 1e-5

    v_safe = jnp.where(jnp.abs(v) > eps, v, jnp.sign(omega) * eps)
    v_safe = jnp.where(v_safe == 0, eps, v_safe)  # omega==0 guard
    ratio = wheelbase * omega / v_safe
    delta = jnp.where(jnp.abs(omega) < 1e-6, 0.0, jnp.arctan(ratio))
    delta = jnp.clip(delta, -STEER_ANGLE_LIMIT, STEER_ANGLE_LIMIT)

    tan_d = jnp.tan(delta)
    tan_safe = jnp.where(jnp.abs(tan_d) > eps, tan_d, eps)
    R = wheelbase / tan_safe
    omega_turn = jnp.where(jnp.abs(R) > eps, v / R, 0.0)
    v_left_turn = omega_turn * (R - track_width / 2.0)
    v_right_turn = omega_turn * (R + track_width / 2.0)
    straight = jnp.abs(delta) < 1e-6
    v_left = jnp.where(straight, v, v_left_turn)
    v_right = jnp.where(straight, v, v_right_turn)

    w_left = v_left / wheel_radius
    w_right = v_right / wheel_radius
    return jnp.stack([
        jnp.clip(delta, -STEER_CLIP, STEER_CLIP),
        jnp.clip(w_left, -WHEEL_SPEED_CLIP, WHEEL_SPEED_CLIP),
        jnp.clip(w_right, -WHEEL_SPEED_CLIP, WHEEL_SPEED_CLIP),
    ], axis=-1)


def ackermann_cmd_vel_to_controls(linear_x, angular_z,
                                  wheel_radius=WHEEL_RADIUS,
                                  wheelbase=WHEELBASE,
                                  track_width=TRACK_WIDTH):
    """Per-wheel Ackermann geometry (controller.py:42-78).

    Returns [delta_left, delta_right, w_left, w_right] for scenes with
    independent steering actuators (ackermann_maze_flat.xml:296-304).
    """
    v = jnp.asarray(linear_x)
    omega = jnp.asarray(angular_z)
    straight = jnp.abs(omega) < 1e-4
    omega_safe = jnp.where(straight, 1.0, omega)
    R = v / omega_safe
    R_inner = R - track_width / 2.0
    R_outer = R + track_width / 2.0
    inner = jnp.arctan(wheelbase / R_inner)
    outer = jnp.arctan(wheelbase / R_outer)
    left_turn = omega > 0
    delta_left = jnp.where(straight, 0.0, jnp.where(left_turn, inner, outer))
    delta_right = jnp.where(straight, 0.0, jnp.where(left_turn, outer, inner))
    v_left = jnp.where(straight, v, omega * R_inner)
    v_right = jnp.where(straight, v, omega * R_outer)
    return jnp.stack([
        jnp.clip(delta_left, -STEER_CLIP, STEER_CLIP),
        jnp.clip(delta_right, -STEER_CLIP, STEER_CLIP),
        jnp.clip(v_left / wheel_radius, -WHEEL_SPEED_CLIP, WHEEL_SPEED_CLIP),
        jnp.clip(v_right / wheel_radius, -WHEEL_SPEED_CLIP, WHEEL_SPEED_CLIP),
    ], axis=-1)


class PIDState(NamedTuple):
    """Functional PID (reference src/core/controller.py:7-21)."""
    integral: Any
    prev_error: Any


def pid_init(dtype=jnp.float32) -> PIDState:
    return PIDState(jnp.zeros((), dtype), jnp.zeros((), dtype))


def pid_compute(state: PIDState, kp, ki, kd, target, current, dt=0.002):
    error = target - current
    integral = state.integral + error * dt
    derivative = (error - state.prev_error) / dt
    out = kp * error + ki * integral + kd * derivative
    return out, PIDState(integral, error)
