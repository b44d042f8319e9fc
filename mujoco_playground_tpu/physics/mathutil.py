"""Quaternion / rotation / spatial-algebra primitives.

Pure ``jnp`` functions, shape-polymorphic over leading batch dims where noted.
Conventions match MuJoCo: quaternions are ``[w, x, y, z]``; spatial motion
vectors are ``[angular(3); linear(3)]`` anchored at an explicit world point.
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_mul(a, b):
    """Hamilton product a*b for [w,x,y,z] quaternions (batched on leading dims)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q, v):
    qc = q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)
    return quat_rotate(qc, v)


def quat_to_mat(q):
    """Quaternion -> 3x3 rotation matrix (batched)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return r.reshape(q.shape[:-1] + (3, 3))


def quat_from_axis_angle(axis, angle):
    """Unit axis + angle -> quaternion. ``angle`` broadcasts against axis[...,:3]."""
    angle = jnp.asarray(angle)
    s = jnp.sin(angle / 2.0)[..., None]
    w = jnp.cos(angle / 2.0)[..., None]
    return jnp.concatenate([w, axis * s], axis=-1)


def quat_integrate(q, omega, dt):
    """Integrate quaternion by body-frame angular velocity over dt.

    Matches MuJoCo ``mju_quatIntegrate``: rotate by angle |w|*dt about axis w
    (expressed in the local frame), i.e. q' = q * exp(dt*w/2), then normalize.
    """
    angle = jnp.linalg.norm(omega, axis=-1, keepdims=True)
    safe = jnp.where(angle > 1e-14, angle, 1.0)
    axis = omega / safe
    dq = quat_from_axis_angle(axis, (angle * dt)[..., 0])
    dq = jnp.where(angle > 1e-14, dq, jnp.asarray([1.0, 0, 0, 0], dtype=q.dtype))
    out = quat_mul(q, dq)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def quat_to_yaw(q):
    """Yaw (rotation about world Z) of quaternion — same formula as the
    reference Odometry._quat_to_yaw (src/core/odometry.py:154-170)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))


def skew(v):
    """3-vector -> skew-symmetric cross-product matrix (batched)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


# --- spatial algebra (motion = [ang; lin], force = [torque; force]) ---------

def motion_cross(v, s):
    """Spatial motion cross product v x s (both motion vectors)."""
    vang, vlin = v[..., :3], v[..., 3:]
    sang, slin = s[..., :3], s[..., 3:]
    return jnp.concatenate([
        jnp.cross(vang, sang),
        jnp.cross(vlin, sang) + jnp.cross(vang, slin),
    ], axis=-1)


def force_cross(v, f):
    """Spatial force cross product v x* f (motion v, force f)."""
    vang, vlin = v[..., :3], v[..., 3:]
    ftrq, ffrc = f[..., :3], f[..., 3:]
    return jnp.concatenate([
        jnp.cross(vang, ftrq) + jnp.cross(vlin, ffrc),
        jnp.cross(vang, ffrc),
    ], axis=-1)


def spatial_inertia(mass, inertia_world, com_rel):
    """6x6 spatial inertia about an anchor point.

    Args:
      mass: scalar (batched ok).
      inertia_world: (..., 3, 3) rotational inertia about the CoM, world axes.
      com_rel: (..., 3) CoM position relative to the anchor.

    Returns: (..., 6, 6) matrix mapping motion [ang; lin] -> force [trq; frc].
    """
    c = skew(com_rel)
    m = mass[..., None, None]
    top_left = inertia_world + m * (c @ c.swapaxes(-1, -2))
    top_right = m * c
    bot_left = m * c.swapaxes(-1, -2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=c.dtype), c.shape)
    bot_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, bot_right], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
