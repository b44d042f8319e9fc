"""Batched lidar raycast: N envs x 72 beams vs plane + AABB obstacles.

The reference reads 72 MuJoCo rangefinder sensors with a Python loop per step
(src/rl/envs/ackermann_env.py:234-237 — pure interpreter overhead); here the
whole scan is two fused vector ops: a ray-plane solve and a (beams x boxes)
ray-AABB slab test, vmapped over envs.  MuJoCo semantics preserved: distance
to nearest surface along the site's +Z, -1.0 when nothing is hit, positive
readings clamped to the sensor cutoff (12 m — ackermann_robot_v2.xml:103).

Rays do not test the robot's own geoms: empirically (MuJoCo 3.10 on the
reference XML) all 72 beams read -1 on the open floor — the horizontal beam
plane at z~0.095 clears the chassis plates and wheels; self-hit would require
extreme tilt, at which point the episode has already ended in a collision.
"""
from __future__ import annotations

import jax.numpy as jnp

from mujoco_playground_tpu.physics.model import Model

BIG = 1e10


def raycast_scene(model: Model, origins, dirs):
    """Nearest-hit distances for rays vs floor plane + scene boxes.

    Args:
      origins: (R, 3) ray origins (world).
      dirs: (R, 3) unit ray directions (world).
    Returns: (R,) distances; -1.0 where no hit.
    """
    dtype = origins.dtype
    # --- plane z = plane_z (infinite for rays, like MuJoCo planes) ---------
    dz = dirs[:, 2]
    t_plane = (model.plane_z - origins[:, 2]) / jnp.where(
        jnp.abs(dz) > 1e-12, dz, 1e-12)
    t_plane = jnp.where((jnp.abs(dz) > 1e-12) & (t_plane > 0), t_plane, BIG)

    # --- AABB slab tests: (R, K) -------------------------------------------
    if model.num_scene_boxes > 0:
        lo = model.scene_box_pos - model.scene_box_size    # (K, 3)
        hi = model.scene_box_pos + model.scene_box_size
        o = origins[:, None, :]                            # (R, 1, 3)
        eps = 1e-9
        parallel = jnp.abs(dirs)[:, None, :] <= eps        # (R, 1, 3)
        inv = 1.0 / jnp.where(jnp.abs(dirs) > eps, dirs, eps)[:, None, :]
        t1 = (lo[None] - o) * inv
        t2 = (hi[None] - o) * inv
        tmin = jnp.max(jnp.where(parallel, -BIG, jnp.minimum(t1, t2)),
                       axis=-1)                            # (R, K)
        tmax = jnp.min(jnp.where(parallel, BIG, jnp.maximum(t1, t2)),
                       axis=-1)
        # For axes the ray is parallel to, the origin must be strictly inside
        # the slab (MuJoCo semantics: a ray sliding tangentially along a box
        # face does not hit it).
        inside_par = jnp.all((~parallel) | ((o > lo[None]) & (o < hi[None])),
                             axis=-1)                      # (R, K)
        hit = (tmax >= tmin) & (tmax > 0) & inside_par
        t_box = jnp.where(hit, jnp.where(tmin > 0, tmin, tmax), BIG)
        t_boxes = jnp.min(t_box, axis=-1)
    else:
        t_boxes = jnp.full(origins.shape[:1], BIG, dtype)

    t = jnp.minimum(t_plane, t_boxes)
    return jnp.where(t >= BIG, jnp.asarray(-1.0, dtype), t)


def lidar(model: Model, xpos, xquat, site_slice=None):
    """72-beam lidar scan from the robot's rangefinder sites.

    Returns (nsite,) distances with cutoff clamping and -1 no-hit.
    """
    from mujoco_playground_tpu.physics import kinematics

    pos, zaxis = kinematics.site_frames(model, xpos, xquat)
    dist = raycast_scene(model, pos, zaxis)
    cutoff = model.sensor_cutoff
    return jnp.where(dist >= 0, jnp.minimum(dist, cutoff), dist)
