"""Batched lidar raycast: N envs x 72 beams vs plane + AABB obstacles.

The reference reads 72 MuJoCo rangefinder sensors with a Python loop per step
(src/rl/envs/ackermann_env.py:234-237 — pure interpreter overhead); here the
whole scan is two fused vector ops: a ray-plane solve and a (beams x boxes)
ray-AABB slab test, vmapped over envs.  MuJoCo semantics preserved: distance
to nearest surface along the site's +Z, -1.0 when nothing is hit, positive
readings clamped to the sensor cutoff (12 m — ackermann_robot_v2.xml:103).

Self-hit semantics (reference ackermann_robot_v2.xml:21,30,42): MuJoCo's
rangefinder calls mj_ray with bodyexclude = the site's body (lidar_360,
which carries no geoms), so the oracle DOES test the chassis meshes and
wheels.  ``raycast_robot`` implements exactly that (OBB chassis proxies +
wheel cylinders, mj_ray cap/side semantics); ``lidar`` takes
``include_robot_geoms=True`` to fold it in.  The default skips it because
self-hit is geometrically impossible for this robot: every robot geom is
rigid to the chassis (wheel spin/steer axes never move them through the
beam plane), so the beam-vs-robot configuration is pose-invariant —
verified against MuJoCo 3.10 at steering lock, 45-degree tilt, and fully
flipped (tests/test_engine_parity.py::test_lidar_no_self_hit_any_pose).
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
    # --- plane z = plane_z.  MuJoCo rays treat planes with positive sizes
    # as FINITE rectangles (engine_ray.c ray_plane); ours is size 40x40 at
    # the origin, so reject hits landing outside the extents. -------------
    dz = dirs[:, 2]
    t_plane = (model.plane_z - origins[:, 2]) / jnp.where(
        jnp.abs(dz) > 1e-12, dz, 1e-12)
    hit_xy = origins[:, :2] + t_plane[:, None] * dirs[:, :2]
    on_plane = jnp.all(
        (model.plane_half_size <= 0)
        | (jnp.abs(hit_xy) <= model.plane_half_size), axis=-1)
    t_plane = jnp.where(
        (jnp.abs(dz) > 1e-12) & (t_plane > 0) & on_plane, t_plane, BIG)

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


def _ray_obb(origins, dirs, center, quat, half):
    """Ray vs one oriented box: (R,) distances, BIG on miss.

    Same slab test + tangential-rejection semantics as raycast_scene, run in
    the box frame.
    """
    from mujoco_playground_tpu.physics.mathutil import quat_rotate_inv

    o = quat_rotate_inv(quat, origins - center)            # (R, 3)
    d = quat_rotate_inv(quat, dirs)
    eps = 1e-9
    parallel = jnp.abs(d) <= eps
    inv = 1.0 / jnp.where(jnp.abs(d) > eps, d, eps)
    t1 = (-half - o) * inv
    t2 = (half - o) * inv
    tmin = jnp.max(jnp.where(parallel, -BIG, jnp.minimum(t1, t2)), axis=-1)
    tmax = jnp.min(jnp.where(parallel, BIG, jnp.maximum(t1, t2)), axis=-1)
    inside_par = jnp.all((~parallel) | ((o > -half) & (o < half)), axis=-1)
    hit = (tmax >= tmin) & (tmax > 0) & inside_par
    return jnp.where(hit, jnp.where(tmin > 0, tmin, tmax), BIG)


def _ray_cylinder(origins, dirs, center, axis, radius, half_h):
    """Ray vs one finite cylinder (round side + caps), mj_ray semantics:
    smallest t > 0 among valid side/cap intersections, BIG on miss."""
    rel = origins - center                                  # (R, 3)
    ad = dirs @ axis                                        # (R,)
    ao = rel @ axis
    # --- caps: planes axis-coord = ±half_h, radial check ----------------
    t_caps = jnp.full(ad.shape, BIG, origins.dtype)
    for s in (-1.0, 1.0):
        ok = jnp.abs(ad) > 1e-12
        t = (s * half_h - ao) / jnp.where(ok, ad, 1e-12)
        p = rel + t[:, None] * dirs
        rad2 = jnp.sum((p - (p @ axis)[:, None] * axis) ** 2, axis=-1)
        valid = ok & (t > 0) & (rad2 <= radius * radius)
        t_caps = jnp.minimum(t_caps, jnp.where(valid, t, BIG))
    # --- round side: quadratic in the plane perpendicular to axis ------
    d_perp = dirs - ad[:, None] * axis
    o_perp = rel - ao[:, None] * axis
    a = jnp.sum(d_perp * d_perp, axis=-1)
    b = 2.0 * jnp.sum(o_perp * d_perp, axis=-1)
    c = jnp.sum(o_perp * o_perp, axis=-1) - radius * radius
    disc = b * b - 4.0 * a * c
    ok = (disc >= 0) & (a > 1e-12)
    sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
    t_side = jnp.full(ad.shape, BIG, origins.dtype)
    for sgn in (-1.0, 1.0):
        t = (-b + sgn * sq) / jnp.where(ok, 2.0 * a, 1.0)
        h = ao + t * ad
        valid = ok & (t > 0) & (jnp.abs(h) <= half_h)
        t_side = jnp.minimum(t_side, jnp.where(valid, t, BIG))
    return jnp.minimum(t_caps, t_side)


def raycast_robot(model: Model, xpos, xquat, origins, dirs):
    """Nearest-hit distances for rays vs the robot's OWN geoms.

    MuJoCo rangefinder semantics: mj_ray excludes only the site's body
    (lidar_360 — no geoms), so chassis proxy OBBs and wheel cylinders are
    all tested.  Returns (R,) distances, BIG where no robot geom is hit.
    """
    from mujoco_playground_tpu.physics.mathutil import quat_mul, quat_rotate

    t_best = jnp.full(origins.shape[:1], BIG, origins.dtype)
    for i, b in enumerate(model.chassis_box_body):
        center = xpos[b] + quat_rotate(xquat[b], model.chassis_box_pos[i])
        quat = quat_mul(xquat[b], model.chassis_box_quat[i])
        t_best = jnp.minimum(t_best, _ray_obb(
            origins, dirs, center, quat, model.chassis_box_size[i]))
    for j, b in enumerate(model.wheel_body):
        center = xpos[b] + quat_rotate(xquat[b], model.wheel_pos[j])
        axis = quat_rotate(xquat[b], model.wheel_axis[j])
        t_best = jnp.minimum(t_best, _ray_cylinder(
            origins, dirs, center, axis,
            model.wheel_size[j, 0], model.wheel_size[j, 1]))
    return t_best


def lidar(model: Model, xpos, xquat, site_slice=None,
          include_robot_geoms: bool = False):
    """72-beam lidar scan from the robot's rangefinder sites.

    Returns (nsite,) distances with cutoff clamping and -1 no-hit.
    ``include_robot_geoms`` folds in ray-vs-own-geom hits (exact mj_ray
    semantics); the default skips them — equivalent for this robot in every
    pose (see module docstring), and cheaper.
    """
    from mujoco_playground_tpu.physics import kinematics

    pos, zaxis = kinematics.site_frames(model, xpos, xquat)
    dist = raycast_scene(model, pos, zaxis)
    if include_robot_geoms:
        t_robot = raycast_robot(model, xpos, xquat, pos, zaxis)
        t = jnp.where(dist >= 0, dist, BIG)
        t = jnp.minimum(t, t_robot)
        dist = jnp.where(t >= BIG, jnp.asarray(-1.0, t.dtype), t)
    cutoff = model.sensor_cutoff
    return jnp.where(dist >= 0, jnp.minimum(dist, cutoff), dist)
