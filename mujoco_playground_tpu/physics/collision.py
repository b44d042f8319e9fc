"""Narrowphase collision against the static scene (plane + AABB obstacles).

Fixed-size contact slots (static shapes for XLA): every candidate contact
always exists; inactive ones are gated by ``dist >= 0`` downstream.  The
robot's colliders are its 4 wheel cylinders and 2 chassis plate proxies; the
world's are the floor plane and the scene's axis-aligned boxes — exactly the
pairs MuJoCo's broadphase admits under the reference's contype/conaffinity
masking (ackermann_robot_v2.xml:21,30,42: floor<->{chassis,wheels} and
scene-box<->{chassis,wheels} only; no self-collision).

Slot layout (C = total contact slots):
  [4 wheels x 4 cylinder-plane candidates]           -> 16
  [4 wheels x TOPK_W boxes x 2 rim-ring candidates]  -> 8*TOPK_W  (if boxes)
  [2 chassis hulls x TOPK_H deepest verts vs plane]  -> 8
  [2 chassis hulls x TOPK_H deepest verts vs box]    -> 8         (if boxes)

Wheel-vs-plane reproduces MuJoCo's full mjc_PlaneCylinder manifold
(empirically characterized against MuJoCo 3.10, tests/test_wheel_cylinder.py):
the deepest rim point, the opposite-end rim partner (dist1 + 2h cos(tilt) —
active when rolling), and the +-120-degree disc pair on the deep face
(dist1 + 1.5 r sin(tilt) — active when face-down/flipped).  All four
candidates always occupy slots; separation gates them exactly like MuJoCo's
margin test.  Wheel-vs-box is an exact cylinder narrowphase: per disc end,
the rim-ring point closest to the box (two fixed-point iterations of the
ring-direction projection) collides as a point — covering tread-segment
endpoints against wall faces (MuJoCo's multiCCD manifold endpoints), tilted
rim contact, and face-on approach.  The chassis collides through the
convex-hull vertices of its reference meshes (spec/robot.py) — against the
plane this is MuJoCo's own plane-convex candidate set.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mujoco_playground_tpu.physics import mathutil as mu
from mujoco_playground_tpu.physics.model import Model

TOPK_W = 2  # boxes tested per wheel
TOPK_H = 4  # hull-vertex contacts per chassis-geom pair: the deepest vertex
            # in each body-frame-xy quadrant (MuJoCo's plane-convex and
            # box-convex manifolds are <=4 spread points)


@struct.dataclass
class Contacts:
    pos: Any          # (C, 3) contact position (world)
    frame: Any        # (C, 3, 3) rows [n, t1, t2]; n points world->robot
    dist: Any         # (C,) signed distance (negative = penetrating)
    friction: Any     # (C,) isotropic tangential mu
    solref: Any       # (C, 2)
    solimp: Any       # (C, 5)
    diag_approx: Any  # (C,) trn invweight sum of the two bodies
    # static (numpy) slot -> robot body index of the moving geom
    body: Any = struct.field(pytree_node=False)


def _make_frame(n):
    """Tangent frame matching mju_makeFrame: t1 = normalize(n x a), t2 = n x t1,
    with helper axis a = x-hat unless n is near x-hat."""
    dtype = n.dtype
    a_x = jnp.asarray([1.0, 0.0, 0.0], dtype)
    a_y = jnp.asarray([0.0, 1.0, 0.0], dtype)
    a = jnp.where(jnp.abs(n[..., :1]) < 0.5, a_x, a_y)
    t1 = jnp.cross(n, a)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2], axis=-2)


def _combine(model: Model, robot_friction, robot_solref, robot_solimp):
    """MuJoCo default mixing: friction = elementwise max; solref/solimp mean."""
    fric = jnp.maximum(robot_friction, model.plane_friction[0])
    solref = 0.5 * (robot_solref + model.plane_solref)
    solimp = 0.5 * (robot_solimp + model.plane_solimp)
    return fric, solref, solimp


def collide(model: Model, xpos, xquat) -> Contacts:
    """All contact slots for one env. Shapes are static given the model."""
    dtype = xpos.dtype
    nw = len(model.wheel_body)
    zhat = jnp.asarray([0.0, 0.0, 1.0], dtype)

    pos_l, frame_l, dist_l, fric_l, solref_l, solimp_l, diag_l, body_l = (
        [], [], [], [], [], [], [], [])

    # tracer-safe: body lists are static tuples; invweight may be traced
    # (e.g. under vmap over domain-randomized model leaves)
    iw = jnp.asarray(model.body_invweight0, dtype)
    wheel_iw = iw[list(model.wheel_body), 0]
    chassis_iw = (iw[list(model.chassis_box_body), 0]
                  if len(model.chassis_box_body)
                  else jnp.zeros(0, dtype))

    # --- wheels vs plane: MuJoCo's full cylinder-plane manifold -------------
    # Four candidates per wheel (separation-gated, like mjc_PlaneCylinder's
    # margin test — characterized against MuJoCo 3.10 contact dumps):
    #   two rim points (both ends along the steepest-descent radial) cover
    #   rolling; the +-120-degree disc pair on the DEEP face covers the
    #   face-down/flipped regime (a flipped robot rests flat, no rocking).
    for w in range(nw):
        b = model.wheel_body[w]
        c = xpos[b] + mu.quat_rotate(xquat[b], model.wheel_pos[w])
        a = mu.quat_rotate(xquat[b], model.wheel_axis[w])
        r, h = model.wheel_size[w, 0], model.wheel_size[w, 1]
        # radial direction toward the plane; the exact-degenerate (axis
        # vertical) fallback is -x so the deepest candidate lands at +x —
        # matching MuJoCo's arbitrary pick for a flat disc (probed 3.10)
        proj = zhat - jnp.dot(zhat, a) * a
        pn = jnp.linalg.norm(proj)
        raddir = jnp.where(pn > 1e-9, proj / jnp.maximum(pn, 1e-9),
                           jnp.asarray([-1.0, 0, 0], dtype))
        fric, solref, solimp = _combine(
            model, model.wheel_friction[w, 0], model.wheel_solref[w],
            model.wheel_solimp[w])

        def emit_plane(p):
            dist = p[2] - model.plane_z
            pos_l.append(p - 0.5 * dist * zhat)
            frame_l.append(_make_frame(zhat))
            dist_l.append(dist)
            fric_l.append(fric)
            solref_l.append(solref)
            solimp_l.append(solimp)
            diag_l.append(wheel_iw[w])
            body_l.append(b)

        for sgn in (-1.0, 1.0):
            emit_plane(c + sgn * h * a - r * raddir)
        # disc pair on the deep end (rim points at +-120 degrees from the
        # deepest radial): dist = dist1 + 1.5 r sin(tilt) — penetrating
        # only near face-down, exactly MuJoCo's 3-point disc manifold
        deep_sgn = jnp.where(a[2] > 0, -1.0, 1.0).astype(dtype)
        deep_center = c + deep_sgn * h * a
        t = jnp.cross(a, raddir)
        for s in (-1.0, 1.0):
            # math.sqrt (weak-typed Python float), NOT np.sqrt: a np.float64
            # scalar would promote the f32 hot path to f64 under x64 tests
            emit_plane(deep_center
                       + r * (0.5 * raddir + s * (math.sqrt(3) / 2) * t))

    # --- wheels vs boxes (exact cylinder narrowphase) ------------------------
    # candidate selection by squared SURFACE distance (clamp), not center
    # distance: merged maze walls are long slabs whose centers sit far from
    # a nearby face, so center ranking would miss the true closest box.
    # Per box, TWO contacts: the rim-ring point of each disc end closest to
    # the box (point-vs-box) — tread-segment endpoints against a wall face
    # (MuJoCo's multiCCD manifold endpoints), the true rim point when
    # tilted, the disc edge when face-on.
    if model.num_scene_boxes > 0:
        box_pos = model.scene_box_pos
        box_size = model.scene_box_size
        for w in range(nw):
            b = model.wheel_body[w]
            c = xpos[b] + mu.quat_rotate(xquat[b], model.wheel_pos[w])
            a = mu.quat_rotate(xquat[b], model.wheel_axis[w])
            r, h = model.wheel_size[w, 0], model.wheel_size[w, 1]
            d2 = jnp.sum(jnp.maximum(jnp.abs(box_pos - c) - box_size,
                                     0.0) ** 2, axis=-1)
            _, idx = jax.lax.top_k(-d2, min(TOPK_W, model.num_scene_boxes))
            fric, solref, solimp = _combine(
                model, model.wheel_friction[w, 0], model.wheel_solref[w],
                model.wheel_solimp[w])
            for k in range(min(TOPK_W, model.num_scene_boxes)):
                bp = box_pos[idx[k]]
                bs = box_size[idx[k]]
                for dist, n, p in _cylinder_box(
                        c, a, r, h, bp, bs, dtype,
                        patch=model.compat_wheel_patch):
                    pos_l.append(p)
                    frame_l.append(_make_frame(n))
                    dist_l.append(dist)
                    fric_l.append(fric)
                    solref_l.append(solref)
                    solimp_l.append(solimp)
                    diag_l.append(wheel_iw[w])
                    body_l.append(b)

    # --- chassis convex hulls vs plane (and top-1 box) -----------------------
    # Each chassis geom carries the convex-hull vertex cloud of its reference
    # mesh (spec/robot.py _BASE_HULL/_CEILING_HULL, body frame).  Against the
    # plane, deep hull vertices ARE MuJoCo's plane-convex contact candidates
    # (engine_collision_convex.c); against the nearest box they approximate
    # the CCD manifold.  One deepest vertex PER static body-frame-xy
    # quadrant (model.chassis_hull_quadrants) — rather than a global top-k —
    # so flat/edge contact patches get a SPANNING 4-point manifold like
    # MuJoCo's (global top-k picks adjacent tied vertices along one edge,
    # which cannot balance the support polygon).  Slot count per pair stays
    # TOPK_H = 4, matching the old 4-corner plates.
    for i in range(len(model.chassis_box_body)):
        b = model.chassis_box_body[i]
        Rb = mu.quat_to_mat(xquat[b])
        verts = (xpos[b]
                 + jnp.asarray(model.chassis_hull_verts[i], dtype) @ Rb.T)
        quads = [np.asarray(q, np.int32)
                 for q in model.chassis_hull_quadrants[i]]
        bias = jnp.asarray(model.chassis_hull_bias[i], dtype)
        fric = jnp.maximum(model.plane_friction[0],
                           jnp.asarray(1.0, dtype))
        solref, solimp = model.plane_solref, model.plane_solimp
        dists = verts[:, 2] - model.plane_z
        score = dists - bias

        def emit_chassis_plane(p, dist):
            pos_l.append(p - 0.5 * dist * zhat)
            frame_l.append(_make_frame(zhat))
            dist_l.append(dist)
            fric_l.append(fric)
            solref_l.append(solref)
            solimp_l.append(solimp)
            diag_l.append(chassis_iw[i])
            body_l.append(b)

        if model.compat_flat_manifold:
            # MuJoCo-compat manifold (PARITY.md approx 1): the native convex
            # collider's plane contacts are the verts of the penetration
            # face its EPA terminates on — the deepest hull face incident
            # to the support vertex (verified against MuJoCo 3.10: the
            # flipped flat plate's 3 contacts are exactly one hull
            # triangle).  3 clustered points cannot span the support
            # polygon, so a flat plate rocks — reference-exact regime.
            faces = np.asarray(model.chassis_hull_faces[i], np.int32)
            if faces.size == 0:
                raise ValueError(
                    "compat_flat_manifold needs hull_faces for every "
                    f"chassis geom (geom {i} has none)")
            fj = jnp.asarray(faces)                          # (F, 3)
            # Restrict the support pick to face-covered vertices: a few
            # baked hull verts appear in no triangle of MuJoCo's hull graph
            # (they are vertices MuJoCo's own qhull pass dropped, sitting
            # ~1e-8 inside/outside the face-verts' hull).  If such a vert
            # won the depth argmin, `contains` would be all-False and the
            # masked argmin below would silently emit face 0 — an arbitrary,
            # possibly non-touching manifold (ADVICE r4).  MuJoCo's EPA only
            # ever terminates on graph vertices, so masking is also the
            # faithful semantics.
            covered_np = np.zeros(int(dists.shape[0]), bool)
            covered_np[np.unique(faces)] = True
            covered = jnp.asarray(covered_np)
            support = jnp.argmin(jnp.where(covered, dists,
                                           jnp.asarray(jnp.inf, dtype)))
            contains = jnp.any(fj == support, axis=1)
            fsum = jnp.sum(dists[fj], axis=1)
            fsel = jnp.argmin(jnp.where(contains, fsum,
                                        jnp.asarray(jnp.inf, dtype)))
            tri = fj[fsel]                                   # (3,)
            for k in range(3):
                emit_chassis_plane(verts[tri[k]], dists[tri[k]])
            # 4th slot (static TOPK_H=4 layout) parked inactive
            emit_chassis_plane(verts[support], jnp.asarray(1.0, dtype))
        else:
            for q in quads:
                sub = dists[q]
                k = jnp.argmin(score[q])
                emit_chassis_plane(verts[q][k], sub[k])
        if model.num_scene_boxes > 0:
            center = xpos[b] + mu.quat_rotate(xquat[b],
                                              model.chassis_box_pos[i])
            d2 = jnp.sum(jnp.maximum(jnp.abs(model.scene_box_pos - center)
                                     - model.scene_box_size, 0.0) ** 2,
                         axis=-1)
            j = jnp.argmin(d2)
            bp = model.scene_box_pos[j]
            bs = model.scene_box_size[j]
            bdist, bn, bpos = jax.vmap(
                lambda v: _point_box(v, bp, bs, dtype))(verts)
            bscore = bdist - bias
            for q in quads:
                k = jnp.argmin(bscore[q])
                pos_l.append(bpos[q][k])
                frame_l.append(_make_frame(bn[q][k]))
                dist_l.append(bdist[q][k])
                fric_l.append(fric)
                solref_l.append(solref)
                solimp_l.append(solimp)
                diag_l.append(chassis_iw[i])
                body_l.append(b)

    return Contacts(
        pos=jnp.stack(pos_l), frame=jnp.stack(frame_l),
        dist=jnp.stack(dist_l), friction=jnp.stack(fric_l),
        solref=jnp.stack(solref_l), solimp=jnp.stack(solimp_l),
        diag_approx=jnp.stack(diag_l),
        body=np.asarray(body_l, np.int32))


def _cylinder_box(c, a, r, h, bp, bs, dtype, patch=False):
    """Cylinder (center c, unit axis a, radius r, half-height h) vs AABB.

    Returns two candidate contacts [(dist, normal box->wheel, midpoint)] —
    one per disc end: the rim-ring point closest to the box, collided as a
    point.  The ring direction is found by two fixed-point iterations of
    u <- normalize(perp_a(closest_box_point(q) - ce)); exact for face
    contacts (the clamp face is direction-invariant), sub-millimeter for
    edge/corner regions at wheel scale.  Degenerate face-on approach
    (closest direction parallel to the axis) falls back to a fixed radial
    so the contact depth is still exact (any ring point is equidistant).

    ``patch=True`` (compat_wheel_patch, PARITY.md approx 2) appends the 3
    mid-tread points MuJoCo 3.10's clipped-polygon manifold adds for a
    tread segment resting on a face — one at the axis midpoint's closest
    ring point plus the measured +-2e-3 rad clip pair around it — giving
    MuJoCo's 5 equal-depth contacts instead of the 2 segment endpoints.
    """
    out = []
    # a stable fallback radial (perpendicular to a): prefer x-hat, else y-hat
    xh = jnp.asarray([1.0, 0.0, 0.0], dtype)
    yh = jnp.asarray([0.0, 1.0, 0.0], dtype)
    fx = xh - jnp.dot(xh, a) * a
    fy = yh - jnp.dot(yh, a) * a
    use_x = jnp.linalg.norm(fx) > 0.1
    fall = jnp.where(use_x, fx, fy)
    fall = fall / jnp.maximum(jnp.linalg.norm(fall), 1e-12)
    def ring_point(ce):
        q = ce
        u = fall
        for _ in range(2):
            cp = bp + jnp.clip(q - bp, -bs, bs)
            d = cp - ce
            dperp = d - jnp.dot(d, a) * a
            dn = jnp.linalg.norm(dperp)
            u = jnp.where(dn > 1e-9, dperp / jnp.maximum(dn, 1e-9), fall)
            q = ce + r * u
        return q, u

    for e in (-1.0, 1.0):
        q, _ = ring_point(c + e * h * a)
        out.append(_point_box(q, bp, bs, dtype))
    if patch:
        _, u = ring_point(c)
        w = jnp.cross(a, u)
        for phi in (0.0, 2e-3, -2e-3):
            qm = c + r * (math.cos(phi) * u + math.sin(phi) * w)
            out.append(_point_box(qm, bp, bs, dtype))
    return out


def _point_box(p, bp, bs, dtype):
    """Point vs AABB. Returns (dist, normal box->point, contact midpoint)."""
    rel = p - bp
    q = jnp.abs(rel) - bs
    inside = jnp.all(q < 0)
    qpos_part = jnp.maximum(q, 0.0)
    dist_out = jnp.linalg.norm(qpos_part)
    ax = jnp.argmax(q)
    n_in = jnp.zeros(3, dtype).at[ax].set(jnp.sign(rel[ax]))
    delta = rel - jnp.clip(rel, -bs, bs)
    dn = jnp.linalg.norm(delta)
    n_out = delta / jnp.maximum(dn, 1e-9)
    n = jnp.where(inside, n_in, n_out)
    dist = jnp.where(inside, q[ax], dist_out)
    pos = p - 0.5 * dist * n
    return dist, n, pos
