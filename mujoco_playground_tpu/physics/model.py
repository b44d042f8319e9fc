"""Spec -> static model pytree compiler (replaces ``MjModel.from_xml_path``).

The reference recompiles its MJCF model inside the training loop (every maze
reset re-merges XML and rebuilds ``MjModel`` — reference
ackermann_gymnasium_maze_env.py:447->179).  Here compilation happens exactly
once, on the host, producing a :class:`Model`: a pytree of static arrays that
is closed over by the jitted step function.  Start/goal/scene variation is
*state*, never *model*.

Welded (jointless) bodies are fused into their parent at compile time (the
reference robot's ``base``/``ceiling``/``lidar_360`` bodies fold into
``chassis``), shrinking the kinematic tree the TPU loops over.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mujoco_playground_tpu.spec import types as st
from mujoco_playground_tpu.spec.scene import SceneSpec, open_floor_scene

# Joint type codes (static).
JNT_FREE = 0
JNT_HINGE = 1
JNT_SLIDE = 2

_JNT_CODE = {st.FREE: JNT_FREE, st.HINGE: JNT_HINGE, st.SLIDE: JNT_SLIDE}
_JNT_NQ = {JNT_FREE: 7, JNT_HINGE: 1, JNT_SLIDE: 1}
_JNT_NV = {JNT_FREE: 6, JNT_HINGE: 1, JNT_SLIDE: 1}


@struct.dataclass
class Model:
    """Static physics model. All sizes are Python ints; arrays are leaves."""

    # --- static sizes / topology (not traced) ---
    nq: int = struct.field(pytree_node=False)
    nv: int = struct.field(pytree_node=False)
    nu: int = struct.field(pytree_node=False)
    nbody: int = struct.field(pytree_node=False)
    njnt: int = struct.field(pytree_node=False)
    nsite: int = struct.field(pytree_node=False)
    body_parent: Tuple[int, ...] = struct.field(pytree_node=False)
    body_names: Tuple[str, ...] = struct.field(pytree_node=False)
    jnt_type: Tuple[int, ...] = struct.field(pytree_node=False)
    jnt_body: Tuple[int, ...] = struct.field(pytree_node=False)
    jnt_qposadr: Tuple[int, ...] = struct.field(pytree_node=False)
    jnt_dofadr: Tuple[int, ...] = struct.field(pytree_node=False)
    jnt_names: Tuple[str, ...] = struct.field(pytree_node=False)
    dof_body: Tuple[int, ...] = struct.field(pytree_node=False)
    dof_jnt: Tuple[int, ...] = struct.field(pytree_node=False)
    # per-dof ancestor chain as body index list is implicit via dof_body+parents
    site_body: Tuple[int, ...] = struct.field(pytree_node=False)
    site_names: Tuple[str, ...] = struct.field(pytree_node=False)
    actuator_dof: Tuple[int, ...] = struct.field(pytree_node=False)
    actuator_names: Tuple[str, ...] = struct.field(pytree_node=False)
    # constraint topology
    eq_dof_pairs: Tuple[Tuple[int, int], ...] = struct.field(pytree_node=False)
    limited_dofs: Tuple[int, ...] = struct.field(pytree_node=False)
    friction_dofs: Tuple[int, ...] = struct.field(pytree_node=False)
    # sensors: kinds "jointpos"|"jointvel"|"rangefinder"; obj = qposadr /
    # dofadr / site index respectively; one sensordata slot each
    sensor_kinds: Tuple[str, ...] = struct.field(pytree_node=False)
    sensor_obj: Tuple[int, ...] = struct.field(pytree_node=False)
    sensor_names: Tuple[str, ...] = struct.field(pytree_node=False)
    # collision topology: wheel cylinders + chassis proxy boxes
    wheel_body: Tuple[int, ...] = struct.field(pytree_node=False)
    chassis_box_body: Tuple[int, ...] = struct.field(pytree_node=False)
    # static body-frame-xy quadrant partition of each chassis hull's
    # vertices (4 index tuples per geom); the narrowphase keeps the deepest
    # vertex PER QUADRANT so flat/edge contact manifolds span the patch
    # (a plain global top-k picks adjacent tied vertices along one edge)
    chassis_hull_quadrants: Tuple[Tuple[Tuple[int, ...], ...], ...] = \
        struct.field(pytree_node=False)
    # per-vertex selection bias toward xy-extreme vertices (breaks flat-
    # contact depth ties so the kept manifold spans the support polygon)
    chassis_hull_bias: Tuple[Tuple[float, ...], ...] = \
        struct.field(pytree_node=False)
    # hull triangles (index triples into chassis_hull_verts' leading,
    # unpadded region) in MuJoCo's mesh-graph face order; consumed by the
    # compat_flat_manifold support-face manifold
    chassis_hull_faces: Tuple[Tuple[Tuple[int, int, int], ...], ...] = \
        struct.field(pytree_node=False)
    num_scene_boxes: int = struct.field(pytree_node=False)
    # Parity-compat manifolds (PARITY.md approximations 1-2), both off by
    # default.  compat_flat_manifold: chassis-vs-plane contacts are the
    # support vertex's deepest incident hull FACE (MuJoCo's native convex
    # collider emits the EPA face — 3 clustered points that make a flat
    # plate rock) instead of the quadrant-spread pick.  compat_wheel_patch:
    # wheel-vs-box adds MuJoCo's 3 mid-tread patch points to the 2 segment
    # endpoints (5 equal-depth contacts).  Both force the staged XLA step
    # path (the megakernel bakes the default manifolds).
    compat_flat_manifold: bool = struct.field(pytree_node=False)
    compat_wheel_patch: bool = struct.field(pytree_node=False)
    # solver
    solver_iterations: int = struct.field(pytree_node=False)
    ls_iterations: int = struct.field(pytree_node=False)

    # --- array data ---
    body_pos: Any
    body_quat: Any
    body_mass: Any
    body_ipos: Any
    body_iquat: Any
    body_inertia: Any          # (nbody, 3) principal moments
    body_invweight0: Any       # (nbody, 2) [trn, rot]
    jnt_axis: Any              # (njnt, 3)
    jnt_pos: Any               # (njnt, 3)
    jnt_range: Any             # (njnt, 2)
    jnt_solref_limit: Any      # (njnt, 2)
    jnt_solimp_limit: Any      # (njnt, 5)
    dof_damping: Any           # (nv,)
    dof_armature: Any
    dof_frictionloss: Any
    dof_invweight0: Any
    qpos0: Any                 # (nq,)
    site_pos: Any              # (nsite, 3)
    site_quat: Any             # (nsite, 4)
    actuator_gain: Any         # (nu,)
    actuator_bias: Any         # (nu, 3)
    actuator_ctrlrange: Any    # (nu, 2)
    actuator_forcerange: Any   # (nu, 2)  (+-inf when unbounded)
    eq_polycoef: Any           # (neq, 5)
    eq_solref: Any             # (neq, 2)
    eq_solimp: Any             # (neq, 5)
    # robot collision geoms
    wheel_pos: Any             # (nwheel, 3) geom pos in body frame
    wheel_axis: Any            # (nwheel, 3) cylinder axis in body frame
    wheel_size: Any            # (nwheel, 2) radius, half-width
    wheel_friction: Any        # (nwheel, 3)
    wheel_solref: Any          # (nwheel, 2)
    wheel_solimp: Any          # (nwheel, 5)
    chassis_box_pos: Any       # (nbox_r, 3)
    chassis_box_quat: Any      # (nbox_r, 4)
    chassis_box_size: Any      # (nbox_r, 3)
    # convex-hull vertex cloud per chassis geom, BODY frame (mesh hulls when
    # the spec bakes them, else the proxy box's 8 corners; padded to a common
    # V with the cloud's centroid — strictly interior, never the deepest
    # vertex against a plane)
    chassis_hull_verts: Any    # (nbox_r, V, 3)
    # scene
    plane_z: Any               # scalar
    plane_half_size: Any       # (2,) x/y half extents; <=0 => infinite
    plane_friction: Any        # (3,)
    plane_solref: Any
    plane_solimp: Any
    scene_box_pos: Any         # (K, 3)
    scene_box_size: Any        # (K, 3)
    # options
    gravity: Any               # (3,)
    timestep: Any              # scalar
    # sensors (rangefinder handled by envs; scalar sensors by sensors.py)
    sensor_cutoff: Any         # (n_rangefinder,) cutoff distances

    @property
    def dtype(self):
        return self.body_pos.dtype

    def body_id(self, name: str) -> int:
        return self.body_names.index(name)

    def joint_id(self, name: str) -> int:
        return self.jnt_names.index(name)

    def actuator_id(self, name: str) -> int:
        return self.actuator_names.index(name)


def _fuse_welded(spec: st.ModelSpec):
    """Fold jointless bodies into their parents; returns (bodies, site_map).

    Returns the fused body list (each with combined inertial properties and
    geoms/sites re-expressed in the parent frame) in topological order.
    """
    # Build name->spec map and children lists.
    by_name = {b.name: b for b in spec.bodies}

    # Compute absolute transform of each body relative to its nearest jointed
    # ancestor ("host").
    def rot(q):
        w, x, y, z = q
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])

    hosts = {}  # body name -> (host name, pos offset, quat offset)
    fused = {}  # host name -> dict(inertials=[], geoms=[], sites=[])
    order = []
    for b in spec.bodies:
        if b.joints or b.parent == "world":
            hosts[b.name] = (b.name, np.zeros(3), np.array([1.0, 0, 0, 0]))
            fused[b.name] = dict(body=b, inertials=[], geoms=[], sites=[])
            order.append(b.name)
        else:
            hname, hpos, hquat = hosts[b.parent]
            pos = hpos + rot(hquat) @ np.asarray(b.pos)
            quat = np.asarray(st.quat_mul_np(tuple(hquat), tuple(b.quat)))
            hosts[b.name] = (hname, pos, quat)
        hname, hpos, hquat = hosts[b.name]
        entry = fused[hname]
        R = rot(hquat)
        if b.inertial is not None:
            ip = hpos + R @ np.asarray(b.inertial.pos)
            iq = np.asarray(st.quat_mul_np(tuple(hquat), tuple(b.inertial.quat)))
            entry["inertials"].append((b.inertial.mass, ip, iq,
                                       np.asarray(b.inertial.diaginertia)))
        else:
            # No explicit inertial: derive from primitive geoms that carry a
            # mass (MuJoCo's inertiafromgeom behavior for the supported
            # primitives).
            for g in b.geoms:
                gi = _geom_inertial(g)
                if gi is None:
                    continue
                gm, gpos, gquat, gdiag = gi
                ip = hpos + R @ gpos
                iq = np.asarray(st.quat_mul_np(tuple(hquat), tuple(gquat)))
                entry["inertials"].append((gm, ip, iq, gdiag))
        for g in b.geoms:
            gp = hpos + R @ np.asarray(g.pos)
            gq = np.asarray(st.quat_mul_np(tuple(hquat), tuple(g.quat)))
            entry["geoms"].append(dataclasses.replace(
                g, pos=tuple(gp), quat=tuple(gq)))
        for s_ in b.sites:
            sp = hpos + R @ np.asarray(s_.pos)
            sq = np.asarray(st.quat_mul_np(tuple(hquat), tuple(s_.quat)))
            entry["sites"].append(dataclasses.replace(
                s_, pos=tuple(sp), quat=tuple(sq)))
    # Re-map parents of jointed bodies to their host.
    for name in order:
        b = fused[name]["body"]
        if b.parent != "world":
            fused[name]["parent"] = hosts[b.parent][0]
        else:
            fused[name]["parent"] = "world"
    return order, fused


def _geom_inertial(g: st.GeomSpec):
    """Analytic inertia of a primitive geom with explicit mass, in the geom
    frame: returns (mass, pos, quat, diaginertia) or None."""
    if g.mass is None:
        return None
    m = float(g.mass)
    s = g.size
    if g.type == st.SPHERE:
        r = s[0]
        diag = np.full(3, 0.4 * m * r * r)
    elif g.type == st.BOX:
        hx, hy, hz = s[:3]
        diag = m / 3.0 * np.array([hy * hy + hz * hz, hx * hx + hz * hz,
                                   hx * hx + hy * hy])
    elif g.type == st.CYLINDER:
        r, h = s[0], s[1]      # radius, half-height
        ixx = m * (3 * r * r + 4 * h * h) / 12.0
        diag = np.array([ixx, ixx, 0.5 * m * r * r])
    elif g.type == st.CAPSULE:
        # approximate as cylinder (adequate for mass bookkeeping)
        r, h = s[0], s[1]
        ixx = m * (3 * r * r + 4 * h * h) / 12.0
        diag = np.array([ixx, ixx, 0.5 * m * r * r])
    else:
        return None
    return m, np.asarray(g.pos), np.asarray(g.quat), diag


def _combine_inertials(inertials):
    """Combine (mass, ipos, iquat, diaginertia) list into one inertial tuple.

    Returns (mass, com, iquat, diaginertia) with the combined rotational
    inertia re-diagonalized (principal frame).
    """
    def rot(q):
        w, x, y, z = q
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])

    if not inertials:
        return 0.0, np.zeros(3), np.array([1.0, 0, 0, 0]), np.zeros(3)
    total_mass = sum(m for m, *_ in inertials)
    com = sum(m * p for m, p, *_ in inertials) / max(total_mass, 1e-30)
    inertia = np.zeros((3, 3))
    for m, p, q, diag in inertials:
        R = rot(q)
        I_com = R @ np.diag(diag) @ R.T
        d = p - com
        inertia += I_com + m * (np.dot(d, d) * np.eye(3) - np.outer(d, d))
    evals, evecs = np.linalg.eigh(inertia)
    # eigh returns ascending; MuJoCo uses descending principal order. Sort
    # descending and form a right-handed frame.
    idx = np.argsort(evals)[::-1]
    evals = evals[idx]
    evecs = evecs[:, idx]
    if np.linalg.det(evecs) < 0:
        evecs[:, 2] *= -1
    # rotation matrix -> quaternion
    t = np.trace(evecs)
    if t > 0:
        r = np.sqrt(1 + t)
        w = 0.5 * r
        x = (evecs[2, 1] - evecs[1, 2]) / (2 * r)
        y = (evecs[0, 2] - evecs[2, 0]) / (2 * r)
        z = (evecs[1, 0] - evecs[0, 1]) / (2 * r)
    else:
        i = np.argmax(np.diag(evecs))
        j, k = (i + 1) % 3, (i + 2) % 3
        r = np.sqrt(1 + evecs[i, i] - evecs[j, j] - evecs[k, k])
        q_ = np.zeros(4)
        q_[i + 1] = 0.5 * r
        q_[0] = (evecs[k, j] - evecs[j, k]) / (2 * r)
        q_[j + 1] = (evecs[j, i] + evecs[i, j]) / (2 * r)
        q_[k + 1] = (evecs[k, i] + evecs[i, k]) / (2 * r)
        w, x, y, z = q_
    quat = np.array([w, x, y, z])
    quat /= np.linalg.norm(quat)
    return total_mass, com, quat, evals


_HULL_SPREAD_EPS = 1e-3  # m of depth preference per m of xy extremity


def _hull_quadrants(hull):
    """Partition vertex indices into 4 body-frame-xy quadrants around the
    cloud centroid; an empty quadrant falls back to the full index set (its
    pick then duplicates the global deepest vertex, which is harmless)."""
    c = hull[:, :2].mean(axis=0)
    quads = [[], [], [], []]
    for k, v in enumerate(hull):
        quads[(0 if v[0] >= c[0] else 2) + (0 if v[1] >= c[1] else 1)].append(k)
    return tuple(tuple(q) if q else tuple(range(len(hull))) for q in quads)


def _hull_spread_bias(hull):
    """Per-vertex depth-selection bias: prefer xy-extreme vertices among
    near-tied depths (flat contact ties in a quadrant would otherwise pick
    an arbitrary vertex near the quadrant boundary, collapsing the support
    polygon).  The bias (~0.1 mm at this chassis scale) only reorders
    depths closer than eps*extremity; any real tilt separates candidate
    depths by far more (1 deg over a 0.1 m lever is 1.7 mm)."""
    c = hull[:, :2].mean(axis=0)
    r = np.linalg.norm(hull[:, :2] - c, axis=-1)
    return tuple(float(x) for x in (_HULL_SPREAD_EPS * r))


# Triangulation of an 8-corner box hull whose corner k has sign pattern
# (x, y, z) = (k>>2, (k>>1)&1, k&1) over (-1, +1) — the ordering the
# box-corner fallback below generates.  Two triangles per face; winding is
# irrelevant (the compat manifold only gathers face vertices).
_BOX_TRIS = (
    (0, 2, 6), (0, 6, 4),   # z = -1
    (1, 7, 3), (1, 5, 7),   # z = +1
    (0, 1, 5), (0, 5, 4),   # y = -1
    (2, 3, 7), (2, 7, 6),   # y = +1
    (0, 1, 3), (0, 3, 2),   # x = -1
    (4, 5, 7), (4, 7, 6),   # x = +1
)


def _pad_hulls(hulls):
    """Per-geom vertex clouds padded to a common V with their centroid
    (strictly interior, so padding never becomes the deepest vertex
    against a plane or box face)."""
    vmax = max(h.shape[0] for h in hulls)
    out = []
    for h in hulls:
        if h.shape[0] < vmax:
            pad = np.repeat(h.mean(axis=0, keepdims=True),
                            vmax - h.shape[0], axis=0)
            h = np.concatenate([h, pad], axis=0)
        out.append(h)
    return out


def make_model(spec: st.ModelSpec,
               scene: Optional[SceneSpec] = None,
               dtype=jnp.float32,
               solver_iterations: int = 16,
               ls_iterations: int = 8,
               compat_flat_manifold: bool = False,
               compat_wheel_patch: bool = False) -> Model:
    """Compile a ModelSpec (+ static scene) into a Model pytree."""
    scene = scene if scene is not None else open_floor_scene()
    order, fused = _fuse_welded(spec)

    body_names = ["world"] + order
    nbody = len(body_names)
    body_index = {n: i for i, n in enumerate(body_names)}
    body_parent = [0] + [body_index[fused[n]["parent"]] for n in order]

    body_pos = np.zeros((nbody, 3))
    body_quat = np.tile(np.array([1.0, 0, 0, 0]), (nbody, 1))
    body_mass = np.zeros(nbody)
    body_ipos = np.zeros((nbody, 3))
    body_iquat = np.tile(np.array([1.0, 0, 0, 0]), (nbody, 1))
    body_inertia = np.zeros((nbody, 3))

    jnt_type, jnt_body, jnt_axis, jnt_pos, jnt_range = [], [], [], [], []
    jnt_qposadr, jnt_dofadr, jnt_names = [], [], []
    jnt_solref_limit, jnt_solimp_limit = [], []
    limited_jnts = []
    dof_body, dof_jnt = [], []
    dof_damping, dof_armature, dof_frictionloss = [], [], []
    qpos0 = []
    site_body, site_pos, site_quat, site_names = [], [], [], []
    wheel_body, wheel_pos, wheel_axis, wheel_size = [], [], [], []
    wheel_friction, wheel_solref, wheel_solimp = [], [], []
    cbox_body, cbox_pos, cbox_quat, cbox_size = [], [], [], []
    cbox_hull = []
    cbox_faces = []

    for name in order:
        i = body_index[name]
        b = fused[name]["body"]
        body_pos[i] = b.pos
        body_quat[i] = b.quat
        m, com, iq, diag = _combine_inertials(fused[name]["inertials"])
        body_mass[i] = m
        body_ipos[i] = com
        body_iquat[i] = iq
        body_inertia[i] = diag
        for j in b.joints:
            code = _JNT_CODE[j.type]
            jnt_names.append(j.name)
            jnt_type.append(code)
            jnt_body.append(i)
            jnt_axis.append(np.asarray(j.axis, dtype=np.float64))
            jnt_pos.append(np.asarray(j.pos, dtype=np.float64))
            jnt_qposadr.append(len(qpos0))
            jnt_dofadr.append(len(dof_body))
            jnt_range.append(j.range if j.range is not None else (0.0, 0.0))
            jnt_solref_limit.append(j.solref_limit)
            jnt_solimp_limit.append(j.solimp_limit)
            if j.range is not None:
                limited_jnts.append(len(jnt_names) - 1)
            if code == JNT_FREE:
                qpos0.extend(list(b.pos) + list(b.quat))
                for _ in range(6):
                    dof_body.append(i)
                    dof_jnt.append(len(jnt_names) - 1)
                    dof_damping.append(j.damping)
                    dof_armature.append(j.armature)
                    dof_frictionloss.append(j.frictionloss)
            else:
                qpos0.append(0.0)
                dof_body.append(i)
                dof_jnt.append(len(jnt_names) - 1)
                dof_damping.append(j.damping)
                dof_armature.append(j.armature)
                dof_frictionloss.append(j.frictionloss)
        for s_ in fused[name]["sites"]:
            site_body.append(i)
            site_pos.append(np.asarray(s_.pos))
            site_quat.append(np.asarray(s_.quat))
            site_names.append(s_.name)
        for g in fused[name]["geoms"]:
            if g.type == st.CYLINDER:
                # cylinder axis = local z rotated by geom quat
                w, x, y, z = g.quat
                axis = np.array([2 * (x * z + w * y), 2 * (y * z - w * x),
                                 1 - 2 * (x * x + y * y)])
                wheel_body.append(i)
                wheel_pos.append(np.asarray(g.pos))
                wheel_axis.append(axis)
                wheel_size.append(np.asarray(g.size[:2]))
                wheel_friction.append(np.asarray(g.friction))
                wheel_solref.append(np.asarray(g.solref))
                wheel_solimp.append(np.asarray(g.solimp))
            elif g.type == st.BOX:
                cbox_body.append(i)
                cbox_pos.append(np.asarray(g.pos))
                cbox_quat.append(np.asarray(g.quat))
                cbox_size.append(np.asarray(g.size))
                if g.hull is not None:
                    cbox_hull.append(np.asarray(g.hull, dtype=np.float64))
                    cbox_faces.append(tuple(tuple(int(v) for v in f)
                                            for f in (g.hull_faces or ())))
                else:
                    cbox_faces.append(_BOX_TRIS)
                    # box corners as the vertex cloud (body frame)
                    w_, x_, y_, z_ = g.quat
                    Rg = np.array([
                        [1 - 2 * (y_ * y_ + z_ * z_), 2 * (x_ * y_ - w_ * z_),
                         2 * (x_ * z_ + w_ * y_)],
                        [2 * (x_ * y_ + w_ * z_), 1 - 2 * (x_ * x_ + z_ * z_),
                         2 * (y_ * z_ - w_ * x_)],
                        [2 * (x_ * z_ - w_ * y_), 2 * (y_ * z_ + w_ * x_),
                         1 - 2 * (x_ * x_ + y_ * y_)]])
                    signs = np.array([[sx, sy, sz] for sx in (-1, 1)
                                      for sy in (-1, 1) for sz in (-1, 1)],
                                     dtype=np.float64)
                    cbox_hull.append(np.asarray(g.pos)
                                     + (signs * np.asarray(g.size)) @ Rg.T)

    nq, nv = len(qpos0), len(dof_body)
    njnt = len(jnt_names)
    cbox_hull_padded = _pad_hulls(cbox_hull) if cbox_hull else []

    # plane from spec world geoms (fall back to scene floor_z)
    plane_z = scene.floor_z
    # mjcf.to_mjcf always exports the floor as size="40 40 0.1" at the
    # origin; MuJoCo rays treat a plane with positive sizes as FINITE
    # (engine_ray.c ray_plane), so the raycast needs the extents too.
    plane_half_size = np.array([40.0, 40.0])
    plane_friction = np.asarray(scene.floor_friction)
    plane_solref = np.array([0.02, 1.0])
    plane_solimp = np.array([0.9, 0.95, 0.001, 0.5, 2.0])
    for g in spec.world_geoms:
        if g.type == st.PLANE:
            if len(g.size) >= 2:
                plane_half_size = np.asarray(g.size[:2], np.float64)
            plane_friction = np.asarray(g.friction)
            plane_solref = np.asarray(g.solref)
            plane_solimp = np.asarray(g.solimp)

    # actuators (scalar-joint transmission only)
    jnt_index = {n: i for i, n in enumerate(jnt_names)}
    act_dof, act_gain, act_bias, act_ctrl, act_force, act_names = [], [], [], [], [], []
    for a in spec.actuators:
        jid = jnt_index[a.joint]
        act_dof.append(jnt_dofadr[jid])
        act_gain.append(a.gain)
        act_bias.append(np.asarray(a.bias))
        act_ctrl.append(np.asarray(a.ctrlrange if a.ctrlrange is not None
                                   else (-np.inf, np.inf)))
        act_force.append(np.asarray(a.forcerange if a.forcerange is not None
                                    else (-np.inf, np.inf)))
        act_names.append(a.name)

    # equalities (joint couplings)
    eq_pairs, eq_poly, eq_solref, eq_solimp = [], [], [], []
    for e in spec.equalities:
        d1 = jnt_dofadr[jnt_index[e.joint1]]
        d2 = jnt_dofadr[jnt_index[e.joint2]]
        eq_pairs.append((d1, d2))
        # always (5,): the constraint assembly indexes coef[0..4], and a
        # short row would make jnp's clamped gather repeat the last entry
        poly5 = np.zeros(5)
        poly5[:min(len(e.polycoef), 5)] = np.asarray(e.polycoef[:5])
        eq_poly.append(poly5)
        eq_solref.append(np.asarray(e.solref))
        eq_solimp.append(np.asarray(e.solimp))

    friction_dofs = tuple(i for i in range(nv) if dof_frictionloss[i] > 0)
    limited_dofs = tuple(jnt_dofadr[j] for j in limited_jnts)

    # sensor metadata
    site_index = {n: i for i, n in enumerate(site_names)}
    sensor_kinds, sensor_obj, sensor_names = [], [], []
    rf_cutoff = []
    for s in spec.sensors:
        sensor_kinds.append(s.type)
        sensor_names.append(s.name)
        if s.type == "jointpos":
            sensor_obj.append(jnt_qposadr[jnt_index[s.obj]])
        elif s.type == "jointvel":
            sensor_obj.append(jnt_dofadr[jnt_index[s.obj]])
        elif s.type == "rangefinder":
            sensor_obj.append(site_index[s.obj])
            rf_cutoff.append(s.cutoff)
        else:
            raise ValueError(f"unsupported sensor type {s.type}")

    def arr(x):
        return jnp.asarray(np.asarray(x, dtype=np.float64), dtype=dtype)

    model = Model(
        nq=nq, nv=nv, nu=len(act_names), nbody=nbody, njnt=njnt,
        nsite=len(site_names),
        body_parent=tuple(body_parent), body_names=tuple(body_names),
        jnt_type=tuple(jnt_type), jnt_body=tuple(jnt_body),
        jnt_qposadr=tuple(jnt_qposadr), jnt_dofadr=tuple(jnt_dofadr),
        jnt_names=tuple(jnt_names),
        dof_body=tuple(dof_body), dof_jnt=tuple(dof_jnt),
        site_body=tuple(site_body), site_names=tuple(site_names),
        actuator_dof=tuple(act_dof), actuator_names=tuple(act_names),
        sensor_kinds=tuple(sensor_kinds), sensor_obj=tuple(sensor_obj),
        sensor_names=tuple(sensor_names),
        eq_dof_pairs=tuple(eq_pairs),
        limited_dofs=limited_dofs, friction_dofs=friction_dofs,
        wheel_body=tuple(wheel_body), chassis_box_body=tuple(cbox_body),
        chassis_hull_quadrants=tuple(_hull_quadrants(h)
                                     for h in cbox_hull_padded),
        chassis_hull_bias=tuple(_hull_spread_bias(h)
                                for h in cbox_hull_padded),
        chassis_hull_faces=tuple(cbox_faces),
        num_scene_boxes=int(scene.num_boxes),
        compat_flat_manifold=bool(compat_flat_manifold),
        compat_wheel_patch=bool(compat_wheel_patch),
        solver_iterations=solver_iterations, ls_iterations=ls_iterations,
        body_pos=arr(body_pos), body_quat=arr(body_quat),
        body_mass=arr(body_mass), body_ipos=arr(body_ipos),
        body_iquat=arr(body_iquat), body_inertia=arr(body_inertia),
        body_invweight0=arr(np.zeros((nbody, 2))),
        jnt_axis=arr(np.stack(jnt_axis)), jnt_pos=arr(np.stack(jnt_pos)),
        jnt_range=arr(np.stack(jnt_range)),
        jnt_solref_limit=arr(np.stack(jnt_solref_limit)),
        jnt_solimp_limit=arr(np.stack(jnt_solimp_limit)),
        dof_damping=arr(dof_damping), dof_armature=arr(dof_armature),
        dof_frictionloss=arr(dof_frictionloss),
        dof_invweight0=arr(np.zeros(nv)),
        qpos0=arr(qpos0),
        site_pos=arr(np.stack(site_pos)) if site_pos else arr(np.zeros((0, 3))),
        site_quat=arr(np.stack(site_quat)) if site_quat else arr(np.zeros((0, 4))),
        actuator_gain=arr(act_gain),
        actuator_bias=arr(np.stack(act_bias) if act_bias
                          else np.zeros((0, 3))),
        actuator_ctrlrange=arr(np.stack(act_ctrl) if act_ctrl
                               else np.zeros((0, 2))),
        actuator_forcerange=arr(np.stack(act_force) if act_force
                                else np.zeros((0, 2))),
        eq_polycoef=arr(np.stack(eq_poly)) if eq_poly else arr(np.zeros((0, 5))),
        eq_solref=arr(np.stack(eq_solref)) if eq_poly else arr(np.zeros((0, 2))),
        eq_solimp=arr(np.stack(eq_solimp)) if eq_poly else arr(np.zeros((0, 5))),
        wheel_pos=arr(np.stack(wheel_pos)) if wheel_pos else arr(np.zeros((0, 3))),
        wheel_axis=arr(np.stack(wheel_axis)) if wheel_pos else arr(np.zeros((0, 3))),
        wheel_size=arr(np.stack(wheel_size)) if wheel_pos else arr(np.zeros((0, 2))),
        wheel_friction=arr(np.stack(wheel_friction)) if wheel_pos else arr(np.zeros((0, 3))),
        wheel_solref=arr(np.stack(wheel_solref)) if wheel_pos else arr(np.zeros((0, 2))),
        wheel_solimp=arr(np.stack(wheel_solimp)) if wheel_pos else arr(np.zeros((0, 5))),
        chassis_box_pos=arr(np.stack(cbox_pos)) if cbox_pos else arr(np.zeros((0, 3))),
        chassis_box_quat=arr(np.stack(cbox_quat)) if cbox_pos else arr(np.zeros((0, 4))),
        chassis_box_size=arr(np.stack(cbox_size)) if cbox_pos else arr(np.zeros((0, 3))),
        chassis_hull_verts=arr(np.stack(cbox_hull_padded)) if cbox_hull
        else arr(np.zeros((0, 8, 3))),
        plane_z=arr(plane_z), plane_half_size=arr(plane_half_size),
        plane_friction=arr(plane_friction),
        plane_solref=arr(plane_solref), plane_solimp=arr(plane_solimp),
        scene_box_pos=arr(scene.box_pos.reshape(-1, 3)),
        scene_box_size=arr(scene.box_size.reshape(-1, 3)),
        gravity=arr(spec.option.gravity), timestep=arr(spec.option.timestep),
        sensor_cutoff=arr(rf_cutoff),
    )
    # Compile-time constants that need the dynamics: invweight0 (MuJoCo's
    # mj_setConst analog) — computed with the engine itself at qpos0.
    from mujoco_playground_tpu.physics import inertia as _inertia
    model = _inertia.set_invweight0(model)
    return model
