"""Batch-last (lane-major) smooth-dynamics stages for the TPU fast path.

Same math as kinematics/inertia/engine, but every array carries the env
batch in its LAST axis: quaternions are (4, B), positions (3, B), the mass
matrix (nv, nv, B).  Under the per-env ``vmap`` formulation XLA tiles the
tiny trailing dims (3, 4, 6, 12) into (8, 128) lanes and pads 10-30x; with
B trailing, every elementwise op runs on fully-packed lanes.

Used only by ``engine.step_batch``; the per-env modules remain the readable
reference implementation and the parity-test surface (a CPU f64 test pins
this module to them exactly).
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_playground_tpu.physics import kinematics
from mujoco_playground_tpu.physics.model import (JNT_FREE, JNT_HINGE,
                                                 JNT_SLIDE, Model)

# --- quaternion ops on (4, B) ------------------------------------------------

def quat_mul_bl(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def quat_rotate_bl(q, v):
    w = q[0]
    u = q[1:]
    uv = _cross_bl(u, v)
    return v + 2.0 * (w * uv + _cross_bl(u, uv))


def _cross_bl(a, b):
    return jnp.stack([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


def quat_to_mat_bl(q):
    """(4, B) -> (3, 3, B)."""
    w, x, y, z = q
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)]),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)]),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)]),
    ])


def quat_axis_angle_bl(axis_const, theta):
    """Static unit axis (3,) + per-env angle (B,) -> (4, B)."""
    half = theta * 0.5
    s = jnp.sin(half)
    return jnp.stack([jnp.cos(half), axis_const[0] * s, axis_const[1] * s,
                      axis_const[2] * s])


def quat_integrate_bl(q, omega, dt):
    """q (4,B) by body-frame omega (3,B) over dt; normalized."""
    angle = jnp.sqrt(omega[0] ** 2 + omega[1] ** 2 + omega[2] ** 2)
    safe = jnp.where(angle > 1e-14, angle, 1.0)
    half = angle * dt * 0.5
    s = jnp.where(angle > 1e-14, jnp.sin(half) / safe, 0.0)
    dq = jnp.stack([jnp.cos(half), omega[0] * s, omega[1] * s, omega[2] * s])
    out = quat_mul_bl(q, dq)
    norm = jnp.sqrt(out[0]**2 + out[1]**2 + out[2]**2 + out[3]**2)
    return out / norm


# --- FK ---------------------------------------------------------------------

def fk_bl(model: Model, qpos_bl) -> Tuple[List, List]:
    """qpos (nq, B) -> (xpos [nbody of (3,B)], xquat [nbody of (4,B)])."""
    B = qpos_bl.shape[-1]
    dtype = qpos_bl.dtype
    zeros3 = jnp.zeros((3, B), dtype)
    ident4 = jnp.concatenate([jnp.ones((1, B), dtype),
                              jnp.zeros((3, B), dtype)])
    xpos = [zeros3]
    xquat = [ident4]
    body_pos = np.asarray(model.body_pos)
    body_quat = np.asarray(model.body_quat)
    jnt_axis = np.asarray(model.jnt_axis)
    jnt_pos = np.asarray(model.jnt_pos)
    qpos0 = np.asarray(model.qpos0)

    jnts_of = {b: [] for b in range(model.nbody)}
    for j in range(model.njnt):
        jnts_of[model.jnt_body[j]].append(j)

    def const3(v):
        return jnp.asarray(v, dtype)[:, None]

    def const4(v):
        return jnp.asarray(v, dtype)[:, None]

    for b in range(1, model.nbody):
        p = model.body_parent[b]
        pos = xpos[p] + quat_rotate_bl(xquat[p], const3(body_pos[b]))
        quat = quat_mul_bl(xquat[p], const4(body_quat[b]))
        for j in jnts_of[b]:
            adr = model.jnt_qposadr[j]
            t = model.jnt_type[j]
            if t == JNT_FREE:
                pos = qpos_bl[adr:adr + 3]
                q = qpos_bl[adr + 3:adr + 7]
                norm = jnp.sqrt(q[0]**2 + q[1]**2 + q[2]**2 + q[3]**2)
                quat = q / norm
            elif t == JNT_HINGE:
                theta = qpos_bl[adr] - qpos0[adr]
                jp = const3(jnt_pos[j])
                anchor = pos + quat_rotate_bl(quat, jp)
                quat = quat_mul_bl(
                    quat, quat_axis_angle_bl(jnt_axis[j], theta))
                if np.any(jnt_pos[j] != 0):
                    pos = anchor - quat_rotate_bl(quat, jp)
            else:  # slide
                pos = pos + quat_rotate_bl(quat, const3(jnt_axis[j])) * (
                    qpos_bl[adr] - qpos0[adr])
        xpos.append(pos)
        xquat.append(quat)
    return xpos, xquat


# --- motion subspace / CRBA / bias ------------------------------------------

def motion_subspace_bl(model: Model, xpos, xquat, anchor):
    """Per-dof spatial vectors: list of nv (6, B) arrays about `anchor`."""
    dtype = anchor.dtype
    B = anchor.shape[-1]
    S = []
    jnt_axis = np.asarray(model.jnt_axis)
    jnt_pos = np.asarray(model.jnt_pos)
    for j in range(model.njnt):
        b = model.jnt_body[j]
        t = model.jnt_type[j]
        if t == JNT_FREE:
            zero = jnp.zeros((3, B), dtype)
            eye = np.eye(3)
            for k in range(3):
                S.append(jnp.concatenate([
                    zero, jnp.broadcast_to(
                        jnp.asarray(eye[k], dtype)[:, None], (3, B))]))
            R = quat_to_mat_bl(xquat[b])
            for k in range(3):
                w = R[:, k]                       # (3, B) column k
                S.append(jnp.concatenate([w, _cross_bl(w, anchor - xpos[b])]))
        else:
            axis_w = quat_rotate_bl(
                xquat[b], jnp.asarray(jnt_axis[j], dtype)[:, None])
            anch = xpos[b]
            if np.any(jnt_pos[j] != 0):
                anch = anch + quat_rotate_bl(
                    xquat[b], jnp.asarray(jnt_pos[j], dtype)[:, None])
            if t == JNT_HINGE:
                S.append(jnp.concatenate(
                    [axis_w, _cross_bl(axis_w, anchor - anch)]))
            else:
                S.append(jnp.concatenate([jnp.zeros((3, B), dtype), axis_w]))
    return S


def _spatial_inertia_bl(model: Model, b, xpos_b, xquat_b, anchor):
    """(6, 6, B) spatial inertia of body b about anchor."""
    dtype = anchor.dtype
    iquat = quat_mul_bl(xquat_b, jnp.asarray(
        np.asarray(model.body_iquat)[b], dtype)[:, None])
    R = quat_to_mat_bl(iquat)                     # (3, 3, B)
    diag = np.asarray(model.body_inertia)[b]
    # I_world = R diag R^T
    Iw = jnp.einsum('ikB,k,jkB->ijB', R, jnp.asarray(diag, dtype), R)
    com = xpos_b + quat_rotate_bl(xquat_b, jnp.asarray(
        np.asarray(model.body_ipos)[b], dtype)[:, None])
    c = com - anchor                              # (3, B)
    m = float(np.asarray(model.body_mass)[b])
    # skew(c)
    B_ = c.shape[-1]
    zero = jnp.zeros((B_,), dtype)
    cx = jnp.stack([jnp.stack([zero, -c[2], c[1]]),
                    jnp.stack([c[2], zero, -c[0]]),
                    jnp.stack([-c[1], c[0], zero])])
    top_left = Iw + m * jnp.einsum('ikB,jkB->ijB', cx, cx)
    top_right = m * cx
    bot_left = m * jnp.einsum('ijB->jiB', cx)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype)[:, :, None], cx.shape)
    bot_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=1)
    bot = jnp.concatenate([bot_left, bot_right], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def crba_bias_bl(model: Model, xpos, xquat, qvel_bl, gravity):
    """Batch-last CRBA + RNEA: returns (M (nv,nv,B), qfrc_bias (nv,B), S).

    Scatter-free: per-body contributions are embedded through the static
    ancestor mask and summed with einsums (TPU scatters serialize).
    """
    dtype = qvel_bl.dtype
    B = qvel_bl.shape[-1]
    nv = model.nv
    anchor = xpos[1] if model.nbody > 1 else jnp.zeros((3, B), dtype)
    S = motion_subspace_bl(model, xpos, xquat, anchor)    # nv x (6, B)
    Sarr = jnp.stack(S)                                    # (nv, 6, B)
    mask = kinematics.ancestor_mask(model)                 # (nbody, nv) np

    # keep only bodies with inertia (fused tree: all but world)
    bodies = [b for b in range(model.nbody)
              if float(np.asarray(model.body_mass)[b]) != 0.0
              or np.any(np.asarray(model.body_inertia)[b])]
    Ibar = jnp.stack([
        _spatial_inertia_bl(model, b, xpos[b], xquat[b], anchor)
        for b in bodies])                                  # (nb, 6, 6, B)
    mask_c = jnp.asarray(mask[np.asarray(bodies)], dtype)  # (nb, nv)

    # J[b, k, v, B] = S[v, k, B] * mask[b, v]
    Jfull = jnp.einsum('vkB,bv->bkvB', Sarr, mask_c)
    IJ = jnp.einsum('bklB,blvB->bkvB', Ibar, Jfull)
    M = jnp.einsum('bkvB,bkwB->vwB', Jfull, IJ)
    arma = jnp.asarray(np.asarray(model.dof_armature), dtype)
    M = M + jnp.eye(nv, dtype=dtype)[:, :, None] * arma[:, None, None]

    # body spatial velocities
    vbody = jnp.einsum('bkvB,vB->bkB', Jfull, qvel_bl)     # (nb, 6, B)

    # velocity-product terms (zero for free-joint translation dofs)
    carried = np.ones(nv, bool)
    for j in range(model.njnt):
        if model.jnt_type[j] == JNT_FREE:
            adr = model.jnt_dofadr[j]
            carried[adr:adr + 3] = False
    body_of = {b: i for i, b in enumerate(bodies)}
    cdot_rows = []
    for d in range(nv):
        if carried[d]:
            vb = vbody[body_of[model.dof_body[d]]]
            cdot_rows.append(_motion_cross_bl(vb, S[d]) * qvel_bl[d])
        else:
            cdot_rows.append(jnp.zeros((6, B), dtype))
    cdot = jnp.stack(cdot_rows)                            # (nv, 6, B)

    a0 = jnp.concatenate([jnp.zeros((3, B), dtype),
                          jnp.broadcast_to(
                              -jnp.asarray(gravity, dtype)[:, None], (3, B))])
    abody = a0[None] + jnp.einsum('bv,vkB->bkB', mask_c, cdot)
    Iv = jnp.einsum('bklB,blB->bkB', Ibar, vbody)
    Ia = jnp.einsum('bklB,blB->bkB', Ibar, abody)
    fbody = Ia + jnp.stack([
        _force_cross_bl(vbody[i], Iv[i]) for i in range(len(bodies))])
    fbias = jnp.einsum('bkvB,bkB->vB', Jfull, fbody)
    return M, fbias, Sarr, anchor


def _motion_cross_bl(v, s):
    vang, vlin = v[:3], v[3:]
    sang, slin = s[:3], s[3:]
    return jnp.concatenate([
        _cross_bl(vang, sang),
        _cross_bl(vlin, sang) + _cross_bl(vang, slin)])


def _force_cross_bl(v, f):
    vang, vlin = v[:3], v[3:]
    ftrq, ffrc = f[:3], f[3:]
    return jnp.concatenate([
        _cross_bl(vang, ftrq) + _cross_bl(vlin, ffrc),
        _cross_bl(vang, ffrc)])


# --- actuation + position integration ---------------------------------------

def actuator_force_bl(model: Model, qpos_bl, qvel_bl, ctrl_bl):
    """(nu, B) ctrl -> (nv, B) generalized force."""
    from mujoco_playground_tpu.physics.constraint import _dof_to_qposadr
    dtype = qpos_bl.dtype
    nv = model.nv
    out = jnp.zeros((nv, qpos_bl.shape[-1]), dtype)
    for u in range(model.nu):
        d = model.actuator_dof[u]
        qadr = _dof_to_qposadr(model, d)
        lo, hi = model.actuator_ctrlrange[u]
        c = jnp.clip(ctrl_bl[u], lo, hi)
        force = (model.actuator_gain[u] * c + model.actuator_bias[u, 0]
                 + model.actuator_bias[u, 1] * qpos_bl[qadr]
                 + model.actuator_bias[u, 2] * qvel_bl[d])
        force = jnp.clip(force, model.actuator_forcerange[u, 0],
                         model.actuator_forcerange[u, 1])
        out = out.at[d].add(force)
    return out


def integrate_pos_bl(model: Model, qpos_bl, qvel_bl, h):
    out = []
    for j in range(model.njnt):
        adr = model.jnt_qposadr[j]
        dadr = model.jnt_dofadr[j]
        t = model.jnt_type[j]
        if t == JNT_FREE:
            out.append(qpos_bl[adr:adr + 3] + h * qvel_bl[dadr:dadr + 3])
            out.append(quat_integrate_bl(qpos_bl[adr + 3:adr + 7],
                                         qvel_bl[dadr + 3:dadr + 6], h))
        else:
            out.append(qpos_bl[adr:adr + 1] + h * qvel_bl[dadr:dadr + 1])
    return jnp.concatenate(out)
