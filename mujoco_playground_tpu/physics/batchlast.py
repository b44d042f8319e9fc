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


def _param_bl(x, base_ndim):
    """Model param -> batch-last form: leaves with an extra leading env axis
    (domain randomization) become (..., B) jnp arrays; unbatched leaves pass
    through (numpy, broadcast-compatible)."""
    nd = getattr(x, "ndim", 0)
    if nd == base_ndim + 1:
        return jnp.moveaxis(jnp.asarray(x), 0, -1)
    return np.asarray(x)


def _spatial_inertia_bl(model: Model, b, xpos_b, xquat_b, anchor):
    """(6, 6, B) spatial inertia of body b about anchor.

    Handles per-env (domain-randomized) mass/inertia: those params arrive as
    (B,)-trailing arrays and broadcast against the (.., B) geometry."""
    dtype = anchor.dtype
    iquat_p = _param_bl(model.body_iquat, 2)[b]       # (4,) or (4, B)
    iq = (jnp.asarray(iquat_p, dtype)[:, None] if iquat_p.ndim == 1
          else iquat_p.astype(dtype))
    iquat = quat_mul_bl(xquat_b, iq)
    R = quat_to_mat_bl(iquat)                     # (3, 3, B)
    diag = _param_bl(model.body_inertia, 2)[b]        # (3,) or (3, B)
    diag_e = (jnp.asarray(diag, dtype)[:, None] if diag.ndim == 1
              else diag.astype(dtype))                # (3, 1|B)
    Iw = jnp.einsum('ikB,jkB->ijB', R * diag_e[None, :, :], R)
    ipos_p = _param_bl(model.body_ipos, 2)[b]
    ip = (jnp.asarray(ipos_p, dtype)[:, None] if ipos_p.ndim == 1
          else ipos_p.astype(dtype))
    com = xpos_b + quat_rotate_bl(xquat_b, ip)
    c = com - anchor                              # (3, B)
    m = _param_bl(model.body_mass, 1)[b]          # scalar or (B,)
    m = jnp.asarray(m, dtype)
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

    # keep only bodies with inertia (fused tree: all but world); with
    # batched (domain-randomized) masses, keep bodies any env gives inertia
    mass_np = np.asarray(jax.device_get(model.body_mass)
                         if hasattr(model.body_mass, "devices")
                         else model.body_mass)
    inert_np = np.asarray(jax.device_get(model.body_inertia)
                          if hasattr(model.body_inertia, "devices")
                          else model.body_inertia)
    if mass_np.ndim == 2:
        mass_np = np.abs(mass_np).max(axis=0)
        inert_np = np.abs(inert_np).max(axis=0)
    bodies = [b for b in range(model.nbody)
              if mass_np[b] != 0.0 or np.any(inert_np[b])]
    Ibar = jnp.stack([
        _spatial_inertia_bl(model, b, xpos[b], xquat[b], anchor)
        for b in bodies])                                  # (nb, 6, 6, B)
    mask_c = jnp.asarray(mask[np.asarray(bodies)], dtype)  # (nb, nv)

    # J[b, k, v, B] = S[v, k, B] * mask[b, v]
    Jfull = jnp.einsum('vkB,bv->bkvB', Sarr, mask_c)
    IJ = jnp.einsum('bklB,blvB->bkvB', Ibar, Jfull)
    M = jnp.einsum('bkvB,bkwB->vwB', Jfull, IJ)
    arma = jnp.asarray(_param_bl(model.dof_armature, 1), dtype)
    arma_col = arma[:, None] if arma.ndim == 1 else arma        # (nv, 1|B)
    M = M + jnp.eye(nv, dtype=dtype)[:, :, None] * arma_col[:, None, :]

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
    """(nu, B) ctrl -> (nv, B) generalized force.

    gain/bias may carry a per-env axis (domain randomization); ranges are
    static."""
    from mujoco_playground_tpu.physics.constraint import _dof_to_qposadr
    dtype = qpos_bl.dtype
    nv = model.nv
    gain = _param_bl(model.actuator_gain, 1)      # (nu,) or (nu, B)
    bias = _param_bl(model.actuator_bias, 2)      # (nu, 3) or (nu, 3, B)
    out = jnp.zeros((nv, qpos_bl.shape[-1]), dtype)
    for u in range(model.nu):
        d = model.actuator_dof[u]
        qadr = _dof_to_qposadr(model, d)
        cr = _param_bl(model.actuator_ctrlrange, 2)[u]   # (2,) or (2, B)
        fr = _param_bl(model.actuator_forcerange, 2)[u]
        c = jnp.clip(ctrl_bl[u], cr[0], cr[1])
        force = (gain[u] * c + bias[u, 0]
                 + bias[u, 1] * qpos_bl[qadr]
                 + bias[u, 2] * qvel_bl[d])
        force = jnp.clip(force, fr[0], fr[1])
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
