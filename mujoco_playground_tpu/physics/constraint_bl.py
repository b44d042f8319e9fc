"""Batch-last constraint assembly — feeds the Pallas Newton kernel directly.

Same rows/formulas as :mod:`constraint` (the parity-tested reference
implementation), but every produced array is lane-major ((rows, B) /
(nv, rows, B)), exactly the layout ops/newton_pallas consumes.  This removes
the last big padded tensors of the step: the per-env contact Jacobian
build materializes (B, C, nv, 3) arrays whose (12, 3) minors pad ~10x in
HBM; here the same quantities are (C, nv, 3, B) with B filling lanes.

Collision narrowphase stays per-env (tiny), and the slot->body mapping is
static, so the ancestor mask needs no batch dimension at all.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from mujoco_playground_tpu.physics import kinematics
from mujoco_playground_tpu.physics.collision import Contacts
from mujoco_playground_tpu.physics.constraint import (CONE, EQ, FRICTION,
                                                      _dof_to_qposadr,
                                                      impedance)
from mujoco_playground_tpu.physics.model import Model


def _kbi_bl(solref, solimp, pos, vel):
    d = impedance(solimp, pos)
    dmax = solimp[..., 1]
    tc, zeta = solref[..., 0], solref[..., 1]
    b = 2.0 / (dmax * tc)
    k = d / (dmax * dmax * tc * tc * zeta * zeta)
    return -b * vel - k * pos, d


def make_efc_bl(model: Model, qpos_bl, qvel_bl, S_bl, anchor_bl,
                     contacts: Contacts) -> Dict:
    """Batch-last efc arrays in the Pallas-kernel layout.

    Args:
      qpos_bl (nq, B); qvel_bl (nv, B); S_bl (nv, 6, B); anchor_bl (3, B);
      contacts: per-env Contacts with (B, C, ...) leaves (slot metadata is
        env-invariant).

    Returns dict: Gt (nv, nj, B), j_aref/j_R/j_floss/j_active (nj, B),
    j_kind (static), Jnt/Jt1t/Jt2t (nv, C, B), c_aref4 (4, C, B),
    c_R/c_mu/c_active (C, B).
    """
    out = {}
    dtype = qpos_bl.dtype
    nv = model.nv
    # joint rows: reuse the code above up to Gt via a small inner call
    joint = _joint_rows_bl(model, qpos_bl, qvel_bl)
    out.update(joint)

    body_static = np.asarray(contacts.body)
    mask_cv = jnp.asarray(kinematics.ancestor_mask(model)[body_static], dtype)
    C = body_static.shape[0]

    pos = jnp.moveaxis(contacts.pos, 0, -1)          # (C, 3, B)
    frame = jnp.moveaxis(contacts.frame, 0, -1)      # (C, 3, 3, B)
    dist = jnp.moveaxis(contacts.dist, 0, -1)        # (C, B)
    mu_ = jnp.moveaxis(contacts.friction, 0, -1)
    solref = jnp.moveaxis(contacts.solref, 0, -1)
    solimp = jnp.moveaxis(contacts.solimp, 0, -1)
    diag_c = jnp.moveaxis(contacts.diag_approx, 0, -1)

    S_ang = S_bl[:, :3]                               # (nv, 3, B)
    S_lin = S_bl[:, 3:]
    arm = pos - anchor_bl[None]                       # (C, 3, B)
    # Jp[c, v, k, B] = S_lin[v,k] + (S_ang[v] x arm[c])_k, masked
    a1, a2, a3 = S_ang[:, 0], S_ang[:, 1], S_ang[:, 2]   # (nv, B)
    r1, r2, r3 = arm[:, 0], arm[:, 1], arm[:, 2]         # (C, B)
    cx = a2[None, :] * r3[:, None] - a3[None, :] * r2[:, None]  # (C, nv, B)
    cy = a3[None, :] * r1[:, None] - a1[None, :] * r3[:, None]
    cz = a1[None, :] * r2[:, None] - a2[None, :] * r1[:, None]
    Jx = (S_lin[None, :, 0] + cx) * mask_cv[:, :, None]
    Jy = (S_lin[None, :, 1] + cy) * mask_cv[:, :, None]
    Jz = (S_lin[None, :, 2] + cz) * mask_cv[:, :, None]

    def project(axis):
        n1 = frame[:, axis, 0][:, None]               # (C, 1, B)
        n2 = frame[:, axis, 1][:, None]
        n3 = frame[:, axis, 2][:, None]
        return Jx * n1 + Jy * n2 + Jz * n3            # (C, nv, B)

    Jn = project(0)
    Jt1 = project(1)
    Jt2 = project(2)

    act = (dist < 0).astype(dtype)
    d_imp = impedance(jnp.moveaxis(solimp, 1, -1), dist)
    dmax = solimp[:, 1]
    tc, zeta = solref[:, 0], solref[:, 1]
    bcoef = 2.0 / (dmax * tc)
    kcoef = d_imp / (dmax * dmax * tc * tc * zeta * zeta)
    diag = jnp.maximum(diag_c * 2.0 * mu_**2 * (1.0 + mu_**2), 1e-12)
    Rrow = jnp.maximum((1.0 - d_imp) / d_imp * diag, 1e-10)
    vn = jnp.einsum('cvB,vB->cB', Jn, qvel_bl)
    vt1 = jnp.einsum('cvB,vB->cB', Jt1, qvel_bl)
    vt2 = jnp.einsum('cvB,vB->cB', Jt2, qvel_bl)
    vel4 = jnp.stack([vn + mu_ * vt1, vn - mu_ * vt1,
                      vn + mu_ * vt2, vn - mu_ * vt2])  # (4, C, B)
    aref4 = -bcoef[None] * vel4 - (kcoef * dist)[None]

    out.update(dict(
        Jnt=jnp.moveaxis(Jn, 0, 1), Jt1t=jnp.moveaxis(Jt1, 0, 1),
        Jt2t=jnp.moveaxis(Jt2, 0, 1),                  # (nv, C, B)
        c_aref4=aref4, c_R=Rrow, c_mu=mu_, c_active=act))
    return out


def _joint_rows_bl(model: Model, qpos_bl, qvel_bl) -> Dict:
    """Joint rows only (equality/friction/limits), batch-last."""
    dtype = qpos_bl.dtype
    nv = model.nv
    B = qpos_bl.shape[-1]
    c1_l, c2_l, dof1_l, dof2_l = [], [], [], []
    aref_l, R_l, fl_l, act_l, kind_l = [], [], [], [], []
    one = jnp.ones((B,), dtype)
    zero = jnp.zeros((B,), dtype)

    for e, (d1, d2) in enumerate(model.eq_dof_pairs):
        q1adr = _dof_to_qposadr(model, d1)
        q2adr = _dof_to_qposadr(model, d2)
        q1 = qpos_bl[q1adr] - model.qpos0[q1adr]
        q2 = qpos_bl[q2adr] - model.qpos0[q2adr]
        coef = model.eq_polycoef[e]
        poly = (coef[0] + coef[1] * q2 + coef[2] * q2**2 + coef[3] * q2**3
                + coef[4] * q2**4)
        dpoly = (coef[1] + 2 * coef[2] * q2 + 3 * coef[3] * q2**2
                 + 4 * coef[4] * q2**3)
        pos = q1 - poly
        vel = qvel_bl[d1] - dpoly * qvel_bl[d2]
        aref, d = _kbi_bl(model.eq_solref[e], model.eq_solimp[e], pos, vel)
        diag = model.dof_invweight0[d1] + model.dof_invweight0[d2]
        dof1_l.append(d1); dof2_l.append(d2)
        c1_l.append(one); c2_l.append(-dpoly)
        aref_l.append(aref)
        R_l.append(jnp.maximum((1.0 - d) / d * diag, 1e-10) * one)
        fl_l.append(zero); act_l.append(one); kind_l.append(EQ)

    default_solref = jnp.asarray([0.02, 1.0], dtype)
    default_solimp = jnp.asarray([0.9, 0.95, 0.001, 0.5, 2.0], dtype)
    for d1 in model.friction_dofs:
        aref, d = _kbi_bl(default_solref, default_solimp,
                          jnp.zeros((), dtype), qvel_bl[d1])
        dof1_l.append(d1); dof2_l.append(0)
        c1_l.append(one); c2_l.append(zero)
        aref_l.append(aref)
        R_l.append(jnp.maximum(
            (1.0 - d) / d * model.dof_invweight0[d1], 1e-10) * one)
        fl_l.append(model.dof_frictionloss[d1] * one); act_l.append(one)
        kind_l.append(FRICTION)

    for d1 in model.limited_dofs:
        jid = model.dof_jnt[d1]
        qadr = _dof_to_qposadr(model, d1)
        solref = model.jnt_solref_limit[jid]
        solimp = model.jnt_solimp_limit[jid]
        for side in (0, 1):
            if side == 0:
                dist = qpos_bl[qadr] - model.jnt_range[jid, 0]
                coef = one
            else:
                dist = model.jnt_range[jid, 1] - qpos_bl[qadr]
                coef = -one
            aref, d = _kbi_bl(solref, solimp, jnp.minimum(dist, 0.0),
                              coef * qvel_bl[d1])
            dof1_l.append(d1); dof2_l.append(0)
            c1_l.append(coef); c2_l.append(zero)
            aref_l.append(aref)
            R_l.append(jnp.maximum(
                (1.0 - d) / d * model.dof_invweight0[d1], 1e-10)
                * jnp.ones_like(dist))
            fl_l.append(zero); act_l.append((dist < 0).astype(dtype))
            kind_l.append(CONE)

    nj = len(dof1_l)
    c1 = jnp.stack(c1_l)
    c2 = jnp.stack(c2_l)
    P1 = np.zeros((nj, nv), np.float32)
    P2 = np.zeros((nj, nv), np.float32)
    P1[np.arange(nj), np.asarray(dof1_l)] = 1.0
    P2[np.arange(nj), np.asarray(dof2_l)] = 1.0
    Gt = (jnp.asarray(P1, dtype).T[:, :, None] * c1[None]
          + jnp.asarray(P2, dtype).T[:, :, None] * c2[None])   # (nv, nj, B)
    return dict(Gt=Gt, j_aref=jnp.stack(aref_l), j_R=jnp.stack(R_l),
                j_floss=jnp.stack(fl_l), j_active=jnp.stack(act_l),
                j_kind=np.asarray(kind_l, np.int32))
