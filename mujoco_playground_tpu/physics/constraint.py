"""Constraint assembly: MuJoCo-compatible efc rows in structured form.

Instead of a dense (nefc x nv) Jacobian, rows are stored by structure — the
TPU-first choice: dense J at 4096 envs means hundreds of MB of padded HBM
traffic per step, while the structured form is a few (C x nv) vectors plus
scalar gathers.

* Joint rows (equality / dof-friction / joint-limit) have 1-2 nonzeros:
  J = coef1 * e_dof1 + coef2 * e_dof2.  Matvecs become gathers/scatters.
* Contact rows come in pyramid quadruples sharing one geometry: row =
  Jn +- mu * Jt; only (Jn, Jt1, Jt2) are materialized and the solver expands
  combinations analytically.

All constants were verified numerically against MuJoCo 3.10 efc dumps on the
reference robot (impedance spline; aref = -b*Jv - K*pos with b = 2/(dmax*tc),
K = d(r)/(dmax^2 tc^2 zeta^2); R = (1-d)/d * diagApprox; pyramidal
diagApprox = (iw1+iw2) * 2 mu^2 (1+mu^2); pyramid row order
[n+mu t1, n-mu t1, n+mu t2, n-mu t2]).  Inactive rows (separated contacts,
un-violated limits) are masked, not removed — static shapes for XLA.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import struct

from mujoco_playground_tpu.physics.collision import Contacts
from mujoco_playground_tpu.physics.model import Model

# Row kinds (static codes).
EQ = 0        # two-sided quadratic
FRICTION = 1  # box-bounded (dry friction)
CONE = 2      # one-sided (limits; contact rows are implicitly CONE)


@struct.dataclass
class Efc:
    """Structured constraint rows for one env."""

    # --- joint rows (static count) ---
    j_dof1: Any = struct.field(pytree_node=False)  # static (nj,) int array
    j_dof2: Any = struct.field(pytree_node=False)  # static (nj,) ints
    j_coef1: Any     # (nj,)
    j_coef2: Any     # (nj,) 0 where unused
    j_aref: Any      # (nj,)
    j_R: Any         # (nj,)
    j_floss: Any     # (nj,)
    j_active: Any    # (nj,)
    j_kind: Any = struct.field(pytree_node=False)  # static (nj,) kind codes
    # --- contact rows (4 per contact slot) ---
    c_Jn: Any        # (C, nv)
    c_Jt1: Any       # (C, nv)
    c_Jt2: Any       # (C, nv)
    c_aref: Any      # (C, 4) per pyramid row
    c_R: Any         # (C,) shared across the 4 rows
    c_mu: Any        # (C,)
    c_active: Any    # (C,)


def impedance(solimp, r):
    """MuJoCo impedance spline d(r): solimp = [d0, dmax, width, mid, power]."""
    d0, dmax, width, mid, power = (solimp[..., 0], solimp[..., 1],
                                   solimp[..., 2], solimp[..., 3],
                                   solimp[..., 4])
    x = jnp.clip(jnp.abs(r) / jnp.maximum(width, 1e-12), 0.0, 1.0)
    a = 1.0 / jnp.power(mid, power - 1.0)
    b = 1.0 / jnp.power(1.0 - mid, power - 1.0)
    y = jnp.where(x <= mid, a * jnp.power(x, power),
                  1.0 - b * jnp.power(1.0 - x, power))
    return d0 + y * (dmax - d0)


def kbi(solref, solimp, pos, vel):
    """(aref, d) for a row: reference acceleration + impedance."""
    d = impedance(solimp, pos)
    dmax = solimp[..., 1]
    tc, zeta = solref[..., 0], solref[..., 1]
    b = 2.0 / (dmax * tc)
    k = d / (dmax * dmax * tc * tc * zeta * zeta)
    return -b * vel - k * pos, d


def make_efc(model: Model, qpos, qvel, S, mask, anchor,
             contacts: Contacts) -> Efc:
    dtype = qpos.dtype
    nv = model.nv
    dof1_l, dof2_l, c1_l, c2_l = [], [], [], []
    aref_l, R_l, fl_l, act_l, kind_l = [], [], [], [], []
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)

    # --- equality: joint couplings q1 = poly(q2) ----------------------------
    for e, (d1, d2) in enumerate(model.eq_dof_pairs):
        q1adr = _dof_to_qposadr(model, d1)
        q2adr = _dof_to_qposadr(model, d2)
        q2 = qpos[q2adr] - model.qpos0[q2adr]
        coef = model.eq_polycoef[e]
        poly = (coef[0] + coef[1] * q2 + coef[2] * q2**2 + coef[3] * q2**3
                + coef[4] * q2**4)
        dpoly = (coef[1] + 2 * coef[2] * q2 + 3 * coef[3] * q2**2
                 + 4 * coef[4] * q2**3)
        pos = (qpos[q1adr] - model.qpos0[q1adr]) - poly
        vel = qvel[d1] - dpoly * qvel[d2]
        aref, d = kbi(model.eq_solref[e], model.eq_solimp[e], pos, vel)
        diag = model.dof_invweight0[d1] + model.dof_invweight0[d2]
        dof1_l.append(d1); dof2_l.append(d2)
        c1_l.append(one); c2_l.append(-dpoly)
        aref_l.append(aref)
        R_l.append(jnp.maximum((1.0 - d) / d * diag, 1e-10))
        fl_l.append(zero); act_l.append(one); kind_l.append(EQ)

    # --- dof friction loss --------------------------------------------------
    default_solref = jnp.asarray([0.02, 1.0], dtype)
    default_solimp = jnp.asarray([0.9, 0.95, 0.001, 0.5, 2.0], dtype)
    for d1 in model.friction_dofs:
        aref, d = kbi(default_solref, default_solimp, zero, qvel[d1])
        dof1_l.append(d1); dof2_l.append(0)
        c1_l.append(one); c2_l.append(zero)
        aref_l.append(aref)
        R_l.append(jnp.maximum((1.0 - d) / d * model.dof_invweight0[d1], 1e-10))
        fl_l.append(model.dof_frictionloss[d1]); act_l.append(one)
        kind_l.append(FRICTION)

    # --- joint limits (lower, upper per limited dof) ------------------------
    for d1 in model.limited_dofs:
        jid = model.dof_jnt[d1]
        qadr = _dof_to_qposadr(model, d1)
        solref = model.jnt_solref_limit[jid]
        solimp = model.jnt_solimp_limit[jid]
        for side in (0, 1):
            if side == 0:
                dist = qpos[qadr] - model.jnt_range[jid, 0]
                coef = one
            else:
                dist = model.jnt_range[jid, 1] - qpos[qadr]
                coef = -one
            aref, d = kbi(solref, solimp, jnp.minimum(dist, 0.0),
                          coef * qvel[d1])
            dof1_l.append(d1); dof2_l.append(0)
            c1_l.append(coef); c2_l.append(zero)
            aref_l.append(aref)
            R_l.append(jnp.maximum(
                (1.0 - d) / d * model.dof_invweight0[d1], 1e-10))
            fl_l.append(zero); act_l.append((dist < 0).astype(dtype))
            kind_l.append(CONE)

    # --- contacts -----------------------------------------------------------
    C = contacts.dist.shape[0]
    from mujoco_playground_tpu.physics import kinematics
    body_mask = jnp.asarray(np.asarray(kinematics.ancestor_mask(model)),
                            dtype)[contacts.body]          # (C, nv)
    # translational point Jacobian: v(p) = S_lin + S_ang x (p - anchor)
    Jp = (S[None, :, 3:] + jnp.cross(
        jnp.broadcast_to(S[None, :, :3], (C, nv, 3)),
        (contacts.pos[:, None, :] - anchor))) * body_mask[:, :, None]
    Jn = jnp.sum(Jp * contacts.frame[:, 0][:, None, :], axis=-1)
    Jt1 = jnp.sum(Jp * contacts.frame[:, 1][:, None, :], axis=-1)
    Jt2 = jnp.sum(Jp * contacts.frame[:, 2][:, None, :], axis=-1)
    mu_ = contacts.friction
    act = (contacts.dist < 0).astype(dtype)
    d_imp = impedance(contacts.solimp, contacts.dist)
    dmax = contacts.solimp[:, 1]
    tc, zeta = contacts.solref[:, 0], contacts.solref[:, 1]
    bcoef = 2.0 / (dmax * tc)
    kcoef = d_imp / (dmax * dmax * tc * tc * zeta * zeta)
    diag = jnp.maximum(
        contacts.diag_approx * 2.0 * mu_**2 * (1.0 + mu_**2), 1e-12)
    Rrow = jnp.maximum((1.0 - d_imp) / d_imp * diag, 1e-10)
    vn = jnp.sum(Jn * qvel, axis=-1)
    vt1 = jnp.sum(Jt1 * qvel, axis=-1)
    vt2 = jnp.sum(Jt2 * qvel, axis=-1)
    vel4 = jnp.stack([vn + mu_ * vt1, vn - mu_ * vt1,
                      vn + mu_ * vt2, vn - mu_ * vt2], axis=-1)
    aref4 = -bcoef[:, None] * vel4 - (kcoef * contacts.dist)[:, None]

    def stk(xs):
        # models with no equality/friction/limit rows (e.g. a bare free
        # body) produce zero joint rows
        return jnp.stack(xs) if xs else jnp.zeros((0,), dtype)

    return Efc(
        j_dof1=np.asarray(dof1_l, np.int32),
        j_dof2=np.asarray(dof2_l, np.int32),
        j_coef1=stk(c1_l), j_coef2=stk(c2_l),
        j_aref=stk(aref_l), j_R=stk(R_l),
        j_floss=stk(fl_l), j_active=stk(act_l),
        j_kind=np.asarray(kind_l, np.int32),
        c_Jn=Jn, c_Jt1=Jt1, c_Jt2=Jt2, c_aref=aref4, c_R=Rrow, c_mu=mu_,
        c_active=act)


def _dof_to_qposadr(model: Model, dof: int) -> int:
    jid = model.dof_jnt[dof]
    return model.jnt_qposadr[jid] + (dof - model.jnt_dofadr[jid])
