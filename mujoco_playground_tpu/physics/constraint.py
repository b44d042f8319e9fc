"""Constraint assembly: MuJoCo-compatible efc rows with static shapes.

Row order mirrors MuJoCo: [equality | dof friction | joint limits | contact
pyramid].  Every formula below was verified numerically against MuJoCo 3.10
efc dumps on the reference robot (impedance spline, aref = -b*Jv - K*pos with
b = 2/(d_max*tc), K = d(r)/(d_max^2*tc^2*zeta^2), R = (1-d)/d * diagApprox,
pyramidal diagApprox = (iw1+iw2) * 2*mu^2*(1+mu^2), pyramid rows
[n+mu*t1, n-mu*t1, n+mu*t2, n-mu*t2]).

Inactive rows (separated contacts, un-violated limits) stay in the arrays but
are masked: their force and Hessian weight are zeroed in the solver.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import struct

from mujoco_playground_tpu.physics import kinematics
from mujoco_playground_tpu.physics.collision import Contacts
from mujoco_playground_tpu.physics.model import Model

# Row kinds (static codes).
EQ = 0       # two-sided quadratic
FRICTION = 1  # box-bounded (dry friction)
CONE = 2     # one-sided (limits + contact pyramid rows)


@struct.dataclass
class Efc:
    J: Any           # (nefc, nv)
    aref: Any        # (nefc,)
    R: Any           # (nefc,)
    floss: Any       # (nefc,) friction-loss bound (FRICTION rows)
    active: Any      # (nefc,) 0/1 gate (inactive padded rows -> 0)
    kind: Any        # (nefc,) static row kind codes (numpy)


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
    rows_J, rows_aref, rows_R, rows_fl, rows_act, rows_kind = (
        [], [], [], [], [], [])

    def add(J, aref, R, fl, act, kind):
        rows_J.append(J)
        rows_aref.append(aref)
        rows_R.append(R)
        rows_fl.append(fl)
        rows_act.append(act)
        rows_kind.append(kind)

    one = jnp.ones((), dtype)

    # --- equality: joint couplings q1 = poly(q2) ---------------------------
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
        J = jnp.zeros(nv, dtype).at[d1].set(1.0).at[d2].set(-dpoly)
        vel = J @ qvel
        aref, d = kbi(model.eq_solref[e], model.eq_solimp[e], pos, vel)
        diag = model.dof_invweight0[d1] + model.dof_invweight0[d2]
        R = jnp.maximum((1.0 - d) / d * diag, 1e-10)
        add(J, aref, R, jnp.zeros((), dtype), one, EQ)

    # --- dof friction loss --------------------------------------------------
    default_solref = jnp.asarray([0.02, 1.0], dtype)
    default_solimp = jnp.asarray([0.9, 0.95, 0.001, 0.5, 2.0], dtype)
    for d1 in model.friction_dofs:
        J = jnp.zeros(nv, dtype).at[d1].set(1.0)
        vel = qvel[d1]
        aref, d = kbi(default_solref, default_solimp,
                      jnp.zeros((), dtype), vel)
        R = jnp.maximum((1.0 - d) / d * model.dof_invweight0[d1], 1e-10)
        add(J, aref, R, model.dof_frictionloss[d1], one, FRICTION)

    # --- joint limits (lower, upper per limited dof) ------------------------
    for d1 in model.limited_dofs:
        jid = model.dof_jnt[d1]
        qadr = _dof_to_qposadr(model, d1)
        lo, hi = model.jnt_range[jid, 0], model.jnt_range[jid, 1]
        solref = model.jnt_solref_limit[jid]
        solimp = model.jnt_solimp_limit[jid]
        for side in (0, 1):
            if side == 0:
                dist = qpos[qadr] - lo
                J = jnp.zeros(nv, dtype).at[d1].set(1.0)
            else:
                dist = hi - qpos[qadr]
                J = jnp.zeros(nv, dtype).at[d1].set(-1.0)
            act = (dist < 0).astype(dtype)
            vel = J @ qvel
            aref, d = kbi(solref, solimp, jnp.minimum(dist, 0.0), vel)
            R = jnp.maximum((1.0 - d) / d * model.dof_invweight0[d1], 1e-10)
            add(J, aref, R, jnp.zeros((), dtype), act, CONE)

    # --- contacts: 4 pyramid rows each --------------------------------------
    C = contacts.dist.shape[0]
    body_mask = jnp.asarray(np.asarray(kinematics.ancestor_mask(model)),
                            dtype)[contacts.body]          # (C, nv)
    # translational point Jacobian rows for each contact: (C, nv, 3)
    Jp = (S[None, :, 3:] + jnp.cross(
        jnp.broadcast_to(S[None, :, :3], (C, nv, 3)),
        (contacts.pos[:, None, :] - anchor))) * body_mask[:, :, None]
    n = contacts.frame[:, 0]
    t1 = contacts.frame[:, 1]
    t2 = contacts.frame[:, 2]
    Jn = jnp.einsum('cvk,ck->cv', Jp, n)
    Jt1 = jnp.einsum('cvk,ck->cv', Jp, t1)
    Jt2 = jnp.einsum('cvk,ck->cv', Jp, t2)
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
    m1 = mu_[:, None]
    # MuJoCo pyramid order per contact: [n+mu t1, n-mu t1, n+mu t2, n-mu t2]
    Jpyr = jnp.stack([Jn + m1 * Jt1, Jn - m1 * Jt1,
                      Jn + m1 * Jt2, Jn - m1 * Jt2], axis=1)  # (C, 4, nv)
    vel = jnp.einsum('crv,v->cr', Jpyr, qvel)
    aref_pyr = -bcoef[:, None] * vel - (kcoef * contacts.dist)[:, None]

    zero = jnp.zeros((), dtype)
    J = jnp.concatenate([jnp.stack(rows_J), Jpyr.reshape(-1, nv)])
    aref = jnp.concatenate([jnp.stack(rows_aref), aref_pyr.reshape(-1)])
    R = jnp.concatenate([jnp.stack(rows_R),
                         jnp.broadcast_to(Rrow[:, None], (C, 4)).reshape(-1)])
    floss = jnp.concatenate([jnp.stack(rows_fl), jnp.zeros(4 * C, dtype)])
    active = jnp.concatenate([jnp.stack(rows_act),
                              jnp.broadcast_to(act[:, None], (C, 4)).reshape(-1)])
    kind = np.concatenate([np.asarray(rows_kind, dtype=np.int32),
                           np.full(4 * C, CONE, dtype=np.int32)])
    return Efc(J=J, aref=aref, R=R, floss=floss, active=active, kind=kind)


def _dof_to_qposadr(model: Model, dof: int) -> int:
    jid = model.dof_jnt[dof]
    return model.jnt_qposadr[jid] + (dof - model.jnt_dofadr[jid])
