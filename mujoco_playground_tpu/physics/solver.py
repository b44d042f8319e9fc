"""Constraint solver: dense Newton in acceleration space, structured rows.

Minimizes MuJoCo's convex soft-constraint objective

    Phi(a) = 1/2 (a - a_smooth)^T M (a - a_smooth) + sum_i s_i(J_i a - aref_i)

with per-row piecewise-quadratic costs s_i: two-sided quadratic (equality),
Huber (dof friction), one-sided quadratic (limits + contact pyramid).
MuJoCo's Newton solver optimizes the same objective; both converge to the
same qacc (the parity tests pin this).

TPU shape discipline: no dense (nefc x nv) Jacobian and *no scatters* (TPU
scatters serialize).  Joint rows (1-2 nonzeros each) are packed into a tiny
dense G = coef1*onehot(dof1) + coef2*onehot(dof2) of shape (nj, nv), so
x = G a, J^T f = G^T f, and the Hessian contribution is G^T diag(w) G — all
matmuls.  Contacts contribute three (nv,) vectors each; their pyramid
combinations are expanded analytically via a per-contact 3x3 weight matrix:
H += B^T W B with B = [Jn; Jt1; Jt2].  Fixed iteration counts, fused vector
ops, vmapped over envs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_playground_tpu.physics import linalg_small
from mujoco_playground_tpu.physics.constraint import CONE, EQ, FRICTION, Efc


def _joint_G(efc: Efc, nv, dtype):
    """(nj, nv) dense joint-row Jacobian from the structured coefficients."""
    nj = efc.j_coef1.shape[0]
    P1 = np.zeros((nj, nv), np.float32)
    P2 = np.zeros((nj, nv), np.float32)
    P1[np.arange(nj), np.asarray(efc.j_dof1)] = 1.0
    P2[np.arange(nj), np.asarray(efc.j_dof2)] = 1.0
    P1 = jnp.asarray(P1, dtype)
    P2 = jnp.asarray(P2, dtype)
    return efc.j_coef1[:, None] * P1 + efc.j_coef2[:, None] * P2


def _joint_forces(efc: Efc, x, masks):
    is_eq, is_fric = masks
    raw = -x / efc.j_R
    f = jnp.where(is_eq, raw,
                  jnp.where(is_fric, jnp.clip(raw, -efc.j_floss, efc.j_floss),
                            jnp.maximum(raw, 0.0)))
    f = f * efc.j_active
    quad = jnp.where(is_eq, 1.0,
                     jnp.where(is_fric,
                               (jnp.abs(raw) < efc.j_floss).astype(x.dtype),
                               (x < 0).astype(x.dtype)))
    return f, quad * efc.j_active


def _contact_forces(efc: Efc, x4):
    """x4: (C, 4) pyramid-row values. Returns (f4, quad4)."""
    raw = -x4 / efc.c_R[:, None]
    f = jnp.maximum(raw, 0.0) * efc.c_active[:, None]
    quad = (x4 < 0).astype(x4.dtype) * efc.c_active[:, None]
    return f, quad


def _pyr4(efc: Efc, an, at1, at2):
    mu_ = efc.c_mu
    return jnp.stack([an + mu_ * at1, an - mu_ * at1,
                      an + mu_ * at2, an - mu_ * at2], axis=-1)


def solve(model, M, qacc_smooth, efc: Efc, iterations=None,
          ls_iterations=None, warmstart=None):
    """Newton solve -> (qacc, (joint_forces, contact_forces4)).

    ``warmstart``: optional (nv,) initial point (the previous step's qacc,
    MuJoCo's qacc_warmstart semantics).  The objective stays anchored at
    ``qacc_smooth``; only the iteration start moves.
    """
    iterations = iterations or model.solver_iterations
    ls_iterations = ls_iterations or model.ls_iterations
    dtype = qacc_smooth.dtype
    nv = qacc_smooth.shape[-1]
    kind = np.asarray(efc.j_kind)
    masks = (jnp.asarray(kind == EQ), jnp.asarray(kind == FRICTION))
    G = _joint_G(efc, nv, dtype)
    jRinv = 1.0 / efc.j_R
    cRinv = 1.0 / efc.c_R
    mu_ = efc.c_mu
    B = jnp.stack([efc.c_Jn, efc.c_Jt1, efc.c_Jt2], axis=1)  # (C, 3, nv)
    C3 = B.shape[0] * 3
    Bflat = B.reshape(C3, nv)
    eye_reg = 1e-9 * jnp.eye(nv, dtype=dtype)

    def row_values(a):
        xj = G @ a - efc.j_aref
        av = B @ a                                           # (C, 3)
        x4 = _pyr4(efc, av[:, 0], av[:, 1], av[:, 2]) - efc.c_aref
        return xj, x4

    def jt_f(fj, f4):
        fn = f4.sum(axis=-1)
        ft1 = mu_ * (f4[:, 0] - f4[:, 1])
        ft2 = mu_ * (f4[:, 2] - f4[:, 3])
        fB = jnp.stack([fn, ft1, ft2], axis=-1)              # (C, 3)
        return G.T @ fj + fB.reshape(-1) @ Bflat

    def newton_iter(a, _):
        xj, x4 = row_values(a)
        fj, quadj = _joint_forces(efc, xj, masks)
        f4, quad4 = _contact_forces(efc, x4)
        grad = M @ (a - qacc_smooth) - jt_f(fj, f4)

        # Hessian: M + G^T diag(wj) G + sum_c B^T W B
        wj = quadj * jRinv
        H = M + eye_reg + (G * wj[:, None]).T @ G
        w4 = quad4 * cRinv[:, None]                          # (C, 4)
        w01 = w4[:, 0] + w4[:, 1]
        w23 = w4[:, 2] + w4[:, 3]
        W00 = w01 + w23
        W01 = mu_ * (w4[:, 0] - w4[:, 1])
        W02 = mu_ * (w4[:, 2] - w4[:, 3])
        W11 = mu_ * mu_ * w01
        W22 = mu_ * mu_ * w23
        zero = jnp.zeros_like(W00)
        W = jnp.stack([
            jnp.stack([W00, W01, W02], -1),
            jnp.stack([W01, W11, zero], -1),
            jnp.stack([W02, zero, W22], -1)], -2)            # (C, 3, 3)
        BW = W @ B                                           # (C, 3, nv)
        H = H + Bflat.T @ BW.reshape(C3, nv)

        L = linalg_small.cholesky_small(H)
        delta = -linalg_small.cho_solve_small(L, grad)

        # 1-D Newton line search on the piecewise-quadratic restriction.
        jdj = G @ delta
        dv = B @ delta
        jd4 = _pyr4(efc, dv[:, 0], dv[:, 1], dv[:, 2])
        dMd = delta @ (M @ delta)
        dM_as = delta @ (M @ (a - qacc_smooth))
        alpha = jnp.ones((), dtype)
        for _unused in range(ls_iterations):
            fj_a, quadj_a = _joint_forces(efc, xj + alpha * jdj, masks)
            f4_a, quad4_a = _contact_forces(efc, x4 + alpha * jd4)
            dphi = (dM_as + alpha * dMd - jnp.sum(jdj * fj_a)
                    - jnp.sum(jd4 * f4_a))
            ddphi = (dMd + jnp.sum(quadj_a * jRinv * jdj * jdj)
                     + jnp.sum(quad4_a * cRinv[:, None] * jd4 * jd4))
            alpha = jnp.clip(alpha - dphi / jnp.maximum(ddphi, 1e-12),
                             0.0, 2.0)
        return a + alpha * delta, None

    def primal_cost(a):
        """MuJoCo's primal objective Phi(a) (module docstring)."""
        xj, x4 = row_values(a)
        is_eq, is_fric = masks
        quad_j = 0.5 * xj * xj * jRinv
        lin_j = (efc.j_floss * jnp.abs(xj)
                 - 0.5 * efc.j_floss * efc.j_floss * efc.j_R)
        cost_j = jnp.where(
            is_eq, quad_j,
            jnp.where(is_fric,
                      jnp.where(jnp.abs(xj) * jRinv < efc.j_floss,
                                quad_j, lin_j),
                      jnp.where(xj < 0, quad_j, 0.0)))
        cc = jnp.where(x4 < 0, 0.5 * x4 * x4 * cRinv[:, None], 0.0)
        da = a - qacc_smooth
        return (0.5 * da @ (M @ da) + jnp.sum(cost_j * efc.j_active)
                + jnp.sum(cc * efc.c_active[:, None]))

    if warmstart is None:
        a0 = qacc_smooth
    else:
        # mj_warmstart: start from the cheaper of the previous solution and
        # qacc_smooth (a stale start after an impact can be worse than cold)
        a0 = jnp.where(primal_cost(warmstart) < primal_cost(qacc_smooth),
                       warmstart, qacc_smooth)
    a, _ = jax.lax.scan(newton_iter, a0, None, length=iterations)
    xj, x4 = row_values(a)
    fj, _ = _joint_forces(efc, xj, masks)
    f4, _ = _contact_forces(efc, x4)
    return a, (fj, f4)


def constraint_force(efc: Efc, forces, nv, dtype):
    fj, f4 = forces
    G = _joint_G(efc, nv, dtype)
    fn = f4.sum(axis=-1)
    ft1 = efc.c_mu * (f4[:, 0] - f4[:, 1])
    ft2 = efc.c_mu * (f4[:, 2] - f4[:, 3])
    B = jnp.stack([efc.c_Jn, efc.c_Jt1, efc.c_Jt2], axis=1)
    fB = jnp.stack([fn, ft1, ft2], axis=-1)
    return G.T @ fj + fB.reshape(-1) @ B.reshape(-1, nv)
