"""Batch-last Newton constraint solver — the TPU hot loop.

Same mathematics as :mod:`solver` (MuJoCo's convex soft-constraint objective,
Newton with piecewise-quadratic line search), but written for an explicit env
batch living in the LAST axis of every array: (rows..., B) with B = thousands
of envs filling TPU lanes exactly.  The per-env formulation under ``vmap``
puts tiny (C, 3, 12)-shaped minors in the tiled dims and pads them to
(8, 128) tiles — ~14x wasted bandwidth/compute, measured as the dominant cost
of the physics step.  Batch-last removes all of it: every elementwise op and
reduction runs over a fully-packed lane dimension.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_playground_tpu.physics import linalg_small
from mujoco_playground_tpu.physics.constraint import CONE, EQ, FRICTION, Efc


def _transpose_efc(efc: Efc, nv: int):
    """Batch-first Efc (leaves (B, ...)) -> batch-last arrays."""
    jt = lambda x: jnp.moveaxis(x, 0, -1)
    # joint rows: build dense G (B, nj, nv) -> (nj, nv, B)
    nj = efc.j_coef1.shape[-1]
    P1 = np.zeros((nj, nv), np.float32)
    P2 = np.zeros((nj, nv), np.float32)
    P1[np.arange(nj), np.asarray(efc.j_dof1)] = 1.0
    P2[np.arange(nj), np.asarray(efc.j_dof2)] = 1.0
    dtype = efc.j_coef1.dtype
    P1 = jnp.asarray(P1, dtype)
    P2 = jnp.asarray(P2, dtype)
    G = (jt(efc.j_coef1)[:, None, :] * P1[:, :, None]
         + jt(efc.j_coef2)[:, None, :] * P2[:, :, None])   # (nj, nv, B)
    Jn = jnp.moveaxis(efc.c_Jn, 0, -1)                     # (C, nv, B)
    Jt1 = jnp.moveaxis(efc.c_Jt1, 0, -1)
    Jt2 = jnp.moveaxis(efc.c_Jt2, 0, -1)
    return dict(
        G=G, j_aref=jt(efc.j_aref), j_R=jt(efc.j_R),
        j_floss=jt(efc.j_floss), j_active=jt(efc.j_active),
        Jn=Jn, Jt1=Jt1, Jt2=Jt2,
        c_aref=jnp.moveaxis(efc.c_aref, 0, -1),            # (C, 4, B)
        c_R=jt(efc.c_R), c_mu=jt(efc.c_mu), c_active=jt(efc.c_active))


def solve_batched(model, M, qacc_smooth, efc: Efc,
                  iterations=None, ls_iterations=None,
                  use_pallas: bool = None, warmstart=None) -> Tuple:
    """Batched Newton solve.

    Args: M (B, nv, nv); qacc_smooth (B, nv); efc with (B, ...) leaves.
    Returns (qacc (B, nv), (fj (B, nj), f4 (B, C, 4), qfrc_constraint)).

    ``use_pallas``: run the Newton loop as one fused Pallas kernel (the TPU
    fast path; defaults to True on TPU backends, False on CPU).
    ``warmstart``: optional (B, nv) Newton initial point (previous step's
    qacc, MuJoCo's qacc_warmstart semantics).
    """
    iterations = iterations or model.solver_iterations
    ls_iterations = ls_iterations or model.ls_iterations
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform != "cpu"
    if use_pallas and qacc_smooth.shape[0] % 256 == 0:
        return _solve_pallas(model, M, qacc_smooth, efc, iterations,
                             ls_iterations, warmstart=warmstart)
    dtype = qacc_smooth.dtype
    nv = qacc_smooth.shape[-1]
    kind = np.asarray(efc.j_kind)
    is_eq = jnp.asarray(kind == EQ)[:, None]
    is_fric = jnp.asarray(kind == FRICTION)[:, None]

    e = _transpose_efc(efc, nv)
    Mt = jnp.moveaxis(M, 0, -1)                            # (nv, nv, B)
    a_s = qacc_smooth.T                                    # (nv, B)
    G, Jn, Jt1, Jt2 = e["G"], e["Jn"], e["Jt1"], e["Jt2"]
    jR, jfl, jact = e["j_R"], e["j_floss"], e["j_active"]
    cR, mu_, cact = e["c_R"], e["c_mu"], e["c_active"]
    jRinv = 1.0 / jR
    cRinv = 1.0 / cR
    eye = jnp.eye(nv, dtype=dtype)[:, :, None]

    def mv(Mat, v):
        # (r, nv, B) x (nv, B) -> (r, B)
        return jnp.sum(Mat * v[None, :, :], axis=1)

    def joint_forces(xj):
        raw = -xj * jRinv
        f = jnp.where(is_eq, raw,
                      jnp.where(is_fric, jnp.clip(raw, -jfl, jfl),
                                jnp.maximum(raw, 0.0))) * jact
        quad = jnp.where(is_eq, 1.0,
                         jnp.where(is_fric, (jnp.abs(raw) < jfl).astype(dtype),
                                   (xj < 0).astype(dtype))) * jact
        return f, quad

    def contact_forces(x4):
        raw = -x4 * cRinv[:, None, :]
        f = jnp.maximum(raw, 0.0) * cact[:, None, :]
        quad = (x4 < 0).astype(dtype) * cact[:, None, :]
        return f, quad

    def pyr4(an, at1, at2):
        # (C, B) each -> (C, 4, B)
        return jnp.stack([an + mu_ * at1, an - mu_ * at1,
                          an + mu_ * at2, an - mu_ * at2], axis=1)

    def row_values(a):
        xj = mv(G, a) - e["j_aref"]
        an, at1, at2 = mv(Jn, a), mv(Jt1, a), mv(Jt2, a)
        x4 = pyr4(an, at1, at2) - e["c_aref"]
        return xj, x4

    def jt_f(fj, f4):
        fn = f4.sum(axis=1)                                # (C, B)
        ft1 = mu_ * (f4[:, 0] - f4[:, 1])
        ft2 = mu_ * (f4[:, 2] - f4[:, 3])
        out = jnp.sum(G * fj[:, None, :], axis=0)
        out = out + jnp.sum(Jn * fn[:, None, :], axis=0)
        out = out + jnp.sum(Jt1 * ft1[:, None, :], axis=0)
        out = out + jnp.sum(Jt2 * ft2[:, None, :], axis=0)
        return out                                         # (nv, B)

    def Mtv(v):
        return jnp.sum(Mt * v[None, :, :], axis=1)

    def newton_iter(a, _):
        xj, x4 = row_values(a)
        fj, quadj = joint_forces(xj)
        f4, quad4 = contact_forces(x4)
        grad = Mtv(a - a_s) - jt_f(fj, f4)

        wj = quadj * jRinv                                  # (nj, B)
        w4 = quad4 * cRinv[:, None, :]                      # (C, 4, B)
        w01 = w4[:, 0] + w4[:, 1]
        w23 = w4[:, 2] + w4[:, 3]
        W00 = w01 + w23
        W01 = mu_ * (w4[:, 0] - w4[:, 1])
        W02 = mu_ * (w4[:, 2] - w4[:, 3])
        W11 = mu_ * mu_ * w01
        W22 = mu_ * mu_ * w23
        # H = M + G^T wj G + sum_c B^T W B   (outer products, batch-last)
        Gw = G * wj[:, None, :]
        U1 = W00[:, None, :] * Jn + W01[:, None, :] * Jt1 + W02[:, None, :] * Jt2
        U2 = W01[:, None, :] * Jn + W11[:, None, :] * Jt1
        U3 = W02[:, None, :] * Jn + W22[:, None, :] * Jt2
        H = (Mt + 1e-9 * eye
             + jnp.einsum('jvB,jwB->vwB', Gw, G)
             + jnp.einsum('cvB,cwB->vwB', Jn, U1)
             + jnp.einsum('cvB,cwB->vwB', Jt1, U2)
             + jnp.einsum('cvB,cwB->vwB', Jt2, U3))

        L = linalg_small.cholesky_bl(H)
        delta = -linalg_small.cho_solve_bl(L, grad)         # (nv, B)

        jdj = mv(G, delta)
        dn, dt1, dt2 = mv(Jn, delta), mv(Jt1, delta), mv(Jt2, delta)
        jd4 = pyr4(dn, dt1, dt2)
        Md = Mtv(delta)
        dMd = jnp.sum(delta * Md, axis=0)                   # (B,)
        dM_as = jnp.sum(delta * Mtv(a - a_s), axis=0)
        alpha = jnp.ones_like(dMd)
        for _unused in range(ls_iterations):
            fj_a, quadj_a = joint_forces(xj + alpha[None, :] * jdj)
            f4_a, quad4_a = contact_forces(x4 + alpha[None, None, :] * jd4)
            dphi = (dM_as + alpha * dMd - jnp.sum(jdj * fj_a, axis=0)
                    - jnp.sum(jd4 * f4_a, axis=(0, 1)))
            ddphi = (dMd + jnp.sum(quadj_a * jRinv * jdj * jdj, axis=0)
                     + jnp.sum(quad4_a * cRinv[:, None, :] * jd4 * jd4,
                               axis=(0, 1)))
            alpha = jnp.clip(alpha - dphi / jnp.maximum(ddphi, 1e-12),
                             0.0, 2.0)
        return a + alpha[None, :] * delta, None

    def primal_cost(a):
        """Per-env primal objective Phi(a) -> (B,) (mj_warmstart compare)."""
        xj, x4 = row_values(a)
        quad_j = 0.5 * xj * xj * jRinv
        lin_j = jfl * jnp.abs(xj) - 0.5 * jfl * jfl * jR
        cost_j = jnp.where(
            is_eq, quad_j,
            jnp.where(is_fric,
                      jnp.where(jnp.abs(xj) * jRinv < jfl, quad_j, lin_j),
                      jnp.where(xj < 0, quad_j, 0.0)))
        cc = jnp.where(x4 < 0, 0.5 * x4 * x4 * cRinv[:, None, :], 0.0)
        da = a - a_s
        return (0.5 * jnp.sum(da * Mtv(da), axis=0)
                + jnp.sum(cost_j * jact, axis=0)
                + jnp.sum(cc * cact[:, None, :], axis=(0, 1)))

    if warmstart is None:
        a0 = a_s
    else:
        # mj_warmstart: per-env pick of the cheaper start (previous qacc vs
        # qacc_smooth); see solver.solve
        ws = warmstart.T
        a0 = jnp.where(primal_cost(ws) < primal_cost(a_s), ws, a_s)
    a, _ = jax.lax.scan(newton_iter, a0, None, length=iterations)
    xj, x4 = row_values(a)
    fj, _ = joint_forces(xj)
    f4, _ = contact_forces(x4)
    qfrc_constraint = jt_f(fj, f4).T                        # (B, nv)
    return a.T, (jnp.moveaxis(fj, -1, 0), jnp.moveaxis(f4, -1, 0),
                 qfrc_constraint)


def _solve_pallas(model, M, qacc_smooth, efc: Efc, iterations,
                  ls_iterations, warmstart=None):
    """Fused-kernel path: Newton loop in VMEM (ops/newton_pallas.py)."""
    from mujoco_playground_tpu.ops import newton_pallas

    nv = qacc_smooth.shape[-1]
    e = _transpose_efc(efc, nv)
    Mt = jnp.moveaxis(M, 0, -1)
    a = newton_pallas.newton_solve_pallas(
        Mt, qacc_smooth.T, e["G"], e["j_aref"], e["j_R"], e["j_floss"],
        e["j_active"], efc.j_kind, e["Jn"], e["Jt1"], e["Jt2"], e["c_aref"],
        e["c_R"], e["c_mu"], e["c_active"], iterations, ls_iterations,
        warmstart=None if warmstart is None else warmstart.T)

    # Final forces (diagnostics / qfrc_constraint), one cheap XLA pass.
    kind = np.asarray(efc.j_kind)
    is_eq = jnp.asarray(kind == EQ)[:, None]
    is_fric = jnp.asarray(kind == FRICTION)[:, None]
    G, Jn, Jt1, Jt2 = e["G"], e["Jn"], e["Jt1"], e["Jt2"]
    mu_ = e["c_mu"]

    def mv(Mat, v):
        return jnp.sum(Mat * v[None, :, :], axis=1)

    xj = mv(G, a) - e["j_aref"]
    an, at1, at2 = mv(Jn, a), mv(Jt1, a), mv(Jt2, a)
    x4 = jnp.stack([an + mu_ * at1, an - mu_ * at1,
                    an + mu_ * at2, an - mu_ * at2], axis=1) - e["c_aref"]
    raw = -xj / e["j_R"]
    fj = jnp.where(is_eq, raw,
                   jnp.where(is_fric,
                             jnp.clip(raw, -e["j_floss"], e["j_floss"]),
                             jnp.maximum(raw, 0.0))) * e["j_active"]
    f4 = jnp.maximum(-x4 / e["c_R"][:, None, :], 0.0) * e["c_active"][:, None, :]
    fn = f4.sum(axis=1)
    ft1 = mu_ * (f4[:, 0] - f4[:, 1])
    ft2 = mu_ * (f4[:, 2] - f4[:, 3])
    qfrc = (jnp.sum(G * fj[:, None, :], axis=0)
            + jnp.sum(Jn * fn[:, None, :], axis=0)
            + jnp.sum(Jt1 * ft1[:, None, :], axis=0)
            + jnp.sum(Jt2 * ft2[:, None, :], axis=0)).T
    return a.T, (jnp.moveaxis(fj, -1, 0), jnp.moveaxis(f4, -1, 0), qfrc)
