"""Constraint solver: dense Newton in acceleration space.

Minimizes MuJoCo's convex soft-constraint objective

    Phi(a) = 1/2 (a - a_smooth)^T M (a - a_smooth) + sum_i s_i(J_i a - aref_i)

with per-row piecewise-quadratic costs s_i: two-sided quadratic for equality,
Huber (bounded) for dof friction, one-sided quadratic for limits/contact
pyramid rows.  MuJoCo's Newton solver optimizes the same objective; both
converge to the same qacc, which is what the parity tests check.

TPU shape: a fixed number of Newton iterations, each a (nv x nv) Cholesky +
(nefc x nv) matvecs, followed by a fixed-iteration exact-ish line search on
the piecewise-quadratic 1-D restriction — straight-line code, batched over
envs by vmap, no data-dependent control flow.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_playground_tpu.physics.constraint import CONE, EQ, FRICTION, Efc


def _forces(efc: Efc, x, kinds):
    """Row forces f_i(x_i) = -s_i'(x_i) and quadratic-region weights."""
    is_eq, is_fric, is_cone = kinds
    raw = -x / efc.R
    f_eq = raw
    f_fric = jnp.clip(raw, -efc.floss, efc.floss)
    f_cone = jnp.maximum(raw, 0.0)
    f = jnp.where(is_eq, f_eq, jnp.where(is_fric, f_fric, f_cone))
    f = f * efc.active
    # quadratic region (nonzero Hessian weight)
    quad_fric = (jnp.abs(raw) < efc.floss).astype(x.dtype)
    quad_cone = (x < 0).astype(x.dtype)
    quad = jnp.where(is_eq, 1.0, jnp.where(is_fric, quad_fric, quad_cone))
    return f, quad * efc.active


def solve(model, M, qacc_smooth, efc: Efc, iterations=None, ls_iterations=None):
    """Newton solve -> (qacc, efc_force)."""
    iterations = iterations or model.solver_iterations
    ls_iterations = ls_iterations or model.ls_iterations
    dtype = qacc_smooth.dtype
    kind = np.asarray(efc.kind)
    kinds = (jnp.asarray(kind == EQ), jnp.asarray(kind == FRICTION),
             jnp.asarray(kind == CONE))
    Rinv = 1.0 / efc.R

    def newton_iter(a, _):
        x = efc.J @ a - efc.aref
        f, quad = _forces(efc, x, kinds)
        grad = M @ (a - qacc_smooth) - efc.J.T @ f
        w = quad * Rinv
        H = M + jnp.einsum('iv,i,iw->vw', efc.J, w, efc.J)
        L = jax.scipy.linalg.cho_factor(
            H + 1e-9 * jnp.eye(H.shape[0], dtype=dtype))
        delta = -jax.scipy.linalg.cho_solve(L, grad)

        # line search on the piecewise-quadratic restriction phi(alpha)
        Jd = efc.J @ delta
        dMd = delta @ M @ delta
        dM_as = delta @ M @ (a - qacc_smooth)

        def ls_iter(alpha, _):
            xa = x + alpha * Jd
            fa, quada = _forces(efc, xa, kinds)
            dphi = dM_as + alpha * dMd - Jd @ fa
            ddphi = dMd + jnp.sum(quada * Rinv * Jd * Jd)
            alpha = alpha - dphi / jnp.maximum(ddphi, 1e-12)
            return jnp.clip(alpha, 0.0, 2.0), None

        alpha, _ = jax.lax.scan(ls_iter, jnp.ones((), dtype), None,
                                length=ls_iterations)
        return a + alpha * delta, None

    a, _ = jax.lax.scan(newton_iter, qacc_smooth, None, length=iterations)
    x = efc.J @ a - efc.aref
    f, _ = _forces(efc, x, kinds)
    return a, f
