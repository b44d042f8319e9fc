"""Pallas TPU kernel: the Newton constraint solve as one fused program.

The XLA version of the solve (physics/solver_batched.py) is HBM-bound: every
Newton iteration re-streams the per-env constraint system (mass matrix,
joint-row G, contact basis vectors Jn/Jt1/Jt2, ~1.7 KB/env) from HBM through
dozens of small kernels.  This kernel loads one block of envs into VMEM once,
runs the *entire* fixed-iteration Newton loop (Hessian assembly, unrolled
12x12 Cholesky, piecewise-quadratic line search) on-chip, and writes back
only qacc — turning ~2 GB of HBM traffic per physics step into ~25 MB.

Layout discipline: batch-last, envs in lanes.  Arrays arrive as
(nv, rows, B) so that every slice the kernel takes is along the *leading*
(untiled) dimension — Mosaic requires zero sublane offsets on reduction
inputs, which leading-dim slices guarantee.  The nv=12 axis is unrolled in
Python; all runtime ops are (rows, B) VPU vectors.

Numerics are identical to solver_batched (same objective and iteration
counts) — parity-tested against it and transitively against MuJoCo.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_B = 256


def _cholesky_solve_lanes(H, g, n):
    """Solve H x = g; H is an n x n list-of-lists of (B,) lane vectors."""
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = [H[i][j] for i in range(n)]
        for k in range(j):
            ljk = L[j][k]
            for i in range(j, n):
                s[i] = s[i] - L[i][k] * ljk
        d = jax.lax.rsqrt(jnp.maximum(s[j], 1e-30))
        for i in range(j, n):
            L[i][j] = s[i] * d
    y = [None] * n
    for i in range(n):
        s = g[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def newton_body(nv, nj, nc, iterations, ls_iterations, is_eq, is_fric,
                Mt, a_s, Gt, j_aref, jRinv, j_floss, j_active,
                Jnt, Jt1t, Jt2t, c_aref, cRinv, mu, c_active):
    """The Newton loop on loaded VMEM values (reused by the fused step kernel).

    Shapes: Mt (nv, nv, B); a_s (nv, B); Gt (nv, nj, B); j_* (nj, B);
    Jnt/Jt1t/Jt2t (nv, nc, B); c_aref (4, nc, B); c-rows (nc, B).
    Returns the solution as a list of nv (B,) lane vectors.
    """
    def joint_forces(xj):
        # Static row kinds -> unrolled per row; ops on (B,) lane vectors.
        f_rows, q_rows = [], []
        for r in range(nj):
            raw = -xj[r] * jRinv[r]
            if is_eq[r]:
                f, q = raw, jnp.ones_like(raw)
            elif is_fric[r]:
                f = jnp.clip(raw, -j_floss[r], j_floss[r])
                q = (jnp.abs(raw) < j_floss[r]).astype(raw.dtype)
            else:
                f = jnp.maximum(raw, 0.0)
                q = (raw > 0).astype(raw.dtype)
            f_rows.append(f * j_active[r])
            q_rows.append(q * j_active[r])
        return jnp.stack(f_rows), jnp.stack(q_rows)

    def contact_forces4(x4):
        f4, q4 = [], []
        for k in range(4):
            raw = -x4[k] * cRinv
            f4.append(jnp.maximum(raw, 0.0) * c_active)
            q4.append((x4[k] < 0).astype(raw.dtype) * c_active)
        return f4, q4

    def rows_apply(Jt_arr, avec):
        """(nv, rows, B) applied to per-dof list avec -> (rows, B)."""
        acc = Jt_arr[0] * avec[0][None, :]
        for v in range(1, nv):
            acc = acc + Jt_arr[v] * avec[v][None, :]
        return acc

    def pyr4(an, at1, at2):
        return [an + mu * at1, an - mu * at1, an + mu * at2, an - mu * at2]

    def row_values(avec):
        xj = rows_apply(Gt, avec) - j_aref
        an = rows_apply(Jnt, avec)
        at1 = rows_apply(Jt1t, avec)
        at2 = rows_apply(Jt2t, avec)
        p = pyr4(an, at1, at2)
        return xj, [p[k] - c_aref[k] for k in range(4)]

    def jt_f(fj, f4):
        fn = f4[0] + f4[1] + f4[2] + f4[3]
        ft1 = mu * (f4[0] - f4[1])
        ft2 = mu * (f4[2] - f4[3])
        return [jnp.sum(Gt[v] * fj, axis=0) + jnp.sum(Jnt[v] * fn, axis=0)
                + jnp.sum(Jt1t[v] * ft1, axis=0)
                + jnp.sum(Jt2t[v] * ft2, axis=0) for v in range(nv)]

    def Mtv(dvec):
        # Mt[v] is a leading-dim slice (nv, B); dvec a list of (B,)
        return [sum(Mt[v][w] * dvec[w] for w in range(nv)) for v in range(nv)]

    avec = [a_s[v] for v in range(nv)]
    a_s_vec = list(avec)
    for _it in range(iterations):
        xj, x4 = row_values(avec)
        fj, quadj = joint_forces(xj)
        f4, quad4 = contact_forces4(x4)
        jtf = jt_f(fj, f4)
        diff = [avec[v] - a_s_vec[v] for v in range(nv)]
        Mdiff = Mtv(diff)
        grad = [Mdiff[v] - jtf[v] for v in range(nv)]

        wj = quadj * jRinv                       # (nj, B)
        w4 = [quad4[k] * cRinv for k in range(4)]
        w01 = w4[0] + w4[1]
        w23 = w4[2] + w4[3]
        W00 = w01 + w23
        W01 = mu * (w4[0] - w4[1])
        W02 = mu * (w4[2] - w4[3])
        W11 = mu * mu * w01
        W22 = mu * mu * w23
        U1 = [W00 * Jnt[v] + W01 * Jt1t[v] + W02 * Jt2t[v] for v in range(nv)]
        U2 = [W01 * Jnt[v] + W11 * Jt1t[v] for v in range(nv)]
        U3 = [W02 * Jnt[v] + W22 * Jt2t[v] for v in range(nv)]
        Gw = [Gt[v] * wj for v in range(nv)]
        H = [[None] * nv for _ in range(nv)]
        for v in range(nv):
            for w in range(v, nv):
                h = Mt[v][w] + jnp.sum(Gw[v] * Gt[w], axis=0)
                h = h + jnp.sum(Jnt[v] * U1[w], axis=0)
                h = h + jnp.sum(Jt1t[v] * U2[w], axis=0)
                h = h + jnp.sum(Jt2t[v] * U3[w], axis=0)
                if v == w:
                    h = h + 1e-9
                H[v][w] = h
                H[w][v] = h
        delta = _cholesky_solve_lanes(H, [-g for g in grad], nv)

        jdj = rows_apply(Gt, delta)
        jd4 = pyr4(rows_apply(Jnt, delta), rows_apply(Jt1t, delta),
                   rows_apply(Jt2t, delta))
        Md = Mtv(delta)
        dMd = sum(delta[v] * Md[v] for v in range(nv))
        dM_as = sum(delta[v] * Mdiff[v] for v in range(nv))
        alpha = jnp.ones_like(dMd)
        for _ls in range(ls_iterations):
            fj_a, quadj_a = joint_forces(xj + alpha[None, :] * jdj)
            x4_a = [x4[k] + alpha[None, :] * jd4[k] for k in range(4)]
            f4_a, quad4_a = contact_forces4(x4_a)
            dphi = dM_as + alpha * dMd - jnp.sum(jdj * fj_a, axis=0)
            ddphi = dMd + jnp.sum(quadj_a * jRinv * jdj * jdj, axis=0)
            for k in range(4):
                dphi = dphi - jnp.sum(jd4[k] * f4_a[k], axis=0)
                ddphi = ddphi + jnp.sum(quad4_a[k] * cRinv * jd4[k] * jd4[k],
                                        axis=0)
            alpha = jnp.clip(alpha - dphi / jnp.maximum(ddphi, 1e-12),
                             0.0, 2.0)
        avec = [avec[v] + alpha * delta[v] for v in range(nv)]

    return avec


def _newton_kernel(nv, nj, nc, iterations, ls_iterations, is_eq, is_fric,
                   Mt_ref, a_s_ref, Gt_ref, j_aref_ref, j_R_ref, j_floss_ref,
                   j_active_ref, Jnt_ref, Jt1t_ref, Jt2t_ref, c_aref_ref,
                   c_R_ref, c_mu_ref, c_active_ref, out_ref):
    avec = newton_body(
        nv, nj, nc, iterations, ls_iterations, is_eq, is_fric,
        Mt_ref[...], a_s_ref[...], Gt_ref[...], j_aref_ref[...],
        1.0 / j_R_ref[...], j_floss_ref[...], j_active_ref[...],
        Jnt_ref[...], Jt1t_ref[...], Jt2t_ref[...], c_aref_ref[...],
        1.0 / c_R_ref[...], c_mu_ref[...], c_active_ref[...])
    out_ref[...] = jnp.stack(avec)


def newton_solve_pallas(Mt, a_s, G, j_aref, j_R, j_floss, j_active, j_kind,
                        Jn, Jt1, Jt2, c_aref, c_R, c_mu, c_active,
                        iterations: int, ls_iterations: int,
                        block_b: int = BLOCK_B, interpret: bool = False,
                        pre_transposed: bool = False):
    """Batch-last Newton solve; B % block_b == 0. Returns qacc (nv, B).

    Inputs either row-major (G (nj,nv,B), Jn (nc,nv,B), c_aref (nc,4,B) — as
    produced by solver_batched._transpose_efc) or, with
    ``pre_transposed=True``, already in kernel layout (Gt (nv,nj,B),
    Jnt (nv,nc,B), c_aref (4,nc,B) — as produced by constraint_bl).
    """
    nv, B = a_s.shape
    from mujoco_playground_tpu.physics.constraint import EQ, FRICTION
    kind = np.asarray(j_kind)
    is_eq = tuple(bool(k == EQ) for k in kind)
    is_fric = tuple(bool(k == FRICTION) for k in kind)

    if pre_transposed:
        Gt, Jnt, Jt1t, Jt2t, c_aref4 = G, Jn, Jt1, Jt2, c_aref
        nj = Gt.shape[1]
        nc = Jnt.shape[1]
    else:
        nj = G.shape[0]
        nc = Jn.shape[0]
        # Re-layout so kernel slices are along the leading dim.
        Gt = jnp.moveaxis(G, 0, 1)          # (nv, nj, B)
        Jnt = jnp.moveaxis(Jn, 0, 1)        # (nv, nc, B)
        Jt1t = jnp.moveaxis(Jt1, 0, 1)
        Jt2t = jnp.moveaxis(Jt2, 0, 1)
        c_aref4 = jnp.moveaxis(c_aref, 1, 0)  # (4, nc, B)

    kernel = functools.partial(
        _newton_kernel, nv, nj, nc, iterations, ls_iterations, is_eq, is_fric)

    def spec(*row_dims):
        nrow = len(row_dims)
        return pl.BlockSpec(tuple(row_dims) + (block_b,),
                            lambda i, _n=nrow: (0,) * _n + (i,),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(B // block_b,),
        in_specs=[
            spec(nv, nv), spec(nv), spec(nv, nj), spec(nj), spec(nj),
            spec(nj), spec(nj), spec(nv, nc), spec(nv, nc), spec(nv, nc),
            spec(4, nc), spec(nc), spec(nc), spec(nc),
        ],
        out_specs=spec(nv),
        out_shape=jax.ShapeDtypeStruct((nv, B), a_s.dtype),
        interpret=interpret,
    )(Mt, a_s, Gt, j_aref, j_R, j_floss, j_active, Jnt, Jt1t, Jt2t,
      c_aref4, c_R, c_mu, c_active)
