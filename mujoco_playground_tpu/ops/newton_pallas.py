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


# --------------------------------------------------------------------------
# static-zero-pruning scalar helpers (shared with step_pallas): operands are
# Python floats (static) or (B,) lane arrays; exact float zeros vanish at
# trace time.  This is how branch-induced sparsity (a contact row touches
# only the base + its wheel's chain dofs) turns into pruned kernel code.

def _is0(x):
    return isinstance(x, (int, float)) and x == 0.0


def smul(a, b):
    if _is0(a) or _is0(b):
        return 0.0
    return a * b


def sadd(*xs):
    out = None
    for x in xs:
        if _is0(x):
            continue
        out = x if out is None else out + x
    return 0.0 if out is None else out


def ssub(a, b):
    if _is0(b):
        return a
    if _is0(a):
        return 0.0 - b if not isinstance(b, (int, float)) else -b
    return a - b


def smax(a, b):
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return max(a, b)
    return jnp.maximum(a, b)


def _cholesky_solve_lanes(H, g, n, order=None):
    """Solve H x = g (SPD); H an n x n list-of-lists of (B,) lanes and/or
    static-zero Python floats, g a list of lanes/floats.

    Static zeros prune at trace time, so a tree-sparse H factors in the
    fill-reduced op count.  ``order`` permutes the elimination sequence —
    pass leaves-first (non-base dofs before the free joint) so wheel-chain
    columns eliminate before the dense base block and create no fill-in
    (Featherstone's branch-induced-sparsity order).  Pure permutation:
    identical solution up to rounding, for any order.
    """
    p = list(order) if order is not None else list(range(n))
    Hp = [[H[p[i]][p[j]] for j in range(n)] for i in range(n)]
    gp = [g[p[i]] for i in range(n)]
    L = [[0.0] * n for _ in range(n)]
    for j in range(n):
        s = [Hp[i][j] for i in range(n)]
        for k in range(j):
            ljk = L[j][k]
            if _is0(ljk):
                continue
            for i in range(j, n):
                s[i] = ssub(s[i], smul(L[i][k], ljk))
        d = jax.lax.rsqrt(jnp.maximum(s[j], 1e-30))
        for i in range(j, n):
            L[i][j] = smul(s[i], d)
    y = [0.0] * n
    for i in range(n):
        s = gp[i]
        for k in range(i):
            s = ssub(s, smul(L[i][k], y[k]))
        y[i] = s / L[i][i] if not _is0(s) else 0.0
    x = [0.0] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = ssub(s, smul(L[k][i], x[k]))
        x[i] = s / L[i][i] if not _is0(s) else 0.0
    xout = [0.0] * n
    for i in range(n):
        xout[p[i]] = x[i]
    return xout


def newton_body(nv, iterations, ls_iterations, M, a_s, jrows, cgroups,
                order=None, a0=None, ws_compare=True):
    """The Newton loop on structure-grouped lanes (reused by the fused step
    kernel and the standalone Newton kernel).

    Inputs:
      M        nv x nv list-of-lists; entries (B,) lanes or static floats
               (CRBA's branch-induced zeros prune at trace time).
      a_s      list of nv (B,) lanes (smooth acceleration).
      jrows    per joint row: dict(G=list of nv lane/float entries, aref,
               Rinv, floss, active, is_eq, is_fric) — few rows (eq/
               friction/limit), handled per-row with static-zero pruning.
      cgroups  contact rows GROUPED by static Jacobian sparsity pattern:
               dict(dofs=tuple of touched dof indices,
                    Jn/Jt1/Jt2=list over dofs of (ncg, B) stacks,
                    aref4=list of 4 (ncg, B), Rinv/active=(ncg, B),
                    mu=(ncg, 1) static or (ncg, B)).
      order    Cholesky elimination order (see _cholesky_solve_lanes).

    Grouping is the layout compromise the TPU wants: a contact row touches
    only the base + its wheel's chain (~7 of 12 dofs), so restricting the
    Hessian/apply/accumulate loops to each group's dof set cuts the
    dominant flops ~2.5x vs dense (nv, nc, B) — while keeping rows stacked
    per group so the op count (trace size, interpret speed, Mosaic
    unrolling) stays within ~2x of the dense kernel, unlike fully per-row
    scalarization which explodes it 15x.  One group holding all rows with
    dofs=(0..nv-1) reproduces the dense layout exactly (the standalone
    kernel path).  Numerics are the dense loop's exactly (same terms, same
    iteration structure).  Returns a list of nv (B,) lane vectors.
    """
    def japply(Jlist, avec):
        return sadd(*[smul(Jlist[v], avec[v]) for v in range(nv)])

    def gapply(Jg, dofs, avec):
        acc = None
        for i, v in enumerate(dofs):
            a = avec[v]
            if _is0(a):
                continue
            t = Jg[i] * (a[None, :] if hasattr(a, "ndim") else a)
            acc = t if acc is None else acc + t
        return 0.0 if acc is None else acc

    def joint_force(r, x):
        raw = -x * r["Rinv"]
        if r["is_eq"]:
            f, q = raw, jnp.ones_like(raw)
        elif r["is_fric"]:
            f = jnp.clip(raw, -r["floss"], r["floss"])
            q = (jnp.abs(raw) < r["floss"]).astype(raw.dtype)
        else:
            f = jnp.maximum(raw, 0.0)
            q = (raw > 0).astype(raw.dtype)
        return smul(f, r["active"]), smul(q, r["active"])

    def contact_forces4(g, x4):
        f4 = [jnp.maximum(-x4[k] * g["Rinv"], 0.0) * g["active"]
              for k in range(4)]
        q4 = [(x4[k] < 0).astype(f4[0].dtype) * g["active"] for k in range(4)]
        return f4, q4

    def pyr4(mu, an, at1, at2):
        return [an + mu * at1, an - mu * at1, an + mu * at2, an - mu * at2]

    def row_values(avec):
        xj = [ssub(japply(r["G"], avec), r["aref"]) for r in jrows]
        x4 = []
        for g in cgroups:
            p = pyr4(g["mu"], gapply(g["Jn"], g["dofs"], avec),
                     gapply(g["Jt1"], g["dofs"], avec),
                     gapply(g["Jt2"], g["dofs"], avec))
            x4.append([p[k] - g["aref4"][k] for k in range(4)])
        return xj, x4

    def jt_f(fj, f4):
        out = [0.0] * nv
        for r, f in zip(jrows, fj):
            for v in range(nv):
                out[v] = sadd(out[v], smul(r["G"][v], f))
        for g, fc in zip(cgroups, f4):
            fn = fc[0] + fc[1] + fc[2] + fc[3]
            ft1 = g["mu"] * (fc[0] - fc[1])
            ft2 = g["mu"] * (fc[2] - fc[3])
            for i, v in enumerate(g["dofs"]):
                out[v] = sadd(out[v],
                              jnp.sum(g["Jn"][i] * fn + g["Jt1"][i] * ft1
                                      + g["Jt2"][i] * ft2, axis=0))
        return out

    def Mtv(dvec):
        return [sadd(*[smul(M[v][w], dvec[w]) for w in range(nv)])
                for v in range(nv)]

    # warm start (MuJoCo mj_warmstart semantics): evaluate the primal cost
    # at BOTH the previous solution and qacc_smooth and iterate from the
    # cheaper (after a contact-set discontinuity the previous solution can
    # be a worse start than cold — ADVICE r4).  The objective's smooth
    # anchor M(a - a_s) stays at a_s either way.
    a_s_vec = [a_s[v] for v in range(nv)]

    def primal_cost(vec, with_m_term):
        """(Phi(vec), xj, x4); with_m_term=False skips the smooth quadratic
        (exactly zero when vec == a_s — saves an nv^2 Mtv on the cold-side
        eval).  Row values are returned so the selected start's can seed
        the first Newton iteration without recomputation."""
        xj, x4 = row_values(vec)
        c = 0.0
        for r, x in zip(jrows, xj):
            quad = 0.5 * x * x * r["Rinv"]
            if r["is_eq"]:
                rc = quad
            elif r["is_fric"]:
                lin = (r["floss"] * jnp.abs(x)
                       - 0.5 * r["floss"] * r["floss"] / r["Rinv"])
                rc = jnp.where(jnp.abs(x) * r["Rinv"] < r["floss"],
                               quad, lin)
            else:
                rc = jnp.where(x < 0, quad, 0.0)
            c = sadd(c, smul(rc, r["active"]))
        for g, x4g in zip(cgroups, x4):
            for k in range(4):
                xk = x4g[k]
                c = c + jnp.sum(
                    jnp.where(xk < 0, 0.5 * xk * xk * g["Rinv"], 0.0)
                    * g["active"], axis=0)
        if with_m_term:
            diff = [ssub(vec[v], a_s_vec[v]) for v in range(nv)]
            Mdiff = Mtv(diff)
            c = sadd(c, 0.5 * sadd(*[smul(diff[v], Mdiff[v])
                                     for v in range(nv)]))
        return c, xj, x4

    if a0 is None:
        avec = list(a_s_vec)
        pre_rows = None
    elif not ws_compare:
        # unconditional warm start (the megakernel hot path): skipping the
        # two-sided cost evaluation saves one full row_values pass per
        # solve (~10% of the fused step at 4096 envs, measured r5); the
        # mj-exact compare stays on by default for the standalone kernel
        # and the staged solver paths (PARITY.md "warm start").
        avec = list(a0)
        pre_rows = None
    else:
        c_ws, xj_ws, x4_ws = primal_cost(list(a0), True)
        c_sm, xj_sm, x4_sm = primal_cost(a_s_vec, False)
        use_ws = c_ws < c_sm
        avec = [jnp.where(use_ws, a0[v], a_s_vec[v]) for v in range(nv)]
        # seed iteration 1 with the selected start's row values (already
        # computed for the cost compare — saves a full row_values pass)
        pre_rows = (
            [jnp.where(use_ws, a, b) for a, b in zip(xj_ws, xj_sm)],
            [[jnp.where(use_ws, a[k], b[k]) for k in range(4)]
             for a, b in zip(x4_ws, x4_sm)])
    for _it in range(iterations):
        if _it == 0 and pre_rows is not None:
            xj, x4 = pre_rows
        else:
            xj, x4 = row_values(avec)
        fq_j = [joint_force(r, x) for r, x in zip(jrows, xj)]
        fj = [f for f, _ in fq_j]
        fq_c = [contact_forces4(g, x) for g, x in zip(cgroups, x4)]
        f4 = [f for f, _ in fq_c]
        jtf = jt_f(fj, f4)
        diff = [ssub(avec[v], a_s_vec[v]) for v in range(nv)]
        Mdiff = Mtv(diff)
        grad = [ssub(Mdiff[v], jtf[v]) for v in range(nv)]

        # Hessian: M + G^T w G (per joint row) + the pyramid blocks
        # J U^T (per contact group), built only on each group's dof set
        H = [[None] * nv for _ in range(nv)]
        for v in range(nv):
            for w in range(v, nv):
                H[v][w] = M[v][w]
        for r, (_, q) in zip(jrows, fq_j):
            wjr = smul(q, r["Rinv"])
            for v in range(nv):
                if _is0(r["G"][v]):
                    continue
                for w in range(v, nv):
                    if _is0(r["G"][w]):
                        continue
                    H[v][w] = sadd(H[v][w],
                                   smul(smul(r["G"][v], wjr), r["G"][w]))
        for g, (_, q4) in zip(cgroups, fq_c):
            w4 = [q4[k] * g["Rinv"] for k in range(4)]
            w01 = w4[0] + w4[1]
            w23 = w4[2] + w4[3]
            mu = g["mu"]
            W00 = w01 + w23
            W01 = mu * (w4[0] - w4[1])
            W02 = mu * (w4[2] - w4[3])
            W11 = mu * mu * w01
            W22 = mu * mu * w23
            dofs = g["dofs"]
            U1 = [W00 * g["Jn"][i] + W01 * g["Jt1"][i] + W02 * g["Jt2"][i]
                  for i in range(len(dofs))]
            U2 = [W01 * g["Jn"][i] + W11 * g["Jt1"][i]
                  for i in range(len(dofs))]
            U3 = [W02 * g["Jn"][i] + W22 * g["Jt2"][i]
                  for i in range(len(dofs))]
            for i, v in enumerate(dofs):
                for jj, w in enumerate(dofs):
                    if w < v:
                        continue
                    H[v][w] = sadd(H[v][w], jnp.sum(
                        g["Jn"][i] * U1[jj] + g["Jt1"][i] * U2[jj]
                        + g["Jt2"][i] * U3[jj], axis=0))
        for v in range(nv):
            H[v][v] = H[v][v] + 1e-9
            for w in range(v + 1, nv):
                H[w][v] = H[v][w]
        delta = _cholesky_solve_lanes(H, [ssub(0.0, g_) for g_ in grad], nv,
                                      order=order)

        jdj = [japply(r["G"], delta) for r in jrows]
        jd4 = [pyr4(g["mu"], gapply(g["Jn"], g["dofs"], delta),
                    gapply(g["Jt1"], g["dofs"], delta),
                    gapply(g["Jt2"], g["dofs"], delta)) for g in cgroups]
        Md = Mtv(delta)
        dMd = sadd(*[smul(delta[v], Md[v]) for v in range(nv)])
        dM_as = sadd(*[smul(delta[v], Mdiff[v]) for v in range(nv)])
        alpha = jnp.ones_like(dMd)
        for _ls in range(ls_iterations):
            dphi = dM_as + alpha * dMd
            ddphi = dMd
            for r, xr, jd in zip(jrows, xj, jdj):
                if _is0(jd):
                    continue
                f_a, q_a = joint_force(r, xr + alpha * jd)
                dphi = ssub(dphi, smul(jd, f_a))
                ddphi = sadd(ddphi, smul(smul(q_a, r["Rinv"]), jd * jd))
            for g, xc, jdc in zip(cgroups, x4, jd4):
                x4_a = [xc[k] + alpha[None, :] * jdc[k] for k in range(4)]
                f4_a, q4_a = contact_forces4(g, x4_a)
                acc_d = acc_dd = None
                for k in range(4):
                    td = jdc[k] * f4_a[k]
                    tdd = q4_a[k] * g["Rinv"] * jdc[k] * jdc[k]
                    acc_d = td if acc_d is None else acc_d + td
                    acc_dd = tdd if acc_dd is None else acc_dd + tdd
                dphi = dphi - jnp.sum(acc_d, axis=0)
                ddphi = ddphi + jnp.sum(acc_dd, axis=0)
            alpha = jnp.clip(alpha - dphi / jnp.maximum(ddphi, 1e-12),
                             0.0, 2.0)
        avec = [avec[v] + alpha * delta[v] for v in range(nv)]

    return avec


def _newton_kernel(nv, nj, nc, iterations, ls_iterations, is_eq, is_fric,
                   has_ws, *refs):
    if has_ws:
        (Mt_ref, a_s_ref, ws_ref, Gt_ref, j_aref_ref, j_R_ref, j_floss_ref,
         j_active_ref, Jnt_ref, Jt1t_ref, Jt2t_ref, c_aref_ref,
         c_R_ref, c_mu_ref, c_active_ref, out_ref) = refs
    else:
        (Mt_ref, a_s_ref, Gt_ref, j_aref_ref, j_R_ref, j_floss_ref,
         j_active_ref, Jnt_ref, Jt1t_ref, Jt2t_ref, c_aref_ref,
         c_R_ref, c_mu_ref, c_active_ref, out_ref) = refs
        ws_ref = None
    # array refs -> the list structure newton_body consumes (entries here
    # are all runtime lanes — the standalone kernel receives the system
    # from HBM, so there is no static sparsity to prune; the fused step
    # kernel builds these lists with static zeros instead)
    Mt, Gt = Mt_ref[...], Gt_ref[...]
    Jnt, Jt1t, Jt2t = Jnt_ref[...], Jt1t_ref[...], Jt2t_ref[...]
    j_aref, j_R = j_aref_ref[...], j_R_ref[...]
    j_floss, j_active = j_floss_ref[...], j_active_ref[...]
    c_aref, c_R = c_aref_ref[...], c_R_ref[...]
    c_mu, c_active = c_mu_ref[...], c_active_ref[...]
    M = [[Mt[v][w] for w in range(nv)] for v in range(nv)]
    a_s = [a_s_ref[v] for v in range(nv)]
    jrows = [dict(G=[Gt[v][r] for v in range(nv)], aref=j_aref[r],
                  Rinv=1.0 / j_R[r], floss=j_floss[r], active=j_active[r],
                  is_eq=is_eq[r], is_fric=is_fric[r]) for r in range(nj)]
    # one all-dof group == the dense layout (no static sparsity to exploit
    # when the system arrives from HBM)
    cgroups = [dict(dofs=tuple(range(nv)),
                    Jn=[Jnt[v] for v in range(nv)],
                    Jt1=[Jt1t[v] for v in range(nv)],
                    Jt2=[Jt2t[v] for v in range(nv)],
                    aref4=[c_aref[k] for k in range(4)],
                    Rinv=1.0 / c_R, mu=c_mu, active=c_active)] if nc else []
    a0 = [ws_ref[v] for v in range(nv)] if ws_ref is not None else None
    avec = newton_body(nv, iterations, ls_iterations, M, a_s, jrows, cgroups,
                       a0=a0)
    out_ref[...] = jnp.stack(avec)


def newton_solve_pallas(Mt, a_s, G, j_aref, j_R, j_floss, j_active, j_kind,
                        Jn, Jt1, Jt2, c_aref, c_R, c_mu, c_active,
                        iterations: int, ls_iterations: int,
                        block_b: int = BLOCK_B, interpret: bool = False,
                        pre_transposed: bool = False, warmstart=None):
    """Batch-last Newton solve; B % block_b == 0. Returns qacc (nv, B).

    Inputs either row-major (G (nj,nv,B), Jn (nc,nv,B), c_aref (nc,4,B) — as
    produced by solver_batched._transpose_efc) or, with
    ``pre_transposed=True``, already in kernel layout (Gt (nv,nj,B),
    Jnt (nv,nc,B), c_aref (4,nc,B) — as produced by constraint_bl).
    ``warmstart``: optional (nv, B) Newton initial point (previous step's
    qacc); the objective's anchor stays a_s.
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
        _newton_kernel, nv, nj, nc, iterations, ls_iterations, is_eq,
        is_fric, warmstart is not None)

    def spec(*row_dims):
        nrow = len(row_dims)
        return pl.BlockSpec(tuple(row_dims) + (block_b,),
                            lambda i, _n=nrow: (0,) * _n + (i,),
                            memory_space=pltpu.VMEM)

    ws_in = [] if warmstart is None else [warmstart]
    ws_spec = [] if warmstart is None else [spec(nv)]
    return pl.pallas_call(
        kernel,
        grid=(B // block_b,),
        in_specs=[spec(nv, nv), spec(nv)] + ws_spec + [
            spec(nv, nj), spec(nj), spec(nj),
            spec(nj), spec(nj), spec(nv, nc), spec(nv, nc), spec(nv, nc),
            spec(4, nc), spec(nc), spec(nc), spec(nc),
        ],
        out_specs=spec(nv),
        out_shape=jax.ShapeDtypeStruct((nv, B), a_s.dtype),
        interpret=interpret,
    )(Mt, a_s, *ws_in, Gt, j_aref, j_R, j_floss, j_active, Jnt, Jt1t, Jt2t,
      c_aref4, c_R, c_mu, c_active)
