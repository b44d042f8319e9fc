"""Mass matrix (CRBA) and bias forces (RNEA) as dense batched einsums.

Instead of MuJoCo's sparse L'L^T factorization over a C tree traversal, the
composite-rigid-body sum is expressed as M = sum_b J_b^T I_b J_b with an
(nbody, nv) static ancestor mask — straight-line einsums over tiny fixed
shapes that vmap/XLA fuse across thousands of envs.  Spatial quantities are
anchored at the root body's position for conditioning (MuJoCo anchors at the
subtree CoM; any consistent anchor yields the same M and bias).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_playground_tpu.physics import kinematics, mathutil as mu
from mujoco_playground_tpu.physics.model import Model


def _anchor(model: Model, xpos):
    # root of the (single) floating subtree: first non-world body
    return xpos[1] if model.nbody > 1 else jnp.zeros(3, xpos.dtype)


def body_spatial_inertia(model: Model, xpos, xquat, anchor):
    """(nbody, 6, 6) spatial inertias about the common anchor."""
    iquat = mu.quat_mul(xquat, model.body_iquat)
    R = mu.quat_to_mat(iquat)
    inertia_world = jnp.einsum('bij,bj,bkj->bik', R, model.body_inertia, R)
    com = xpos + mu.quat_rotate(xquat, model.body_ipos)
    return mu.spatial_inertia(model.body_mass, inertia_world, com - anchor)


def crba(model: Model, xpos, xquat, mask):
    """Dense joint-space mass matrix M (nv, nv), incl. armature.

    Returns (M, S, anchor) so callers can reuse the motion subspace.
    """
    anchor = _anchor(model, xpos)
    S = kinematics.motion_subspace(model, xpos, xquat, anchor)
    Ibar = body_spatial_inertia(model, xpos, xquat, anchor)
    # J[b,:,d] = S[d]*mask[b,d];  M = sum_b J^T I J
    J = jnp.einsum('dk,bd->bkd', S, mask)
    M = jnp.einsum('bki,bkl,blj->ij', J, Ibar, J)
    M = M + jnp.diag(model.dof_armature)
    return M, S, anchor


def bias_force(model: Model, xpos, xquat, qvel, S, mask, anchor):
    """qfrc_bias (nv,): Coriolis/centrifugal + gravity (MuJoCo sign convention:
    M qacc + qfrc_bias = qfrc_applied)."""
    dtype = xpos.dtype
    Ibar = body_spatial_inertia(model, xpos, xquat, anchor)
    J = jnp.einsum('dk,bd->bkd', S, mask)
    vbody = jnp.einsum('bkd,d->bk', J, qvel)                  # (nbody, 6)
    # velocity-product terms: cdot[d] = v_{body(d)} x S_d * qvel_d for dofs
    # whose axes are carried by the body (hinge/slide/free-rotation); zero for
    # free-joint translation dofs (their axes are world-fixed => S-dot = 0).
    dof_body = np.asarray(model.dof_body)
    vd = vbody[dof_body]                                       # (nv, 6)
    carried = np.ones(len(dof_body))
    from mujoco_playground_tpu.physics.model import JNT_FREE
    for j in range(model.njnt):
        if model.jnt_type[j] == JNT_FREE:
            adr = model.jnt_dofadr[j]
            carried[adr:adr + 3] = 0.0
    carried = jnp.asarray(carried, dtype=S.dtype)
    cdot = mu.motion_cross(vd, S) * (qvel * carried)[:, None]  # (nv, 6)
    # fictitious base acceleration for gravity: a0 = [0; -g]
    a0 = jnp.concatenate([jnp.zeros(3, dtype), -model.gravity])
    abody = a0 + jnp.einsum('bd,dk->bk', mask, cdot)           # (nbody, 6)
    fbody = (jnp.einsum('bkl,bl->bk', Ibar, abody)
             + mu.force_cross(vbody, jnp.einsum('bkl,bl->bk', Ibar, vbody)))
    return jnp.einsum('bkd,bk->d', J, fbody)


def set_invweight0(model: Model) -> Model:
    """Compile-time twin of MuJoCo's mj_setConst invweight0 computation.

    body_invweight0 = mean diagonal of J M^-1 J^T for the body's 3 trans rows
    (at the body CoM) and 3 rot rows, at qpos0; dof_invweight0 = diag(M^-1).
    """
    mask = jnp.asarray(kinematics.ancestor_mask(model), model.dtype)

    def compute():
        xpos, xquat = kinematics.fk(model, model.qpos0)
        M, S, anchor = crba(model, xpos, xquat, mask)
        Minv = jnp.linalg.inv(M)
        dof_iw = jnp.diag(Minv)
        com = xpos + mu.quat_rotate(xquat, model.body_ipos)
        body_iw = []
        for b in range(model.nbody):
            if b == 0:
                body_iw.append(jnp.zeros(2, model.dtype))
                continue
            Jt = kinematics.point_jacobian(S, com[b], anchor) * mask[b][:, None]
            Jr = S[:, :3] * mask[b][:, None]
            At = Jt.T @ Minv @ Jt
            Ar = Jr.T @ Minv @ Jr
            body_iw.append(jnp.stack([jnp.trace(At) / 3, jnp.trace(Ar) / 3]))
        return jnp.stack(body_iw), dof_iw

    body_iw, dof_iw = jax.jit(compute)()
    return model.replace(body_invweight0=body_iw, dof_invweight0=dof_iw)
