"""Forward kinematics and motion-subspace (Jacobian) computation.

The kinematic tree is tiny and static (8 fused bodies for the Ackermann
robot), so tree traversals are unrolled Python loops at trace time — XLA sees
pure straight-line vector code, ideal under ``jit``+``vmap``.

Mirrors MuJoCo's ``mj_kinematics`` semantics: free-joint qpos is the body's
world pose directly (body_pos/quat ignored; reference relies on this,
ackermann_gymnasium_maze_env.py:184-208), hinge axes live in the body-local
frame, and free-joint angular velocity is body-local.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from mujoco_playground_tpu.physics import mathutil as mu
from mujoco_playground_tpu.physics.model import JNT_FREE, JNT_HINGE, JNT_SLIDE, Model


def fk(model: Model, qpos):
    """Body-frame forward kinematics. Returns (xpos (nbody,3), xquat (nbody,4))."""
    dtype = qpos.dtype
    xpos = [jnp.zeros(3, dtype)]
    xquat = [jnp.asarray([1.0, 0, 0, 0], dtype)]

    # group joints by body (static metadata)
    jnts_of = {b: [] for b in range(model.nbody)}
    for j in range(model.njnt):
        jnts_of[model.jnt_body[j]].append(j)

    for b in range(1, model.nbody):
        p = model.body_parent[b]
        pos = xpos[p] + mu.quat_rotate(xquat[p], model.body_pos[b])
        quat = mu.quat_mul(xquat[p], model.body_quat[b])
        for j in jnts_of[b]:
            adr = model.jnt_qposadr[j]
            t = model.jnt_type[j]
            if t == JNT_FREE:
                pos = qpos[adr:adr + 3]
                q = qpos[adr + 3:adr + 7]
                quat = q / jnp.linalg.norm(q)
            elif t == JNT_HINGE:
                theta = qpos[adr] - model.qpos0[adr]
                anchor = pos + mu.quat_rotate(quat, model.jnt_pos[j])
                quat = mu.quat_mul(
                    quat, mu.quat_from_axis_angle(model.jnt_axis[j], theta))
                pos = anchor - mu.quat_rotate(quat, model.jnt_pos[j])
            elif t == JNT_SLIDE:
                pos = pos + mu.quat_rotate(quat, model.jnt_axis[j]) * (
                    qpos[adr] - model.qpos0[adr])
        xpos.append(pos)
        xquat.append(quat)
    return jnp.stack(xpos), jnp.stack(xquat)


def ancestor_mask(model: Model) -> np.ndarray:
    """(nbody, nv) static 0/1 mask: mask[b, d] = dof d moves body b."""
    mask = np.zeros((model.nbody, model.nv))
    for b in range(model.nbody):
        anc = set()
        cur = b
        while cur != 0:
            anc.add(cur)
            cur = model.body_parent[cur]
        for d in range(model.nv):
            if model.dof_body[d] in anc:
                mask[b, d] = 1.0
    return mask


def motion_subspace(model: Model, xpos, xquat, anchor):
    """Per-dof spatial motion vectors S (nv, 6) = [ang; lin] about ``anchor``.

    Also returns per-dof joint anchor points (nv, 3) (world) for reference.
    """
    S = []
    for j in range(model.njnt):
        b = model.jnt_body[j]
        t = model.jnt_type[j]
        if t == JNT_FREE:
            eye = jnp.eye(3, dtype=xpos.dtype)
            # translations: world axes
            for k in range(3):
                S.append(jnp.concatenate([jnp.zeros(3, xpos.dtype), eye[k]]))
            # rotations: body-frame axes, about the body origin
            R = mu.quat_to_mat(xquat[b])
            for k in range(3):
                w = R[:, k]
                S.append(jnp.concatenate([w, jnp.cross(w, anchor - xpos[b])]))
        else:
            axis_w = mu.quat_rotate(xquat[b], model.jnt_axis[j])
            anch = xpos[b] + mu.quat_rotate(xquat[b], model.jnt_pos[j])
            if t == JNT_HINGE:
                S.append(jnp.concatenate(
                    [axis_w, jnp.cross(axis_w, anchor - anch)]))
            else:  # slide
                S.append(jnp.concatenate([jnp.zeros(3, xpos.dtype), axis_w]))
    return jnp.stack(S)


def body_jacobians(model: Model, S, mask):
    """(nbody, 6, nv) body spatial Jacobians from motion subspace + mask."""
    # J[b, :, d] = S[d] if dof d moves body b
    return jnp.einsum('dk,bd->bkd', S, mask)


def point_jacobian(S, point, anchor):
    """Translational Jacobian rows (nv, 3) of a world point given S about anchor.

    v(point) = S_lin + S_ang x (point - anchor).
    """
    return S[:, 3:] + jnp.cross(S[:, :3], point - anchor)


def site_frames(model: Model, xpos, xquat) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World positions (nsite,3) and z-axes (nsite,3) of all sites."""
    body = np.asarray(model.site_body)
    bpos = xpos[body]
    bquat = xquat[body]
    pos = bpos + mu.quat_rotate(bquat, model.site_pos)
    quat = mu.quat_mul(bquat, model.site_quat)
    zaxis = mu.quat_to_mat(quat)[..., :, 2]
    return pos, zaxis
