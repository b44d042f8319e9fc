"""Physics step: the TPU-native twin of ``mj_step`` (mj_forward + Euler).

One call = one 0.002 s physics step (the reference steps once per env step,
500 Hz control — src/rl/envs/ackermann_env.py:200).  Pure function of
(model, state); batched over envs with ``vmap``; everything inside is
straight-line jnp code with static shapes.

Pipeline (mirrors MuJoCo's mj_forward):
  FK -> motion subspace -> CRBA mass matrix -> RNEA bias -> actuator +
  passive forces -> qacc_smooth -> collision -> efc assembly -> Newton
  constraint solve -> semi-implicit Euler with implicit joint damping
  ((M + h D) v' = M v + h * total force, matching MuJoCo's Euler integrator).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_playground_tpu.physics import (collision, constraint, inertia,
                                           kinematics, linalg_small, solver)
from mujoco_playground_tpu.physics import mathutil as mu
from mujoco_playground_tpu.physics.model import JNT_FREE, JNT_HINGE, JNT_SLIDE, Model
from mujoco_playground_tpu.physics.state import State

# Test knob: set to a block size (e.g. 8) to take the Pallas megakernel path
# on CPU too, in interpret mode with that block.  Lets the suite trace the
# FULL fused TPU hot path — step_batch's fused obs/reward gate,
# step_autoreset_batch's fresh-lidar branch — so trace-time bugs that only
# fire when the megakernel returns a slab (round-2 TPU bench crash,
# envs/ackermann_env.py heading0) are caught on the CPU rig.
FORCE_MEGAKERNEL = False


def actuator_force(model: Model, qpos, qvel, ctrl):
    """Affine actuator model: clip(gain*ctrl + b0 + b1*q + b2*qdot, forcerange)."""
    if len(model.actuator_dof) == 0:
        return jnp.zeros(model.nv, qpos.dtype)
    ctrl = jnp.clip(ctrl, model.actuator_ctrlrange[:, 0],
                    model.actuator_ctrlrange[:, 1])
    dof = np.asarray(model.actuator_dof)
    qadr = np.asarray([constraint._dof_to_qposadr(model, d) for d in dof])
    q = qpos[qadr]
    qd = qvel[dof]
    force = (model.actuator_gain * ctrl + model.actuator_bias[:, 0]
             + model.actuator_bias[:, 1] * q + model.actuator_bias[:, 2] * qd)
    force = jnp.clip(force, model.actuator_forcerange[:, 0],
                     model.actuator_forcerange[:, 1])
    qfrc = jnp.zeros(model.nv, qpos.dtype).at[dof].add(force)
    return qfrc


def forward(model: Model, state: State):
    """Forward dynamics: returns (qacc, aux dict with M, xpos, xquat, ...).

    Uses the body frames cached in ``state`` (make_state/step keep
    state.xpos/xquat in sync with qpos), avoiding a second FK per step.
    """
    qpos, qvel, ctrl = state.qpos, state.qvel, state.ctrl
    mask = jnp.asarray(kinematics.ancestor_mask(model), qpos.dtype)
    xpos, xquat = state.xpos, state.xquat
    M, S, anchor = inertia.crba(model, xpos, xquat, mask)
    bias = inertia.bias_force(model, xpos, xquat, qvel, S, mask, anchor)
    qfrc_passive = -model.dof_damping * qvel
    qfrc_act = actuator_force(model, qpos, qvel, ctrl)
    qfrc_smooth = qfrc_act + qfrc_passive - bias
    qacc_smooth = linalg_small.solve_spd_small(M, qfrc_smooth)

    contacts = collision.collide(model, xpos, xquat)
    efc = constraint.make_efc(model, qpos, qvel, S, mask, anchor, contacts)
    qacc, efc_force = solver.solve(model, M, qacc_smooth, efc,
                                   warmstart=state.qacc_warmstart)
    aux = dict(M=M, xpos=xpos, xquat=xquat, qfrc_smooth=qfrc_smooth,
               qacc_smooth=qacc_smooth, contacts=contacts, efc=efc,
               efc_force=efc_force,
               qfrc_constraint=solver.constraint_force(
                   efc, efc_force, model.nv, qpos.dtype))
    return qacc, aux


def _integrate_pos(model: Model, qpos, qvel, h):
    out = []
    for j in range(model.njnt):
        adr = model.jnt_qposadr[j]
        dadr = model.jnt_dofadr[j]
        t = model.jnt_type[j]
        if t == JNT_FREE:
            out.append(qpos[adr:adr + 3] + h * qvel[dadr:dadr + 3])
            out.append(mu.quat_integrate(qpos[adr + 3:adr + 7],
                                         qvel[dadr + 3:dadr + 6], h))
        else:
            out.append(qpos[adr:adr + 1] + h * qvel[dadr:dadr + 1])
    return jnp.concatenate(out)


def batched_field_dict(model: Model, base_model: Model):
    """Names -> leaves for model fields carrying an extra leading env axis
    (domain randomization)."""
    import dataclasses as _dc
    out = {}
    for f in _dc.fields(model):
        if f.metadata.get("pytree_node", True) is False:
            continue
        leaf = getattr(model, f.name)
        base = getattr(base_model, f.name)
        if (hasattr(leaf, "ndim") and hasattr(base, "ndim")
                and leaf.ndim == base.ndim + 1):
            out[f.name] = leaf
    return out


def step_batch(model: Model, states: State,
               base_model: Model = None, with_lidar: bool = False,
               with_env: tuple = None, env_in=None, with_fresh: tuple = None):
    """Batched physics step — the TPU fast path (semantics == vmap(step)).

    ``with_lidar=True`` returns ``(states', lidar_or_None)``: on the
    megakernel path the rangefinder scan is fused into the same kernel
    (post-step frames are already VMEM lanes); on the fallback paths the
    second element is None and the caller scans separately.

    ``with_env`` (a tuple of baked env constants, see
    step_pallas.build_step_fn) additionally fuses the Ackermann obs +
    reward pipeline: pass ``env_in (B, 5) = [ref_x, ref_y, goal_x, goal_y,
    prev_goal_distance]`` and the return is ``(states', env_slab_or_None)``
    with ``env_slab (B, nsite+12)``.  Fallback paths return None and the
    caller observes separately.

    Smooth dynamics (CRBA/RNEA/actuation/integration) run batch-last via
    :mod:`batchlast` (env axis in TPU lanes), the Newton constraint solve as
    a fused Pallas kernel, and only the cheap collision/efc assembly stays
    per-env under vmap.

    Domain randomization: pass a ``model`` whose randomized leaves carry a
    leading env axis plus the unbatched ``base_model``; the batch-last
    stages broadcast per-env parameters natively and the per-env assembly
    vmaps over them.

    When the model is concrete (no DR) and the batch is a multiple of the
    Pallas block, the whole step runs as ONE fused Pallas megakernel
    (ops/step_pallas.py) with every intermediate VMEM-resident — measured
    9-14x faster than the staged XLA pipeline below on v5e (441 us vs
    4131 us at B=4096).  The staged path remains the fallback (DR, ragged
    batches, f64 debugging) and the parity oracle.
    """
    from mujoco_playground_tpu.physics import batchlast, solver_batched
    from mujoco_playground_tpu.ops import step_pallas

    B = states.qpos.shape[0]
    on_tpu = jax.devices()[0].platform != "cpu"
    # a model with zero joint constraint rows (bare free body: no equality/
    # friction/limit rows) is handled by the XLA path below; the megakernel
    # stacks per-row lanes and requires nj >= 1
    has_joint_rows = (len(model.eq_dof_pairs) + len(model.friction_dofs)
                      + 2 * len(model.limited_dofs)) > 0
    # 512 lanes when the batch allows it: ~10% faster than 256 on v5e
    # (deeper lanes hide the Newton/Cholesky dependency chains; measured
    # bit-identical output), falling back to BLOCK_B=256 so small batches
    # (e.g. SAC's 256 envs) still take the megakernel
    block_b = ((512 if B % 512 == 0 else step_pallas.BLOCK_B) if on_tpu
               else int(FORCE_MEGAKERNEL) if FORCE_MEGAKERNEL else 0)
    # parity-compat manifolds (PARITY.md approx 1-2) exist only in the
    # staged collide(); the megakernel bakes the default manifolds
    if model.compat_flat_manifold or model.compat_wheel_patch:
        block_b = 0
    # megakernel path: one fused Pallas kernel for the whole step, plus
    # (optionally) the lidar scan and the env obs/reward pipeline.  Under
    # domain randomization — when every randomized leaf is one of the
    # kernel's supported per-env scalar parameters — the base model
    # compiles ONE kernel taking a packed (P, B) param input, and the
    # fused lidar/obs stages consume the randomized plane_z as a per-env
    # lane, so --domain-rand pays the full fused-step speed; the staged
    # per-env-vmap path below only remains for exotic randomizations.
    dr_names = None
    kernel_model = model
    if base_model is not None:
        kernel_model = None
        if (step_pallas.is_concrete_model(base_model)
                and step_pallas.is_concrete_model(model)):
            names = tuple(sorted(batched_field_dict(model, base_model)))
            if names and set(names) <= set(step_pallas.DR_SUPPORTED):
                dr_names = names
                kernel_model = base_model
    if (block_b and kernel_model is not None and B % block_b == 0
            and has_joint_rows
            and step_pallas.is_concrete_model(kernel_model)):
        # a model without rangefinder sites has nothing to fuse (a zero-row
        # kernel output is invalid); the (new, None) contract covers it
        fuse_env = with_env if kernel_model.nsite > 0 else None
        fuse_lidar = with_lidar and kernel_model.nsite > 0
        fn = step_pallas.build_step_fn(
            kernel_model, kernel_model.solver_iterations,
            kernel_model.ls_iterations, block_b=block_b,
            interpret=not on_tpu, with_lidar=fuse_lidar,
            with_env=fuse_env, with_fresh=with_fresh, dr_fields=dr_names)
        kw = {"warmstart": states.qacc_warmstart}
        if dr_names:
            kw["dr_params"] = step_pallas.pack_dr_params(
                model, dr_names).astype(states.qpos.dtype)
        if fuse_env is not None:
            outs = fn(states.qpos, states.qvel, states.ctrl, env_in, **kw)
        else:
            outs = fn(states.qpos, states.qvel, states.ctrl, **kw)
        qpos_n, qvel_n, xpos_n, xquat_n, qacc_n = outs[:5]
        new = states.replace(qpos=qpos_n, qvel=qvel_n,
                             time=states.time + kernel_model.timestep,
                             xpos=xpos_n, xquat=xquat_n,
                             qacc_warmstart=qacc_n)
        if with_env is not None:
            return (new, outs[5] if fuse_env is not None else None)
        if with_lidar:
            return (new, outs[5] if fuse_lidar else None)
        return new

    h = model.timestep
    qpos_bl = states.qpos.T                              # (nq, B)
    qvel_bl = states.qvel.T
    ctrl_bl = states.ctrl.T
    # body frames from the cached state (kept in sync by make_state/step)
    xpos_l = [states.xpos[:, b].T for b in range(model.nbody)]
    xquat_l = [states.xquat[:, b].T for b in range(model.nbody)]

    M_bl, bias_bl, S_bl, anchor_bl = batchlast.crba_bias_bl(
        model, xpos_l, xquat_l, qvel_bl, np.asarray(model.gravity))
    damp = jnp.asarray(batchlast._param_bl(model.dof_damping, 1),
                       qpos_bl.dtype)
    damp_col = damp[:, None] if damp.ndim == 1 else damp      # (nv, 1|B)
    qfrc_smooth_bl = (batchlast.actuator_force_bl(model, qpos_bl, qvel_bl,
                                                  ctrl_bl)
                      - damp_col * qvel_bl - bias_bl)
    qacc_smooth = linalg_small.cho_solve_bl(
        linalg_small.cholesky_bl(M_bl), qfrc_smooth_bl).T   # (B, nv)

    # Per-env collision + efc assembly (XLA fuses these tiny-tensor chains
    # well; a fully batch-last efc assembly — constraint_bl — measured
    # slightly slower end-to-end), then the fused Pallas Newton solve.
    mask = jnp.asarray(kinematics.ancestor_mask(model), qpos_bl.dtype)
    S_env = jnp.moveaxis(S_bl, -1, 0)                    # (B, nv, 6)
    anchor_env = anchor_bl.T                             # (B, 3)

    if base_model is None:
        def assemble(state, S, anchor):
            contacts = collision.collide(model, state.xpos, state.xquat)
            return constraint.make_efc(model, state.qpos, state.qvel, S,
                                       mask, anchor, contacts)

        efc = jax.vmap(assemble)(states, S_env, anchor_env)
    else:
        bdict = batched_field_dict(model, base_model)

        def assemble_dr(state, S, anchor, leaves):
            m_env = base_model.replace(**leaves)
            contacts = collision.collide(m_env, state.xpos, state.xquat)
            return constraint.make_efc(m_env, state.qpos, state.qvel, S,
                                       mask, anchor, contacts)

        efc = jax.vmap(assemble_dr, in_axes=(0, 0, 0, 0))(
            states, S_env, anchor_env, bdict)
    M_env = jnp.moveaxis(M_bl, -1, 0)                    # (B, nv, nv)
    qacc, _forces = solver_batched.solve_batched(
        model, M_env, qacc_smooth, efc,
        warmstart=states.qacc_warmstart)

    # Batch-last implicit-damping integration: (M + hD) v' = Mv + hDv + hMa.
    a = qacc.T
    nv = model.nv
    rhs = (jnp.sum(M_bl * (qvel_bl + h * a)[None, :, :], axis=1)
           + h * damp_col * qvel_bl)
    MhDt = M_bl + h * (jnp.eye(nv, dtype=qpos_bl.dtype)[:, :, None]
                       * damp_col[:, None, :])
    qvel_new_bl = linalg_small.cho_solve_bl(
        linalg_small.cholesky_bl(MhDt), rhs)             # (nv, B)
    qpos_new_bl = batchlast.integrate_pos_bl(model, qpos_bl, qvel_new_bl, h)
    xpos_l, xquat_l = batchlast.fk_bl(model, qpos_new_bl)
    xpos = jnp.stack([x.T for x in xpos_l], axis=1)      # (B, nbody, 3)
    xquat = jnp.stack([x.T for x in xquat_l], axis=1)
    new = states.replace(qpos=qpos_new_bl.T, qvel=qvel_new_bl.T,
                         time=states.time + h, xpos=xpos, xquat=xquat,
                         qacc_warmstart=qacc)
    return (new, None) if (with_lidar or with_env is not None) else new


def step(model: Model, state: State) -> State:
    """One physics step (semi-implicit Euler, implicit joint damping)."""
    h = model.timestep
    qacc, aux = forward(model, state)
    # Implicit damping: M (v' - v)/h = f_other(v) - D v', where f_other is the
    # total force minus explicit damping: f_other = M qacc + D v.  Hence
    # (M + h D) v' = M v + h D v + h M qacc.
    M = aux['M']
    rhs = (M @ (state.qvel + h * qacc)
           + h * model.dof_damping * state.qvel)
    MhD = M + h * jnp.diag(model.dof_damping)
    qvel_new = linalg_small.solve_spd_small(MhD, rhs)
    qpos_new = _integrate_pos(model, state.qpos, qvel_new, h)
    xpos, xquat = kinematics.fk(model, qpos_new)
    return state.replace(qpos=qpos_new, qvel=qvel_new, time=state.time + h,
                         xpos=xpos, xquat=xquat, qacc_warmstart=qacc)
