"""Dev check: FK / mass matrix / bias force parity vs MuJoCo (CPU, f64)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import mujoco
import numpy as np

from mujoco_playground_tpu.spec.robot import ackermann_robot_v2
from mujoco_playground_tpu.physics.model import make_model
from mujoco_playground_tpu.physics import kinematics, inertia

np.set_printoptions(precision=8, suppress=True, linewidth=220)

mj = mujoco.MjModel.from_xml_path('/root/reference/models/ackermann_robot_v2.xml')
d = mujoco.MjData(mj)

spec = ackermann_robot_v2()
model = make_model(spec, dtype=jnp.float64)
print("compiled: nq", model.nq, "nv", model.nv, "nbody", model.nbody,
      "bodies", model.body_names)

rng = np.random.RandomState(0)
qpos = np.array(mj.qpos0, copy=True)
qpos[0:3] = [0.3, -0.2, 0.4]
q = rng.randn(4); q /= np.linalg.norm(q)
qpos[3:7] = q
qpos[7:] = rng.uniform(-0.5, 0.5, 6)
qvel = rng.uniform(-1, 1, 12)

d.qpos[:] = qpos
d.qvel[:] = qvel
mujoco.mj_forward(mj, d)

xpos, xquat = kinematics.fk(model, jnp.asarray(qpos))
# map: my body names -> mj body ids
name2mj = {mujoco.mj_id2name(mj, mujoco.mjtObj.mjOBJ_BODY, i): i
           for i in range(mj.nbody)}
maxerr = 0.0
for i, n in enumerate(model.body_names):
    if n in name2mj:
        e = np.abs(np.asarray(xpos[i]) - d.xpos[name2mj[n]]).max()
        qe = min(np.abs(np.asarray(xquat[i]) - d.xquat[name2mj[n]]).max(),
                 np.abs(np.asarray(xquat[i]) + d.xquat[name2mj[n]]).max())
        maxerr = max(maxerr, e, qe)
print("FK max err:", maxerr)

mask = jnp.asarray(kinematics.ancestor_mask(model))
M, S, anchor = inertia.crba(model, xpos, xquat, mask)
Mmj = np.zeros((12, 12))
mujoco.mj_fullM(mj, d, Mmj)
print("M max err:", np.abs(np.asarray(M) - Mmj).max())

bias = inertia.bias_force(model, xpos, xquat, jnp.asarray(qvel), S, mask, anchor)
print("bias max err:", np.abs(np.asarray(bias) - d.qfrc_bias).max())
print("mine:", np.asarray(bias))
print("mj:  ", d.qfrc_bias)

print("body_invweight0 err:",
      np.abs(np.asarray(model.body_invweight0)[1:] -
             np.array([mj.body_invweight0[name2mj[n]] for n in model.body_names[1:]])).max())
print("dof_invweight0 err:",
      np.abs(np.asarray(model.dof_invweight0) - mj.dof_invweight0).max())
