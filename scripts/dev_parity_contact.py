"""Dev check: constrained forward dynamics + trajectory parity vs MuJoCo."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import mujoco
import numpy as np

from mujoco_playground_tpu.spec.robot import ackermann_robot_v2
from mujoco_playground_tpu.spec.mjcf import to_mjcf
from mujoco_playground_tpu.physics.model import make_model
from mujoco_playground_tpu.physics import engine
from mujoco_playground_tpu.physics.state import State, make_state
from mujoco_playground_tpu.physics import kinematics

np.set_printoptions(precision=8, suppress=True, linewidth=250)

spec = ackermann_robot_v2()
mj = mujoco.MjModel.from_xml_string(to_mjcf(spec))
d = mujoco.MjData(mj)
model = make_model(spec, dtype=jnp.float64, solver_iterations=20, ls_iterations=12)

# settle in mujoco
d.qpos[0:3] = [0, 0, 0.1]
for _ in range(500):
    mujoco.mj_step(mj, d)
d.ctrl[:] = [0.3, 10.0, 10.0]
for _ in range(100):
    mujoco.mj_step(mj, d)
mujoco.mj_forward(mj, d)
print("mj ncon:", d.ncon, "nefc:", d.nefc)

qpos = jnp.asarray(d.qpos.copy())
qvel = jnp.asarray(d.qvel.copy())
st = make_state(model, qpos=qpos, qvel=qvel).replace(
    ctrl=jnp.asarray(d.ctrl.copy()))

qacc, aux = jax.jit(lambda s: engine.forward(model, s))(st)
print("qacc err:", np.abs(np.asarray(qacc) - d.qacc).max())
print("mine qacc:", np.asarray(qacc))
print("mj   qacc:", d.qacc)
con = aux['contacts']
act = np.asarray(con.dist) < 0
print("my active contacts:", act.sum(), "dists:", np.asarray(con.dist)[act])
print("mj dists:", [d.contact[i].dist for i in range(d.ncon)])

# trajectory rollout
step_fn = jax.jit(lambda s: engine.step(model, s))
st2 = st
for t in range(500):
    st2 = step_fn(st2)
    mujoco.mj_step(mj, d)
    if t in (0, 4, 49, 199, 499):
        e = np.abs(np.asarray(st2.qpos) - d.qpos).max()
        print(f"t={t+1}: qpos maxerr={e:.3e}  xy=({float(st2.qpos[0]):.4f},{float(st2.qpos[1]):.4f}) "
              f"mj xy=({d.qpos[0]:.4f},{d.qpos[1]:.4f})")
