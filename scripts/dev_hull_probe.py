"""Dev probe: chassis hull collision vs MuJoCo's real mesh collider.

Compares contact sets, qacc, and settle trajectories for a chassis-only
model in flipped/tilted poses (plane) and a wall-overlap pose (box).
Used to calibrate tests/test_hull_collision.py tolerances.
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

import mujoco

from mujoco_playground_tpu.physics import collision, engine
from mujoco_playground_tpu.physics.model import make_model
from mujoco_playground_tpu.physics.state import make_state
from mujoco_playground_tpu.spec.robot import ackermann_robot_v2
from mujoco_playground_tpu.spec.scene import SceneSpec


def chassis_only_spec():
    spec = ackermann_robot_v2()
    keep = {"chassis", "base", "ceiling"}
    spec.bodies = [b for b in spec.bodies if b.name in keep]
    spec.actuators, spec.sensors, spec.equalities = [], [], []
    return spec


def oracle_xml(wall=None):
    wall_geom = ""
    if wall is not None:
        (wx, wy, wz), (hx, hy, hz) = wall
        wall_geom = (f'<geom name="wall" type="box" pos="{wx} {wy} {wz}" '
                     f'size="{hx} {hy} {hz}" contype="1" conaffinity="7"/>')
    return f"""
<mujoco>
  <compiler meshdir="/root/reference/CAD Models" angle="degree"/>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <asset>
    <mesh name="Base" file="Base.stl"/>
    <mesh name="Ceiling" file="Ceiling.stl"/>
  </asset>
  <worldbody>
    <geom name="floor" type="plane" size="40 40 0.1"
          friction="1 0.005 0.0001" contype="1" conaffinity="7"/>
    {wall_geom}
    <body name="chassis" pos="0 0 0.065">
      <freejoint/>
      <body name="base">
        <geom name="chassis" type="mesh" mesh="Base" euler="90 -90 0"
              pos="0 0 -0.03" mass="5" contype="2" conaffinity="1"/>
      </body>
      <body name="ceiling">
        <geom name="ceiling" type="mesh" mesh="Ceiling" pos="0 0 -0.01"
              euler="90 -90 0" mass="5" contype="2" conaffinity="1"/>
      </body>
    </body>
  </worldbody>
</mujoco>"""


def compare_pose(model, mj, qpos, label):
    d = mujoco.MjData(mj)
    d.qpos[:] = qpos
    mujoco.mj_forward(mj, d)
    st = make_state(model, qpos=jnp.asarray(qpos))
    cts = collision.collide(model, st.xpos, st.xquat)
    act = np.asarray(cts.dist) < 0
    print(f"--- {label}: mj ncon={d.ncon}, ours active={act.sum()}")
    for i in range(d.ncon):
        c = d.contact[i]
        print(f"  mj  dist {c.dist:+.6e} pos {np.round(c.pos,5)} "
              f"n {np.round(c.frame[:3],4)}")
    for i in np.where(act)[0]:
        print(f"  our dist {float(cts.dist[i]):+.6e} "
              f"pos {np.round(np.asarray(cts.pos[i]),5)} "
              f"n {np.round(np.asarray(cts.frame[i,0]),4)}")
    qacc, _ = engine.forward(model, st)
    print(f"  qacc mj  {np.round(d.qacc,4)}")
    print(f"  qacc our {np.round(np.asarray(qacc),4)}")
    if d.ncon:
        print("  efc D mj", np.unique(np.round(d.efc_D[:d.nefc],4)))


def settle(model, mj, qpos, steps=800):
    d = mujoco.MjData(mj)
    d.qpos[:] = qpos
    st = make_state(model, qpos=jnp.asarray(qpos))
    step = jax.jit(lambda s: engine.step(model, s))
    for _ in range(steps):
        mujoco.mj_step(mj, d)
        st = step(st)
    print("  settle mj  qpos", np.round(d.qpos, 6))
    print("  settle our qpos", np.round(np.asarray(st.qpos), 6))
    print("  |dz|", abs(float(st.qpos[2]) - d.qpos[2]),
          " |dquat|", np.abs(np.asarray(st.qpos[3:7]) - d.qpos[3:7]).max())


def main():
    spec = chassis_only_spec()

    # ---- plane: flipped + tilted ----------------------------------------
    mj = mujoco.MjModel.from_xml_string(oracle_xml())
    model = make_model(spec, dtype=jnp.float64, solver_iterations=20,
                       ls_iterations=12)
    # flipped 180 deg roll, ceiling-top verts (body z=-0.006) lowest
    flip = [0.0, 0.0, -0.008, 0.0, 1.0, 0.0, 0.0]
    compare_pose(model, mj, flip, "flipped, 2mm penetration")
    settle(model, mj, [0.0, 0.0, 0.01, 0.0, 1.0, 0.0, 0.0])

    # tilted 30 deg pitch: front edge down
    th = np.radians(30)
    q = [np.cos(th / 2), 0.0, np.sin(th / 2), 0.0]
    compare_pose(model, mj, [0.0, 0.0, 0.095, *q], "pitched 30deg edge down")

    # ---- wall box --------------------------------------------------------
    wall = ((0.30, 0.0, 0.25), (0.05, 0.5, 0.25))
    mj_w = mujoco.MjModel.from_xml_string(oracle_xml(wall))
    scene = SceneSpec(name="wall", box_pos=np.array([wall[0]]),
                      box_size=np.array([wall[1]]))
    model_w = make_model(spec, scene, dtype=jnp.float64,
                         solver_iterations=20, ls_iterations=12)
    # nose overlapping the wall by 5mm (front verts at x=+0.15)
    overlap = [0.105, 0.0, 0.065, 1.0, 0.0, 0.0, 0.0]
    compare_pose(model_w, mj_w, overlap, "nose 5mm into wall")
    d = mujoco.MjData(mj_w)
    d.qpos[:] = overlap
    st = make_state(model_w, qpos=jnp.asarray(overlap))
    step = jax.jit(lambda s: engine.step(model_w, s))
    for _ in range(100):
        mujoco.mj_step(mj_w, d)
        st = step(st)
    print("  after 100 steps: mj x", d.qpos[0], " our x", float(st.qpos[0]))


if __name__ == "__main__":
    main()
