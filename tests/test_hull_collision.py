"""Chassis convex-hull collision parity vs MuJoCo's real mesh collider.

The chassis collides through the convex-hull vertices of the reference STL
meshes (spec/robot.py _BASE_HULL/_CEILING_HULL — extracted from MuJoCo's
compiled mesh for /root/reference/models/ackermann_robot_v2.xml:29,34).
The oracle here loads the ACTUAL meshes, so this is mesh-collision parity,
not proxy-vs-proxy consistency.

Notes on the flat flipped case: MuJoCo's plane-convex narrowphase picks <=4
hull-traversal-order vertices which, for a flat 4 mm plate, cluster on one
corner — the oracle then rocks forever (vz oscillates ~1e-2 m/s at step
4000, measured).  Our quadrant-spread selection yields a spanning 4-point
manifold and a stationary rest; the flat test asserts our physically
correct invariants plus agreement within the oracle's rocking envelope.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from mujoco_playground_tpu.physics import collision, engine
from mujoco_playground_tpu.physics.model import make_model
from mujoco_playground_tpu.physics.state import make_state
from mujoco_playground_tpu.spec.robot import ackermann_robot_v2
from mujoco_playground_tpu.spec.scene import SceneSpec

MESHDIR = "/root/reference/CAD Models"


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
  <compiler meshdir="{MESHDIR}" angle="degree"/>
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


@pytest.fixture(scope="module")
def plane_pair():
    mj = mujoco.MjModel.from_xml_string(oracle_xml())
    model = make_model(chassis_only_spec(), dtype=jnp.float64,
                       solver_iterations=20, ls_iterations=12)
    return model, mj


def _active(model, qpos):
    st = make_state(model, qpos=jnp.asarray(qpos))
    cts = collision.collide(model, st.xpos, st.xquat)
    dist = np.asarray(cts.dist)
    act = dist < 0
    return st, dist[act], np.asarray(cts.pos)[act], \
        np.asarray(cts.frame)[act, 0]


def test_pitched_edge_contact_matches_mesh_oracle(plane_pair):
    """30-degree pitch, front edge down: MuJoCo's mesh collider and our
    hull path must find the SAME two vertices, and the constrained qacc
    must match."""
    model, mj = plane_pair
    th = np.radians(30)
    qpos = [0.0, 0.0, 0.095, np.cos(th / 2), 0.0, np.sin(th / 2), 0.0]
    d = mujoco.MjData(mj)
    d.qpos[:] = qpos
    mujoco.mj_forward(mj, d)
    st, dist, pos, nrm = _active(model, qpos)

    assert d.ncon == 2 and len(dist) == 2
    mj_pts = d.contact.pos[np.argsort(d.contact.pos[:, 1])]
    our_pts = pos[np.argsort(pos[:, 1])]
    np.testing.assert_allclose(our_pts, mj_pts, atol=1e-6)
    np.testing.assert_allclose(np.sort(dist),
                               np.sort(d.contact.dist), atol=1e-7)
    np.testing.assert_allclose(nrm, [[0, 0, 1]] * 2, atol=1e-12)

    qacc, _ = engine.forward(model, st)
    # residual R differs slightly (fused-chassis invweight, PARITY.md) —
    # measured discrepancy ~0.4% on the largest components
    np.testing.assert_allclose(np.asarray(qacc), d.qacc,
                               rtol=2e-2, atol=5e-2)


def test_flat_flipped_rest_is_stationary_and_spanning(plane_pair):
    """Flipped chassis dropped flat: our manifold must span the plate (the
    oracle's clustered picks make it rock forever) and come to an actual
    stationary rest inside the oracle's rocking envelope."""
    model, mj = plane_pair
    qpos = [0.0, 0.0, 0.01, 0.0, 1.0, 0.0, 0.0]
    d = mujoco.MjData(mj)
    d.qpos[:] = qpos
    st = make_state(model, qpos=jnp.asarray(qpos))
    step = jax.jit(lambda s: engine.step(model, s))
    for _ in range(1500):
        mujoco.mj_step(mj, d)
        st = step(st)
    # ours: stationary flat rest with sub-mm penetration
    assert abs(float(st.qvel[2])) < 1e-4
    assert np.abs(np.asarray(st.qvel[3:6])).max() < 1e-3
    _, dist, pos, _ = _active(model, np.asarray(st.qpos))
    assert dist.min() > -5e-4
    # spanning manifold: active contacts on both front and rear of the plate
    assert pos[:, 0].max() > 0.10 and pos[:, 0].min() < -0.10
    # same resting band as the (rocking) oracle
    assert abs(float(st.qpos[2]) - d.qpos[2]) < 4e-3


def test_wall_contact_matches_mesh_oracle():
    """Nose 5 mm into a wall box: our hull contacts are a subset of
    MuJoCo's mesh-box CCD manifold, the qacc agrees, and the push-out
    trajectories coincide."""
    wall = ((0.30, 0.0, 0.25), (0.05, 0.5, 0.25))
    mj = mujoco.MjModel.from_xml_string(oracle_xml(wall))
    scene = SceneSpec(name="wall", box_pos=np.array([wall[0]]),
                      box_size=np.array([wall[1]]))
    model = make_model(chassis_only_spec(), scene, dtype=jnp.float64,
                       solver_iterations=20, ls_iterations=12)
    qpos = [0.105, 0.0, 0.065, 1.0, 0.0, 0.0, 0.0]
    d = mujoco.MjData(mj)
    d.qpos[:] = qpos
    mujoco.mj_forward(mj, d)
    st, dist, pos, nrm = _active(model, qpos)

    assert len(dist) == 4 and d.ncon >= 4
    np.testing.assert_allclose(nrm, [[-1, 0, 0]] * 4, atol=1e-9)
    np.testing.assert_allclose(dist, np.full(4, -5e-3), atol=1e-6)
    mj_pts = {tuple(p) for p in np.round(d.contact.pos, 5).tolist()}
    for p in np.round(pos, 5).tolist():
        assert tuple(p) in mj_pts, (p, mj_pts)

    qacc, _ = engine.forward(model, st)
    np.testing.assert_allclose(np.asarray(qacc), d.qacc,
                               rtol=5e-2, atol=1e-1)

    # push-out trajectory BEFORE the chassis falls to the floor (the flat
    # landing afterwards re-enters the oracle's rocking regime, see module
    # docstring): 40 steps = 80 ms of wall response + free fall
    step = jax.jit(lambda s: engine.step(model, s))
    for _ in range(40):
        mujoco.mj_step(mj, d)
        st = step(st)
    np.testing.assert_allclose(np.asarray(st.qpos[:3]), d.qpos[:3],
                               atol=1e-3)
    assert abs(float(st.qpos[0]) - d.qpos[0]) < 2e-4
