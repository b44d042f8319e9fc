"""Full-step parity vs MuJoCo: constrained dynamics, trajectories, lidar.

The correctness bar from BASELINE.md: trajectories match reference MuJoCo CPU
stepping under fixed seed.  Both engines run the identical generated MJCF
physics (wheel contacts + friction + steering-coupling equality + actuators).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from mujoco_playground_tpu.physics import engine, sensors
from mujoco_playground_tpu.physics.model import make_model
from mujoco_playground_tpu.physics.state import make_state
from mujoco_playground_tpu.spec.mjcf import to_mjcf
from mujoco_playground_tpu.spec.robot import ackermann_robot_v2
from mujoco_playground_tpu.spec.scene import maze_flat_scene, pointmaze_scene


@pytest.fixture(scope="module")
def floor_pair():
    spec = ackermann_robot_v2()
    mj = mujoco.MjModel.from_xml_string(to_mjcf(spec))
    model = make_model(spec, dtype=jnp.float64, solver_iterations=20,
                       ls_iterations=12)
    return model, mj


def _settled(mj, ctrl):
    d = mujoco.MjData(mj)
    d.qpos[0:3] = [0, 0, 0.1]
    for _ in range(500):
        mujoco.mj_step(mj, d)
    d.ctrl[:] = ctrl
    for _ in range(100):
        mujoco.mj_step(mj, d)
    mujoco.mj_forward(mj, d)
    return d


def test_constrained_qacc_matches_mujoco(floor_pair):
    model, mj = floor_pair
    for ctrl in ([0.3, 10.0, 10.0], [-0.4, -20.0, -18.0], [0.0, 0.0, 0.0]):
        d = _settled(mj, ctrl)
        st = make_state(model, qpos=jnp.asarray(d.qpos.copy()),
                        qvel=jnp.asarray(d.qvel.copy()))
        st = st.replace(ctrl=jnp.asarray(d.ctrl.copy()))
        qacc, _ = engine.forward(model, st)
        np.testing.assert_allclose(np.asarray(qacc), d.qacc,
                                   rtol=1e-6, atol=1e-6)


def test_trajectory_parity_driving(floor_pair):
    model, mj = floor_pair
    d = _settled(mj, [0.3, 10.0, 10.0])
    st = make_state(model, qpos=jnp.asarray(d.qpos.copy()),
                    qvel=jnp.asarray(d.qvel.copy()))
    st = st.replace(ctrl=jnp.asarray(d.ctrl.copy()))
    step = jax.jit(lambda s: engine.step(model, s))
    for _ in range(100):
        st = step(st)
        mujoco.mj_step(mj, d)
    # chassis pose to tight tolerance; wheel spin angles are chaotic-free
    # but unobservable, so allow more there.
    np.testing.assert_allclose(np.asarray(st.qpos[:7]), d.qpos[:7], atol=1e-8)
    np.testing.assert_allclose(np.asarray(st.qpos[7:]), d.qpos[7:], atol=1e-4)
    np.testing.assert_allclose(np.asarray(st.qvel), d.qvel, atol=1e-6)


def test_freefall_and_landing_parity(floor_pair):
    """Drop from above the floor: flight (no contacts) then impact."""
    model, mj = floor_pair
    d = mujoco.MjData(mj)
    d.qpos[0:3] = [0, 0, 0.2]
    st = make_state(model, qpos=jnp.asarray(d.qpos.copy()))
    step = jax.jit(lambda s: engine.step(model, s))
    for _ in range(300):
        st = step(st)
        mujoco.mj_step(mj, d)
    np.testing.assert_allclose(np.asarray(st.qpos[:7]), d.qpos[:7], atol=1e-6)


@pytest.mark.parametrize("scene_fn,spawn", [
    (lambda: pointmaze_scene("umaze"), [1.0, 1.0, -0.445]),
    (maze_flat_scene, [1.5, 0.5, 0.065]),
])
def test_lidar_parity(scene_fn, spawn):
    scene = scene_fn()
    spec = ackermann_robot_v2()
    mj = mujoco.MjModel.from_xml_string(to_mjcf(spec, scene))
    model = make_model(spec, scene, dtype=jnp.float64)
    d = mujoco.MjData(mj)
    rng = np.random.RandomState(3)
    for _ in range(3):
        yaw = rng.uniform(0, 2 * np.pi)
        d.qpos[0:3] = spawn
        d.qpos[3:7] = [np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)]
        mujoco.mj_forward(mj, d)
        st = make_state(model, qpos=jnp.asarray(d.qpos.copy()))
        np.testing.assert_allclose(np.asarray(sensors.sensordata(model, st)),
                                   d.sensordata, atol=1e-12)


def test_step_is_jit_vmap_compatible(floor_pair):
    model, mj = floor_pair
    st = make_state(model)
    batch = jax.tree.map(lambda x: jnp.tile(x, (16,) + (1,) * x.ndim), st)
    stepped = jax.jit(jax.vmap(lambda s: engine.step(model, s)))(batch)
    assert stepped.qpos.shape == (16, model.nq)
    assert np.isfinite(np.asarray(stepped.qpos)).all()


@pytest.mark.slow
def test_f32_production_solver_accuracy():
    """The production config (f32, 4 Newton / 3 ls iterations) tracks the
    converged f64/20-iteration solution at float32 rounding level — the
    fixed iteration count is not the accuracy bottleneck."""
    from mujoco_playground_tpu.envs.ackermann_env import AckermannEnv

    env_hi = AckermannEnv(maze_id="PointMaze_UMaze-v3", dtype=jnp.float64,
                          solver_iterations=20, ls_iterations=12)
    env_lo = AckermannEnv(maze_id="PointMaze_UMaze-v3", dtype=jnp.float32,
                          solver_iterations=4, ls_iterations=3)
    s_hi = env_hi.reset(jax.random.PRNGKey(5))
    s_lo = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, s_hi)
    step_hi = jax.jit(env_hi.step)
    step_lo = jax.jit(env_lo.step)
    rng = np.random.RandomState(0)
    for t in range(50):
        a = rng.uniform(-1, 1, 2)
        s_hi = step_hi(s_hi, jnp.asarray(a))
        s_lo = step_lo(s_lo, jnp.asarray(a, jnp.float32))
    err = np.abs(np.asarray(s_hi.physics.qpos[:7], np.float64)
                 - np.asarray(s_lo.physics.qpos[:7], np.float64)).max()
    assert err < 5e-4, f"f32 production trajectory error {err}"


# ---------------------------------------------------------------------------
# Lidar self-hit semantics (reference ackermann_robot_v2.xml:21,30,42):
# MuJoCo rangefinders exclude only the site's body (lidar_360, no geoms), so
# the oracle tests chassis/wheel geoms.  raycast.raycast_robot implements
# exactly that; the default scan skips it because self-hit is impossible for
# this robot in ANY pose (all robot geoms rigid to the chassis).
# ---------------------------------------------------------------------------

def _pose_qpos(mj, xyz, quat_wxyz, steer=None):
    q = mj.qpos0.copy()
    q[0:3] = xyz
    q[3:7] = quat_wxyz
    if steer is not None:
        for j in range(mj.njnt):
            name = mujoco.mj_id2name(mj, mujoco.mjtObj.mjOBJ_JOINT, j)
            if name and "steer" in name:
                q[mj.jnt_qposadr[j]] = steer
    return q


def test_lidar_no_self_hit_any_pose():
    from mujoco_playground_tpu.physics import raycast

    scene = pointmaze_scene("umaze")
    spec = ackermann_robot_v2()
    mj = mujoco.MjModel.from_xml_string(to_mjcf(spec, scene))
    model = make_model(spec, scene, dtype=jnp.float64)
    d = mujoco.MjData(mj)
    c, s = np.cos(np.pi / 8), np.sin(np.pi / 8)
    poses = [
        _pose_qpos(mj, [1.0, 1.0, -0.445], [1, 0, 0, 0]),            # nominal
        _pose_qpos(mj, [1.0, 1.0, -0.445], [1, 0, 0, 0], steer=0.61),
        _pose_qpos(mj, [1.0, 1.0, -0.445], [1, 0, 0, 0], steer=-0.61),
        _pose_qpos(mj, [1.0, 1.0, 0.2], [c, s, 0, 0]),               # 45 deg
        _pose_qpos(mj, [1.0, 1.0, 0.2], [0, 1, 0, 0]),               # flipped
    ]
    for q in poses:
        d.qpos[:] = q
        mujoco.mj_forward(mj, d)
        st = make_state(model, qpos=jnp.asarray(d.qpos.copy()))
        ours = raycast.lidar(model, st.xpos, st.xquat)
        with_robot = raycast.lidar(model, st.xpos, st.xquat,
                                   include_robot_geoms=True)
        rf = np.asarray(d.sensordata[-72:])
        np.testing.assert_allclose(np.asarray(ours), rf, atol=1e-10)
        # robot geoms never shadow anything, in any pose
        np.testing.assert_allclose(np.asarray(with_robot), np.asarray(ours),
                                   atol=0)


def test_lidar_robot_geom_parity_on_intersecting_model():
    """raycast_robot's mj_ray semantics checked on a robot whose geoms DO
    cross the beam plane: a tall box mast and a vertical cylinder are added
    to the chassis, and the include_robot_geoms scan must match MuJoCo's
    rangefinders over random poses (box + cylinder side/cap coverage)."""
    import dataclasses

    from mujoco_playground_tpu.physics import raycast
    from mujoco_playground_tpu.spec.types import GeomSpec

    spec = ackermann_robot_v2()
    base = spec.body("base")
    base.geoms.append(GeomSpec(
        name="mast", type="box", size=(0.02, 0.1, 0.2), pos=(0.2, 0.0, 0.0),
        contype=2, conaffinity=1, group=2, rgba=(1.0, 0.0, 0.0, 1.0)))
    base.geoms.append(GeomSpec(
        name="pole", type="cylinder", size=(0.03, 0.25),
        pos=(-0.2, 0.05, 0.0), contype=2, conaffinity=1, group=2,
        rgba=(0.0, 1.0, 0.0, 1.0)))
    scene = pointmaze_scene("umaze")
    mj = mujoco.MjModel.from_xml_string(to_mjcf(spec, scene))
    model = make_model(spec, scene, dtype=jnp.float64)
    d = mujoco.MjData(mj)
    rng = np.random.RandomState(11)
    hits = 0
    for _ in range(6):
        quat = rng.randn(4)
        quat /= np.linalg.norm(quat)
        d.qpos[:] = _pose_qpos(mj, [1.0, 1.0, 0.3], quat,
                               steer=rng.uniform(-0.61, 0.61))
        mujoco.mj_forward(mj, d)
        st = make_state(model, qpos=jnp.asarray(d.qpos.copy()))
        ours = raycast.lidar(model, st.xpos, st.xquat,
                             include_robot_geoms=True)
        rf = np.asarray(d.sensordata[-72:])
        np.testing.assert_allclose(np.asarray(ours), rf, atol=1e-10)
        default = raycast.lidar(model, st.xpos, st.xquat)
        hits += int((np.asarray(default) != np.asarray(ours)).sum())
    assert hits > 50   # the added geoms really are in the beam plane
