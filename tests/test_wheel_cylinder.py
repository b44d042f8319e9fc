"""Exact wheel (cylinder) narrowphase parity vs MuJoCo 3.10.

Round 2 approximated two wheel regimes (PARITY.md approx 2-3): wheel-vs-box
via a sphere, and a flipped/face-down wheel via rim contacts only.  Both are
now exact manifolds (physics/collision.py):

  * cylinder-plane: MuJoCo's mjc_PlaneCylinder candidates — deepest rim,
    opposite-end rim (rolling partner), and the +-120-degree disc pair on
    the deep face — all separation-gated (empirically characterized against
    MuJoCo: the partner's dist is dist1 + 2h cos(tilt), the pair's
    dist1 + 1.5 r sin(tilt); regime selection falls out of the margin test).
  * cylinder-box: per disc end, the rim-ring point closest to the box
    collides as a point (tread-segment endpoints against wall faces, exact
    rim point when tilted).

The oracle here collides the REAL cylinders through MuJoCo (same generated
MJCF the engine-parity suite uses), at poses covering every regime.
Reference geometry: /root/reference/models/ackermann_robot_v2.xml:39-80.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from mujoco_playground_tpu.physics import collision, engine
from mujoco_playground_tpu.physics.model import make_model
from mujoco_playground_tpu.physics.state import make_state
from mujoco_playground_tpu.spec.mjcf import to_mjcf
from mujoco_playground_tpu.spec.robot import ackermann_robot_v2
from mujoco_playground_tpu.spec.scene import pointmaze_scene

CYL, PLANE, BOX = 5, 0, 6   # mjtGeom enums


@pytest.fixture(scope="module")
def floor_pair():
    spec = ackermann_robot_v2()
    mj = mujoco.MjModel.from_xml_string(to_mjcf(spec))
    model = make_model(spec, dtype=jnp.float64, solver_iterations=20,
                       ls_iterations=12)
    return model, mj


def _quat_roll(roll):
    return [math.cos(roll / 2), math.sin(roll / 2), 0.0, 0.0]


def _mj_wheel_contacts(mj, qpos, other_type):
    d = mujoco.MjData(mj)
    d.qpos[:] = qpos
    mujoco.mj_forward(mj, d)
    out = []
    for i in range(d.ncon):
        c = d.contact[i]
        t1, t2 = mj.geom_type[c.geom1], mj.geom_type[c.geom2]
        if {t1, t2} == {CYL, other_type}:
            # canonicalize to our convention (normal points world->wheel);
            # MuJoCo's points geom1->geom2
            n = np.array(c.frame[:3])
            if t1 == CYL:
                n = -n
            out.append((float(c.dist), np.array(c.pos), n))
    return out


def _our_wheel_contacts(model, qpos, against="plane"):
    st = make_state(model, qpos=jnp.asarray(qpos, jnp.float64))
    cts = collision.collide(model, st.xpos, st.xquat)
    nw = len(model.wheel_body)
    if against == "plane":
        sel = range(0, 4 * nw)
    else:
        n_plane = 4 * nw
        sel = range(n_plane, n_plane + 2 * collision.TOPK_W * nw)
    out = []
    for k in sel:
        dist = float(cts.dist[k])
        if dist < 0:
            out.append((dist, np.asarray(cts.pos[k]),
                        np.asarray(cts.frame[k][0])))
    return out


def _find_height(mj, quat, lo, hi, want_min=-0.004, want_max=-0.0005):
    """Scan chassis height so the deepest wheel-floor contact is shallow
    (avoids margin-boundary flakiness without biasing the comparison)."""
    for z in np.linspace(lo, hi, 120):
        qpos = np.zeros(mj.nq)
        qpos[2] = z
        qpos[3:7] = quat
        qpos[7:] = 0.0
        cs = _mj_wheel_contacts(mj, qpos, PLANE)
        if cs and want_min < min(c[0] for c in cs) < want_max:
            return qpos
    raise AssertionError("no height with shallow wheel-floor contact")


def _assert_contact_sets_match(ours, oracle, atol_dist=1e-9, atol_pos=1e-8):
    assert len(ours) == len(oracle), \
        f"active-contact count: ours {len(ours)} vs mujoco {len(oracle)}"

    def key(c):
        return (round(c[1][0], 6), round(c[1][1], 6), round(c[1][2], 6))

    for (d1, p1, n1), (d2, p2, n2) in zip(sorted(ours, key=key),
                                          sorted(oracle, key=key)):
        np.testing.assert_allclose(d1, d2, atol=atol_dist)
        np.testing.assert_allclose(p1, p2, atol=atol_pos)
        np.testing.assert_allclose(n1, n2, atol=1e-9)


@pytest.mark.parametrize("roll,regime", [
    (math.pi / 2, "face-down discs (flipped robot on its side)"),
    (math.pi / 2 - 0.25, "tilted rim (near face-down)"),
    (0.35, "tilted rolling"),
])
def test_cylinder_plane_manifold_matches_mujoco(floor_pair, roll, regime):
    """Active wheel-plane contacts (count, dist, pos, normal) must equal
    MuJoCo's mjc_PlaneCylinder output at poses spanning all regimes."""
    model, mj = floor_pair
    quat = _quat_roll(roll)
    qpos = _find_height(mj, quat, 0.0, 0.30)
    oracle = _mj_wheel_contacts(mj, qpos, PLANE)
    ours = _our_wheel_contacts(model, qpos, against="plane")
    assert oracle, f"oracle saw no wheel contact ({regime})"
    _assert_contact_sets_match(ours, oracle)


def test_cylinder_plane_rolling_two_rims(floor_pair):
    """Upright rolling: exactly two rim contacts per touching wheel, equal
    to MuJoCo's."""
    model, mj = floor_pair
    qpos = _find_height(mj, [1.0, 0.0, 0.0, 0.0], 0.02, 0.08)
    oracle = _mj_wheel_contacts(mj, qpos, PLANE)
    ours = _our_wheel_contacts(model, qpos, against="plane")
    assert len(oracle) in (4, 8)    # 2 rims x touching wheels
    _assert_contact_sets_match(ours, oracle)


@pytest.fixture(scope="module")
def maze_pair():
    spec = ackermann_robot_v2()
    scene = pointmaze_scene("PointMaze_UMaze-v3")
    mj = mujoco.MjModel.from_xml_string(to_mjcf(spec, scene))
    model = make_model(spec, scene, dtype=jnp.float64, solver_iterations=20,
                       ls_iterations=12)
    return model, mj, scene


def test_cylinder_box_tread_vs_wall(maze_pair):
    """Wheel tread pressed into a wall face: our two rim-ring candidates
    must reproduce MuJoCo's contact depth and normal (MuJoCo's multiCCD
    spreads ~5 points over the tread segment at the same depth; ours are
    the segment endpoints)."""
    model, mj, scene = maze_pair
    # find a wall face: drive the robot center toward the +x wall of the
    # umaze at wheel height; scan x until the oracle reports wheel-box
    # contact at ~1mm
    found = None
    quat = [1.0, 0.0, 0.0, 0.0]
    for x in np.linspace(0.0, 2.0, 400):
        qpos = np.zeros(mj.nq)
        qpos[0] = x
        qpos[2] = scene.floor_z + 0.055
        qpos[3:7] = quat
        cs = _mj_wheel_contacts(mj, qpos, BOX)
        if cs and -0.002 < min(c[0] for c in cs) < -0.0002:
            found = qpos
            break
    assert found is not None, "no wall-touching pose found"
    oracle = _mj_wheel_contacts(mj, found, BOX)
    ours = _our_wheel_contacts(model, found, against="box")
    assert ours, "our narrowphase saw no wheel-box contact"
    o_min = min(c[0] for c in oracle)
    u_min = min(c[0] for c in ours)
    # depth parity: the deepest contact must agree to sub-0.1mm
    assert abs(o_min - u_min) < 1e-4, (o_min, u_min)
    # normal parity on the deepest contact of each side
    on = min(oracle, key=lambda c: c[0])[2]
    un = min(ours, key=lambda c: c[0])[2]
    assert float(np.dot(on, un)) > 0.999
    # positions: ours must lie within the oracle's contact patch extent
    opos = np.stack([c[1] for c in oracle])
    for _, p, _ in ours:
        assert np.min(np.linalg.norm(opos - p, axis=1)) < 0.025


def test_face_down_wheel_rests_stably(floor_pair):
    """A robot on its side (wheel discs flat on the floor) must come to
    rest — the disc pair gives a spanning support polygon.  The round-2
    rim-only manifold could not balance this pose."""
    model, mj = floor_pair
    qpos = _find_height(mj, _quat_roll(math.pi / 2), 0.0, 0.30)
    st = make_state(model, qpos=jnp.asarray(qpos, jnp.float64))
    step = jax.jit(lambda s: engine.step(model, s))
    for _ in range(600):
        st = step(st)
    assert bool(jnp.isfinite(st.qpos).all())
    # at rest: linear + angular velocity tiny, and the chassis has not
    # fallen through the floor
    assert float(jnp.abs(st.qvel[:6]).max()) < 0.05, np.asarray(st.qvel[:6])
    assert float(st.qpos[2]) > -0.05


@pytest.mark.slow
def test_megakernel_collision_twin_matches_at_extreme_poses(floor_pair):
    """The Pallas collide_lanes twin (interpret mode) must reproduce the
    host narrowphase through a full step at tilted/flipped poses — the
    regimes where the new manifold slots activate."""
    from mujoco_playground_tpu.ops import step_pallas

    spec = ackermann_robot_v2()
    model = make_model(spec, dtype=jnp.float32, solver_iterations=4,
                       ls_iterations=3)
    B = 8
    rolls = np.linspace(0.0, math.pi, B)          # upright ... upside down
    qpos = np.zeros((B, model.qpos0.shape[0]), np.float32)
    for i, roll in enumerate(rolls):
        qpos[i, 2] = 0.06
        qpos[i, 3:7] = _quat_roll(float(roll))
    st = jax.vmap(lambda q: make_state(model, qpos=q))(jnp.asarray(qpos))
    ctrl = jnp.tile(jnp.asarray([0.2, 5.0, 5.0], jnp.float32), (B, 1))
    st = st.replace(ctrl=ctrl)
    step_ref = jax.jit(jax.vmap(lambda s: engine.step(model, s)))
    for _ in range(3):
        st = step_ref(st)

    fn = step_pallas.build_step_fn(model, 4, 3, block_b=B, interpret=True)
    qp, qv, xp, xq, _ = fn(st.qpos, st.qvel, st.ctrl,
                           warmstart=st.qacc_warmstart)
    ref = step_ref(st)
    assert float(jnp.max(jnp.abs(qp - ref.qpos))) < 1e-6
    assert float(jnp.max(jnp.abs(qv - ref.qvel))) < 1e-4
