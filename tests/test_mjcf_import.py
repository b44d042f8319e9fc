"""MJCF import: roundtrip through export + replicate expansion vs MuJoCo."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from mujoco_playground_tpu.physics import engine, make_model, make_state, sensors
from mujoco_playground_tpu.spec.mjcf import to_mjcf
from mujoco_playground_tpu.spec.mjcf_import import from_mjcf
from mujoco_playground_tpu.spec.robot import ackermann_robot_v2
from mujoco_playground_tpu.spec.scene import pointmaze_scene


@pytest.mark.slow
def test_roundtrip_export_import_dynamics():
    """to_mjcf -> from_mjcf -> make_model reproduces the original engine."""
    spec0 = ackermann_robot_v2()
    xml = to_mjcf(spec0)
    spec1 = from_mjcf(xml)
    m0 = make_model(spec0, dtype=jnp.float64, solver_iterations=10,
                    ls_iterations=8)
    m1 = make_model(spec1, dtype=jnp.float64, solver_iterations=10,
                    ls_iterations=8)
    assert m1.nq == m0.nq and m1.nv == m0.nv and m1.nu == m0.nu
    assert m1.nsite == m0.nsite
    np.testing.assert_allclose(np.asarray(m1.body_mass),
                               np.asarray(m0.body_mass), atol=1e-12)
    np.testing.assert_allclose(np.asarray(m1.site_quat),
                               np.asarray(m0.site_quat), atol=1e-10)

    s0 = make_state(m0, qpos=m0.qpos0.at[2].set(0.1))
    s1 = make_state(m1, qpos=m1.qpos0.at[2].set(0.1))
    ctrl = jnp.asarray([0.3, 8.0, 8.0])
    s0 = s0.replace(ctrl=ctrl)
    s1 = s1.replace(ctrl=ctrl)
    for _ in range(50):
        s0 = engine.step(m0, s0)
        s1 = engine.step(m1, s1)
    np.testing.assert_allclose(np.asarray(s1.qpos), np.asarray(s0.qpos),
                               atol=1e-10)


def test_replicate_expansion_matches_mujoco():
    xml = """
    <mujoco model="rep">
      <compiler angle="degree"/>
      <worldbody>
        <body name="hub" pos="0 0 0.5">
          <freejoint/>
          <geom type="sphere" size="0.05" mass="1"/>
          <body name="ring" pos="0 0 0.1">
            <replicate count="12" sep="-" euler="0 0 30">
              <site name="s" pos="0.2 0 0" euler="0 90 0" size="0.003"/>
            </replicate>
          </body>
        </body>
      </worldbody>
      <sensor><rangefinder name="beam" site="s" cutoff="5"/></sensor>
    </mujoco>"""
    spec = from_mjcf(xml)
    mj = mujoco.MjModel.from_xml_string(xml)
    model = make_model(spec, dtype=jnp.float64)
    assert model.nsite == mj.nsite == 12
    assert len([k for k in model.sensor_kinds if k == "rangefinder"]) == 12
    # world-frame site positions + ray directions identical to MuJoCo's
    # replicate expansion (our compiler fuses the jointless ring body into
    # the hub, so local frames differ by construction)
    from mujoco_playground_tpu.physics import kinematics
    d = mujoco.MjData(mj)
    mujoco.mj_forward(mj, d)
    st = make_state(model)
    pos, zaxis = kinematics.site_frames(model, st.xpos, st.xquat)
    for i in range(12):
        name = f"s-{i:02d}"
        sid = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_SITE, name)
        k = model.site_names.index(name)
        np.testing.assert_allclose(np.asarray(pos[k]), d.site_xpos[sid],
                                   atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(zaxis[k]),
            d.site_xmat[sid].reshape(3, 3)[:, 2], atol=1e-10,
            err_msg=f"site {name} ray direction mismatch")


def test_import_unsupported_mesh_warns():
    xml = """
    <mujoco><worldbody><body name="b" pos="0 0 1"><freejoint/>
      <geom type="mesh" mesh="m"/>
      <inertial mass="1" pos="0 0 0" diaginertia="0.1 0.1 0.1"/>
    </body></worldbody></mujoco>"""
    with pytest.warns(UserWarning, match="mesh geom skipped"):
        spec = from_mjcf(xml)
    assert spec.body("b").inertial.mass == 1.0
