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


# ---------------------------------------------------------------------------
# Mesh ingestion (VERDICT r4 next #7): import the REFERENCE XML verbatim —
# mesh paths intact — and reproduce the hand-spec's baked compiled constants.
# ---------------------------------------------------------------------------

REF_XML = "/root/reference/models/ackermann_robot_v2.xml"


def _tensor(quat, diag):
    w, x, y, z = quat
    R = np.array([[1-2*(y*y+z*z), 2*(x*y-w*z), 2*(x*z+w*y)],
                  [2*(x*y+w*z), 1-2*(x*x+z*z), 2*(y*z-w*x)],
                  [2*(x*z-w*y), 2*(y*z+w*x), 1-2*(x*x+y*y)]])
    return R @ np.diag(diag) @ R.T


def test_import_reference_xml_reproduces_baked_inertials():
    """Golden: legacy mesh mass properties on Base/Ceiling STLs == the
    constants spec/robot.py baked from MuJoCo's compiler."""
    from mujoco_playground_tpu.spec import robot as rb
    from mujoco_playground_tpu.spec.mjcf_import import from_mjcf_file
    spec = from_mjcf_file(REF_XML)
    by = {b.name: b for b in spec.bodies}
    for name, baked in (("base", rb._BASE_INERTIAL),
                        ("ceiling", rb._CEILING_INERTIAL)):
        got = by[name].inertial
        assert got.mass == pytest.approx(baked.mass, abs=1e-12)
        np.testing.assert_allclose(got.pos, baked.pos, atol=1e-12)
        np.testing.assert_allclose(
            _tensor(got.quat, got.diaginertia),
            _tensor(baked.quat, baked.diaginertia), atol=1e-12)


def test_import_reference_xml_hull_equivalent_to_baked():
    """Imported hull clouds describe the same convex body as the baked
    ones: every imported vert on the baked hull and vice versa (MuJoCo's
    graph keeps a few collinear edge verts qhull drops — surface-distance
    equivalence, not vertex-set equality)."""
    from scipy.spatial import ConvexHull
    from mujoco_playground_tpu.spec import robot as rb
    from mujoco_playground_tpu.spec.mjcf_import import from_mjcf_file
    spec = from_mjcf_file(REF_XML)
    by = {b.name: b for b in spec.bodies}
    for name, baked in (("base", rb._BASE_HULL), ("ceiling", rb._CEILING_HULL)):
        hv = np.asarray(by[name].geoms[0].hull)
        bh = np.asarray(baked)

        def max_outside(points, cloud):
            eq = ConvexHull(cloud).equations
            return float((points @ eq[:, :3].T + eq[:, 3]).max())

        assert max_outside(hv, bh) < 1e-6
        assert max_outside(bh, hv) < 1e-6
        assert by[name].geoms[0].hull_faces  # compat manifold stays usable


def test_mesh_mass_properties_match_mujoco_all_modes(tmp_path):
    """spec.mesh reproduces MuJoCo's compiler for every mesh-inertia mode
    on the reference STLs (legacy is MuJoCo's default — what the
    reference models compile with)."""
    from mujoco_playground_tpu.spec import mesh as mesh_lib
    for stl in ("Base", "Ceiling"):
        path = f"/root/reference/CAD Models/{stl}.stl"
        tris = mesh_lib.load_stl(path)
        for mode in ("legacy", "exact", "convex", "shell"):
            xml = f"""<mujoco>
              <asset><mesh name="m" file="{path}" inertia="{mode}"/></asset>
              <worldbody><body name="b"><freejoint/>
                <geom type="mesh" mesh="m" mass="5"/>
              </body></worldbody></mujoco>"""
            mj = mujoco.MjModel.from_xml_string(xml)
            m, com, I = mesh_lib.mesh_mass_properties(tris, mass=5.0,
                                                      mode=mode)
            np.testing.assert_allclose(com, mj.body_ipos[1], atol=1e-8)
            np.testing.assert_allclose(
                I, _tensor(mj.body_iquat[1], mj.body_inertia[1]), atol=1e-8)


def test_import_reference_xml_dynamics_match_handspec():
    """End-to-end: the Model built from the verbatim reference XML steps
    bit-comparably to the hand-spec Model (same engine, same trajectory)."""
    from mujoco_playground_tpu.spec.mjcf_import import from_mjcf_file
    from mujoco_playground_tpu.spec.robot import ackermann_robot_v2
    spec_i = from_mjcf_file(REF_XML)
    spec_h = ackermann_robot_v2()
    m_i = make_model(spec_i, dtype=jnp.float64, solver_iterations=10,
                     ls_iterations=8)
    m_h = make_model(spec_h, dtype=jnp.float64, solver_iterations=10,
                     ls_iterations=8)
    assert m_i.nq == m_h.nq and m_i.nv == m_h.nv and m_i.nu == m_h.nu
    assert m_i.nsite == m_h.nsite == 72
    np.testing.assert_allclose(np.asarray(m_i.body_mass),
                               np.asarray(m_h.body_mass), atol=1e-10)
    s_i = make_state(m_i)
    s_h = make_state(m_h)
    ctrl = jnp.asarray([0.3, 9.0, 9.0])
    s_i = s_i.replace(ctrl=ctrl)
    s_h = s_h.replace(ctrl=ctrl)
    step_i = jax.jit(lambda s: engine.step(m_i, s))
    step_h = jax.jit(lambda s: engine.step(m_h, s))
    for _ in range(100):
        s_i = step_i(s_i)
        s_h = step_h(s_h)
    np.testing.assert_allclose(np.asarray(s_i.qpos), np.asarray(s_h.qpos),
                               rtol=0, atol=1e-6)
