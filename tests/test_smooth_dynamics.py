"""Parity tests for the smooth (constraint-free) dynamics vs MuJoCo CPU.

The reference's physics layer is the MuJoCo C engine (SURVEY.md §1 L1); these
tests pin our TPU-native reimplementation to it: forward kinematics, the CRBA
mass matrix, RNEA bias forces, and compile-time invweight constants, evaluated
at randomized states on the Ackermann robot model.
"""
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from mujoco_playground_tpu.physics import inertia, kinematics
from mujoco_playground_tpu.physics.model import make_model
from mujoco_playground_tpu.spec.mjcf import to_mjcf
from mujoco_playground_tpu.spec.robot import ackermann_robot_v2


@pytest.fixture(scope="module")
def models():
    spec = ackermann_robot_v2()
    model = make_model(spec, dtype=jnp.float64)
    mj = mujoco.MjModel.from_xml_string(to_mjcf(spec))
    return model, mj


def random_states(mj, n, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(n):
        qpos = np.array(mj.qpos0, copy=True)
        qpos[0:3] = rng.uniform(-1, 1, 3)
        q = rng.randn(4)
        qpos[3:7] = q / np.linalg.norm(q)
        qpos[7:] = rng.uniform(-0.5, 0.5, 6)
        qvel = rng.uniform(-2, 2, 12)
        yield qpos, qvel


def test_fk_matches_mujoco(models):
    model, mj = models
    d = mujoco.MjData(mj)
    name2mj = {mujoco.mj_id2name(mj, mujoco.mjtObj.mjOBJ_BODY, i): i
               for i in range(mj.nbody)}
    for qpos, qvel in random_states(mj, 5):
        d.qpos[:] = qpos
        mujoco.mj_forward(mj, d)
        xpos, xquat = kinematics.fk(model, jnp.asarray(qpos))
        for i, n in enumerate(model.body_names):
            if n in name2mj:
                np.testing.assert_allclose(
                    np.asarray(xpos[i]), d.xpos[name2mj[n]], atol=1e-12)
                qe = min(np.abs(np.asarray(xquat[i]) - d.xquat[name2mj[n]]).max(),
                         np.abs(np.asarray(xquat[i]) + d.xquat[name2mj[n]]).max())
                assert qe < 1e-12


def test_mass_matrix_and_bias_match_mujoco(models):
    model, mj = models
    d = mujoco.MjData(mj)
    mask = jnp.asarray(kinematics.ancestor_mask(model))
    for qpos, qvel in random_states(mj, 5):
        d.qpos[:] = qpos
        d.qvel[:] = qvel
        mujoco.mj_forward(mj, d)
        xpos, xquat = kinematics.fk(model, jnp.asarray(qpos))
        M, S, anchor = inertia.crba(model, xpos, xquat, mask)
        Mmj = np.zeros((model.nv, model.nv))
        mujoco.mj_fullM(mj, d, Mmj)
        np.testing.assert_allclose(np.asarray(M), Mmj, atol=1e-16 + 1e-10)
        bias = inertia.bias_force(model, xpos, xquat, jnp.asarray(qvel),
                                  S, mask, anchor)
        np.testing.assert_allclose(np.asarray(bias), d.qfrc_bias, atol=1e-10)


def test_invweight0_matches_mujoco_for_jointed_bodies(models):
    model, mj = models
    name2mj = {mujoco.mj_id2name(mj, mujoco.mjtObj.mjOBJ_BODY, i): i
               for i in range(mj.nbody)}
    # Wheels and steering knuckles (the bodies that actually contact) must
    # match exactly; the fused chassis intentionally differs (MuJoCo computes
    # it on the unfused massless chassis body).
    for n in model.body_names[2:]:
        i = model.body_names.index(n)
        np.testing.assert_allclose(
            np.asarray(model.body_invweight0[i]), mj.body_invweight0[name2mj[n]],
            rtol=1e-9)
    np.testing.assert_allclose(np.asarray(model.dof_invweight0)[6:],
                               mj.dof_invweight0[6:], rtol=1e-9)
