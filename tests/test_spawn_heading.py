"""Spawn-heading randomization (EnvConfig.spawn_heading_noise).

The reference spawns every episode facing +x (its settle template's
heading); the opt-in knob rotates the whole settled robot about the
chassis origin by a uniform yaw at reset.  Verified: the rotation is a
rigid-body rotation of the template (wheel offsets rotate with the
chassis, frame distances preserved), the observed heading matches the
sampled yaw, driving moves along the new heading, and the batched
auto-reset path (which must skip the in-kernel template-baked fresh scan)
stays consistent with the plain reset.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_playground_tpu.envs import make_ackermann_env
from mujoco_playground_tpu.physics import engine
from mujoco_playground_tpu.physics.mathutil import quat_to_yaw


@pytest.fixture(scope="module")
def yaw_env():
    return make_ackermann_env("maze", "umaze", spawn_heading_noise=np.pi,
                              solver_iterations=4, ls_iterations=3)


def test_reset_rotates_rigidly(yaw_env):
    env = yaw_env
    base = make_ackermann_env("maze", "umaze", solver_iterations=4,
                              ls_iterations=3)
    headings = []
    for seed in range(6):
        s = env.reset(jax.random.PRNGKey(seed))
        h = float(quat_to_yaw(s.physics.xquat[1]))
        headings.append(h)
        assert np.isclose(float(s.obs[74]), h, atol=1e-5)
        # rigid rotation: body-to-chassis distances match the template
        rel = np.asarray(s.physics.xpos - s.physics.xpos[1])
        rel0 = np.asarray(base._template.xpos - base._template.xpos[1])
        np.testing.assert_allclose(
            np.linalg.norm(rel[1:], axis=1),
            np.linalg.norm(rel0[1:], axis=1), atol=1e-5)
        # wheel offsets rotate WITH the chassis: de-rotating by the yaw
        # recovers the template offsets
        c, sn = np.cos(h), np.sin(h)
        derot = np.stack([rel[1:, 0] * c + rel[1:, 1] * sn,
                          -rel[1:, 0] * sn + rel[1:, 1] * c,
                          rel[1:, 2]], axis=-1)
        np.testing.assert_allclose(derot, rel0[1:], atol=1e-5)
    # the yaws actually vary
    assert np.ptp(headings) > 1.0


def test_driving_follows_heading(yaw_env):
    env = yaw_env
    s = env.reset(jax.random.PRNGKey(3))
    h = float(quat_to_yaw(s.physics.xquat[1]))
    start = np.asarray(s.physics.xpos[1, :2])
    step = jax.jit(env.step)
    for _ in range(100):
        s = step(s, jnp.asarray([1.0, 0.0]))
    d = np.asarray(s.physics.xpos[1, :2]) - start
    assert np.linalg.norm(d) > 0.05
    ang = abs(np.arctan2(d[1], d[0]) - h)
    ang = min(ang, 2 * np.pi - ang)
    assert ang < 0.3, (d, h)


def test_autoreset_batch_consistent(yaw_env):
    env = yaw_env
    B = 8
    states = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(1), B))
    actions = jnp.full((B, 2), 0.5, states.obs.dtype)
    old = engine.FORCE_MEGAKERNEL
    try:
        engine.FORCE_MEGAKERNEL = B
        fused = jax.jit(env.step_autoreset_batch)(states, actions)
        jax.block_until_ready(fused.obs)
        engine.FORCE_MEGAKERNEL = False
        plain = jax.jit(lambda s, a: env.step_autoreset_batch(s, a))(
            states, actions)
    finally:
        engine.FORCE_MEGAKERNEL = old
    np.testing.assert_allclose(np.asarray(fused.reward),
                               np.asarray(plain.reward), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(fused.obs), np.asarray(plain.obs),
                               rtol=2e-3, atol=2e-3)
