"""Parity test for the fused Pallas lidar kernel (ops/lidar_pallas.py)
against the XLA raycast (physics/raycast.py), itself oracle-tested against
MuJoCo rangefinder sensordata in tests/test_engine_parity.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_playground_tpu.envs import make_ackermann_env
from mujoco_playground_tpu.ops import lidar_pallas
from mujoco_playground_tpu.physics import engine, raycast

pytestmark = pytest.mark.slow  # interpret-mode kernels / long-horizon (full tier)

B = 8


def test_lidar_kernel_matches_raycast():
    env = make_ackermann_env("maze", "umaze", solver_iterations=2,
                             ls_iterations=2)
    states = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(0), B))
    p = states.physics
    # drive toward walls so beams hit boxes at varied angles
    ctrl = jnp.tile(jnp.asarray([0.4, 8.0, 8.0], p.qpos.dtype), (B, 1))
    p = p.replace(ctrl=ctrl)
    stepf = jax.jit(jax.vmap(lambda s: engine.step(env.model, s)))
    for _ in range(30):
        p = stepf(p)

    ref = jax.vmap(lambda xp, xq: raycast.lidar(env.model, xp, xq))(
        p.xpos, p.xquat)
    fn = lidar_pallas.build_lidar_fn(env.model, block_b=B, interpret=True)
    got = fn(p.xpos, p.xquat)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    # beams must include real hits (walls) for the test to mean anything
    assert int((np.asarray(ref) >= 0).sum()) > 0
