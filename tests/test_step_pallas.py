"""Parity test for the fused full-step Pallas megakernel (ops/step_pallas.py).

Runs the kernel in interpret mode on CPU at a tiny batch and compares one
full physics step — qpos/qvel/xpos/xquat — against the per-env reference
``engine.step`` (itself parity-tested against MuJoCo 3.10 in
tests/test_engine_parity.py).  States are warmed up so wheel/wall contacts
are active and the Newton constraint solve is exercised, not just the
smooth path.

Reference semantics: one mj_step per env step at 500 Hz
(/root/reference/src/rl/envs/ackermann_env.py:200).
"""
import jax
import jax.numpy as jnp
import pytest

from mujoco_playground_tpu.envs import make_ackermann_env
from mujoco_playground_tpu.physics import engine
from mujoco_playground_tpu.ops import step_pallas

pytestmark = pytest.mark.slow  # interpret-mode kernels / long-horizon (full tier)

B = 8


@pytest.fixture(scope="module")
def warm_states():
    env = make_ackermann_env("maze", "umaze", solver_iterations=4,
                             ls_iterations=3)
    model = env.model
    states = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(0), B))
    phys = states.physics
    # steer + drive into the maze walls so contacts activate
    ctrl = jnp.tile(jnp.asarray([0.3, 10.0, 10.0], phys.qpos.dtype), (B, 1))
    phys = phys.replace(ctrl=ctrl)
    step_ref = jax.jit(jax.vmap(lambda s: engine.step(model, s)))
    for _ in range(5):
        phys = step_ref(phys)
    return env, model, phys, step_ref


def test_megakernel_matches_engine_step(warm_states):
    env, model, phys, step_ref = warm_states
    step_fn = step_pallas.build_step_fn(model, 4, 3, block_b=B,
                                        interpret=True)
    qpos_n, qvel_n, xpos_n, xquat_n, qacc_n = step_fn(
        phys.qpos, phys.qvel, phys.ctrl, warmstart=phys.qacc_warmstart)
    ref = step_ref(phys)
    # the env model is f32 (production dtype) even under the x64 test
    # config: agreement should be at f32 rounding relative to state scale
    # (positions O(1), velocities O(10); measured 7e-9 / 2e-6).
    assert float(jnp.max(jnp.abs(qpos_n - ref.qpos))) < 1e-7
    assert float(jnp.max(jnp.abs(qvel_n - ref.qvel))) < 1e-5
    assert float(jnp.max(jnp.abs(xpos_n - ref.xpos))) < 1e-7
    assert float(jnp.max(jnp.abs(xquat_n - ref.xquat))) < 1e-7


def test_megakernel_fused_lidar_matches_raycast(warm_states):
    """with_lidar=True must return the exact post-step scan the standalone
    raycast computes on the stepped frames."""
    from mujoco_playground_tpu.physics import raycast
    env, model, phys, step_ref = warm_states
    step_fn = step_pallas.build_step_fn(model, 4, 3, block_b=B,
                                        interpret=True, with_lidar=True)
    qpos_n, qvel_n, xpos_n, xquat_n, _, lidar = step_fn(
        phys.qpos, phys.qvel, phys.ctrl, warmstart=phys.qacc_warmstart)
    ref_lidar = jax.vmap(lambda xp, xq: raycast.lidar(model, xp, xq))(
        xpos_n, xquat_n)
    assert lidar.shape == (B, 72)
    assert float(jnp.max(jnp.abs(lidar - ref_lidar.astype(lidar.dtype)))) \
        < 1e-5
    # and the physics outputs are unchanged by the fused scan
    plain = step_pallas.build_step_fn(model, 4, 3, block_b=B, interpret=True)
    qp2, qv2, _, _, _ = plain(phys.qpos, phys.qvel, phys.ctrl,
                              warmstart=phys.qacc_warmstart)
    assert float(jnp.max(jnp.abs(qpos_n - qp2))) == 0.0
    assert float(jnp.max(jnp.abs(qvel_n - qv2))) == 0.0


def test_is_concrete_model(warm_states):
    env, model, phys, _ = warm_states
    assert step_pallas.is_concrete_model(model)

    def traced(m_qd):
        m = model.replace(dof_damping=m_qd)
        return jnp.float32(step_pallas.is_concrete_model(m))

    # under jit the leaf is a tracer -> not concrete
    recorded = []

    def probe(m_qd):
        m = model.replace(dof_damping=m_qd)
        recorded.append(step_pallas.is_concrete_model(m))
        return m_qd

    jax.jit(probe)(model.dof_damping)
    assert recorded == [False]


def test_megakernel_fused_env_matches_observe_and_reward(warm_states):
    """with_env fuses the whole obs+reward pipeline: the env_out slab must
    match _observe_batch + the env reward block computed on the kernel's
    own post-step frames, for both the faithful and the sane/aliased/shaped
    config variants."""
    import numpy as np

    env, model, phys, step_ref = warm_states
    B_ = phys.qpos.shape[0]
    rng = jax.random.PRNGKey(5)
    ref_xy = jax.random.uniform(rng, (B_, 2), phys.qpos.dtype, -1.0, 1.0)
    goal = jax.random.uniform(jax.random.PRNGKey(6), (B_, 2),
                              phys.qpos.dtype, -3.0, 3.0)
    prev_gd = jnp.linalg.norm(goal - ref_xy, axis=-1)
    env_in = jnp.concatenate([ref_xy, goal, prev_gd[:, None]], axis=-1)

    from mujoco_playground_tpu.envs.ackermann_env import (AckermannEnv,
                                                          EnvConfig,
                                                          OdometryRef)

    for cfg_kw in (dict(),
                   dict(collision_ignores_nohit=True,
                        progress_reward_scale=3.0),
                   dict(reference_lidar_aliasing=True)):
        cfg = EnvConfig(**cfg_kw)
        e = AckermannEnv(scene=env.scene, config=cfg,
                         solver_iterations=4, ls_iterations=3)
        statics = e._env_statics()
        step_fn = step_pallas.build_step_fn(model, 4, 3, block_b=B_,
                                            interpret=True,
                                            with_env=statics)
        qp, qv, xp, xq, _, slab = step_fn(phys.qpos, phys.qvel, phys.ctrl,
                                          env_in,
                                          warmstart=phys.qacc_warmstart)
        ref = OdometryRef(
            position=jnp.pad(ref_xy, ((0, 0), (0, 1))),
            quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0], phys.qpos.dtype),
                          (B_, 1)))
        post = phys.replace(qpos=qp, qvel=qv, xpos=xp, xquat=xq)
        obs, metrics = e._observe_batch(post, ref, goal)
        ns = model.nsite
        np.testing.assert_allclose(np.asarray(slab[:, :ns + 7]),
                                   np.asarray(obs), rtol=1e-5, atol=1e-5)
        gd = metrics["goal_distance"]
        term = gd < cfg.goal_distance_threshold
        want_reward = (-gd * 0.1 + jnp.where(term, 100.0, 0.0)
                       + jnp.where(metrics["collision"], -50.0, 0.0)
                       - 0.01
                       + cfg.progress_reward_scale * (prev_gd - gd))
        np.testing.assert_allclose(np.asarray(slab[:, ns + 7]),
                                   np.asarray(want_reward),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(slab[:, ns + 8]),
                                   np.asarray(gd), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(slab[:, ns + 9]),
                                   np.asarray(metrics["min_lidar"]),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(slab[:, ns + 10]) > 0.5,
                                      np.asarray(metrics["collision"]))
        np.testing.assert_array_equal(np.asarray(slab[:, ns + 11]) > 0.5,
                                      np.asarray(term))


def test_megakernel_fresh_scan_matches_raycast(warm_states):
    """with_fresh appends fresh-spawn lidar rows: they must equal the
    standalone raycast at the template pose translated to the fresh xy."""
    import numpy as np

    from mujoco_playground_tpu.physics import raycast

    env, model, phys, step_ref = warm_states
    B_ = phys.qpos.shape[0]
    statics = env._env_statics()
    fresh_statics = env._fresh_statics()
    step_fn = step_pallas.build_step_fn(model, 4, 3, block_b=B_,
                                        interpret=True, with_env=statics,
                                        with_fresh=fresh_statics)
    rng = jax.random.PRNGKey(11)
    ref_xy = jnp.zeros((B_, 2), phys.qpos.dtype)
    goal = jax.random.uniform(rng, (B_, 2), phys.qpos.dtype, -3.0, 3.0)
    fresh_xy = jax.random.uniform(jax.random.PRNGKey(12), (B_, 2),
                                  phys.qpos.dtype, -1.5, 1.5)
    env_in = jnp.concatenate(
        [ref_xy, goal, jnp.linalg.norm(goal, axis=-1)[:, None], fresh_xy],
        axis=-1)
    *_, slab = step_fn(phys.qpos, phys.qvel, phys.ctrl, env_in)
    ns = model.nsite
    assert slab.shape == (B_, 2 * ns + 12)

    t = env._template
    off = np.asarray(fresh_xy) - np.asarray(t.qpos[:2])   # (B, 2)
    xpos = np.tile(np.asarray(t.xpos)[None], (B_, 1, 1))
    xpos[:, 1:, :2] += off[:, None, :]
    # world body 0 carries no sites; shift it too for a uniform transform
    xpos[:, 0, :2] += off
    xquat = np.tile(np.asarray(t.xquat)[None], (B_, 1, 1))
    want = jax.vmap(lambda xp, xq: raycast.lidar(model, xp, xq))(
        jnp.asarray(xpos, phys.qpos.dtype), jnp.asarray(xquat,
                                                        phys.qpos.dtype))
    np.testing.assert_allclose(np.asarray(slab[:, ns + 12:]),
                               np.asarray(want), rtol=1e-5, atol=1e-5)


def test_fresh_obs_assembly_matches_observe():
    """The fused auto-reset's trivial obs tail (zero odometry, constant
    heading, goal geometry) must equal _observe_batch on the fresh state."""
    import numpy as np

    env = make_ackermann_env("maze", "umaze", solver_iterations=2,
                             ls_iterations=2)
    B_ = 16
    rngs = jax.random.split(jax.random.PRNGKey(4), B_)
    fresh = jax.vmap(env.reset_core)(rngs)
    obs, _ = env._observe_batch(fresh.physics, fresh.odom_ref, fresh.goal)
    from mujoco_playground_tpu.physics.mathutil import quat_to_yaw
    heading0 = float(quat_to_yaw(env._template.xquat[1]))
    g = fresh.goal
    ang = jnp.arctan2(g[:, 1], g[:, 0]) - heading0
    ang = jnp.arctan2(jnp.sin(ang), jnp.cos(ang))
    tail = jnp.concatenate([
        jnp.zeros((B_, 2), obs.dtype),
        jnp.full((B_, 1), heading0, obs.dtype),
        g, fresh.prev_goal_distance[:, None], ang[:, None]], axis=-1)
    np.testing.assert_allclose(np.asarray(obs[:, 72:]), np.asarray(tail),
                               rtol=1e-5, atol=1e-6)
