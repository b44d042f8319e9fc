"""Domain randomization: per-env physics actually differ, semantics hold."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_playground_tpu.envs import make_ackermann_env
from mujoco_playground_tpu.envs.domain_randomization import (
    DomainRandomizedEnv, RandomizationConfig, model_axes, randomize_model)


def test_randomized_leaves_have_env_axis():
    env = make_ackermann_env("simple", solver_iterations=2, ls_iterations=2)
    models = randomize_model(env.model, jax.random.PRNGKey(0), 8)
    assert models.wheel_friction.shape == (8,) + env.model.wheel_friction.shape
    assert models.body_mass.shape == (8,) + env.model.body_mass.shape
    axes = model_axes(env.model, models)
    assert axes.wheel_friction == 0 and axes.qpos0 is None


def test_identical_actions_diverge_across_randomized_envs():
    env0 = make_ackermann_env("simple", solver_iterations=3, ls_iterations=2)
    B = 8
    env = DomainRandomizedEnv(env0, B, jax.random.PRNGKey(1))
    # identical starts: same reset key for every env slot
    same_key = jnp.tile(jax.random.PRNGKey(0)[None], (B, 1))
    states = jax.jit(jax.vmap(env.reset))(same_key)
    np.testing.assert_array_equal(np.asarray(states.physics.qpos[0]),
                                  np.asarray(states.physics.qpos[-1]))
    acts = jnp.tile(jnp.asarray([0.8, 0.5]), (B, 1))
    step = jax.jit(env.step_batch)
    for _ in range(50):
        states = step(states, acts)
    x = np.asarray(states.physics.qpos[:, 0])
    yaw = np.asarray(states.physics.qpos[:, 6])
    assert np.isfinite(np.asarray(states.obs)).all()
    # same actions + same starts but different physics => spread trajectories
    assert x.std() > 1e-4 or yaw.std() > 1e-4


def test_unrandomized_envs_stay_identical():
    env0 = make_ackermann_env("simple", solver_iterations=3, ls_iterations=2)
    B = 4
    tight = RandomizationConfig(
        friction_scale=(1.0, 1.0), mass_scale=(1.0, 1.0),
        damping_scale=(1.0, 1.0), frictionloss_scale=(1.0, 1.0),
        armature_scale=(1.0, 1.0), actuator_gain_scale=(1.0, 1.0),
        floor_z_offset=(0.0, 0.0))
    env = DomainRandomizedEnv(env0, B, jax.random.PRNGKey(1), tight)
    same_key = jnp.tile(jax.random.PRNGKey(0)[None], (B, 1))
    states = jax.jit(jax.vmap(env.reset))(same_key)
    acts = jnp.tile(jnp.asarray([0.8, 0.5]), (B, 1))
    step = jax.jit(env.step_batch)
    for _ in range(20):
        states = step(states, acts)
    qpos = np.asarray(states.physics.qpos)
    # Not exactly 0 on CPU: XLA may duplicate the qacc computation for the
    # extra qacc_warmstart output buffer with different vectorization
    # (remainder lanes take the scalar libm path), giving 1-ulp lane
    # differences that the warm-start feedback then amplifies — measured
    # 2e-11 after 20 steps, still 4+ orders below anything physical.  On
    # the TPU's uniform VPU lanes the trajectories stay bit-identical.
    np.testing.assert_allclose(qpos[0], qpos[-1], atol=1e-8)


@pytest.mark.slow
def test_dr_fast_path_matches_per_env_vmap():
    """The batched DR fast path equals vmapping the per-env step over
    (model_axes, state, action) — f64, exact."""
    import jax.numpy as jnp

    env0 = make_ackermann_env("simple", dtype=jnp.float64,
                              solver_iterations=6, ls_iterations=4)
    B = 8
    env = DomainRandomizedEnv(env0, B, jax.random.PRNGKey(2))
    states = jax.jit(jax.vmap(env.reset))(jax.random.split(jax.random.PRNGKey(0), B))
    acts = jax.random.uniform(jax.random.PRNGKey(1), (B, 2),
                              minval=-1.0, maxval=1.0)
    fast = jax.jit(env.step_batch)(states, acts)
    slow = jax.jit(jax.vmap(env0.step, in_axes=(0, 0, env._axes)))(
        states, acts, env.models)
    np.testing.assert_allclose(np.asarray(fast.physics.qpos),
                               np.asarray(slow.physics.qpos), atol=1e-12)
    np.testing.assert_allclose(np.asarray(fast.obs), np.asarray(slow.obs),
                               atol=1e-10)


@pytest.mark.slow
def test_dr_megakernel_matches_staged_path():
    """The domain-randomized megakernel (per-env scalar parameters packed
    as lane inputs, physics/engine.py DR branch) must match the staged
    XLA DR path through a full physics step, with real per-env parameter
    variation.  Traced through the gate via engine.FORCE_MEGAKERNEL."""
    import jax.numpy as jnp

    from mujoco_playground_tpu.envs.domain_randomization import \
        randomize_model
    from mujoco_playground_tpu.physics import engine

    env0 = make_ackermann_env("maze", "umaze", solver_iterations=4,
                              ls_iterations=3)
    m = env0.model
    B = 8
    models = randomize_model(m, jax.random.PRNGKey(7), B)
    states = jax.vmap(env0.reset)(jax.random.split(jax.random.PRNGKey(0), B))
    phys = states.physics.replace(
        ctrl=jnp.tile(jnp.asarray([0.3, 10.0, 10.0], jnp.float32), (B, 1)))
    ref = jax.jit(lambda s: engine.step_batch(models, s, base_model=m))(phys)
    old = engine.FORCE_MEGAKERNEL
    engine.FORCE_MEGAKERNEL = B
    try:
        out = jax.jit(lambda s: engine.step_batch(models, s,
                                                  base_model=m))(phys)
    finally:
        engine.FORCE_MEGAKERNEL = old
    np.testing.assert_allclose(np.asarray(out.qpos), np.asarray(ref.qpos),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.qvel), np.asarray(ref.qvel),
                               atol=1e-4)
    # sanity: dynamics vary across envs (per-env parameters + spawns)
    assert float(jnp.std(out.qvel, axis=0).max()) > 1e-3


@pytest.mark.slow
def test_dr_fused_env_matches_staged_path():
    """The DR megakernel's FUSED obs/reward/auto-reset path (round-4: the
    randomized plane_z rides into the in-kernel raycast as a per-env lane)
    must match the staged per-env XLA observe through
    step_autoreset_batch."""
    import jax.numpy as jnp

    from mujoco_playground_tpu.physics import engine

    env0 = make_ackermann_env("maze", "umaze", solver_iterations=4,
                              ls_iterations=3)
    B = 8
    # wide floor randomization so a fused/staged plane_z mismatch in the
    # lidar would be visible well above f32 noise
    cfg = RandomizationConfig(floor_z_offset=(-0.02, 0.02))
    env = DomainRandomizedEnv(env0, B, jax.random.PRNGKey(5), cfg)
    states = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(0), B))
    acts = jax.random.uniform(jax.random.PRNGKey(1), (B, 2),
                              minval=-1.0, maxval=1.0)

    ref = jax.jit(env.step_autoreset_batch)(states, acts)
    old = engine.FORCE_MEGAKERNEL
    engine.FORCE_MEGAKERNEL = B
    try:
        out = jax.jit(env.step_autoreset_batch)(states, acts)
    finally:
        engine.FORCE_MEGAKERNEL = old
    np.testing.assert_allclose(np.asarray(out.obs), np.asarray(ref.obs),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.reward),
                               np.asarray(ref.reward), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.done), np.asarray(ref.done))


def test_lidar_rows_take_per_env_plane_z_lane():
    """The in-kernel raycast must consume plane_z as a (B,) lane: with the
    chassis pitched nose-down (beams 30 degrees below horizontal) a per-env
    floor height changes each env's forward reading, and each lane must
    equal the static-plane scan at that env's own plane_z."""
    import jax.numpy as jnp

    from mujoco_playground_tpu.ops.lidar_pallas import (lidar_rows,
                                                        lidar_statics)

    env = make_ackermann_env("simple", solver_iterations=2, ls_iterations=2)
    stat = lidar_statics(env.model)
    site_body = stat[0]
    b = site_body[0]
    B = 4
    # pitch +30 deg about +Y: the forward half of the beam circle tilts
    # 30 degrees below horizontal and sees the floor
    half = np.deg2rad(30.0) / 2
    quat = [float(np.cos(half)), 0.0, float(np.sin(half)), 0.0]
    bp = {b: [jnp.zeros((B,)), jnp.zeros((B,)), jnp.full((B,), 0.2)]}
    bq = {b: [jnp.full((B,), q) for q in quat]}
    plane_lane = jnp.asarray([0.0, -0.05, -0.1, -0.2])
    rows = lidar_rows(*(stat[:5] + (plane_lane,) + stat[6:]), bp, bq)
    arr = np.asarray(rows)             # (nsite, B)
    hit_all = (arr >= 0).all(axis=1)
    assert hit_all.any(), "no beam saw the floor in every env"
    assert arr[hit_all].std(axis=1).max() > 1e-3, "per-env plane_z ignored"
    for j, pz in enumerate(np.asarray(plane_lane)):
        bp1 = {b: [leaf[j:j + 1] for leaf in bp[b]]}
        bq1 = {b: [leaf[j:j + 1] for leaf in bq[b]]}
        ref = lidar_rows(*(stat[:5] + (float(pz),) + stat[6:]), bp1, bq1)
        np.testing.assert_allclose(np.asarray(rows)[:, j],
                                   np.asarray(ref)[:, 0], atol=1e-6)
