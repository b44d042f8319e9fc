"""Domain randomization: per-env physics actually differ, semantics hold."""
import jax
import jax.numpy as jnp
import numpy as np

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
    np.testing.assert_allclose(qpos[0], qpos[-1], atol=1e-12)


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
