"""End-to-end trace + parity test for the FUSED TPU hot path on CPU.

Round-2 shipped two megakernel fusions that crashed on real TPU because no
test ever drove the public entry points (``step_autoreset_batch`` /
``step_batch``) through the fused gate: the gate requires a TPU platform, so
the CPU suite silently exercised only the XLA fallback (VERDICT r2 weak #4).

``engine.FORCE_MEGAKERNEL`` (set to a block size) flips the gate on CPU in
interpret mode.  These tests jit the REAL env entry points through it —
catching trace-time failures (e.g. the round-2 ``float(quat_to_yaw(...))``
ConcretizationTypeError at envs/ackermann_env.py) and checking the fused
obs/reward/auto-reset semantics against the XLA fallback path.

Mosaic *lowering* failures (e.g. atan2 unimplemented on TPU) cannot be seen
in interpret mode — scripts/tpu_smoke.py covers those on the real chip.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_playground_tpu.envs import make_ackermann_env
from mujoco_playground_tpu.physics import engine

B = 8


@pytest.fixture
def force_megakernel():
    old = engine.FORCE_MEGAKERNEL
    engine.FORCE_MEGAKERNEL = B
    yield
    engine.FORCE_MEGAKERNEL = old


@pytest.fixture(scope="module")
def env_and_states():
    env = make_ackermann_env("maze", "umaze", solver_iterations=4,
                             ls_iterations=3)
    states = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(3), B))
    actions = jax.random.uniform(jax.random.PRNGKey(7), (B, 2),
                                 states.obs.dtype, -1.0, 1.0)
    return env, states, actions


def _run_both(env, states, actions, fn_name):
    """Run an env entry point once through the fused gate and once through
    the XLA fallback (separate jit wrappers — the gate is read at trace
    time)."""
    fn = getattr(env, fn_name)
    engine.FORCE_MEGAKERNEL = B
    fused = jax.jit(fn)(states, actions)
    jax.block_until_ready(fused.obs)
    engine.FORCE_MEGAKERNEL = False
    plain = jax.jit(lambda s, a: fn(s, a))(states, actions)
    jax.block_until_ready(plain.obs)
    return fused, plain


def test_fused_paths_trace(force_megakernel, env_and_states):
    """QUICK gate: abstractly trace every public entry point through the
    megakernel gate (jax.eval_shape runs the full trace — including the
    Pallas kernel bodies — without interpret-mode execution, so it catches
    trace-time failures like the round-2 ConcretizationTypeError in
    seconds).  The numeric fused-vs-fallback parity lives in the `slow`
    tests below; Mosaic lowering is scripts/tpu_smoke.py's job."""
    env, states, actions = env_and_states
    out = jax.eval_shape(env.step_batch, states, actions)
    assert out.obs.shape == (B, env.obs_size)
    out = jax.eval_shape(env.step_autoreset_batch, states, actions)
    assert out.obs.shape == (B, env.obs_size)


def test_fused_dr_path_traces(force_megakernel):
    """QUICK gate: the domain-randomized fused path (DR megakernel with
    in-kernel obs/reward + fresh scan, per-env plane_z lanes) traces
    end-to-end."""
    from mujoco_playground_tpu.envs.domain_randomization import \
        DomainRandomizedEnv
    from mujoco_playground_tpu.ops import step_pallas
    env0 = make_ackermann_env("maze", "umaze", solver_iterations=4,
                              ls_iterations=3)
    env = DomainRandomizedEnv(env0, B, jax.random.PRNGKey(2))
    states = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(3), B))
    actions = jnp.zeros((B, 2))
    calls = []
    orig = step_pallas.build_step_fn

    def spy(*a, **kw):
        calls.append(kw)
        return orig(*a, **kw)

    step_pallas.build_step_fn = spy
    try:
        out = jax.eval_shape(env.step_autoreset_batch, states, actions)
    finally:
        step_pallas.build_step_fn = orig
    assert out.obs.shape == (B, env.obs_size)
    assert any(kw.get("dr_fields") and kw.get("with_env") is not None
               and kw.get("with_fresh") is not None for kw in calls), \
        "DR autoreset step must take the fused DR megakernel path"


@pytest.mark.slow
def test_step_batch_fused_gate_matches_fallback(force_megakernel,
                                                env_and_states):
    env, states, actions = env_and_states
    fused, plain = _run_both(env, states, actions, "step_batch")
    np.testing.assert_allclose(np.asarray(fused.physics.qpos),
                               np.asarray(plain.physics.qpos),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fused.obs), np.asarray(plain.obs),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused.reward),
                               np.asarray(plain.reward),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(fused.done),
                                  np.asarray(plain.done))
    np.testing.assert_allclose(np.asarray(fused.goal_distance),
                               np.asarray(plain.goal_distance),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_step_autoreset_batch_fused_gate_matches_fallback(force_megakernel,
                                                          env_and_states):
    """The round-2 crash site: the fresh-lidar branch (fresh obs assembly
    from the fused continuation scan) only traces when the megakernel
    returns a slab.  Force some dones so the fresh obs actually selects."""
    env, states, actions = env_and_states
    # make half the batch hit the episode timeout this step (deterministic
    # done via truncation; exercises the fresh-reset merge + fused fresh obs)
    steps = jnp.where(jnp.arange(B) % 2 == 0,
                      env.config.max_episode_steps - 1, 0
                      ).astype(states.steps.dtype)
    states = states.replace(steps=steps)
    fused, plain = _run_both(env, states, actions, "step_autoreset_batch")
    assert bool(jnp.any(fused.done)), "test must exercise the reset branch"
    np.testing.assert_allclose(np.asarray(fused.reward),
                               np.asarray(plain.reward),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(fused.done),
                                  np.asarray(plain.done))
    np.testing.assert_allclose(np.asarray(fused.final_obs),
                               np.asarray(plain.final_obs),
                               rtol=1e-5, atol=1e-5)
    # continuation obs: fused assembles reset-env rows from the in-kernel
    # fresh scan; fallback observes the post-merge state — must agree.
    # RNG streams are identical (reset_core consumes the same split).
    np.testing.assert_allclose(np.asarray(fused.physics.qpos),
                               np.asarray(plain.physics.qpos),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fused.obs), np.asarray(plain.obs),
                               rtol=1e-5, atol=1e-5)


def test_fused_gate_used(force_megakernel, env_and_states):
    """The knob must actually route through the Pallas builder (guards
    against the gate silently regressing to the fallback)."""
    from mujoco_playground_tpu.ops import step_pallas
    env, states, actions = env_and_states
    calls = []
    orig = step_pallas.build_step_fn

    def spy(*a, **kw):
        calls.append(kw)
        return orig(*a, **kw)

    step_pallas.build_step_fn, engine_builder = spy, orig
    try:
        # abstract trace suffices (and keeps this in the quick tier): the
        # gate is read at trace time, so the spy fires without executing
        # the interpret-mode kernel
        jax.eval_shape(env.step_autoreset_batch, states, actions)
    finally:
        step_pallas.build_step_fn = engine_builder
    assert calls, "megakernel builder never invoked under FORCE_MEGAKERNEL"
    assert any(kw.get("with_env") is not None and
               kw.get("with_fresh") is not None for kw in calls), \
        "autoreset step must fuse obs+reward AND the fresh continuation scan"
