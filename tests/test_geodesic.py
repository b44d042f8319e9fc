"""Geodesic progress-shaping tests (envs/geodesic.py + env integration).

The geodesic potential is the solved-task configs' shaping knob (no
reference counterpart — the reference has no shaping; this knob exists to
get past its 0% success plateau, VERDICT r4 next #1).  Verified here:

* field soundness on the real umaze scene — no off-goal local minimum
  anywhere in free space (the property Euclidean shaping lacks);
* bilinear sampling semantics;
* env integration: reward == faithful reward + scale * (phi_prev -
  phi_new) on the same trajectory, telescoping over multiple steps;
* the fused megakernel gate traces with the shaping applied on top
  (interpret mode, same harness as test_fused_gate).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_playground_tpu.envs import geodesic, make_ackermann_env
from mujoco_playground_tpu.physics import engine
from mujoco_playground_tpu.spec.scene import pointmaze_scene

RES = 0.05


@pytest.fixture(scope="module")
def umaze_fields():
    scene = pointmaze_scene("PointMaze_UMaze-v3")
    fields, origin = geodesic.build_fields(scene, resolution=RES)
    return scene, fields, origin


def test_field_zero_at_goal_and_positive_elsewhere(umaze_fields):
    scene, fields, origin = umaze_fields
    occ, origin2 = geodesic.rasterize_walls(scene, RES)
    np.testing.assert_allclose(origin, origin2.astype(np.float32))
    for k, (cx, cy) in enumerate(scene.free_cells):
        j = int(round((cx - origin[0]) / RES))
        i = int(round((cy - origin[1]) / RES))
        assert fields[k, i, j] == 0.0
        # positive everywhere else
        f = fields[k].copy()
        f[i, j] = 1.0
        assert (f > 0).all()


def test_no_local_minimum_in_free_space(umaze_fields):
    """Every free grid node except the goal has a strictly-lower
    8-neighbor: gradient descent on the potential reaches the goal from
    anywhere — the property that kills the U-turn local optimum."""
    scene, fields, origin = umaze_fields
    occ, _ = geodesic.rasterize_walls(scene, RES)
    H, W = occ.shape
    for k in range(fields.shape[0]):
        f = fields[k]
        fp = np.pad(f, 1, constant_values=np.inf)
        best = np.full_like(f, np.inf)
        for di in (0, 1, 2):
            for dj in (0, 1, 2):
                if (di, dj) == (1, 1):
                    continue
                best = np.minimum(best, fp[di:di + H, dj:dj + W])
        check = ~occ & (f > 0)
        assert (best[check] < f[check]).all()


def test_geodesic_exceeds_euclid_around_the_u(umaze_fields):
    """From the left arm of the U to the other arm the geodesic potential
    must be much larger than straight-line distance (the wall detour),
    while along an open corridor they agree within the octile bound."""
    scene, fields, origin = umaze_fields
    cells = np.asarray(scene.free_cells)
    # goal cell = (-1, 1) (one U arm tip); probe at (-1, -1) (other arm
    # tip): straight-line 2 m through the center wall, ~6 m by corridor
    gi = int(np.argmin(np.linalg.norm(cells - np.array([-1.0, 1.0]), axis=1)))
    phi = geodesic.sample(jnp.asarray(fields), jnp.asarray(origin), RES,
                          jnp.asarray(gi), jnp.asarray([-1.0, -1.0]))
    assert float(phi) > 4.5
    # probe (1, 1): same corridor, Euclid 2 m -> phi ~2 m (octile bound)
    phi_mid = geodesic.sample(jnp.asarray(fields), jnp.asarray(origin), RES,
                              jnp.asarray(gi), jnp.asarray([1.0, 1.0]))
    assert abs(float(phi_mid) - 2.0) < 0.2


def test_bilinear_sampling(umaze_fields):
    scene, fields, origin = umaze_fields
    fj = jnp.asarray(fields)
    oj = jnp.asarray(origin)
    # exactly on a grid node
    i, j, k = 30, 40, 2
    xy = jnp.asarray([origin[0] + j * RES, origin[1] + i * RES])
    assert np.isclose(float(geodesic.sample(fj, oj, RES, jnp.asarray(k), xy)),
                      fields[k, i, j], atol=1e-6)
    # midpoint between two nodes = mean of the nodes
    xy = jnp.asarray([origin[0] + (j + 0.5) * RES, origin[1] + i * RES])
    assert np.isclose(float(geodesic.sample(fj, oj, RES, jnp.asarray(k), xy)),
                      0.5 * (fields[k, i, j] + fields[k, i, j + 1]), atol=1e-6)
    # batched == per-element
    cells = jnp.asarray([0, 3, 6], jnp.int32)
    xys = jnp.asarray([[1.0, 1.0], [2.0, 3.0], [3.0, 1.5]])
    batched = geodesic.sample(fj, oj, RES, cells, xys)
    single = [float(geodesic.sample(fj, oj, RES, cells[i], xys[i]))
              for i in range(3)]
    np.testing.assert_allclose(np.asarray(batched), single, rtol=1e-6)


@pytest.fixture(scope="module")
def geo_env_pair():
    kw = dict(solver_iterations=4, ls_iterations=3)
    plain = make_ackermann_env("maze", "umaze", **kw)
    geo = make_ackermann_env("maze", "umaze", geodesic_reward_scale=7.0, **kw)
    return plain, geo


def test_env_reward_is_faithful_plus_geo_delta(geo_env_pair):
    plain, geo = geo_env_pair
    rng = jax.random.PRNGKey(11)
    s_p = plain.reset(rng)
    s_g = geo.reset(rng)
    np.testing.assert_allclose(np.asarray(s_p.obs), np.asarray(s_g.obs))
    action = jnp.asarray([0.7, -0.3])
    deltas = []
    for _ in range(3):
        n_p = jax.jit(plain.step)(s_p, action)
        n_g = jax.jit(geo.step)(s_g, action)
        phi_p = geodesic.sample(geo._geo_fields, geo._geo_origin,
                                geo._geo_res, s_g.goal_cell,
                                s_g.physics.xpos[1, :2])
        phi_n = geodesic.sample(geo._geo_fields, geo._geo_origin,
                                geo._geo_res, s_g.goal_cell,
                                n_g.physics.xpos[1, :2])
        expect = float(n_p.reward) + 7.0 * (float(phi_p) - float(phi_n))
        assert np.isclose(float(n_g.reward), expect, rtol=1e-4, atol=1e-5)
        deltas.append(float(n_g.reward) - float(n_p.reward))
        s_p, s_g = n_p, n_g
    # telescoping: summed shaping == scale * (phi(start) - phi(end))
    s0 = geo.reset(rng)
    phi0 = geodesic.sample(geo._geo_fields, geo._geo_origin, geo._geo_res,
                           s0.goal_cell, s0.physics.xpos[1, :2])
    phiN = geodesic.sample(geo._geo_fields, geo._geo_origin, geo._geo_res,
                           s_g.goal_cell, s_g.physics.xpos[1, :2])
    assert np.isclose(sum(deltas), 7.0 * (float(phi0) - float(phiN)),
                      rtol=1e-4, atol=1e-5)


def test_batched_fallback_matches_single(geo_env_pair):
    _, geo = geo_env_pair
    B = 4
    states = jax.vmap(geo.reset)(jax.random.split(jax.random.PRNGKey(5), B))
    actions = jnp.tile(jnp.asarray([[0.8, 0.2]]), (B, 1))
    batch = jax.jit(geo.step_batch)(states, actions)
    singles = [jax.jit(geo.step)(jax.tree.map(lambda l: l[i], states),
                                 actions[i]) for i in range(B)]
    np.testing.assert_allclose(
        np.asarray(batch.reward),
        np.asarray([float(s.reward) for s in singles]), rtol=2e-4, atol=2e-4)


def test_fused_gate_traces_with_geodesic(geo_env_pair):
    """The megakernel gate (interpret mode) must trace with the shaping
    stacked on the kernel's reward output and the goal_cell state leaf
    threading through the auto-reset merge."""
    _, geo = geo_env_pair
    B = 8
    states = jax.vmap(geo.reset)(jax.random.split(jax.random.PRNGKey(9), B))
    actions = jnp.zeros((B, 2), states.obs.dtype)
    old = engine.FORCE_MEGAKERNEL
    try:
        engine.FORCE_MEGAKERNEL = B
        fused = jax.jit(geo.step_autoreset_batch)(states, actions)
        jax.block_until_ready(fused.obs)
        engine.FORCE_MEGAKERNEL = False
        plain = jax.jit(lambda s, a: geo.step_autoreset_batch(s, a))(
            states, actions)
    finally:
        engine.FORCE_MEGAKERNEL = old
    np.testing.assert_allclose(np.asarray(fused.reward),
                               np.asarray(plain.reward), rtol=2e-4, atol=2e-4)
    assert fused.goal_cell.shape == (B,)


# ----------------------------------------------------------- goal compass
@pytest.fixture(scope="module")
def compass_env():
    return make_ackermann_env("maze", "umaze", geodesic_reward_scale=10.0,
                              goal_compass=True, solver_iterations=4,
                              ls_iterations=3)


def test_compass_obs_size_and_unit_norm(compass_env):
    env = compass_env
    assert env.obs_size == 81
    B = 6
    states = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(2), B))
    assert states.obs.shape == (B, 81)
    norms = np.linalg.norm(np.asarray(states.obs[:, 79:81]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    nxt = jax.jit(env.step_batch)(states, jnp.zeros((B, 2)))
    assert nxt.obs.shape == (B, 81)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(nxt.obs[:, 79:81]), axis=-1), 1.0,
        atol=1e-5)


def test_compass_points_along_corridor_not_through_wall(compass_env):
    """Robot in one U-arm tip, goal in the other: the straight-line goal
    direction points through the center wall (-y for a robot at the top
    arm), but the compass must point along the corridor (+x toward the
    open side)."""
    env = compass_env
    cells = np.asarray(env.scene.free_cells)
    gi = int(np.argmin(np.linalg.norm(cells - np.array([-1.0, -1.0]),
                                      axis=1)))
    # robot at (-1, 1) heading 0 (facing +x); goal cell (-1, -1)
    xy = jnp.asarray([-1.0, 1.0])
    goal_vec = jnp.asarray([0.0, -2.0])
    comp = env._compass(xy, jnp.asarray(0.0), jnp.asarray(gi), goal_vec)
    comp = np.asarray(comp)
    assert comp[0] > 0.8, comp          # along the corridor (+x)
    # straight-line direction would be (0, -1): compass must disagree
    assert abs(comp[1]) < 0.6


def test_compass_fused_gate_matches_fallback(compass_env):
    env = compass_env
    B = 8
    states = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(4), B))
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
    np.testing.assert_allclose(np.asarray(fused.obs[:, 79:81]),
                               np.asarray(plain.obs[:, 79:81]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fused.reward),
                               np.asarray(plain.reward), rtol=2e-4,
                               atol=2e-4)


def test_compass_open_floor_falls_back_to_goal_direction():
    env = make_ackermann_env("simple", goal_compass=True,
                             solver_iterations=4, ls_iterations=3)
    assert env.obs_size == 81
    s = env.reset(jax.random.PRNGKey(0))
    comp = np.asarray(s.obs[79:81])
    # world goal direction rotated into the robot frame must match the
    # obs goal angle
    ang = float(s.obs[78])
    np.testing.assert_allclose(comp, [np.cos(ang), np.sin(ang)], atol=1e-4)
