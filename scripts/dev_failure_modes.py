"""Failure-mode analysis for a trained PPO checkpoint on the maze task.

Plays N deterministic eval episodes (one per env slot, no auto-reset, the
evaluate_agent protocol) and classifies the failures:

  * success            — reached the goal
  * stuck              — truncated with final speed ~0 and a wall close by
                         (pressed against geometry, never recovered)
  * timeout_progress   — truncated while still moving and geodesically
                         closer than at spawn (ran out of budget)
  * lost               — truncated, not closer than at spawn

Prints a JSON summary with per-class counts and distance/length stats —
the evidence that picks the next training lever (budget vs control vs
exploration).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev_failure_modes.py \
        --log-dir /tmp/r5_solved_k [env knobs matching the run] --episodes 256
"""
import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/.axon_site")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log-dir", required=True)
    p.add_argument("--episodes", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-velocity", type=float, default=1.5)
    p.add_argument("--max-angular", type=float, default=3.0)
    p.add_argument("--max-episode-steps", type=int, default=3000)
    p.add_argument("--hidden", type=int, nargs="+", default=[64, 64])
    p.add_argument("--collision-penalty", type=float, default=-5.0)
    p.add_argument("--geodesic-reward", type=float, default=10.0)
    p.add_argument("--goal-compass", action="store_true")
    args = p.parse_args()

    from mujoco_playground_tpu.rl import checkpoint as ckpt_lib
    from mujoco_playground_tpu.rl import ppo
    from mujoco_playground_tpu.rl.config import RLConfig
    from mujoco_playground_tpu.rl.evaluate import deterministic_policy
    from mujoco_playground_tpu.rl.networks import ActorCritic
    from mujoco_playground_tpu.rl.train import build_env
    from mujoco_playground_tpu.envs import geodesic

    config = RLConfig(
        env_type="maze", maze_id="PointMaze_UMaze-v3",
        max_linear_velocity=args.max_velocity,
        max_angular_velocity=args.max_angular,
        max_episode_steps=args.max_episode_steps,
        hidden_sizes=tuple(args.hidden),
        sane_collision=True,
        collision_penalty=args.collision_penalty,
        geodesic_reward=args.geodesic_reward,
        goal_compass=args.goal_compass,
        normalize_obs=True, normalize_reward=True,
        log_dir=args.log_dir, seed=args.seed)
    env = build_env(config)
    network = ActorCritic(action_size=env.action_size,
                          hidden=tuple(config.hidden_sizes))
    ts = ppo.init_train_state(env, network, config,
                              jax.random.PRNGKey(config.seed))
    latest = ckpt_lib.latest_checkpoint(os.path.join(args.log_dir, "ppo"))
    if not latest:
        raise SystemExit(f"no checkpoint under {args.log_dir}/ppo")
    ts = ckpt_lib.restore_checkpoint(latest, ts)
    print(f"restored {latest} (global_step {int(ts.global_step)})",
          file=sys.stderr)
    policy = deterministic_policy(network, ts.params, norm=ts.norm)

    B = args.episodes
    states = jax.vmap(env.reset)(
        jax.random.split(jax.random.PRNGKey(args.seed), B))
    phi0 = geodesic.sample(env._geo_fields, env._geo_origin, env._geo_res,
                           states.goal_cell, states.physics.xpos[:, 1, :2])

    def body(carry, _):
        st, finished, succ, length, coll_steps, slow_steps = carry
        act = policy(st.obs)
        nxt = env.step_batch(st, act)
        live = ~finished
        succ = succ | (nxt.terminated & live)
        length = length + live.astype(jnp.int32)
        coll_steps = coll_steps + (nxt.collision & live).astype(jnp.int32)
        speed = jnp.linalg.norm(
            nxt.physics.qvel[:, 0:2], axis=-1)
        slow_steps = slow_steps + ((speed < 0.05) & live).astype(jnp.int32)
        finished = finished | nxt.done
        # freeze finished slots (keep their final state by re-selecting)
        keep = lambda new, old: jnp.where(
            live.reshape(live.shape + (1,) * (new.ndim - 1)), new, old)
        st = jax.tree.map(keep, nxt, st)
        return (st, finished, succ, length, coll_steps, slow_steps), None

    z = jnp.zeros((B,), jnp.int32)
    f = jnp.zeros((B,), bool)
    (st, fin, succ, length, coll, slow), _ = jax.lax.scan(
        body, (states, f, f, z, z, z), None, length=args.max_episode_steps)

    succ = np.asarray(succ)
    length = np.asarray(length)
    coll = np.asarray(coll)
    slow = np.asarray(slow)
    gd = np.asarray(st.goal_distance)
    phiN = np.asarray(geodesic.sample(
        env._geo_fields, env._geo_origin, env._geo_res, st.goal_cell,
        st.physics.xpos[:, 1, :2]))
    phi0 = np.asarray(phi0)
    min_lid = np.asarray(st.min_lidar)

    # start cell = nearest free cell to the spawn xy; goal cell from state
    cells = np.asarray(env.scene.free_cells)
    spawn = np.asarray(states.physics.xpos[:, 1, :2])
    start_cell = np.argmin(
        np.linalg.norm(spawn[:, None, :] - cells[None], axis=-1), axis=1)
    goal_cell = np.asarray(states.goal_cell)

    fail = ~succ
    stuck = fail & (slow > 0.3 * length) & (min_lid < 0.4)
    closer = phiN < 0.5 * phi0
    timeout_progress = fail & ~stuck & closer
    lost = fail & ~stuck & ~closer
    out = {
        "episodes": int(B),
        "success": int(succ.sum()),
        "stuck": int(stuck.sum()),
        "timeout_progress": int(timeout_progress.sum()),
        "lost": int(lost.sum()),
        "succ_len_mean": float(length[succ].mean()) if succ.any() else None,
        "fail_final_goal_dist_mean": float(gd[fail].mean()) if fail.any() else None,
        "fail_phi_frac_mean": float((phiN[fail] / np.maximum(phi0[fail], 1e-6)).mean()) if fail.any() else None,
        "fail_collision_frac_mean": float((coll[fail] / np.maximum(length[fail], 1)).mean()) if fail.any() else None,
        "fail_slow_frac_mean": float((slow[fail] / np.maximum(length[fail], 1)).mean()) if fail.any() else None,
        "phi0_mean_fail": float(phi0[fail].mean()) if fail.any() else None,
        "phi0_mean_succ": float(phi0[succ].mean()) if succ.any() else None,
    }
    K = len(cells)
    mat_n = np.zeros((K, K), int)
    mat_s = np.zeros((K, K), int)
    for sc, gc, ok in zip(start_cell, goal_cell, succ):
        mat_n[sc, gc] += 1
        mat_s[sc, gc] += int(ok)
    out["cells"] = [list(map(float, c)) for c in cells]
    out["pair_success"] = [
        [f"{mat_s[i, j]}/{mat_n[i, j]}" for j in range(K)] for i in range(K)]
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
