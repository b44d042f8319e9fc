"""Evaluate a committed PPO checkpoint and write EVAL.json next to it.

The solved-task artifact protocol (VERDICT r4 next #1): >=100 deterministic
eval episodes of the restored checkpoint, stats + config + commit recorded
in machine-readable form.  Run on the TPU:

    PYTHONPATH=/root/repo:/root/.axon_site \
        python scripts/solved_eval.py --log-dir rl_logs/solved \
            [env knobs matching the training run] --episodes 256
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/.axon_site")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log-dir", required=True)
    p.add_argument("--episodes", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-velocity", type=float, default=1.0)
    p.add_argument("--max-angular", type=float, default=1.0)
    p.add_argument("--max-episode-steps", type=int, default=1000)
    p.add_argument("--goal-threshold", type=float, default=0.5)
    p.add_argument("--maze-id", default="PointMaze_UMaze-v3")
    p.add_argument("--hidden", type=int, nargs="+", default=[64, 64])
    p.add_argument("--sane-collision", action="store_true")
    p.add_argument("--collision-penalty", type=float, default=-50.0)
    p.add_argument("--progress-reward", type=float, default=0.0)
    p.add_argument("--geodesic-reward", type=float, default=0.0)
    p.add_argument("--goal-compass", action="store_true")
    p.add_argument("--spawn-heading-noise", type=float, default=0.0)
    p.add_argument("--normalize", action="store_true")
    p.add_argument("--random-baseline", action="store_true",
                   help="also evaluate a uniform-random policy for contrast")
    p.add_argument("--checkpoint", default=None,
                   help="explicit checkpoint dir (default: latest under "
                        "<log-dir>/ppo) — model selection across the "
                        "committed save cadence")
    p.add_argument("--out", default=None,
                   help="EVAL.json path (default <log-dir>/EVAL.json)")
    p.add_argument("--note", default="")
    args = p.parse_args()

    from mujoco_playground_tpu.rl import checkpoint as ckpt_lib
    from mujoco_playground_tpu.rl import ppo
    from mujoco_playground_tpu.rl.config import RLConfig
    from mujoco_playground_tpu.rl.evaluate import (deterministic_policy,
                                                   evaluate_agent)
    from mujoco_playground_tpu.rl.networks import ActorCritic
    from mujoco_playground_tpu.rl.train import build_env

    config = RLConfig(
        env_type="maze", maze_id=args.maze_id,
        max_linear_velocity=args.max_velocity,
        max_angular_velocity=args.max_angular,
        max_episode_steps=args.max_episode_steps,
        goal_distance_threshold=args.goal_threshold,
        hidden_sizes=tuple(args.hidden),
        sane_collision=args.sane_collision,
        collision_penalty=args.collision_penalty,
        progress_reward=args.progress_reward,
        geodesic_reward=args.geodesic_reward,
        goal_compass=args.goal_compass,
        spawn_heading_noise=args.spawn_heading_noise,
        normalize_obs=args.normalize, normalize_reward=args.normalize,
        log_dir=args.log_dir, seed=args.seed)
    env = build_env(config)
    network = ActorCritic(action_size=env.action_size,
                          hidden=tuple(config.hidden_sizes))
    ts = ppo.init_train_state(env, network, config,
                              jax.random.PRNGKey(config.seed))
    ckpt_dir = os.path.join(args.log_dir, "ppo")
    latest = args.checkpoint or ckpt_lib.latest_checkpoint(ckpt_dir)
    if not latest:
        raise SystemExit(f"no checkpoint under {ckpt_dir}")
    ts = ckpt_lib.restore_checkpoint(latest, ts)
    gs = ckpt_lib.checkpoint_step(latest)
    gs = int(ts.global_step) if gs is None else gs
    print(f"restored {latest} (global_step {gs})")

    policy = deterministic_policy(
        network, ts.params, norm=ts.norm if config.normalize_obs else None)
    stats = evaluate_agent(env, policy, num_episodes=args.episodes,
                           rng=jax.random.PRNGKey(args.seed))
    print(json.dumps(stats, indent=2))

    commit = subprocess.run(
        ["git", "-C", "/root/repo", "describe", "--always", "--dirty"],
        capture_output=True, text=True).stdout.strip()
    record = {
        "checkpoint": latest,
        "global_step": gs,
        "commit": commit,
        "protocol": (f"rl/evaluate.evaluate_agent, {args.episodes} parallel "
                     f"episodes, deterministic policy, eval seed "
                     f"{args.seed}, max {args.max_episode_steps} steps"),
        "env": {
            "maze_id": args.maze_id,
            "max_linear_velocity": args.max_velocity,
            "max_angular_velocity": args.max_angular,
            "max_episode_steps": args.max_episode_steps,
            "goal_threshold": args.goal_threshold,
            "sane_collision": args.sane_collision,
            "collision_penalty": args.collision_penalty,
            "progress_reward": args.progress_reward,
            "geodesic_reward": args.geodesic_reward,
            "goal_compass": args.goal_compass,
            "spawn_heading_noise": args.spawn_heading_noise,
            "normalize": args.normalize,
            "hidden": list(args.hidden),
        },
        "eval": stats,
    }
    if args.random_baseline:
        import jax.numpy as jnp

        def rand_policy(obs):
            # hash the obs through a fixed key so the policy is stateless
            key = jax.random.PRNGKey(123)
            return jax.random.uniform(key, (obs.shape[0], 2),
                                      minval=-1.0, maxval=1.0)
        record["random_baseline"] = evaluate_agent(
            env, rand_policy, num_episodes=args.episodes,
            rng=jax.random.PRNGKey(args.seed))
    if args.note:
        record["notes"] = args.note
    out = args.out or os.path.join(args.log_dir, "EVAL.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
