"""Scripted-expert ceiling probe for the umaze task.

Evaluates a hand-crafted goal-seeking policy (pure-pursuit toward the goal
with lidar wall repulsion) through the SAME evaluate_agent harness the
trainers use, to measure what success rate near-optimal driving achieves
within the task's 1000-step (2 s) episode budget at a given max velocity.
This bounds what any learned policy can reach and calibrates the
solved-run target (VERDICT r3 item 5).

Usage:
    python scripts/dev_scripted_ceiling.py [--max-velocity 1.5] [--episodes 512]
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/.axon_site")

import jax
import jax.numpy as jnp

from mujoco_playground_tpu.envs import make_ackermann_env
from mujoco_playground_tpu.rl.evaluate import evaluate_agent


def scripted_policy(env):
    """obs (B, 79) -> action (B, 2) in [-1, 1].

    obs layout: [72 lidar, x, y, heading, dx, dy, dist, angle_to_goal]
    (envs/ackermann_env.py _observe; angle is goal bearing MINUS heading,
    wrapped).  Strategy: full throttle scaled down in turns, steer
    proportionally to the bearing error, bias away from near walls.
    """

    def policy(obs):
        angle = obs[..., 78]
        dist = obs[..., 77]
        lidar = obs[..., :72]
        valid = jnp.where(lidar < 0, 12.0, lidar)
        left = jnp.min(valid[..., 6:30], axis=-1)
        right = jnp.min(valid[..., 42:66], axis=-1)
        front = jnp.minimum(jnp.min(valid[..., :6], axis=-1),
                            jnp.min(valid[..., 66:72], axis=-1))
        back = jnp.min(valid[..., 30:42], axis=-1)

        # the robot's turn rate saturates near 0.6 rad/s (steering clip +
        # understeer), so a U-turn costs more than the 2 s episode; goals
        # in the rear hemisphere are driven to in REVERSE (negative
        # linear_x flips the pursuit axis)
        fwd = jnp.abs(angle) <= jnp.pi / 2
        e_rev = jnp.where(angle > 0, angle - jnp.pi, angle + jnp.pi)
        err = jnp.where(fwd, angle, e_rev)

        repulse = jnp.where(jnp.minimum(left, right) < 0.22,
                            jnp.where(left < right, -1.0, 1.0), 0.0)
        steer = jnp.clip(3.0 * err + 1.0 * repulse, -1.0, 1.0)
        mag = jnp.clip(1.0 - 0.5 * jnp.abs(err), 0.3, 1.0)
        clear = jnp.where(fwd, front, back)
        mag = jnp.where(clear < 0.2, 0.35, mag)
        mag = jnp.where(dist < 0.3, 0.45, mag)
        speed = jnp.where(fwd, mag, -mag)
        return jnp.stack([speed, steer], axis=-1)

    return policy


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max-velocity", type=float, default=1.5)
    p.add_argument("--max-angular", type=float, default=1.0)
    p.add_argument("--episodes", type=int, default=512)
    p.add_argument("--maze", default="PointMaze_UMaze-v3")
    p.add_argument("--max-episode-steps", type=int, default=1000,
                   help="episode budget (500 Hz steps; 1000 = the "
                        "reference's 2 s)")
    p.add_argument("--spawn-heading-noise", type=float, default=0.0)
    args = p.parse_args()

    env = make_ackermann_env(
        env_type="maze", maze_id=args.maze,
        max_linear_velocity=args.max_velocity,
        max_angular_velocity=args.max_angular,
        max_episode_steps=args.max_episode_steps,
        spawn_heading_noise=args.spawn_heading_noise,
        collision_ignores_nohit=True)
    stats = evaluate_agent(env, scripted_policy(env),
                           num_episodes=args.episodes,
                           rng=jax.random.PRNGKey(7))
    print(f"max_velocity={args.max_velocity} max_angular={args.max_angular} "
          f"episodes={args.episodes}")
    for k, v in stats.items():
        print(f"  {k}: {v:.3f}")


if __name__ == "__main__":
    main()
