"""Reproduce the reference's published PPO learning dynamics (BASELINE.md).

The reference's shipped SB3 run (/root/reference/rl_logs/ppo/
ppo_model_{10000,20000,30000}_steps.zip -> data.ep_info_buffer) trains ONE
env on the open-floor arena with n_steps=2048, batch 64, 10 epochs, lr 3e-4,
gamma 0.99, lam 0.95, clip 0.2, ent_coef 0.0 — and its episode returns
COLLAPSE from -129.5 +- 28.6 (at 10k steps) to -47,268 +- 35 (at 20k-30k):
on the open floor every lidar beam reads -1 (no hit), the reference env
counts that as a collision (ackermann_env.py:279-284), and once the policy
drifts it pays -50 every step of every 1000-step episode.

This script runs OUR PPO under the same recipe with the reference-artifact
env flags on, reconstructs per-episode returns from the rollout stream
(the analog of SB3's ep_info_buffer), and writes the curve to
rl_logs/reference_compat/episodes.jsonl.  Learning-dynamics parity =
episodes settle at -47k +- seed noise after ~20k steps, from a first-episode
region around -10^2 (exact early values are seed-dependent: they hinge on
where the untrained policy drifts in the first episodes).

Run (CPU is fine at 1 env):
    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/reference_compat_run.py
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from mujoco_playground_tpu.rl import networks, ppo
from mujoco_playground_tpu.rl.config import RLConfig
from mujoco_playground_tpu.rl.train import build_env

TOTAL_STEPS = 65_536          # 32 iterations of 2048 — 2x the reference's 30k


def main():
    # --maze: run in the walled umaze arena instead of the open floor.  The
    # reference's published run shows ~9 collision-free episodes (-129.5)
    # before the collapse — impossible on the shipped SimpleMapSpawner's
    # bare floor (every no-hit beam reads -1 => "collision" from step one);
    # its full walled MapSpawner is lost source (import fallback,
    # ackermann_env.py:83-90).  The walled arena reproduces both phases.
    maze = "--maze" in sys.argv
    config = RLConfig(
        env_type="maze" if maze else "simple",
        reference_compat=True,
        num_envs=1, unroll_length=2048, num_minibatches=32,
        ppo_epochs=10, learning_rate=3e-4, gamma=0.99, gae_lambda=0.95,
        clip_range=0.2, ent_coef=0.0, seed=0,
        total_timesteps=TOTAL_STEPS)
    env = build_env(config)
    network = networks.ActorCritic(action_size=env.action_size)
    ts = ppo.init_train_state(env, network, config, jax.random.PRNGKey(0),
                              stagger_resets=False)
    rollout_fn, update_fn = ppo.make_train_fns(env, network, config)
    rollout_j = jax.jit(rollout_fn)
    update_j = jax.jit(update_fn)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "rl_logs", "reference_compat")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir,
                        "episodes_umaze.jsonl" if maze else "episodes.jsonl")

    ep_ret, ep_len, gs = 0.0, 0, 0
    episodes = []
    t0 = time.time()
    with open(path, "w") as f:
        f.write(json.dumps({
            "recipe": "reference SB3 PPO (BASELINE.md row 'PPO run config')",
            "flags": {"reference_compat": True, "num_envs": 1,
                      "n_steps": 2048, "batch": 64, "epochs": 10,
                      "lr": 3e-4, "gamma": 0.99, "lam": 0.95,
                      "clip": 0.2, "ent_coef": 0.0, "seed": 0},
            "baseline_anchor": {"10k": [-129.5, 28.6],
                                "20k": [-47268, 35], "30k": [-47269, 36]},
        }) + "\n")
        while gs < TOTAL_STEPS:
            ts, batch_data, _ = rollout_j(ts)
            flat_batch = batch_data[0]
            rew = np.asarray(flat_batch.reward).reshape(-1)
            done = np.asarray(flat_batch.done).reshape(-1)
            ts, _ = update_j(ts, batch_data)
            for r, d in zip(rew, done):
                ep_ret += float(r)
                ep_len += 1
                gs += 1
                if d:
                    rec = {"global_step": gs, "episode_return": ep_ret,
                           "episode_length": ep_len}
                    episodes.append(rec)
                    f.write(json.dumps(rec) + "\n")
                    ep_ret, ep_len = 0.0, 0
            print(f"step {gs:>7d} | episodes {len(episodes)} | "
                  f"last returns: "
                  + " ".join(f"{e['episode_return']:.1f}"
                             for e in episodes[-3:]), flush=True)

        rets = np.array([e["episode_return"] for e in episodes])
        steps = np.array([e["global_step"] for e in episodes])
        summary = {}
        for anchor in (10_000, 20_000, 30_000):
            win = rets[(steps > anchor - 5000) & (steps <= anchor + 5000)]
            if len(win):
                summary[f"at_{anchor}"] = [float(win.mean()),
                                           float(win.std()), len(win)]
        late = rets[steps > 15_000]
        summary["late_mean"] = float(late.mean())
        summary["collapsed"] = bool((late < -40_000).mean() > 0.8)
        f.write(json.dumps({"summary": summary}) + "\n")
    print("summary:", json.dumps(summary, indent=1))
    print(f"wrote {path} ({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
