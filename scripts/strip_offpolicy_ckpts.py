"""Reduce SAC/TD3 run dirs to committable learning artifacts.

The full off-policy train state checkpoints ~59 MB each (the 100k-step
replay buffer dominates).  For the committed learning evidence we keep the
curve (metrics.jsonl), the final eval, and a params-only Orbax checkpoint
(actor/critic/targets, no buffer/env states) under params_final/ — enough
to evaluate or fine-tune the policy; full resume needs a fresh buffer warmup.

Run on CPU: env -u PYTHONPATH JAX_PLATFORMS=cpu python scripts/strip_offpolicy_ckpts.py rl_logs/offpolicy
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import orbax.checkpoint as ocp

from mujoco_playground_tpu.envs import make_ackermann_env
from mujoco_playground_tpu.rl import checkpoint as ckpt_lib
from mujoco_playground_tpu.rl import sac as sac_lib
from mujoco_playground_tpu.rl import td3 as td3_lib
from mujoco_playground_tpu.rl.config import RLConfig


def main(base):
    cfg = RLConfig(num_envs=256, progress_reward=3.0)
    env = make_ackermann_env("maze", "umaze",
                             progress_reward_scale=cfg.progress_reward,
                             solver_iterations=cfg.solver_iterations,
                             ls_iterations=cfg.ls_iterations)
    for algo, mod, make in (("sac", sac_lib, sac_lib.make_sac),
                            ("td3", td3_lib, td3_lib.make_td3)):
        d = os.path.join(base, algo)
        if not os.path.isdir(d):
            continue
        latest = ckpt_lib.latest_checkpoint(d)
        init, _ = make(env, cfg)
        state = ckpt_lib.restore_checkpoint(latest, init(jax.random.PRNGKey(0)))
        if algo == "sac":
            slim = dict(actor_params=state.actor_params,
                        q_params=state.q_params,
                        q_target_params=state.q_target_params,
                        log_alpha=state.log_alpha,
                        global_step=state.global_step)
        else:
            slim = dict(actor_params=state.actor_params,
                        actor_target_params=state.actor_target_params,
                        q_params=state.q_params,
                        q_target_params=state.q_target_params,
                        global_step=state.global_step)
        out = os.path.join(os.path.abspath(d), "params_final")
        if os.path.exists(out):
            shutil.rmtree(out)
        with ocp.StandardCheckpointer() as cp:
            cp.save(out, jax.device_get(slim))
        for name in sorted(os.listdir(d)):
            if name.startswith("step_"):
                shutil.rmtree(os.path.join(d, name))
                print(f"removed {d}/{name}")
        print(f"{algo}: kept metrics.jsonl + params_final "
              f"(global_step={int(state.global_step)})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "rl_logs/offpolicy")
