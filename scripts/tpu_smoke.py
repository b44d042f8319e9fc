"""TPU smoke gate: compile AND RUN every public TPU entry point on the chip.

Round 2 shipped megakernel fusions that interpret-mode CPU tests could not
fault (Mosaic lowering failures only appear when compiling for real TPU) and
that crashed the driver bench (VERDICT r2 weak #1-2, #4).  This script is the
gate that makes that impossible to repeat: it drives the exact code paths of
bench.py, the PPO/SAC/TD3 trainers, the evaluator, and the DR path for two
real steps each on the device, tiny shapes, and fails loudly.

Run it on the real chip before ending any round that touched the hot path
(CLAUDE.md rule).  The script WRITES <repo>/TPU_SMOKE.txt itself on success
(rounds 3 and 4 both shipped stale hand-tee'd stamps — VERDICT r4 weak #1);
commit that file.  bench.py cross-checks the stamp against HEAD and warns
loudly on mismatch.

    PYTHONPATH=/root/repo:/root/.axon_site \
    JAX_COMPILATION_CACHE_DIR=~/.cache/jax_comp \
        python scripts/tpu_smoke.py

Reference analog: the reference's only integration check is running
--algo random end-to-end (src/rl/train.py:189-227).
"""
import os
import subprocess
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 256          # smallest megakernel batch (ops/step_pallas.BLOCK_B)
T = 2
FAILED = []
LINES = []       # everything printed, re-written to TPU_SMOKE.txt at the end


def emit(line):
    print(line, flush=True)
    LINES.append(line)


def check(name):
    def deco(fn):
        def run():
            t0 = time.time()
            try:
                out = fn()
                dt = time.time() - t0
                emit(f"PASS  {name:34s} {dt:7.1f}s  {out}")
            except Exception:
                dt = time.time() - t0
                emit(f"FAIL  {name:34s} {dt:7.1f}s")
                traceback.print_exc()
                FAILED.append(name)
        return run
    return deco


def make_env():
    from mujoco_playground_tpu.envs import make_ackermann_env
    return make_ackermann_env("maze", "umaze", solver_iterations=4,
                              ls_iterations=3)


@check("bench rollout (step_autoreset_batch)")
def smoke_bench():
    env = make_env()
    states = jax.jit(jax.vmap(env.reset))(
        jax.random.split(jax.random.PRNGKey(0), B))

    def rollout(states, keys):
        def body(s, key):
            acts = jax.random.uniform(key, (B, 2), minval=-1.0, maxval=1.0)
            return env.step_autoreset_batch(s, acts), ()
        out, _ = jax.lax.scan(body, states, keys)
        return out

    keys = jax.random.split(jax.random.PRNGKey(1), T)
    states = jax.jit(rollout)(states, keys)
    jax.block_until_ready(states.obs)
    assert bool(jnp.all(jnp.isfinite(states.obs))), "non-finite obs"
    return f"mean_reward={float(states.reward.mean()):.3f}"


@check("evaluate (step_batch)")
def smoke_evaluate():
    from mujoco_playground_tpu.rl.evaluate import evaluate_agent
    env = make_env()
    policy = lambda obs: jnp.zeros((obs.shape[0], 2), obs.dtype)
    m = evaluate_agent(env, policy, num_episodes=B, max_steps=T)
    return f"mean_return={m['mean_return']:.3f}"


def _rl_config():
    from mujoco_playground_tpu.rl.config import RLConfig
    return RLConfig(num_envs=B, unroll_length=4, num_minibatches=2,
                    ppo_epochs=1, sac_batch_size=64)


@check("PPO train step")
def smoke_ppo():
    from mujoco_playground_tpu.rl import networks, ppo
    env = make_env()
    cfg = _rl_config()
    net = networks.ActorCritic(action_size=env.action_size)
    ts = ppo.init_train_state(env, net, cfg, jax.random.PRNGKey(0))
    train_step = jax.jit(ppo.make_train_step(env, net, cfg))
    for _ in range(T):
        ts, metrics = train_step(ts)
    jax.block_until_ready(ts.params)
    loss = float(metrics["policy_loss"]) + float(metrics["value_loss"])
    assert loss == loss, "NaN loss"
    return f"loss={loss:.4f}"


@check("SAC train step")
def smoke_sac():
    from mujoco_playground_tpu.rl import sac
    env = make_env()
    init, make_step = sac.make_sac(env, _rl_config(), collect_steps=2,
                                   grad_steps=1)
    state = init(jax.random.PRNGKey(0))
    step = jax.jit(make_step(random_actions=True))
    for _ in range(T):
        state, metrics = step(state)
    jax.block_until_ready(state.actor_params)
    return f"mean_reward={float(metrics['mean_reward']):.3f}"


@check("TD3 train step")
def smoke_td3():
    from mujoco_playground_tpu.rl import td3
    env = make_env()
    init, make_step = td3.make_td3(env, _rl_config(), collect_steps=2,
                                   grad_steps=1)
    state = init(jax.random.PRNGKey(0))
    step = jax.jit(make_step(random_actions=True))
    for _ in range(T):
        state, metrics = step(state)
    jax.block_until_ready(state.actor_params)
    return f"mean_reward={float(metrics['mean_reward']):.3f}"


@check("DR rollout (randomized models)")
def smoke_dr():
    from mujoco_playground_tpu.envs.domain_randomization import \
        DomainRandomizedEnv
    env = make_env()
    dr = DomainRandomizedEnv(env, B, jax.random.PRNGKey(2))
    states = jax.vmap(dr.reset)(jax.random.split(jax.random.PRNGKey(3), B))

    def rollout(states, keys):
        def body(s, key):
            acts = jax.random.uniform(key, (B, 2), minval=-1.0, maxval=1.0)
            return dr.step_autoreset_batch(s, acts), ()
        out, _ = jax.lax.scan(body, states, keys)
        return out

    keys = jax.random.split(jax.random.PRNGKey(4), T)
    states = jax.jit(rollout)(states, keys)
    jax.block_until_ready(states.obs)
    assert bool(jnp.all(jnp.isfinite(states.obs))), "non-finite obs"
    return f"mean_reward={float(states.reward.mean()):.3f}"


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # --dirty so a stamp made from an uncommitted tree is identifiable
    # (round-3 verdict weak #3: a clean-looking stamp can hide unstaged
    # hot-path edits)
    commit = subprocess.run(
        ["git", "-C", repo, "describe", "--always", "--dirty"],
        capture_output=True, text=True).stdout.strip()
    dev = jax.devices()[0]
    emit(f"tpu_smoke @ commit {commit}  device={dev.device_kind} "
         f"({dev.platform})")
    if dev.platform == "cpu":
        emit("WARNING: running on CPU — this does NOT validate Mosaic "
             "lowering; run on the real chip.")
    for fn in (smoke_bench, smoke_evaluate, smoke_ppo, smoke_sac, smoke_td3,
               smoke_dr):
        fn()
    if FAILED:
        emit(f"SMOKE FAILED: {FAILED}")
        sys.exit(1)   # deliberately does NOT stamp — a failed run is not a gate pass
    emit("SMOKE OK: all public TPU entry points compiled and ran.")
    # Self-stamp (VERDICT r4 next #2): the script, not a human tee, writes
    # the artifact, so the stamp can never silently lag the run.  CPU runs
    # don't stamp — they can't validate Mosaic lowering.
    if dev.platform != "cpu":
        with open(os.path.join(repo, "TPU_SMOKE.txt"), "w") as f:
            f.write("\n".join(LINES) + "\n")
        emit(f"stamped {os.path.join(repo, 'TPU_SMOKE.txt')} @ {commit}")


if __name__ == "__main__":
    main()
