"""Training CLI — TPU twin of the reference trainer (src/rl/train.py).

Same surface (--algo random/ppo, --maze, --timesteps, --learning-rate,
--save-freq, --eval-freq, --goal-threshold, --max-velocity) plus the TPU
axes the reference lacked: --num-envs (lockstep vectorization), --unroll,
--seed.  PPO runs as a fused on-device actor-learner; checkpoints via Orbax
land in rl_logs/<algo>/ like the reference's layout.

Examples:
    python -m mujoco_playground_tpu.rl.train --algo random --episodes 100
    python -m mujoco_playground_tpu.rl.train --algo ppo --maze umaze \
        --timesteps 1000000 --num-envs 2048
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_playground_tpu.envs import make_ackermann_env
from mujoco_playground_tpu.rl import checkpoint as ckpt_lib
from mujoco_playground_tpu.rl import ppo
from mujoco_playground_tpu.rl.config import RLConfig
from mujoco_playground_tpu.rl.evaluate import (deterministic_policy,
                                               evaluate_agent)
from mujoco_playground_tpu.rl.networks import ActorCritic
from mujoco_playground_tpu.rl.random_policy import run_random_baseline
from mujoco_playground_tpu.utils.logging import MetricsLogger


def build_env(config: RLConfig):
    env = _build_base_env(config)
    if config.domain_rand:
        from mujoco_playground_tpu.envs.domain_randomization import \
            DomainRandomizedEnv
        env = DomainRandomizedEnv(
            env, config.num_envs,
            jax.random.PRNGKey(config.seed ^ 0x5EED))
    return env


def _build_base_env(config: RLConfig):
    return make_ackermann_env(
        env_type=config.env_type, maze_id=config.maze_id,
        max_linear_velocity=config.max_linear_velocity,
        max_angular_velocity=config.max_angular_velocity,
        goal_distance_threshold=config.goal_distance_threshold,
        max_episode_steps=config.max_episode_steps,
        reference_delayed_obs=config.reference_compat,
        reference_lidar_aliasing=config.reference_compat,
        collision_ignores_nohit=config.sane_collision,
        progress_reward_scale=config.progress_reward,
        geodesic_reward_scale=config.geodesic_reward,
        goal_compass=config.goal_compass,
        spawn_heading_noise=config.spawn_heading_noise,
        collision_penalty=config.collision_penalty,
        solver_iterations=config.solver_iterations,
        ls_iterations=config.ls_iterations)


def train_ppo(config: RLConfig, resume: bool = False, verbose: bool = True,
              profile_dir: str = None, eval_only: bool = False):
    env = build_env(config)
    network = ActorCritic(action_size=env.action_size,
                          hidden=tuple(config.hidden_sizes))
    rng = jax.random.PRNGKey(config.seed)
    ts = ppo.init_train_state(env, network, config, rng)

    log_dir = os.path.join(config.log_dir, "ppo")
    resume_gs = None
    if resume or eval_only:
        latest = ckpt_lib.latest_checkpoint(log_dir)
        if latest:
            ts = ckpt_lib.restore_checkpoint(latest, ts)
            resume_gs = ckpt_lib.checkpoint_step(latest)
            if verbose:
                print(f"Resumed from {latest}")
        elif eval_only:
            raise SystemExit(f"--eval-only: no checkpoint under {log_dir}")
    if eval_only:
        # read-only: no training loop, no logger, and crucially no final
        # save (which rewrites the checkpoint directory in place)
        return ts, env, network
    logger = MetricsLogger(log_dir)

    # Split compilation: rollout and update as separate XLA programs (much
    # faster first compile than the fully-fused step; same math).
    rollout_fn, update_fn = ppo.make_train_fns(env, network, config)
    rollout_j = jax.jit(rollout_fn)
    update_j = jax.jit(update_fn)

    def train_step(ts):
        ts, batch_data, roll_metrics = rollout_j(ts)
        ts, upd_metrics = update_j(ts, batch_data)
        return ts, {**roll_metrics, **upd_metrics}

    steps_per_iter = config.num_envs * config.unroll_length
    # resume-aware counters: start from the restored step count so a
    # resumed run neither re-trains past its target nor floods saves/evals
    # while the cadence counters catch up.  The checkpoint DIRNAME is the
    # authoritative count — the in-state counter is int32 on device and
    # wraps at 2^31 env-steps (hit by a real 3B-step run, round 5); all
    # step accounting below is host-side Python ints for the same reason.
    start_gs = resume_gs if resume_gs is not None else int(ts.global_step)
    next_save = (start_gs // config.save_freq + 1) * config.save_freq
    next_eval = (start_gs // config.eval_freq + 1) * config.eval_freq

    if profile_dir:
        # warm up (compile), then trace one full train step
        ts, _ = train_step(ts)
        jax.block_until_ready(ts.params)
        from mujoco_playground_tpu.utils.profiler import trace_context
        with trace_context(profile_dir):
            ts, _ = train_step(ts)
            jax.block_until_ready(ts.params)
        if verbose:
            print(f"profiler trace written to {profile_dir}")

    # Host<->device syncs are expensive (hundreds of ms through a remote
    # tunnel); read metrics back only every ~1M env-steps and let
    # iterations in between run fully async — but never queue more
    # iterations than `total_timesteps` has left, so short runs stop (and
    # LR schedules end) where requested instead of overshooting by up to
    # a full sync group.
    log_interval = max(1, 1_000_000 // steps_per_iter)
    t_start = time.time()
    gs = start_gs
    t0 = time.time()
    prev = ts
    while gs < config.total_timesteps:
        remaining = -(-(config.total_timesteps - gs) // steps_per_iter)
        group = min(log_interval, remaining)
        for _ in range(group):
            ts, metrics = train_step(ts)
        jax.block_until_ready(ts.params)
        dt = (time.time() - t0) / group
        t0 = time.time()
        gs += steps_per_iter * group
        metrics = {k: float(v) for k, v in metrics.items()}
        # Failure detection (absent in the reference, SURVEY.md §5): if an
        # update produced non-finite losses, drop it and continue from the
        # pre-update state with a fresh RNG stream.
        if not all(np.isfinite(v) for v in metrics.values()):
            print(f"step {gs}: non-finite metrics {metrics}; "
                  f"rolling back to the last finite state")
            rng, sub = jax.random.split(prev.rng)
            ts = prev.replace(rng=sub, global_step=ts.global_step)
            continue
        prev = ts
        metrics["steps_per_second"] = steps_per_iter / dt
        metrics["global_step"] = gs
        logger.log(gs, metrics)
        if verbose:
            print(f"step {gs:>10d} | {steps_per_iter/dt/1e3:8.1f}k sps | "
                  f"reward/step {metrics['mean_reward']:+8.3f} | "
                  f"eps {metrics['episodes_finished']:.0f} | "
                  f"success {metrics['successes']:.0f} | "
                  f"kl {metrics['approx_kl']:.4f}")
        if gs >= next_save:
            path = ckpt_lib.save_checkpoint(log_dir, ts, gs)
            next_save += config.save_freq
            if verbose:
                print(f"  checkpoint -> {path}")
        if gs >= next_eval:
            stats = evaluate_agent(
                env, deterministic_policy(
                    network, ts.params,
                    norm=ts.norm if config.normalize_obs else None),
                num_episodes=config.eval_episodes,
                rng=jax.random.PRNGKey(gs))
            logger.log(gs, {f"eval/{k}": v for k, v in stats.items()})
            next_eval += config.eval_freq
            if verbose:
                print(f"  eval: return {stats['mean_return']:.1f} "
                      f"± {stats['std_return']:.1f}, "
                      f"success {stats['success_rate']*100:.1f}%")
    if verbose:
        total = time.time() - t_start
        ran = gs - start_gs                    # steps THIS run (post-resume)
        print(f"Done: {gs} steps ({ran} this run) in "
              f"{total:.1f}s ({ran/max(total, 1e-9)/1e3:.1f}k steps/s)")
    ckpt_lib.save_checkpoint(log_dir, ts, gs)
    return ts, env, network


def train_off_policy(config: RLConfig, algo: str, total_timesteps: int,
                     eval_episodes: int = 10, verbose: bool = True,
                     resume: bool = False, eval_only: bool = False):
    """SAC/TD3 training loop (reference --algo sac/td3, train.py:108-121).

    Checkpoints the FULL train state — params, targets, optimizers, env
    states, RNG, and the replay buffer (the SB3 analog needs a separate
    save_replay_buffer call; resuming without replay data changes
    learning) — every ``save_freq`` env-steps and at exit.
    """
    import dataclasses as _dc

    from mujoco_playground_tpu.rl import sac as sac_lib
    from mujoco_playground_tpu.rl import td3 as td3_lib

    config = _dc.replace(config, num_envs=min(config.num_envs, 256))
    env = build_env(config)
    mod = sac_lib if algo == "sac" else td3_lib
    init, make_step = (mod.make_sac(env, config) if algo == "sac"
                       else mod.make_td3(env, config))
    state = init(jax.random.PRNGKey(config.seed))
    log_dir = os.path.join(config.log_dir, algo)
    resume_gs = None
    if resume or eval_only:
        latest = ckpt_lib.latest_checkpoint(log_dir)
        if latest:
            state = ckpt_lib.restore_checkpoint(latest, state)
            resume_gs = ckpt_lib.checkpoint_step(latest)
            if verbose:
                print(f"[{algo}] resumed from {latest}")
        elif eval_only:
            raise SystemExit(f"--eval-only: no checkpoint under {log_dir}")
    if eval_only:
        stats = evaluate_agent(env, mod.deterministic_policy(env, state),
                               num_episodes=eval_episodes)
        if verbose:
            print(f"[{algo}] eval: return {stats['mean_return']:.1f} "
                  f"± {stats['std_return']:.1f}, "
                  f"success {stats['success_rate']*100:.1f}%")
        return state, env
    # NOTE: buffer donation (donate_argnums) would avoid copying the replay
    # arrays per insert, but donation hangs the axon TPU tunnel on this rig;
    # XLA still reuses buffers well enough without it.
    warmup_step = jax.jit(make_step(random_actions=True))
    train_step = make_step(random_actions=False)
    logger = MetricsLogger(log_dir)

    # Track the step count host-side (each iteration advances a fixed
    # number of env steps) — device readbacks every iteration are expensive.
    steps_per_iter = 4 * config.num_envs
    log_every = max(1, min(100_000, total_timesteps) // steps_per_iter)

    # One iteration is ~1 ms of device work (4 megakernel env steps at 256
    # envs + 8 tiny-MLP grad updates); dispatching it per-iteration through
    # the remote tunnel costs ~7-15 ms of host latency — the binding
    # resource behind round-3's 68k/141k steps/s.  Scan `log_every`
    # iterations inside ONE jitted call so dispatch amortizes over ~100k
    # env-steps (same cadence the logger/saver already used).
    def make_chunk(niter):
        def chunk_fn(state):
            def body(st, _):
                return train_step(st)
            state, ms = jax.lax.scan(body, state, None, length=niter)
            ms = {k: (v.mean() if k == "mean_reward" else v[-1])
                  for k, v in ms.items()}
            return state, ms
        return jax.jit(chunk_fn)
    # the final chunk is cut to the remaining step budget, so the loop
    # overshoots --timesteps by at most steps_per_iter-1 (the same bound
    # the PPO loop has; a full-log_every final chunk could overshoot by
    # ~100k steps).  At most 2 distinct lengths compile.
    chunks = {log_every: make_chunk(log_every)}

    # dirname-authoritative resume count (the in-state counter is int32 on
    # device and wraps at 2^31 env-steps — see train_ppo)
    start_gs = resume_gs if resume_gs is not None else int(state.global_step)
    gs = start_gs
    next_save = (start_gs // config.save_freq + 1) * config.save_freq
    while gs < config.sac_learning_starts and gs < total_timesteps:
        state, metrics = warmup_step(state)
        gs += steps_per_iter
    t0 = time.time()
    while gs < total_timesteps:
        rem = -(-(total_timesteps - gs) // steps_per_iter)
        niter = min(log_every, rem)
        if niter not in chunks:
            chunks[niter] = make_chunk(niter)
        state, metrics = chunks[niter](state)
        jax.block_until_ready(metrics["mean_reward"])
        t1 = time.time()
        gs += steps_per_iter * niter
        metrics = {k: float(v) for k, v in metrics.items()}
        # marginal rate over this chunk (the first chunk's rate includes
        # its one-time compile; steady state from the second line on)
        metrics["steps_per_second"] = (steps_per_iter * niter
                                       / max(t1 - t0, 1e-9))
        t0 = t1
        logger.log(gs, metrics)
        if verbose:
            print(f"[{algo}] step {gs:>9d} | "
                  f"reward/step {metrics['mean_reward']:+8.3f} | "
                  f"{metrics['steps_per_second']/1e3:7.1f}k sps")
        if gs >= next_save:
            path = ckpt_lib.save_checkpoint(log_dir, state, gs)
            next_save = (gs // config.save_freq + 1) * config.save_freq
            if verbose:
                print(f"  checkpoint -> {path}")
    ckpt_lib.save_checkpoint(log_dir, state, gs)
    stats = evaluate_agent(env, mod.deterministic_policy(env, state),
                           num_episodes=eval_episodes)
    if verbose:
        print(f"[{algo}] eval: return {stats['mean_return']:.1f} "
              f"± {stats['std_return']:.1f}, "
              f"success {stats['success_rate']*100:.1f}%")
    return state, stats


def main(argv=None):
    p = argparse.ArgumentParser(description="Train Ackermann Robot RL Agent")
    p.add_argument("--algo", default="random",
                   choices=["random", "ppo", "sac", "td3"])
    p.add_argument("--episodes", type=int, default=1000,
                   help="episodes (for --algo random)")
    p.add_argument("--timesteps", type=int, default=100000)
    p.add_argument("--max-velocity", type=float, default=1.0)
    p.add_argument("--max-angular", type=float, default=1.0,
                   help="cmd_vel angular_z cap (rad/s).  The reference env "
                        "pins 1.0, which at speed caps the bicycle steering "
                        "angle near 8 deg (arctan(L*w/v)) — far inside the "
                        "servo's +-35 deg range — making maze corners "
                        "uncompletable within the 2 s episode; raise it "
                        "(e.g. 3.0) to let policies use the real steering "
                        "envelope")
    p.add_argument("--goal-threshold", type=float, default=0.5)
    p.add_argument("--max-episode-steps", type=int, default=1000,
                   help="episode truncation (physics steps at 500 Hz).  The "
                        "reference pins 1000 = 2 s of sim time, under which "
                        "most start/goal pairs are physically unreachable "
                        "(the robot's measured top speed is ~1 m/s and its "
                        "U-turn costs ~5 s — scripts/dev_scripted_ceiling."
                        "py); 3000 gives a solvable task")
    p.add_argument("--maze", default=None,
                   choices=[None, "umaze", "open", "medium", "large"])
    p.add_argument("--maze-id", default="PointMaze_UMaze-v3")
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--save-freq", type=int, default=10000)
    p.add_argument("--eval-freq", type=int, default=10000)
    p.add_argument("--eval-episodes", type=int, default=10)
    p.add_argument("--num-envs", type=int, default=2048)
    p.add_argument("--unroll", type=int, default=32)
    p.add_argument("--minibatches", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--anneal-lr", action="store_true")
    p.add_argument("--hidden", type=int, nargs="+", default=None,
                   help="policy/value tower widths for the chosen algo.  "
                        "Default when omitted: 64 64 for PPO (reference "
                        "checkpoint arch), 256 256 for SAC/TD3 (SB3 "
                        "off-policy net_arch default)")
    p.add_argument("--reference-compat", action="store_true",
                   help="reproduce the reference env's artifacts exactly "
                        "(stale-obs stepping + lidar name-aliasing bug)")
    p.add_argument("--normalize", action="store_true",
                   help="SB3 VecNormalize-equivalent running obs + reward "
                        "normalization in the PPO learner")
    p.add_argument("--sane-collision", action="store_true",
                   help="no-hit lidar beams (-1) do NOT count as collisions "
                        "(fixes the reference reward bug, PARITY.md)")
    p.add_argument("--progress-reward", type=float, default=0.0,
                   metavar="SCALE",
                   help="potential-based progress shaping: reward += "
                        "SCALE*(d_prev - d_new) toward the goal (0 = the "
                        "faithful reference reward; preserves the optimal "
                        "policy, Ng et al. 1999)")
    p.add_argument("--geodesic-reward", type=float, default=0.0,
                   metavar="SCALE",
                   help="maze-aware potential shaping: like "
                        "--progress-reward but the potential is geodesic "
                        "distance through the corridors (no local optimum "
                        "behind walls; envs/geodesic.py) — the shaping the "
                        "solved-task configs use")
    p.add_argument("--goal-compass", action="store_true",
                   help="append the geodesic-descent direction (2 dims, "
                        "robot frame) to the observation — a global "
                        "planner feeding the learned local policy; obs "
                        "79 -> 81")
    p.add_argument("--spawn-heading-noise", type=float, default=0.0,
                   metavar="RAD",
                   help="uniform random spawn yaw in [-RAD, +RAD] "
                        "(0 = the reference's fixed +x heading; 3.14159 = "
                        "any heading)")
    p.add_argument("--collision-penalty", type=float, default=-50.0,
                   help="per-step reward when min lidar < 0.15 m (reference: "
                        "-50, which outweighs the +100 goal bonus after ~2 "
                        "grazed corners and caps goal-seeking; -5 makes the "
                        "solved-task configs learnable)")
    p.add_argument("--shuffle-block", type=int, default=128,
                   help="PPO minibatch shuffle granularity (rows moved "
                        "together; 1 = SB3-exact per-row reshuffle, "
                        "~4x slower updates on TPU — RLConfig."
                        "shuffle_block_size)")
    p.add_argument("--gamma", type=float, default=0.99)
    p.add_argument("--ent-coef", type=float, default=0.01)
    p.add_argument("--domain-rand", action="store_true",
                   help="per-env randomized physics (mass/friction/damping/"
                        "actuators/floor); runs the DR megakernel")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--eval-only", action="store_true",
                   help="restore the latest checkpoint under --log-dir and "
                        "evaluate it (no training, nothing written)")
    p.add_argument("--log-dir", default="rl_logs")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="capture a jax.profiler trace of one train step "
                        "into DIR (view with xprof/TensorBoard)")
    args = p.parse_args(argv)

    config = RLConfig(
        env_type="maze" if args.maze else "simple",
        maze_id=args.maze or args.maze_id,
        max_linear_velocity=args.max_velocity,
        max_angular_velocity=args.max_angular,
        goal_distance_threshold=args.goal_threshold,
        max_episode_steps=args.max_episode_steps,
        total_timesteps=args.timesteps,
        learning_rate=args.learning_rate or 3e-4,
        save_freq=args.save_freq, eval_freq=args.eval_freq,
        eval_episodes=args.eval_episodes,
        num_envs=args.num_envs, unroll_length=args.unroll,
        num_minibatches=args.minibatches, seed=args.seed,
        anneal_lr=args.anneal_lr, gamma=args.gamma, ent_coef=args.ent_coef,
        shuffle_block_size=args.shuffle_block,
        hidden_sizes=tuple(args.hidden) if args.hidden else (64, 64),
        offpolicy_hidden_sizes=(tuple(args.hidden) if args.hidden
                                else (256, 256)),
        normalize_obs=args.normalize, normalize_reward=args.normalize,
        reference_compat=args.reference_compat,
        sane_collision=args.sane_collision,
        progress_reward=args.progress_reward,
        geodesic_reward=args.geodesic_reward,
        goal_compass=args.goal_compass,
        spawn_heading_noise=args.spawn_heading_noise,
        collision_penalty=args.collision_penalty, log_dir=args.log_dir,
        domain_rand=args.domain_rand)

    print("=" * 60)
    print("Ackermann Robot RL Training (TPU)")
    print("=" * 60)
    print(f"devices: {jax.devices()}")
    print(f"env: {config.env_type} ({config.maze_id if config.env_type == 'maze' else 'open floor'})")
    print(f"obs ({79 + (2 if config.goal_compass else 0)},), act (2,), "
          f"num_envs {config.num_envs}")
    print("=" * 60)

    if args.eval_only and args.algo == "random":
        raise SystemExit("--eval-only needs a checkpointing algo "
                         "(ppo/sac/td3)")
    if args.algo == "random":
        env = build_env(config)
        run_random_baseline(env, episodes=args.episodes, seed=args.seed)
    elif args.algo in ("sac", "td3"):
        train_off_policy(config, args.algo, args.timesteps,
                         eval_episodes=args.eval_episodes,
                         resume=args.resume, eval_only=args.eval_only)
    elif args.algo == "ppo":
        ts, env, network = train_ppo(config, resume=args.resume,
                                     profile_dir=args.profile,
                                     eval_only=args.eval_only)
        stats = evaluate_agent(
            env, deterministic_policy(
                network, ts.params,
                norm=ts.norm if config.normalize_obs else None),
                               num_episodes=args.eval_episodes)
        print("\nEvaluation Results:")
        print(f"  Mean Return: {stats['mean_return']:.2f} "
              f"± {stats['std_return']:.2f}")
        print(f"  Mean Episode Length: {stats['mean_length']:.1f}")
        print(f"  Success Rate: {stats['success_rate']*100:.1f}%")
    else:
        raise SystemExit(f"unknown --algo {args.algo}")


if __name__ == "__main__":
    main()
