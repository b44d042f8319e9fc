"""Multi-process (multi-host) sharded PPO train-step runner.

Each process owns a subset of devices; together they form one global 1-D env
mesh and run the SAME jitted train step (GSPMD single-program), with the env
batch sharded across all processes' devices and params replicated.  Gradient
reduction rides the mesh as psum — across ICI on a real pod, across the
coordinator's transport on the CPU test rig.

Host-count invariance: every process builds the identical *global* initial
state from the global seed (env resets keyed by global env index, not by
process), then `jax.device_put` against the global sharding slices out the
local shards.  The learned params are therefore bit-identical regardless of
how many processes the same 8 devices are split across — asserted by
tests/test_multiprocess.py, which compares this script's param hash at
--num-processes 2 with the single-process run.

Run one process per host (CPU rig: same machine, distinct --process-id):

    python scripts/multihost_train.py --coordinator localhost:12345 \
        --num-processes 2 --process-id 0 --local-devices 4 --out /tmp/p0.json

The reference has no distributed path at all (DummyVecEnv n_envs=1,
/root/reference/src/rl/train.py:73-76); this implements SURVEY §2.3's comms
row and §7 hard part (d) the JAX way.
"""
import argparse
import hashlib
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (omit for single-process)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--local-devices", type=int, default=4,
                    help="virtual CPU devices to expose in this process")
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--num-envs", type=int, default=16)
    ap.add_argument("--unroll", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None, help="write result JSON here")
    args = ap.parse_args()

    # Backend config must precede jax import.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax
    import numpy as np

    from mujoco_playground_tpu.parallel.distributed import (
        initialize_distributed)

    dist = initialize_distributed(coordinator_address=args.coordinator,
                                  num_processes=args.num_processes,
                                  process_id=args.process_id)

    from mujoco_playground_tpu.envs import make_ackermann_env
    from mujoco_playground_tpu.parallel import mesh as mesh_lib
    from mujoco_playground_tpu.rl import ppo
    from mujoco_playground_tpu.rl.config import RLConfig
    from mujoco_playground_tpu.rl.networks import ActorCritic

    config = RLConfig(num_envs=args.num_envs, unroll_length=args.unroll,
                      num_minibatches=2, ppo_epochs=1,
                      solver_iterations=2, ls_iterations=2)
    env = make_ackermann_env("maze", "umaze", solver_iterations=2,
                             ls_iterations=2)
    network = ActorCritic(action_size=env.action_size)

    # Identical global init on every process (same seed -> same arrays).
    ts = ppo.init_train_state(env, network, config,
                              jax.random.PRNGKey(args.seed))
    mesh = mesh_lib.make_mesh(jax.devices())
    # device_put against a multi-process sharding requires the same global
    # value on all processes — guaranteed by the seed-deterministic init.
    ts = mesh_lib.shard_train_state(ts, mesh)

    train_step = jax.jit(ppo.make_train_step(env, network, config))
    metrics = {}
    for _ in range(args.steps):
        ts, metrics = train_step(ts)
    jax.block_until_ready(ts.params)

    # Params are replicated: every process holds the full value.  Hash them.
    h = hashlib.sha256()
    for leaf in jax.tree.leaves(ts.params):
        local = np.asarray(leaf.addressable_shards[0].data)
        h.update(local.tobytes())
    result = {
        "distributed": dist,
        "process_count": jax.process_count(),
        "process_index": jax.process_index(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "param_sha256": h.hexdigest(),
        "mean_reward": float(metrics["mean_reward"]),
        "global_step": int(np.asarray(
            ts.global_step.addressable_shards[0].data)),
    }
    line = json.dumps(result)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
