"""Multi-chip scaling benchmark: env throughput vs mesh size.

On a real v5e host/pod this measures scaling efficiency of the data-parallel
env batch (BASELINE target: >=80% at N>=2).  On this single-chip rig it
degenerates to N=1; run with JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count=8 to validate mechanics on a virtual
mesh (numbers then reflect CPU, not TPU).

    python scripts/scale_bench.py --envs-per-chip 4096 --steps 50
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs-per-chip", type=int, default=4096)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--maze", default="umaze")
    args = p.parse_args()

    from mujoco_playground_tpu.envs import make_ackermann_env
    from mujoco_playground_tpu.parallel import mesh as mesh_lib

    env = make_ackermann_env("maze", args.maze, solver_iterations=4,
                             ls_iterations=3)
    devices = jax.devices()
    results = {}
    n = 1
    while n <= len(devices):
        mesh = mesh_lib.make_mesh(devices[:n])
        B = args.envs_per_chip * n
        states = jax.jit(jax.vmap(env.reset))(
            jax.random.split(jax.random.PRNGKey(0), B))
        states = mesh_lib.shard_env_states(states, mesh)

        def rollout(states, keys):
            def body(s, key):
                acts = jax.random.uniform(key, (B, 2), minval=-1.0,
                                          maxval=1.0)
                return env.step_autoreset_batch(s, acts), ()
            out, _ = jax.lax.scan(body, states, keys)
            return out

        f = jax.jit(rollout)
        keys = jax.random.split(jax.random.PRNGKey(1), args.steps)
        states = f(states, keys)
        jax.block_until_ready(states.obs)
        t0 = time.time()
        states = f(states, keys)
        jax.block_until_ready(states.obs)
        dt = time.time() - t0
        sps = args.steps * B / dt
        results[n] = sps
        eff = sps / (n * results[1]) * 100 if 1 in results else 100.0
        print(f"chips={n:2d}  envs={B:6d}  {sps/1e6:7.3f} M env-steps/s  "
              f"scaling efficiency {eff:5.1f}%")
        n *= 2


if __name__ == "__main__":
    main()
