"""Dev: time the components of the full env step on the TPU.

Breaks 1/throughput into physics megakernel, lidar kernel, observe/reward,
and auto-reset merge so optimization effort goes where the time is.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev_step_breakdown.py
"""
import time

import jax
import jax.numpy as jnp

from mujoco_playground_tpu.envs import make_ackermann_env

B = 4096
N = 200


def bench(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(N):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N
    print(f"{name:42s} {dt*1e3:7.3f} ms  {B/dt/1e6:6.2f} M env-steps/s")
    return dt


def main():
    env = make_ackermann_env("maze", "umaze", solver_iterations=4,
                             ls_iterations=3)
    rng = jax.random.PRNGKey(0)
    states = jax.jit(jax.vmap(env.reset))(jax.random.split(rng, B))
    actions = jnp.zeros((B, 2), states.obs.dtype) + 0.3

    from mujoco_playground_tpu.physics import engine
    from mujoco_playground_tpu.ops import lidar_pallas

    model = env.model

    phys = jax.jit(lambda s: engine.step_batch(model, s.physics))
    bench("physics step_batch (megakernel)", phys, states)

    lidar_fn = lidar_pallas.build_lidar_fn(model)
    ph = states.physics
    lid = jax.jit(lambda p: lidar_fn(p.xpos, p.xquat))
    bench("lidar kernel", lid, ph)

    step_only = jax.jit(lambda s, a: env.step_batch(s, a))
    bench("env.step_batch (physics+obs+reward)", step_only, states, actions)

    full = jax.jit(lambda s, a: env.step_autoreset_batch(s, a))
    bench("env.step_autoreset_batch (FULL)", full, states, actions)


if __name__ == "__main__":
    main()
