import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import sys; sys.path.insert(0, '/root/repo')
from mujoco_playground_tpu.envs.ackermann_env import AckermannEnv
from mujoco_playground_tpu.physics import engine

env = AckermannEnv(maze_id="PointMaze_UMaze-v3", solver_iterations=4, ls_iterations=3)
model = env.model
T = 20
for B in [4096, 8192]:
    states = jax.jit(jax.vmap(env.reset))(jax.random.split(jax.random.PRNGKey(0), B))
    phys = states.physics
    def wrapped(s):
        def body(c, _): return engine.step_batch(model, c), ()
        out, _ = jax.lax.scan(body, s, None, length=T)
        return out
    f = jax.jit(wrapped)
    t0=time.time(); out = f(phys); jax.block_until_ready(out.qpos); print(f"B={B} compile+first:", round(time.time()-t0,1), flush=True)
    t0=time.time(); out = f(out); jax.block_until_ready(out.qpos)
    dt=(time.time()-t0)/T
    print(f"B={B}: physics(batched) {dt*1e3:6.2f} ms/step  {B/dt/1e6:.3f} M env-steps/s", flush=True)
B=4096
states = jax.jit(jax.vmap(env.reset))(jax.random.split(jax.random.PRNGKey(0), B))
def envroll(s, keys):
    def body(c, key):
        acts = jax.random.uniform(key, (B,2), minval=-1., maxval=1.)
        return env.step_autoreset_batch(c, acts), ()
    out, _ = jax.lax.scan(body, s, keys)
    return out
f2 = jax.jit(envroll)
keys = jax.random.split(jax.random.PRNGKey(2), T)
t0=time.time(); out = f2(states, keys); jax.block_until_ready(out.obs); print("env compile+first:", round(time.time()-t0,1), flush=True)
t0=time.time(); out = f2(out, keys); jax.block_until_ready(out.obs)
dt=(time.time()-t0)/T
print(f"B={B}: full env step(batched) {dt*1e3:6.2f} ms/step  {B/dt/1e6:.3f} M env-steps/s", flush=True)
