"""MFU/roofline accounting for the step megakernel (VERDICT r2 #6 / r3 #4).

Counts the work in one fused env-step three ways and relates the measured
throughput to v5e ceilings, answering "is the kernel at 10% or 60% of
peak — is the next 2x cheap or hard?".

  * FLOPs/env-step: XLA cost_analysis of the staged fallback path (the same
    math the megakernel fuses).  This is an UPPER bound on the kernel's
    arithmetic — the kernel prunes static zeros (sparse Jacobians, zero
    quaternion lanes) that XLA's count includes.
  * HBM bytes/env-step: the kernel's exact I/O (everything else is
    VMEM-resident by construction — that is the point of the megakernel).
  * Measured env-steps/s: pass --steps-per-sec from a bench.py run, or let
    the script run the real chip itself (default under axon).

Run on CPU for the counts only:   env -u PYTHONPATH python scripts/roofline.py --steps-per-sec 3.6e6
Run on TPU for counts + measure:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/roofline.py
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e TensorCore ceilings (public specs; VPU structure per the scaling book)
V5E_HBM_GBS = 819.0
V5E_BF16_MXU_TFLOPS = 197.0
# VPU: (8,128) vector registers x 4 ALUs/slot at ~1.5 GHz (197.2e12 bf16 =
# 2*128*128*4 MXUs * f => f ~ 1.50 GHz)
V5E_VPU_F32_TFLOPS = 8 * 128 * 4 * 1.50e9 / 1e12   # ~6.1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-per-sec", type=float, default=None,
                    help="measured env-steps/s (skip on-device measurement)")
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    from mujoco_playground_tpu.envs import make_ackermann_env

    env = make_ackermann_env("maze", "umaze", solver_iterations=4,
                             ls_iterations=3)
    m = env.model
    B = 256
    states = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(0), B))
    acts = jnp.zeros((B, 2), states.obs.dtype)

    # -- arithmetic (XLA count of the identical-math fallback) --------------
    import mujoco_playground_tpu.physics.engine as engine
    old = engine.FORCE_MEGAKERNEL
    engine.FORCE_MEGAKERNEL = False         # count the XLA path explicitly
    try:
        ca = jax.jit(env.step_autoreset_batch).lower(
            states, acts).compile().cost_analysis()
    finally:
        engine.FORCE_MEGAKERNEL = old
    if isinstance(ca, list):
        ca = ca[0]
    flops_env = ca["flops"] / B

    # -- kernel HBM I/O per env-step ----------------------------------------
    nq, nv, nu = m.qpos0.shape[0], m.dof_damping.shape[0], len(m.actuator_dof)
    nbody, ns = m.body_mass.shape[0], m.nsite
    f32 = 4
    bytes_in = (nq + nv + nu + 7) * f32                 # qpos qvel ctrl env_in
    bytes_out = (nq + nv + 7 * nbody + (2 * ns + 12)) * f32
    bytes_env = bytes_in + bytes_out

    sps = args.steps_per_sec
    if sps is None:
        import time
        Bb = args.batch
        st = jax.jit(jax.vmap(env.reset))(
            jax.random.split(jax.random.PRNGKey(0), Bb))

        def roll(s, keys):
            def body(c, k):
                a = jax.random.uniform(k, (Bb, 2), minval=-1.0, maxval=1.0)
                return env.step_autoreset_batch(c, a), ()
            return jax.lax.scan(body, s, keys)[0]

        keys = jax.random.split(jax.random.PRNGKey(1), 50)
        rj = jax.jit(roll)
        st = rj(st, keys)
        jax.block_until_ready(st.obs)
        t0 = time.time()
        st = rj(st, keys)
        jax.block_until_ready(st.obs)
        sps = 50 * Bb / (time.time() - t0)

    tf = flops_env * sps / 1e12
    gbs = bytes_env * sps / 1e9
    print(f"model: nq={nq} nv={nv} nbody={nbody} nsite={ns}")
    print(f"FLOPs/env-step (XLA upper bound): {flops_env:,.0f}")
    print(f"HBM bytes/env-step (kernel I/O):  {bytes_env:,}")
    print(f"measured:                         {sps:,.0f} env-steps/s")
    print(f"arithmetic:  {tf:.2f} TFLOP/s f32 = "
          f"{100 * tf / V5E_VPU_F32_TFLOPS:.0f}% of VPU peak "
          f"(~{V5E_VPU_F32_TFLOPS:.1f} TF/s), 0% MXU")
    print(f"HBM:         {gbs:.1f} GB/s = "
          f"{100 * gbs / V5E_HBM_GBS:.1f}% of {V5E_HBM_GBS:.0f} GB/s")
    print("binding resource: VPU issue / serial dependency chains "
          "(Newton + Cholesky recurrences), not HBM and not FLOP throughput")


if __name__ == "__main__":
    main()
