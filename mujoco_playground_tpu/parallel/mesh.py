"""Device mesh + sharding layout for the env batch and learner.

The reference has no parallelism at all (DummyVecEnv, n_envs=1 —
src/rl/train.py:73-76).  The TPU-native scaling axis is data parallelism over
the env batch: a 1-D ``Mesh`` over all chips with the env batch dimension
sharded along it and learner params replicated.  Gradient reduction comes out
of ``jax.jit`` automatically as ``psum`` over ICI when the loss averages over
the sharded batch axis — no hand-written collectives (the XLA/GSPMD way; the
reference's torch world would have needed NCCL allreduce plumbing).

Works identically on one chip (trivial mesh), a v5e host (8 chips), multiple
hosts (``jax.distributed.initialize`` first), or a CPU test mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=8``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = ENV_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    dev_array = mesh_utils.create_device_mesh(
        (len(devices),), devices=np.asarray(devices))
    return Mesh(dev_array, (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = ENV_AXIS) -> NamedSharding:
    """Shard a leading batch dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_states(states, mesh: Mesh, axis_name: str = ENV_AXIS):
    """Place a batched EnvState pytree with the batch dim sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "ndim") and x.ndim
        else x, states)


def shard_train_state(ts, mesh: Mesh, axis_name: str = ENV_AXIS):
    """Params/opt replicated, env batch sharded, rng replicated."""
    batch = batch_sharding(mesh, axis_name)
    repl = replicated_sharding(mesh)
    return ts.replace(
        params=jax.device_put(ts.params, repl),
        opt_state=jax.device_put(ts.opt_state, repl),
        env_states=jax.tree.map(lambda x: jax.device_put(x, batch),
                                ts.env_states),
        rng=jax.device_put(ts.rng, repl),
        global_step=jax.device_put(ts.global_step, repl),
    )
