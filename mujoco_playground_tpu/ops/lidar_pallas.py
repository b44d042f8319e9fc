"""Fused Pallas TPU kernel for the 72-beam lidar raycast.

The XLA path (physics/raycast.py vmapped over envs) materializes
(B, beams, boxes, 3) slab-test intermediates in HBM — measured ~670 us at
B=4096 on v5e, the dominant cost of the env step once physics runs in the
step megakernel.  This kernel keeps everything in VMEM per 256-env block:
ray frames are rebuilt from the chassis pose with static site offsets
(static-zero-pruned scalar helpers from ops/step_pallas), and the scene's
AABBs are baked in as Python floats so each beam x box slab test is
scalar-broadcast lane arithmetic with an incremental min over boxes —
no (beams x boxes) tensor ever exists.

Semantics identical to raycast.lidar / MuJoCo rangefinders
(reference ackermann_robot_v2.xml:103): distance along the site +Z,
-1.0 on no-hit, positive readings clamped to the sensor cutoff, planes
infinite, tangential box hits rejected unless the origin is strictly
inside the parallel slab.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mujoco_playground_tpu.ops.step_pallas import qmul, qrot

BLOCK_B = 256
BIG = 1e10
_EPS = 1e-9
_PEPS = 1e-12

_BUILD_CACHE = {}


def lidar_statics(model):
    """Static (baked-float) raycast inputs shared by this kernel and the
    step megakernel's fused lidar (ops/step_pallas.py)."""
    site_body = tuple(int(b) for b in np.asarray(model.site_body))
    site_pos = np.asarray(model.site_pos, np.float64)
    site_quat = np.asarray(model.site_quat, np.float64)
    bpos = np.asarray(model.scene_box_pos, np.float64).reshape(-1, 3)
    bsize = np.asarray(model.scene_box_size, np.float64).reshape(-1, 3)
    boxes_lo = [tuple(float(v) for v in r) for r in (bpos - bsize)]
    boxes_hi = [tuple(float(v) for v in r) for r in (bpos + bsize)]
    plane_z = float(np.asarray(model.plane_z))
    ph = np.asarray(model.plane_half_size, np.float64)
    plane_half = tuple(float(v) if v > 0 else float(BIG) for v in ph)
    cutoff = tuple(float(c) for c in np.asarray(model.sensor_cutoff))
    if len(cutoff) < len(site_body):  # scalar / shared cutoff
        cutoff = tuple(np.broadcast_to(np.asarray(model.sensor_cutoff),
                                       (len(site_body),)).astype(float))
    return (site_body, site_pos, site_quat, boxes_lo, boxes_hi, plane_z,
            plane_half, cutoff)


def lidar_rows(site_body, site_pos, site_quat, boxes_lo, boxes_hi,
               plane_z, plane_half, cutoff, bp, bq):
    """Per-site lidar readings as lane rows given body frames as lanes.

    ``bp``/``bq`` map body index -> [3]/[4] lane vectors.  Pure scalar-
    broadcast lane arithmetic (VMEM-resident inside a Pallas kernel).
    """
    rows = []
    for i, b in enumerate(site_body):
        sp = [float(v) for v in site_pos[i]]
        sq = [float(v) for v in site_quat[i]]
        o = [bp[b][k] + v for k, v in zip(range(3), qrot(bq[b], sp))]
        # beam direction = third column of R(body_quat * site_quat)
        q = qmul(bq[b], sq)
        w, x, y, z = q
        d = [2.0 * (x * z + w * y),
             2.0 * (y * z - w * x),
             1.0 - 2.0 * (x * x + y * y)]

        # ---- floor plane (finite extents, MuJoCo ray_plane semantics) ----
        dz_ok = jnp.abs(d[2]) > _PEPS
        t_plane = (plane_z - o[2]) / jnp.where(dz_ok, d[2], _PEPS)
        on_plane = ((jnp.abs(o[0] + t_plane * d[0]) <= plane_half[0])
                    & (jnp.abs(o[1] + t_plane * d[1]) <= plane_half[1]))
        t_plane = jnp.where(dz_ok & (t_plane > 0) & on_plane, t_plane, BIG)

        # ---- AABBs, incremental min over boxes (static lo/hi floats) ----
        par = [jnp.abs(d[c]) <= _EPS for c in range(3)]
        inv = [1.0 / jnp.where(jnp.abs(d[c]) > _EPS, d[c], _EPS)
               for c in range(3)]
        t_best = jnp.full_like(o[0], BIG)
        for lo, hi in zip(boxes_lo, boxes_hi):
            tmin = jnp.full_like(o[0], -BIG)
            tmax = jnp.full_like(o[0], BIG)
            inside_par = None
            for c in range(3):
                t1 = (lo[c] - o[c]) * inv[c]
                t2 = (hi[c] - o[c]) * inv[c]
                tmin = jnp.maximum(tmin, jnp.where(par[c], -BIG,
                                                   jnp.minimum(t1, t2)))
                tmax = jnp.minimum(tmax, jnp.where(par[c], BIG,
                                                   jnp.maximum(t1, t2)))
                ins = (~par[c]) | ((o[c] > lo[c]) & (o[c] < hi[c]))
                inside_par = ins if inside_par is None else (inside_par & ins)
            hit = (tmax >= tmin) & (tmax > 0) & inside_par
            t_box = jnp.where(hit, jnp.where(tmin > 0, tmin, tmax), BIG)
            t_best = jnp.minimum(t_best, t_box)

        t = jnp.minimum(t_plane, t_best)
        rows.append(jnp.where(t >= BIG, -1.0,
                              jnp.minimum(t, float(cutoff[i]))))
    return rows


def _lidar_kernel(site_body, site_pos, site_quat, boxes_lo, boxes_hi,
                  plane_z, plane_half, cutoff, nbody,
                  xpos_ref, xquat_ref, out_ref):
    """xpos (nbody*3, B), xquat (nbody*4, B) -> lidar (nsite, B)."""
    xpos = xpos_ref[...]
    xquat = xquat_ref[...]
    bp = {b: [xpos[3 * b + k] for k in range(3)]
          for b in sorted(set(site_body))}
    bq = {b: [xquat[4 * b + k] for k in range(4)]
          for b in sorted(set(site_body))}
    out_ref[...] = jnp.stack(lidar_rows(
        site_body, site_pos, site_quat, boxes_lo, boxes_hi,
        plane_z, plane_half, cutoff, bp, bq))


def build_lidar_fn(model, block_b: int = BLOCK_B, interpret: bool = False):
    """Returns lidar(xpos (B, nbody, 3), xquat (B, nbody, 4)) -> (B, nsite).

    The model must be concrete (static geometry baked into the kernel).
    B % block_b == 0.
    """
    # the cached entry retains the model: id() keys are only unique while
    # the object is alive (a GC'd model's id could be reused)
    key = (id(model), block_b, interpret)
    if key in _BUILD_CACHE:
        return _BUILD_CACHE[key][1]

    statics = lidar_statics(model)
    site_body = statics[0]
    nbody = int(model.nbody)
    nsite = len(site_body)

    kernel = functools.partial(_lidar_kernel, *statics, nbody)

    def spec(rows):
        return pl.BlockSpec((rows, block_b), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def lidar(xpos, xquat):
        B = xpos.shape[0]
        dtype = xpos.dtype
        xpos_n = xpos.reshape(B, nbody * 3).T
        xquat_n = xquat.reshape(B, nbody * 4).T
        out = pl.pallas_call(
            kernel,
            grid=(B // block_b,),
            in_specs=[spec(nbody * 3), spec(nbody * 4)],
            out_specs=spec(nsite),
            out_shape=jax.ShapeDtypeStruct((nsite, B), dtype),
            interpret=interpret,
        )(xpos_n, xquat_n)
        return out.T

    _BUILD_CACHE[key] = (model, lidar)
    return lidar
