"""Geodesic (maze-aware) potential fields for progress shaping.

The faithful reference reward's distance term and the Euclidean progress
shaping (`EnvConfig.progress_reward_scale`) both use straight-line goal
distance.  In a U-shaped maze that potential has a local optimum pressed
against the inner wall: driving *around* the wall first increases Euclidean
distance, so a greedy learner parks at the wall — the failure mode behind
the reference's 0% and round-4's ~10-20% success plateaus (VERDICT r4).

This module precomputes, once per scene at env construction, the geodesic
distance-to-goal field for every candidate goal cell: a Dijkstra pass over a
fine occupancy grid rasterized from the scene's wall boxes
(`spec/scene.SceneSpec.box_pos/box_size`).  Shaping then uses
``phi(pos) = field[goal_cell](pos)`` as the potential:
``r += scale * (phi(prev) - phi(new))`` telescopes over the episode
(potential-based shaping, Ng et al. 1999 — preserves the optimal policy)
and is monotonically decreasing along every corridor toward the goal, so
there is no off-goal local optimum anywhere in the maze.

TPU mapping: the fields are a small ``(K, H, W)`` constant (≈7×120×120 f32
for umaze ≈ 400 KB) baked into the jitted step; sampling is four dynamic
gathers + bilinear arithmetic per env — negligible against the physics step
and fully fused by XLA.  The Pallas megakernel is untouched: shaping reads
the chassis world xy that `engine.step_batch` already returns.

No reference counterpart (the reference has no shaping at all); this is an
opt-in training knob (`--geodesic-reward`), OFF by default — reward
semantics with the flag unset are the reference's exactly.
"""
from __future__ import annotations

import heapq
from typing import Tuple

import jax.numpy as jnp
import numpy as np

# Cost multiplier for stepping through a wall-occupied grid cell.  Walls are
# not hard-blocked: the potential keeps a defined, outward-pointing gradient
# even if the chassis center ever overlaps a wall footprint (it can, by the
# chassis half-width), and unreachable pockets still get finite values.
WALL_COST = 6.0


def rasterize_walls(scene, resolution: float,
                    margin: float = 0.6) -> Tuple[np.ndarray, np.ndarray]:
    """Scene wall boxes -> (occupancy (H, W) bool, origin (2,)).

    Grid node (i, j) sits at world ``origin + (j, i) * resolution``; a node
    is occupied when it falls inside any box's xy footprint.  ``margin``
    pads the grid beyond the wall extents so sampling never clamps inside
    the playable area.
    """
    pos = np.asarray(scene.box_pos, np.float64)
    size = np.asarray(scene.box_size, np.float64)
    if len(pos) == 0:                       # open floor: tiny empty grid
        origin = np.array([-margin, -margin])
        shape = (int(2 * margin / resolution) + 1,) * 2
        return np.zeros(shape, bool), origin
    lo = (pos[:, :2] - size[:, :2]).min(axis=0) - margin
    hi = (pos[:, :2] + size[:, :2]).max(axis=0) + margin
    origin = lo
    W = int(np.ceil((hi[0] - lo[0]) / resolution)) + 1
    H = int(np.ceil((hi[1] - lo[1]) / resolution)) + 1
    xs = origin[0] + np.arange(W) * resolution
    ys = origin[1] + np.arange(H) * resolution
    gx, gy = np.meshgrid(xs, ys)            # (H, W)
    occ = np.zeros((H, W), bool)
    for p, s in zip(pos, size):
        occ |= ((np.abs(gx - p[0]) <= s[0]) & (np.abs(gy - p[1]) <= s[1]))
    return occ, origin


def _dijkstra(occ: np.ndarray, start: Tuple[int, int],
              resolution: float) -> np.ndarray:
    """8-connected Dijkstra distance field (meters) from ``start`` (i, j).

    Edge cost = Euclidean step length x the mean of the endpoint cell costs
    (1 for free, WALL_COST inside walls), so the field is defined
    everywhere and grows steeply into walls.
    """
    H, W = occ.shape
    cost = np.where(occ, WALL_COST, 1.0)
    dist = np.full((H, W), np.inf)
    si, sj = start
    dist[si, sj] = 0.0
    pq = [(0.0, si, sj)]
    steps = [(di, dj, resolution * np.hypot(di, dj))
             for di in (-1, 0, 1) for dj in (-1, 0, 1)
             if (di, dj) != (0, 0)]
    while pq:
        d, i, j = heapq.heappop(pq)
        if d > dist[i, j]:
            continue
        ci = cost[i, j]
        for di, dj, ln in steps:
            ni, nj = i + di, j + dj
            if 0 <= ni < H and 0 <= nj < W:
                nd = d + ln * 0.5 * (ci + cost[ni, nj])
                if nd < dist[ni, nj]:
                    dist[ni, nj] = nd
                    heapq.heappush(pq, (nd, ni, nj))
    return dist


def build_fields(scene, resolution: float = 0.05):
    """Per-goal-cell geodesic fields for a maze scene.

    Returns ``(fields (K, H, W) float32, origin (2,) float32)`` where K =
    ``len(scene.free_cells)`` — goal sampling draws exactly these cells
    (envs/ackermann_env.reset_core), so ``fields[goal_cell]`` is the
    episode's potential.  8-connectivity overestimates true geodesics by
    ≤ ~8% (metric on the octile grid), irrelevant for a shaping potential.
    """
    occ, origin = rasterize_walls(scene, resolution)
    fields = []
    for cx, cy in np.asarray(scene.free_cells, np.float64):
        j = int(round((cx - origin[0]) / resolution))
        i = int(round((cy - origin[1]) / resolution))
        i = min(max(i, 0), occ.shape[0] - 1)
        j = min(max(j, 0), occ.shape[1] - 1)
        fields.append(_dijkstra(occ, (i, j), resolution))
    f = np.stack(fields).astype(np.float32)
    # any remaining inf (fully enclosed pockets) -> large finite value
    f[~np.isfinite(f)] = 1e4
    return f, origin.astype(np.float32)


def build_grad_fields(fields: np.ndarray, resolution: float) -> np.ndarray:
    """Per-node central-difference gradient of each field, (K, H, W, 2).

    Sampling this once replaces the four potential lookups a
    central-difference compass costs per step (the interior nodes match
    that exactly up to the sampling offset; borders use one-sided
    differences — outside the wall margin, unreachable in play)."""
    f = np.asarray(fields, np.float32)
    gy, gx = np.gradient(f, resolution, axis=(1, 2))
    return np.stack([gx, gy], axis=-1).astype(np.float32)


def sample(fields, origin, resolution: float, cell_idx, xy):
    """Bilinear potential lookup, fully batched.

    fields: (K, H, W) jnp array; cell_idx: int array (...,); xy: (..., 2)
    world coordinates.  Returns phi (...,) in meters.  Positions outside
    the grid clamp to the border (the margin makes that unreachable in
    play).
    """
    K, H, W = fields.shape
    u = (xy[..., 0] - origin[0]) / resolution
    v = (xy[..., 1] - origin[1]) / resolution
    u = jnp.clip(u, 0.0, W - 1.001)
    v = jnp.clip(v, 0.0, H - 1.001)
    j0 = jnp.floor(u).astype(jnp.int32)
    i0 = jnp.floor(v).astype(jnp.int32)
    fu = u - j0
    fv = v - i0
    c = cell_idx.astype(jnp.int32)
    f00 = fields[c, i0, j0]
    f01 = fields[c, i0, j0 + 1]
    f10 = fields[c, i0 + 1, j0]
    f11 = fields[c, i0 + 1, j0 + 1]
    return ((1 - fv) * ((1 - fu) * f00 + fu * f01)
            + fv * ((1 - fu) * f10 + fu * f11))


def sample_vec(fields, origin, resolution: float, cell_idx, xy):
    """Bilinear lookup in a vector-valued field (K, H, W, C) -> (..., C)."""
    K, H, W, _ = fields.shape
    u = (xy[..., 0] - origin[0]) / resolution
    v = (xy[..., 1] - origin[1]) / resolution
    u = jnp.clip(u, 0.0, W - 1.001)
    v = jnp.clip(v, 0.0, H - 1.001)
    j0 = jnp.floor(u).astype(jnp.int32)
    i0 = jnp.floor(v).astype(jnp.int32)
    fu = (u - j0)[..., None]
    fv = (v - i0)[..., None]
    c = cell_idx.astype(jnp.int32)
    f00 = fields[c, i0, j0]
    f01 = fields[c, i0, j0 + 1]
    f10 = fields[c, i0 + 1, j0]
    f11 = fields[c, i0 + 1, j0 + 1]
    return ((1 - fv) * ((1 - fu) * f00 + fu * f01)
            + fv * ((1 - fu) * f10 + fu * f11))
