"""Maze ingestion tests.

Golden-tests the four transcribed PointMaze grids against the actual
gymnasium_robotics registry (the reference consumes these maps via
gym.make + XML surgery, src/rl/envs/ackermann_gymnasium_maze_env.py:84-98),
and exercises the generalized paths: arbitrary registry ids and explicit
custom cell grids.
"""
import numpy as np
import pytest

from mujoco_playground_tpu.spec import scene as scene_lib

gym = pytest.importorskip("gymnasium")
pytest.importorskip("gymnasium_robotics")


@pytest.mark.parametrize("maze_id", list(scene_lib.POINTMAZE_MAPS))
def test_transcribed_maps_match_registry(maze_id):
    golden = scene_lib.normalize_maze_map(scene_lib.registry_maze_map(maze_id))
    ours = np.asarray(scene_lib.POINTMAZE_MAPS[maze_id])
    np.testing.assert_array_equal(ours, golden)


def _covers_exact_wall_cells(sc, grid, half_h=0.2):
    """The merged boxes must be the EXACT union of the grid's wall cells:
    every wall-cell center lies in some box, no free-cell center does, and
    the total volume (merged boxes are disjoint) equals the cell count."""
    rows, cols = grid.shape
    vol = float(np.sum(np.prod(2 * sc.box_size, axis=-1)))
    assert abs(vol - int(grid.sum()) * 1.0 * 1.0 * 2 * half_h) < 1e-9
    for i in range(rows):
        for j in range(cols):
            x = j * 1.0 - cols / 2 + 0.5
            y = rows / 2 - i * 1.0 - 0.5
            inside = np.any(np.all(
                np.abs(np.array([x, y]) - sc.box_pos[:, :2])
                < sc.box_size[:, :2] + 1e-9, axis=-1))
            assert inside == bool(grid[i, j]), (i, j)


def test_unknown_id_resolves_via_registry():
    maze_id = "PointMaze_Medium_Diverse_GR-v3"   # has 'c' marker cells
    sc = scene_lib.pointmaze_scene(maze_id)
    grid = scene_lib.normalize_maze_map(scene_lib.registry_maze_map(maze_id))
    # collinear wall cells merge into slabs; coverage must stay exact
    assert sc.num_boxes <= int(grid.sum())
    _covers_exact_wall_cells(sc, grid)
    # marker cells count as free (spawnable)
    assert len(sc.free_cells) == int((grid == 0).sum())


def test_explicit_custom_maze_map():
    grid = [[1, 1, 1, 1],
            [1, "r", 0, 1],
            [1, 0, "g", 1],
            [1, 1, 1, 1]]
    sc = scene_lib.pointmaze_scene("custom", maze_map=grid)
    _covers_exact_wall_cells(sc, scene_lib.normalize_maze_map(grid))
    assert sc.num_boxes == 4          # 12 ring cells -> 4 slabs
    assert len(sc.free_cells) == 4


def test_merged_boxes_preserve_lidar_distances():
    """Ray entry distances against the merged union must equal the per-cell
    set exactly (the union solid is unchanged)."""
    import jax.numpy as jnp

    from mujoco_playground_tpu.physics.raycast import raycast_scene

    sc = scene_lib.pointmaze_scene("umaze")
    grid = np.asarray(scene_lib.POINTMAZE_MAPS["PointMaze_UMaze-v3"])
    # rebuild the unmerged per-cell set
    rows, cols = grid.shape
    cells = [(j - cols / 2 + 0.5, rows / 2 - i - 0.5)
             for i in range(rows) for j in range(cols) if grid[i, j]]
    assert sc.num_boxes < len(cells)

    class Boxed:
        plane_z = jnp.asarray(-0.5)
        plane_half_size = np.array([40.0, 40.0])
        num_scene_boxes = None
        scene_box_pos = None
        scene_box_size = None

    merged, percell = Boxed(), Boxed()
    merged.scene_box_pos = jnp.asarray(sc.box_pos)
    merged.scene_box_size = jnp.asarray(sc.box_size)
    merged.num_scene_boxes = sc.num_boxes
    percell.scene_box_pos = jnp.asarray(
        [[x, y, -0.3] for x, y in cells])
    percell.scene_box_size = jnp.asarray([[0.5, 0.5, 0.2]] * len(cells))
    percell.num_scene_boxes = len(cells)

    rng = np.random.RandomState(0)
    origins = np.concatenate(
        [rng.uniform(-2, 2, (512, 2)), rng.uniform(-0.45, 0.2, (512, 1))],
        axis=1)
    # drop origins INSIDE a wall: there the per-cell ray exits its own cell
    # (possibly an internal seam) while the union exits the slab — a real
    # semantic difference, but unreachable in simulation (contacts keep
    # penetration at the mm scale; a lidar origin can never be inside a
    # wall cell's interior)
    pc = np.asarray([[x, y, -0.3] for x, y in cells])
    inside = np.any(np.all(np.abs(origins[:, None, :] - pc[None])
                           < np.array([0.5, 0.5, 0.2]) - 1e-6, axis=-1),
                    axis=-1)
    origins = jnp.asarray(origins[~inside][:256])
    d = rng.randn(512, 3)[~inside][:256]
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    np.testing.assert_array_equal(
        np.asarray(raycast_scene(merged, origins, dirs)),
        np.asarray(raycast_scene(percell, origins, dirs)))


def test_unknown_everything_raises():
    with pytest.raises(KeyError, match="not in the transcribed maps"):
        scene_lib.pointmaze_scene("NotAMaze-v99")


def test_ragged_maze_map_rejected():
    with pytest.raises(ValueError, match="unequal"):
        scene_lib.normalize_maze_map([[1, 1], [1]])


@pytest.mark.slow
def test_make_env_accepts_registry_id_and_custom_map():
    from mujoco_playground_tpu.envs import make_ackermann_env
    env = make_ackermann_env("maze", "PointMaze_Open_Diverse_G-v3",
                             solver_iterations=2, ls_iterations=2)
    assert env.arena == "maze"
    env2 = make_ackermann_env(
        "maze", maze_map=[[1, 1, 1], [1, 0, 1], [1, 1, 1]],
        solver_iterations=2, ls_iterations=2)
    # 8 ring cells merge into 4 slabs
    assert env2.model.scene_box_pos.shape[0] == 4
