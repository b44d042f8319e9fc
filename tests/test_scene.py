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


def test_unknown_id_resolves_via_registry():
    maze_id = "PointMaze_Medium_Diverse_GR-v3"   # has 'c' marker cells
    sc = scene_lib.pointmaze_scene(maze_id)
    grid = scene_lib.normalize_maze_map(scene_lib.registry_maze_map(maze_id))
    assert sc.num_boxes == int(grid.sum())
    # marker cells count as free (spawnable)
    assert len(sc.free_cells) == int((grid == 0).sum())
    # wall centers follow gymnasium_robotics's cell_rowcol_to_xy convention
    rows, cols = grid.shape
    i, j = np.argwhere(grid == 1)[0]
    x = j * 1.0 - cols / 2 + 0.5
    y = rows / 2 - i * 1.0 - 0.5
    np.testing.assert_allclose(sc.box_pos[0][:2], [x, y])


def test_explicit_custom_maze_map():
    grid = [[1, 1, 1, 1],
            [1, "r", 0, 1],
            [1, 0, "g", 1],
            [1, 1, 1, 1]]
    sc = scene_lib.pointmaze_scene("custom", maze_map=grid)
    assert sc.num_boxes == 12
    assert len(sc.free_cells) == 4


def test_unknown_everything_raises():
    with pytest.raises(KeyError, match="not in the transcribed maps"):
        scene_lib.pointmaze_scene("NotAMaze-v99")


def test_ragged_maze_map_rejected():
    with pytest.raises(ValueError, match="unequal"):
        scene_lib.normalize_maze_map([[1, 1], [1]])


def test_make_env_accepts_registry_id_and_custom_map():
    from mujoco_playground_tpu.envs import make_ackermann_env
    env = make_ackermann_env("maze", "PointMaze_Open_Diverse_G-v3",
                             solver_iterations=2, ls_iterations=2)
    assert env.arena == "maze"
    env2 = make_ackermann_env(
        "maze", maze_map=[[1, 1, 1], [1, 0, 1], [1, 1, 1]],
        solver_iterations=2, ls_iterations=2)
    assert env2.model.scene_box_pos.shape[0] == 8
