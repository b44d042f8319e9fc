"""Map spawners — API-surface twins of the reference's spawner layer.

The reference has ``SimpleMapSpawner.load_random_environment`` returning a
freshly-compiled ``(model, data, map_name)`` per reset
(src/rl/envs/simple_map_spawner.py:22-54) and references a richer
``MapSpawner`` whose source is lost (SURVEY.md §2.2).  Here spawners return
the *compiled-once* model plus a fresh state — compilation never happens at
reset time.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mujoco_playground_tpu.physics import make_model, make_state
from mujoco_playground_tpu.physics.model import Model
from mujoco_playground_tpu.physics.state import State
from mujoco_playground_tpu.spec.robot import ackermann_robot_v2
from mujoco_playground_tpu.spec.scene import (SceneSpec, maze_flat_scene,
                                              open_floor_scene,
                                              pointmaze_scene)


class SimpleMapSpawner:
    """Bare-floor spawner (reference SimpleMapSpawner)."""

    def __init__(self, dtype=jnp.float32):
        self.scene = open_floor_scene()
        self.model: Model = make_model(ackermann_robot_v2(), self.scene,
                                       dtype=dtype)

    def load_random_environment(self, robot_pos=None, robot_quat=None
                                ) -> Tuple[Model, State, str]:
        """Returns (model, state, map_name); model is compiled once."""
        robot_pos = [0.0, 0.0, 0.1] if robot_pos is None else robot_pos
        qpos = self.model.qpos0
        qpos = qpos.at[0:3].set(jnp.asarray(robot_pos, self.model.dtype))
        if robot_quat is not None:
            qpos = qpos.at[3:7].set(jnp.asarray(robot_quat, self.model.dtype))
        return self.model, make_state(self.model, qpos=qpos), "simple_floor"


class MapSpawner:
    """Multi-map spawner (restores the lost reference MapSpawner capability):
    rotates through a library of compiled scenes, sampling one per call."""

    def __init__(self, maze_ids=("PointMaze_UMaze-v3", "PointMaze_Open-v3",
                                 "PointMaze_Medium-v3", "PointMaze_Large-v3"),
                 include_maze_flat: bool = True, dtype=jnp.float32):
        self.scenes = [pointmaze_scene(mid) for mid in maze_ids]
        if include_maze_flat:
            self.scenes.append(maze_flat_scene())
        spec = ackermann_robot_v2()
        self.models = [make_model(spec, sc, dtype=dtype) for sc in self.scenes]
        self._key = jax.random.PRNGKey(0)

    def load_random_environment(self, robot_pos=None, robot_quat=None
                                ) -> Tuple[Model, State, str]:
        self._key, sub = jax.random.split(self._key)
        idx = int(jax.random.randint(sub, (), 0, len(self.scenes)))
        scene = self.scenes[idx]
        model = self.models[idx]
        z = scene.floor_z + 0.055 if scene.floor_z != 0.0 else 0.1
        robot_pos = [0.0, 0.0, z] if robot_pos is None else robot_pos
        qpos = model.qpos0.at[0:3].set(jnp.asarray(robot_pos, model.dtype))
        if robot_quat is not None:
            qpos = qpos.at[3:7].set(jnp.asarray(robot_quat, model.dtype))
        return model, make_state(model, qpos=qpos), scene.name
