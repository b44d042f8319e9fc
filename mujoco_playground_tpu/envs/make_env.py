"""Env factory — restores the reference's lost ``make_env`` API.

The reference's ``src/rl/make_env.py`` survives only as bytecode (SURVEY.md
§2 component #17); its recovered signature is reproduced here:
``make_ackermann_env(env_type='maze', maze_id='PointMaze_UMaze-v3', ...)``
dispatching to the maze or simple env, and ``list_available_mazes()``.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from mujoco_playground_tpu.envs.ackermann_env import AckermannEnv, EnvConfig
from mujoco_playground_tpu.spec.scene import (maze_flat_scene,
                                              pointmaze_scene)
from mujoco_playground_tpu.spec.scene import list_available_mazes  # noqa: F401


def make_ackermann_env(env_type: str = "maze",
                       maze_id: str = "PointMaze_UMaze-v3",
                       max_linear_velocity: float = 0.5,
                       max_angular_velocity: float = 1.0,
                       goal_distance_threshold: float = 0.3,
                       max_episode_steps: int = 1000,
                       dtype=jnp.float32,
                       maze_map=None,
                       **kwargs) -> AckermannEnv:
    """Create an Ackermann navigation env.

    Args:
      env_type: 'maze' (PointMaze arena), 'simple' (open floor), or
        'maze_flat' (the hand-authored 38-obstacle grid).
      maze_map: optional explicit cell grid (gymnasium_robotics-style, may
        mix 0/1 with 'r'/'g'/'c' markers) overriding `maze_id`'s layout.
        Unknown `maze_id`s resolve through the gymnasium registry
        (spec.scene.registry_maze_map).
      **kwargs: EnvConfig fields, plus AckermannEnv construction knobs
        (solver_iterations, ls_iterations).  Unknown names raise — a typo'd
        config key silently doing nothing is worse than an error.
    """
    env_kwargs = {k: kwargs.pop(k) for k in ("solver_iterations",
                                             "ls_iterations") if k in kwargs}
    unknown = [k for k in kwargs if k not in EnvConfig.__annotations__]
    if unknown:
        raise TypeError(f"make_ackermann_env: unknown kwargs {unknown}")
    config = EnvConfig(
        max_linear_velocity=max_linear_velocity,
        max_angular_velocity=max_angular_velocity,
        goal_distance_threshold=goal_distance_threshold,
        max_episode_steps=max_episode_steps,
        **kwargs)
    if env_type == "maze":
        scene = pointmaze_scene(maze_id, maze_map=maze_map)
        return AckermannEnv(scene=scene, config=config, dtype=dtype,
                            **env_kwargs)
    if env_type == "simple":
        return AckermannEnv(config=config, dtype=dtype, **env_kwargs)
    if env_type == "maze_flat":
        return AckermannEnv(scene=maze_flat_scene(), config=config,
                            dtype=dtype, **env_kwargs)
    raise ValueError(
        f"Unknown env_type {env_type!r} (expected 'maze', 'simple', or "
        f"'maze_flat')")
