"""Gymnasium-compatible wrapper — drop-in API parity with the reference envs.

The reference exposes ``AckermannRobotEnv(gym.Env)`` /
``AckermannGymnasiumMazeEnv(gym.Env)`` (src/rl/envs/).  This wrapper puts the
same Gymnasium face (reset/step -> numpy, spaces, info dict with the
reference's keys: map_name/goal_position/start_position/step/velocities/
goal_distance/collision/min_lidar) on the jitted functional env, so existing
SB3/Gymnasium user code ports by changing one import.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:
    import gymnasium as gym
    from gymnasium import spaces
    from gymnasium.vector import VectorEnv
    from gymnasium.vector.vector_env import AutoresetMode
    from gymnasium.vector.utils import batch_space
    _BASE = gym.Env
    _VBASE = VectorEnv
except ImportError:  # pragma: no cover
    _BASE = object
    _VBASE = object
    spaces = None

from mujoco_playground_tpu.envs.ackermann_env import AckermannEnv, EnvConfig


class GymAckermannEnv(_BASE):
    """Single-env Gymnasium view of :class:`AckermannEnv`.

    Matches the reference observation/action spaces (Box(79,), Box(2,) —
    ackermann_env.py:94-108) and info keys.
    """

    metadata = {"render_modes": ["human"], "render_fps": 50}

    def __init__(self, env: Optional[AckermannEnv] = None,
                 maze_id: Optional[str] = None,
                 config: EnvConfig = EnvConfig(),
                 render_mode: Optional[str] = None):
        self.env = env or AckermannEnv(maze_id=maze_id, config=config)
        self.render_mode = render_mode
        if spaces is not None:
            self.observation_space = spaces.Box(
                low=-np.inf, high=np.inf, shape=(self.env.obs_size,),
                dtype=np.float32)
            self.action_space = spaces.Box(
                low=-1.0, high=1.0, shape=(self.env.action_size,),
                dtype=np.float32)
        self._reset_jit = jax.jit(self.env.reset)
        self._step_jit = jax.jit(self.env.step)
        self._state = None
        self._viewer = None
        self._rng_seed = 0

    def reset(self, *, seed: Optional[int] = None, options=None):
        if seed is not None:
            self._rng_seed = seed
        else:
            self._rng_seed += 1
        self._state = self._reset_jit(jax.random.PRNGKey(self._rng_seed))
        info = {
            "map_name": self.env.scene.name,
            "goal_position": np.asarray(self._state.goal).tolist(),
            "start_position": [0.0, 0.0],
        }
        if self.render_mode == "human":
            self._sync_viewer()
        return np.asarray(self._state.obs, np.float32), info

    def step(self, action):
        action = np.clip(np.asarray(action, np.float32), -1.0, 1.0)
        self._state = self._step_jit(self._state, jnp.asarray(action))
        s = self._state
        info = {
            "step": int(s.steps),
            "linear_velocity": float(action[0]
                                     * self.env.config.max_linear_velocity),
            "angular_velocity": float(action[1]
                                      * self.env.config.max_angular_velocity),
            "goal_distance": float(s.goal_distance),
            "collision": bool(s.collision),
            "min_lidar": float(s.min_lidar),
        }
        if self.render_mode == "human":
            self._sync_viewer()
        return (np.asarray(s.obs, np.float32), float(s.reward),
                bool(s.terminated), bool(s.truncated), info)

    # ------------------------------------------------------------- rendering
    def _sync_viewer(self):
        """Mirror our engine state into a MuJoCo passive viewer (TPU physics,
        MuJoCo visualization — optional, requires mujoco + a display)."""
        try:
            viewer = self._ensure_viewer()
        except Exception:
            self.render_mode = None
            return
        if viewer is None:
            return
        self._mj_data.qpos[:] = np.asarray(self._state.physics.qpos)
        self._mj_data.qvel[:] = np.asarray(self._state.physics.qvel)
        import mujoco
        mujoco.mj_forward(self._mj_model, self._mj_data)
        viewer.sync()

    def _ensure_viewer(self):
        if self._viewer is not None:
            return self._viewer
        import mujoco
        import mujoco.viewer
        from mujoco_playground_tpu.spec.mjcf import to_mjcf
        from mujoco_playground_tpu.spec.robot import ackermann_robot_v2
        self._mj_model = mujoco.MjModel.from_xml_string(
            to_mjcf(ackermann_robot_v2(), self.env.scene))
        self._mj_data = mujoco.MjData(self._mj_model)
        self._viewer = mujoco.viewer.launch_passive(self._mj_model,
                                                    self._mj_data)
        return self._viewer

    def render(self):
        if self.render_mode == "human":
            self._sync_viewer()

    def close(self):
        if self._viewer is not None:
            self._viewer.close()
            self._viewer = None


class GymVectorAckermannEnv(_VBASE):
    """``gymnasium.vector.VectorEnv`` over the batched TPU fast path.

    Implements the real Gymnasium 1.x vector contract in SAME_STEP autoreset
    mode: when an episode ends, the returned observation is the next
    episode's first observation and the terminal observation/info arrive in
    ``info["final_obs"]`` / ``info["final_info"]`` (the convention
    gymnasium's own SyncVectorEnv uses for this mode), with
    ``metadata["autoreset_mode"]`` advertising it.  Spaces follow the
    single/batched space split (``batch_space``).
    """

    metadata = ({"autoreset_mode": AutoresetMode.SAME_STEP}
                if spaces is not None else {})

    def __init__(self, num_envs: int, env: Optional[AckermannEnv] = None,
                 maze_id: Optional[str] = None,
                 config: EnvConfig = EnvConfig(), seed: int = 0):
        self.env = env or AckermannEnv(maze_id=maze_id, config=config)
        self.num_envs = num_envs
        if spaces is not None:
            self.single_observation_space = spaces.Box(
                low=-np.inf, high=np.inf, shape=(self.env.obs_size,),
                dtype=np.float32)
            self.single_action_space = spaces.Box(
                low=-1.0, high=1.0, shape=(self.env.action_size,),
                dtype=np.float32)
            self.observation_space = batch_space(
                self.single_observation_space, num_envs)
            self.action_space = batch_space(self.single_action_space,
                                            num_envs)
        self._reset_jit = jax.jit(jax.vmap(self.env.reset))
        self._step_jit = jax.jit(self.env.step_autoreset_batch)
        self._seed = seed
        self._states = None

    def reset(self, *, seed: Optional[int] = None, options=None):
        if seed is not None:
            self._seed = seed
        keys = jax.random.split(jax.random.PRNGKey(self._seed),
                                self.num_envs)
        self._states = self._reset_jit(keys)
        return np.asarray(self._states.obs, np.float32), {}

    def step(self, actions):
        self._states = self._step_jit(self._states, jnp.asarray(actions))
        s = self._states
        done = np.asarray(s.done)
        info = {
            "goal_distance": np.asarray(s.goal_distance),
            "collision": np.asarray(s.collision),
        }
        if done.any():
            info["final_obs"] = np.asarray(s.final_obs, np.float32)
            info["final_info"] = {
                "goal_distance": np.asarray(s.goal_distance),
                "collision": np.asarray(s.collision),
                "_goal_distance": done,
                "_collision": done,
            }
            info["_final_obs"] = done
            info["_final_info"] = done
        return (np.asarray(s.obs, np.float32), np.asarray(s.reward),
                np.asarray(s.terminated), np.asarray(s.truncated), info)

    def close_extras(self, **kwargs):
        pass
