"""Gymnasium wrapper + teleop + interop surfaces (host-side API parity)."""
import numpy as np
import pytest

from mujoco_playground_tpu.envs.ackermann_env import EnvConfig
from mujoco_playground_tpu.teleop.keyboard import (KEY_KP_5, KEY_KP_8,
                                                   KEY_LEFT, MujocoTeleop)


def test_gym_wrapper_api():
    gym = pytest.importorskip("gymnasium")
    from mujoco_playground_tpu.envs.gym_wrapper import GymAckermannEnv

    env = GymAckermannEnv(maze_id="PointMaze_UMaze-v3",
                          config=EnvConfig(max_episode_steps=10))
    assert env.observation_space.shape == (79,)
    assert env.action_space.shape == (2,)
    obs, info = env.reset(seed=3)
    assert obs.shape == (79,) and obs.dtype == np.float32
    assert "map_name" in info
    total = 0.0
    for i in range(10):
        obs, reward, terminated, truncated, info = env.step([0.5, 0.1])
        total += reward
        assert {"step", "goal_distance", "collision", "min_lidar",
                "linear_velocity", "angular_velocity"} <= set(info)
    assert truncated and not terminated  # 10-step truncation
    # reset starts a fresh episode
    obs2, _ = env.reset(seed=4)
    assert obs2.shape == (79,)
    env.close()


def test_gym_wrapper_seeding_reproducible():
    pytest.importorskip("gymnasium")
    from mujoco_playground_tpu.envs.gym_wrapper import GymAckermannEnv

    env = GymAckermannEnv(maze_id="PointMaze_UMaze-v3")
    o1, _ = env.reset(seed=11)
    o2, _ = env.reset(seed=11)
    np.testing.assert_array_equal(o1, o2)
    o3, _ = env.reset(seed=12)
    assert not np.array_equal(o1, o3)


def test_keyboard_teleop_semantics():
    t = MujocoTeleop()
    t.key_callback(KEY_KP_8)
    t.key_callback(KEY_KP_8)
    assert np.isclose(t.get_cmd_vel()["linear_x"], 0.2)
    t.key_callback(KEY_LEFT)
    assert np.isclose(t.get_cmd_vel()["angular_z"], 0.3)
    # clipping at the limits (reference: +-1.0 / +-2.0)
    for _ in range(30):
        t.key_callback(KEY_KP_8)
    assert t.get_cmd_vel()["linear_x"] == 1.0
    t.key_callback(KEY_KP_5)
    assert t.get_cmd_vel() == {"linear_x": 0.0, "angular_z": 0.0}


def test_cmd_vel_bus():
    from mujoco_playground_tpu.core.cmd_vel import (CmdVelPublisher, Twist,
                                                    Vector3)
    bus = CmdVelPublisher()
    seen = []
    bus.subscribe(seen.append)
    msg = Twist(linear=Vector3(x=0.5), angular=Vector3(z=-0.2))
    bus.publish(msg)
    assert seen == [msg]
    assert bus.get_latest() is msg


@pytest.mark.slow
def test_gym_vector_env():
    pytest.importorskip("gymnasium")
    import numpy as np

    from mujoco_playground_tpu.envs.gym_wrapper import GymVectorAckermannEnv

    import gymnasium as gym
    from gymnasium.vector import VectorEnv
    from gymnasium.vector.vector_env import AutoresetMode

    venv = GymVectorAckermannEnv(4, maze_id="PointMaze_UMaze-v3",
                                 config=EnvConfig(max_episode_steps=6))
    # real gymnasium.vector.VectorEnv contract
    assert isinstance(venv, VectorEnv)
    assert venv.metadata["autoreset_mode"] is AutoresetMode.SAME_STEP
    assert venv.observation_space.shape == (4, 79)
    assert venv.action_space.shape == (4, 2)
    obs, _ = venv.reset(seed=0)
    assert obs.shape == (4, 79)
    assert venv.observation_space.contains(obs)
    acts = np.tile([0.5, 0.1], (4, 1)).astype(np.float32)
    for i in range(6):
        obs, rew, term, trunc, info = venv.step(acts)
    assert trunc.all() and not term.any()     # all truncate at step 6
    # SAME_STEP convention: final_obs/final_info + mask keys
    assert info["final_obs"].shape == (4, 79)
    assert info["_final_obs"].all()
    assert "final_info" in info
    obs, rew, term, trunc, info = venv.step(acts)
    assert not trunc.any()                    # fresh episodes after autoreset
    assert "final_obs" not in info            # no episode ended this step
    venv.close()
