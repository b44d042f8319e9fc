from mujoco_playground_tpu.teleop.keyboard import MujocoTeleop  # noqa: F401
