"""Keyboard teleop — twin of the reference's MujocoTeleop
(src/teleop/keyboard_teleop.py): numpad/arrow increments on linear_x (+-0.1)
and angular_z (+-0.3), diagonals, KP_5 stop, clipping to +-1.0 / +-2.0.

Keycodes are GLFW numeric values (as delivered by mujoco.viewer's
key_callback); glfw itself is an optional import.
"""
from __future__ import annotations

try:
    import glfw
    KEY_KP_1, KEY_KP_2, KEY_KP_3 = glfw.KEY_KP_1, glfw.KEY_KP_2, glfw.KEY_KP_3
    KEY_KP_4, KEY_KP_5, KEY_KP_6 = glfw.KEY_KP_4, glfw.KEY_KP_5, glfw.KEY_KP_6
    KEY_KP_7, KEY_KP_8, KEY_KP_9 = glfw.KEY_KP_7, glfw.KEY_KP_8, glfw.KEY_KP_9
    KEY_UP, KEY_DOWN = glfw.KEY_UP, glfw.KEY_DOWN
    KEY_LEFT, KEY_RIGHT = glfw.KEY_LEFT, glfw.KEY_RIGHT
except ImportError:  # GLFW numeric keycodes (stable constants)
    KEY_KP_0 = 320
    (KEY_KP_1, KEY_KP_2, KEY_KP_3, KEY_KP_4, KEY_KP_5, KEY_KP_6, KEY_KP_7,
     KEY_KP_8, KEY_KP_9) = range(321, 330)
    KEY_RIGHT, KEY_LEFT, KEY_DOWN, KEY_UP = 262, 263, 264, 265


class MujocoTeleop:
    """Accumulating cmd_vel from viewer key events."""

    def __init__(self, linear_increment=0.1, angular_increment=0.3,
                 linear_limit=1.0, angular_limit=2.0):
        self.cmd_vel = {"linear_x": 0.0, "angular_z": 0.0}
        self.linear_increment = linear_increment
        self.angular_increment = angular_increment
        self.linear_limit = linear_limit
        self.angular_limit = angular_limit

    def key_callback(self, keycode):
        li, ai = self.linear_increment, self.angular_increment
        if keycode in (KEY_KP_8, KEY_UP):
            self.cmd_vel["linear_x"] += li
        elif keycode in (KEY_KP_2, KEY_DOWN):
            self.cmd_vel["linear_x"] -= li
        elif keycode in (KEY_KP_4, KEY_LEFT):
            self.cmd_vel["angular_z"] += ai
        elif keycode in (KEY_KP_6, KEY_RIGHT):
            self.cmd_vel["angular_z"] -= ai
        elif keycode == KEY_KP_7:
            self.cmd_vel["linear_x"] += li
            self.cmd_vel["angular_z"] += ai
        elif keycode == KEY_KP_9:
            self.cmd_vel["linear_x"] += li
            self.cmd_vel["angular_z"] -= ai
        elif keycode == KEY_KP_1:
            self.cmd_vel["linear_x"] -= li
            self.cmd_vel["angular_z"] += ai
        elif keycode == KEY_KP_3:
            self.cmd_vel["linear_x"] -= li
            self.cmd_vel["angular_z"] -= ai
        elif keycode == KEY_KP_5:
            self.cmd_vel["linear_x"] = 0.0
            self.cmd_vel["angular_z"] = 0.0
        self.cmd_vel["linear_x"] = max(
            min(self.cmd_vel["linear_x"], self.linear_limit),
            -self.linear_limit)
        self.cmd_vel["angular_z"] = max(
            min(self.cmd_vel["angular_z"], self.angular_limit),
            -self.angular_limit)

    def get_cmd_vel(self):
        """Return the current cmd_vel dict (linear_x, angular_z)."""
        return self.cmd_vel
