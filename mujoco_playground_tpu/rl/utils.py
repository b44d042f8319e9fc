"""RL utilities — twins of the reference's src/rl/utils.py."""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def compute_episode_stats(returns: List[float],
                          lengths: List[int]) -> Dict[str, float]:
    """Mean/std/min/max return + length stats (reference utils.py:8-17)."""
    return {
        'mean_return': float(np.mean(returns)),
        'std_return': float(np.std(returns)),
        'min_return': float(np.min(returns)),
        'max_return': float(np.max(returns)),
        'mean_length': float(np.mean(lengths)),
        'std_length': float(np.std(lengths)),
    }


def normalize_observation(obs: np.ndarray, low, high) -> np.ndarray:
    """Normalize observation to [0, 1] (reference utils.py:53-63)."""
    range_vals = np.asarray(high) - np.asarray(low)
    range_vals = np.where(range_vals == 0, 1.0, range_vals)
    return (obs - low) / range_vals


def create_action_mapping(max_linear: float = 1.0, max_angular: float = 1.0):
    """Map normalized actions to velocities (reference utils.py:66-72)."""
    def map_action(action) -> Tuple[float, float]:
        return action[0] * max_linear, action[1] * max_angular
    return map_action
