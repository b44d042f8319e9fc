"""RL utilities (reference src/rl/utils.py — only the helpers that are
actually consumed; the reference's ``normalize_observation`` /
``create_action_mapping`` were dead code there and are not reproduced)."""
from __future__ import annotations

from typing import Dict, List

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
