"""Import Stable-Baselines3 PPO checkpoints into our flax ActorCritic.

The reference ships trained SB3 PPO checkpoints (rl_logs/ppo/*.zip — a zip
of torch state_dicts).  This loader maps `policy.pth` weights onto
:class:`mujoco_playground_tpu.rl.networks.ActorCritic` (the architectures
match by construction: twin 79->64->64 tanh towers, action head + learned
log_std, value head), so reference-trained policies can be evaluated —
and fine-tuned — inside the TPU framework.

SB3 MlpPolicy state_dict keys (verified against the shipped checkpoints):
  mlp_extractor.policy_net.{0,2}.{weight,bias}   -> pi_tower.dense_{0,1}
  mlp_extractor.value_net.{0,2}.{weight,bias}    -> vf_tower.dense_{0,1}
  action_net.{weight,bias}                       -> action_head
  value_net.{weight,bias}                        -> value_head
  log_std                                        -> log_std
Torch Linear stores (out, in); flax Dense expects (in, out) — transposed.
"""
from __future__ import annotations

import io
import zipfile
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np


def _load_policy_state_dict(path: str) -> Dict[str, Any]:
    import torch
    if path.endswith(".zip"):
        with zipfile.ZipFile(path) as zf:
            with zf.open("policy.pth") as f:
                buf = io.BytesIO(f.read())
        return torch.load(buf, map_location="cpu", weights_only=True)
    return torch.load(path, map_location="cpu", weights_only=True)


def load_sb3_ppo_params(path: str) -> Dict[str, Any]:
    """SB3 PPO checkpoint (.zip) -> flax params for ActorCritic."""
    sd = _load_policy_state_dict(path)

    def w(key):
        return jnp.asarray(np.asarray(sd[key]).T)   # torch (out,in) -> (in,out)

    def b(key):
        return jnp.asarray(np.asarray(sd[key]))

    def tower(prefix):
        layers = {}
        idx = 0
        torch_idx = 0
        while f"{prefix}.{torch_idx}.weight" in sd:
            layers[f"dense_{idx}"] = {
                "kernel": w(f"{prefix}.{torch_idx}.weight"),
                "bias": b(f"{prefix}.{torch_idx}.bias"),
            }
            idx += 1
            torch_idx += 2  # tanh layers interleave
        return layers

    params = {
        "pi_tower": tower("mlp_extractor.policy_net"),
        "vf_tower": tower("mlp_extractor.value_net"),
        "action_head": {"kernel": w("action_net.weight"),
                        "bias": b("action_net.bias")},
        "value_head": {"kernel": w("value_net.weight"),
                       "bias": b("value_net.bias")},
        "log_std": b("log_std"),
    }
    return {"params": params}
