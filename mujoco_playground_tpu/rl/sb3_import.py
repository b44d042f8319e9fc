"""Import Stable-Baselines3 checkpoints (PPO/SAC/TD3) into our flax nets.

The reference trains all three algos through SB3 (src/rl/train.py:108-121)
and ships trained PPO checkpoints (rl_logs/ppo/*.zip — a zip of torch
state_dicts).  These loaders map `policy.pth` weights onto our flax modules
(the architectures match by construction), so reference-trained policies can
be evaluated — and fine-tuned — inside the TPU framework.

SB3 PPO MlpPolicy state_dict keys (verified against shipped checkpoints):
  mlp_extractor.policy_net.{0,2}.{weight,bias}   -> pi_tower.dense_{0,1}
  mlp_extractor.value_net.{0,2}.{weight,bias}    -> vf_tower.dense_{0,1}
  action_net.{weight,bias}                       -> action_head
  value_net.{weight,bias}                        -> value_head
  log_std                                        -> log_std

SB3 SAC MlpPolicy (sac/policies.py Actor + ContinuousCritic):
  actor.latent_pi.{0,2,...}.{weight,bias}        -> sac.TanhGaussianActor
  actor.mu / actor.log_std                          dense_i / mean / log_std
  critic.qf{0,1}.{0,2,4}.{weight,bias}           -> sac.TwinQ q{1,2}_*
  critic_target.qf{0,1}...                       -> target TwinQ
  (log entropy coefficient lives in pytorch_variables.pth: log_ent_coef)

SB3 TD3 MlpPolicy (td3/policies.py Actor = Sequential(..., Tanh)):
  actor.mu.{0,2,4}.{weight,bias}                 -> td3.DeterministicActor
  actor_target.mu...                                dense_{0,1} / out
  critic{,_target}.qf{0,1}...                    -> td3 TwinQ twins

Torch Linear stores (out, in); flax Dense expects (in, out) — transposed.
"""
from __future__ import annotations

import io
import zipfile
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np


def _load_policy_state_dict(path: str, member: str = "policy.pth"
                            ) -> Dict[str, Any]:
    import torch
    if path.endswith(".zip"):
        with zipfile.ZipFile(path) as zf:
            if member not in zf.namelist():
                return {}
            with zf.open(member) as f:
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


def _wb(sd):
    def w(key):
        return jnp.asarray(np.asarray(sd[key]).T)

    def b(key):
        return jnp.asarray(np.asarray(sd[key]))
    return w, b


def _seq_layers(sd, prefix):
    """torch Sequential Linear layers (stride-2 keys skip activations) ->
    flax dict named dense_0, dense_1, ..."""
    w, b = _wb(sd)
    out, i = {}, 0
    while f"{prefix}.{2 * i}.weight" in sd:
        out[f"dense_{i}"] = {"kernel": w(f"{prefix}.{2 * i}.weight"),
                             "bias": b(f"{prefix}.{2 * i}.bias")}
        i += 1
    return out


def _twinq(sd, prefix):
    """SB3 ContinuousCritic (critic.qf0/qf1 Sequentials) -> our TwinQ."""
    w, b = _wb(sd)
    params = {}
    for qf, ours in (("qf0", "q1"), ("qf1", "q2")):
        i = 0
        while f"{prefix}.{qf}.{2 * i}.weight" in sd:
            last = f"{prefix}.{qf}.{2 * (i + 1)}.weight" not in sd
            name = f"{ours}_out" if last else f"{ours}_dense_{i}"
            params[name] = {"kernel": w(f"{prefix}.{qf}.{2 * i}.weight"),
                            "bias": b(f"{prefix}.{qf}.{2 * i}.bias")}
            i += 1
    return {"params": params}


def _hidden_of(tree, tower_key_prefix="dense_"):
    ks = sorted((k for k in tree if k.startswith(tower_key_prefix)),
                key=lambda k: int(k[len(tower_key_prefix):]))
    return tuple(int(tree[k]["bias"].shape[0]) for k in ks)


def load_sb3_sac_params(path: str) -> Dict[str, Any]:
    """SB3 SAC checkpoint (.zip) -> dict with flax params for
    :class:`rl.sac.TanhGaussianActor` / :class:`rl.sac.TwinQ`.

    Returns ``{"actor", "q", "q_target", "log_alpha", "hidden"}`` —
    ``hidden`` is the inferred tower width tuple (SB3 SAC default (256, 256))
    for constructing matching modules; ``log_alpha`` is the trained entropy
    coefficient if the zip carries one (auto ent_coef), else None.
    """
    sd = _load_policy_state_dict(path)
    w, b = _wb(sd)
    actor = _seq_layers(sd, "actor.latent_pi")
    actor["mean"] = {"kernel": w("actor.mu.weight"),
                     "bias": b("actor.mu.bias")}
    actor["log_std"] = {"kernel": w("actor.log_std.weight"),
                        "bias": b("actor.log_std.bias")}
    out = {
        "actor": {"params": actor},
        "q": _twinq(sd, "critic"),
        "q_target": _twinq(sd, "critic_target"),
        "hidden": _hidden_of(actor),
        "log_alpha": None,
    }
    pv = _load_policy_state_dict(path, "pytorch_variables.pth")
    if "log_ent_coef" in pv:
        out["log_alpha"] = jnp.asarray(
            np.asarray(pv["log_ent_coef"])).reshape(())
    return out


def load_sb3_td3_params(path: str) -> Dict[str, Any]:
    """SB3 TD3 checkpoint (.zip) -> dict with flax params for
    :class:`rl.td3.DeterministicActor` / :class:`rl.td3.TwinQ` twins.

    Returns ``{"actor", "actor_target", "q", "q_target", "hidden"}``
    (SB3 TD3 default hidden is (400, 300)).
    """
    sd = _load_policy_state_dict(path)

    def actor(prefix):
        layers = _seq_layers(sd, prefix)
        # the last Sequential Linear is the tanh head, named "out" in ours
        layers["out"] = layers.pop(f"dense_{len(layers) - 1}")
        return {"params": layers}

    a = actor("actor.mu")
    return {
        "actor": a,
        "actor_target": actor("actor_target.mu"),
        "q": _twinq(sd, "critic"),
        "q_target": _twinq(sd, "critic_target"),
        "hidden": _hidden_of(a["params"]),
    }
