"""Checkpoint/resume via Orbax — full train-state persistence.

The reference saves SB3 zips (policy + optimizer torch state_dicts) but has
no resume path (SURVEY.md §5: train.py never calls PPO.load).  Here the
*entire* train state round-trips: params, optimizer state, env states, RNG,
and step counter — resuming reproduces the exact training stream.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except ImportError:  # pragma: no cover
    _HAS_ORBAX = False


_SAVED_THIS_PROCESS = set()


def save_checkpoint(path: str, train_state, step: int) -> str:
    """Save train state at `path/step`. Returns the checkpoint dir."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    if _HAS_ORBAX:
        ckpt = ocp.StandardCheckpointer()
        target = os.path.join(path, f"step_{step:010d}")
        if target in _SAVED_THIS_PROCESS:
            # Idempotent per step WITHIN a run: the end-of-training save can
            # land on the same global_step as the last periodic save (orbax
            # refuses to overwrite an existing destination).
            return target
        if os.path.isdir(target):
            # Leftover from a PREVIOUS run in the same log dir — silently
            # keeping its stale weights would corrupt a later resume.
            import shutil
            shutil.rmtree(target)
        ckpt.save(target, jax.device_get(train_state))
        ckpt.wait_until_finished()
        _SAVED_THIS_PROCESS.add(target)
        return target
    # Fallback: flat npz of leaves
    leaves, treedef = jax.tree.flatten(jax.device_get(train_state))
    target = os.path.join(path, f"step_{step:010d}.npz")
    np.savez(target, *leaves)
    return target


def latest_checkpoint(path: str) -> Optional[str]:
    if not os.path.isdir(path):
        return None
    entries = sorted(e for e in os.listdir(path) if e.startswith("step_"))
    return os.path.join(path, entries[-1]) if entries else None


def checkpoint_step(path: str) -> Optional[int]:
    """Env-step count from a checkpoint dir name (``.../step_NNN``).

    The authoritative step counter for resume: the in-state
    ``global_step`` array is int32 on device (JAX x64 disabled) and
    wraps at 2^31 env-steps — a real 3B-step run hit this (round 5) —
    while the dirname carries the exact host-side count.
    """
    name = os.path.basename(os.path.normpath(path))
    if name.startswith("step_"):
        try:
            return int(name[5:])
        except ValueError:
            return None
    return None


def restore_checkpoint(target: str, template) -> Any:
    """Restore into the structure of `template` (an abstract train state).

    Forward-compatible: leaves present in `template` but absent from the
    checkpoint (fields added after the checkpoint was written, e.g.
    ``EnvState.prev_goal_distance``) keep their template values instead of
    failing the whole restore.
    """
    if _HAS_ORBAX and os.path.isdir(target):
        target = os.path.abspath(target)   # orbax requires absolute paths
        ckpt = ocp.StandardCheckpointer()
        template = jax.device_get(template)
        try:
            return ckpt.restore(target, template)
        except (ValueError, KeyError, TypeError) as e:
            # Structure mismatch (old checkpoint, new state fields): restore
            # the raw stored tree, overlay it onto the template's serialized
            # form, and rebuild the dataclass structure — checkpoint leaves
            # win, template-only leaves keep their values.  This is meant
            # for fields ADDED since the checkpoint was written; warn loudly
            # because it also fires on genuine config mismatches (e.g. a
            # different --num-envs), where the merged state will fail with
            # a shape error downstream instead of here.
            print(f"checkpoint: strict restore of {target} failed "
                  f"({type(e).__name__}: {str(e)[:200]}); retrying with a "
                  f"best-effort overlay (template values for missing "
                  f"leaves). If the run config does not match the "
                  f"checkpoint, expect shape errors downstream.")
            raw = ckpt.restore(target)
            ser = ocp.utils.serialize_tree(template, keep_empty_nodes=True)

            def overlay(t, r):
                if isinstance(t, dict) and isinstance(r, dict):
                    return {k: (overlay(t[k], r[k]) if k in r else t[k])
                            for k in t}
                return t if r is None else r

            merged = overlay(ser, raw)
            return ocp.utils.deserialize_tree(merged, template,
                                              keep_empty_nodes=True)
    data = np.load(target, allow_pickle=False)
    leaves = [data[k] for k in data.files]
    treedef = jax.tree.structure(template)
    return jax.tree.unflatten(treedef, leaves)
