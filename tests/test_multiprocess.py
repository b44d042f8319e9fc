"""Real multi-process jax.distributed test (VERDICT round-1 item 2).

Launches TWO actual JAX processes (CPU backend, 4 virtual devices each,
localhost coordinator) running the sharded PPO train step over the resulting
8-device global mesh, plus the SAME workload single-process with 8 local
devices, and asserts:

  (a) the multi-process run completes,
  (b) params are bit-identical across the two processes (replication holds
      through psum-reduced grads over the cross-process mesh), and
  (c) params are bit-identical to the single-process 8-device run —
      host-count-invariant seeding (SURVEY §7 hard part (d)): splitting the
      same 8 devices over 2 processes changes nothing.

The reference has no distributed execution at all; this covers SURVEY §2.3's
distributed-comms row end-to-end rather than by construction.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # interpret-mode kernels / long-horizon (full tier)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_train.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env():
    env = dict(os.environ)
    # the workers configure their own backend; scrub inherited jax config
    for k in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH"):
        env.pop(k, None)
    env["PYTHONPATH"] = REPO
    return env


def _run_worker(extra, out, env, timeout=600):
    cmd = [sys.executable, WORKER, "--out", out, "--steps", "2",
           "--num-envs", "16", "--unroll", "4", "--seed", "0"] + extra
    return subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def test_two_process_train_matches_single_process(tmp_path):
    env = _clean_env()
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    outs = [str(tmp_path / f"p{i}.json") for i in range(2)]
    procs = [
        _run_worker(["--coordinator", coord, "--num-processes", "2",
                     "--process-id", str(i), "--local-devices", "4"],
                    outs[i], env)
        for i in range(2)
    ]
    logs = [p.communicate(timeout=780)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.load(open(o)) for o in outs]
    # (a) ran distributed: 2 processes, 8 global / 4 local devices each
    for i, r in enumerate(results):
        assert r["distributed"] is True
        assert r["process_count"] == 2
        assert r["global_devices"] == 8
        assert r["local_devices"] == 4
        assert r["process_index"] == i
    # (b) bit-identical replicated params across processes
    assert results[0]["param_sha256"] == results[1]["param_sha256"]
    assert results[0]["mean_reward"] == results[1]["mean_reward"]

    # (c) identical to the single-process 8-device run
    single_out = str(tmp_path / "single.json")
    p = _run_worker(["--local-devices", "8"], single_out, env)
    log = p.communicate(timeout=780)[0]
    assert p.returncode == 0, f"single-process run failed:\n{log[-3000:]}"
    single = json.load(open(single_out))
    assert single["distributed"] is False
    assert single["global_devices"] == 8
    assert single["param_sha256"] == results[0]["param_sha256"], (
        "2-process params diverge from single-process 8-device params")
