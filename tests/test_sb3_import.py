"""SB3 checkpoint interop: reference-trained policies load bit-exactly."""
import os

import numpy as np
import pytest

CKPT = "/root/reference/rl_logs/ppo/ppo_model_30000_steps.zip"

torch = pytest.importorskip("torch")


@pytest.mark.skipif(not os.path.exists(CKPT),
                    reason="reference checkpoint not present")
def test_sb3_ppo_roundtrip_matches_torch():
    import jax.numpy as jnp
    import torch.nn.functional as F

    from mujoco_playground_tpu.rl.networks import ActorCritic
    from mujoco_playground_tpu.rl.sb3_import import (_load_policy_state_dict,
                                                     load_sb3_ppo_params)

    sd = _load_policy_state_dict(CKPT)
    params = load_sb3_ppo_params(CKPT)
    net = ActorCritic(action_size=2)

    rng = np.random.RandomState(0)
    for _ in range(3):
        obs = rng.randn(79).astype(np.float32)
        mean, log_std, value = net.apply(params, jnp.asarray(obs))
        x = torch.tensor(obs)[None]
        with torch.no_grad():
            h = torch.tanh(F.linear(x, sd['mlp_extractor.policy_net.0.weight'],
                                    sd['mlp_extractor.policy_net.0.bias']))
            h = torch.tanh(F.linear(h, sd['mlp_extractor.policy_net.2.weight'],
                                    sd['mlp_extractor.policy_net.2.bias']))
            act = F.linear(h, sd['action_net.weight'], sd['action_net.bias'])
            v = torch.tanh(F.linear(x, sd['mlp_extractor.value_net.0.weight'],
                                    sd['mlp_extractor.value_net.0.bias']))
            v = torch.tanh(F.linear(v, sd['mlp_extractor.value_net.2.weight'],
                                    sd['mlp_extractor.value_net.2.bias']))
            val = F.linear(v, sd['value_net.weight'], sd['value_net.bias'])
        np.testing.assert_allclose(np.asarray(mean), act.numpy()[0], atol=1e-5)
        np.testing.assert_allclose(float(value), val.numpy()[0, 0], atol=1e-4)
        np.testing.assert_allclose(np.asarray(log_std),
                                   sd['log_std'].numpy(), atol=1e-6)


def _zip_policy(tmp_path, policy_sd, pytorch_vars=None):
    """Write a minimal SB3-format checkpoint zip (policy.pth inside)."""
    import io
    import zipfile
    p = tmp_path / "model.zip"
    with zipfile.ZipFile(p, "w") as zf:
        buf = io.BytesIO()
        torch.save(policy_sd, buf)
        zf.writestr("policy.pth", buf.getvalue())
        if pytorch_vars is not None:
            buf = io.BytesIO()
            torch.save(pytorch_vars, buf)
            zf.writestr("pytorch_variables.pth", buf.getvalue())
    return str(p)


def _lin(out_f, in_f, g):
    # 1/sqrt(fan_in) scale keeps activations O(1) so f32 accumulation-order
    # differences between XLA and torch stay inside the tolerances
    return (torch.randn(out_f, in_f, generator=g) * in_f ** -0.5,
            torch.randn(out_f, generator=g) * 0.1)


def test_sb3_sac_roundtrip_matches_torch(tmp_path):
    """Synthesized SB3-SAC-layout zip loads onto TanhGaussianActor/TwinQ
    with bit-exact forward passes (no reference SAC checkpoint exists —
    the reference pipeline trains SAC through the same SB3 saver,
    src/rl/train.py:108-114)."""
    import jax.numpy as jnp
    import torch.nn.functional as F

    from mujoco_playground_tpu.rl.sac import TanhGaussianActor, TwinQ
    from mujoco_playground_tpu.rl.sb3_import import load_sb3_sac_params

    g = torch.Generator().manual_seed(0)
    obs_n, act_n, h = 79, 2, (32, 16)
    sd = {}
    dims = (obs_n,) + h
    for i in range(len(h)):
        sd[f"actor.latent_pi.{2*i}.weight"], \
            sd[f"actor.latent_pi.{2*i}.bias"] = _lin(dims[i+1], dims[i], g)
    sd["actor.mu.weight"], sd["actor.mu.bias"] = _lin(act_n, h[-1], g)
    sd["actor.log_std.weight"], sd["actor.log_std.bias"] = \
        _lin(act_n, h[-1], g)
    qdims = (obs_n + act_n,) + h + (1,)
    for crit in ("critic", "critic_target"):
        for qf in ("qf0", "qf1"):
            for i in range(len(qdims) - 1):
                sd[f"{crit}.{qf}.{2*i}.weight"], \
                    sd[f"{crit}.{qf}.{2*i}.bias"] = \
                    _lin(qdims[i+1], qdims[i], g)
    path = _zip_policy(tmp_path, sd,
                       {"log_ent_coef": torch.tensor([0.37])})

    loaded = load_sb3_sac_params(path)
    assert loaded["hidden"] == h
    assert abs(float(loaded["log_alpha"]) - 0.37) < 1e-7
    actor = TanhGaussianActor(action_size=act_n, hidden=h)
    qnet = TwinQ(hidden=h)

    rng = np.random.RandomState(1)
    for _ in range(3):
        obs = rng.randn(obs_n).astype(np.float32)
        act = np.tanh(rng.randn(act_n)).astype(np.float32)
        mean, log_std = actor.apply(loaded["actor"], jnp.asarray(obs))
        q1, q2 = qnet.apply(loaded["q"], jnp.asarray(obs), jnp.asarray(act))
        tq1, tq2 = qnet.apply(loaded["q_target"], jnp.asarray(obs),
                              jnp.asarray(act))
        x = torch.tensor(obs)[None]
        with torch.no_grad():
            hdn = x
            for i in range(len(h)):
                hdn = F.relu(F.linear(hdn, sd[f"actor.latent_pi.{2*i}.weight"],
                                      sd[f"actor.latent_pi.{2*i}.bias"]))
            t_mean = F.linear(hdn, sd["actor.mu.weight"], sd["actor.mu.bias"])
            t_ls = torch.clamp(F.linear(hdn, sd["actor.log_std.weight"],
                                        sd["actor.log_std.bias"]), -20.0, 2.0)

            def t_q(crit, qf):
                y = torch.cat([x, torch.tensor(act)[None]], dim=-1)
                for i in range(len(qdims) - 2):
                    y = F.relu(F.linear(y, sd[f"{crit}.{qf}.{2*i}.weight"],
                                        sd[f"{crit}.{qf}.{2*i}.bias"]))
                i = len(qdims) - 2
                return F.linear(y, sd[f"{crit}.{qf}.{2*i}.weight"],
                                sd[f"{crit}.{qf}.{2*i}.bias"])

            want = [t_q("critic", "qf0"), t_q("critic", "qf1"),
                    t_q("critic_target", "qf0"), t_q("critic_target", "qf1")]
        np.testing.assert_allclose(np.asarray(mean), t_mean.numpy()[0],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(log_std), t_ls.numpy()[0],
                                   atol=1e-5)
        for ours, theirs in zip((q1, q2, tq1, tq2), want):
            np.testing.assert_allclose(float(ours), theirs.numpy()[0, 0],
                                       atol=1e-4)


def test_sb3_td3_roundtrip_matches_torch(tmp_path):
    """Synthesized SB3-TD3-layout zip (actor.mu Sequential with tanh head,
    actor_target, critic twins) loads bit-exactly."""
    import jax.numpy as jnp
    import torch.nn.functional as F

    from mujoco_playground_tpu.rl.td3 import DeterministicActor, TwinQ
    from mujoco_playground_tpu.rl.sb3_import import load_sb3_td3_params

    g = torch.Generator().manual_seed(2)
    obs_n, act_n, h = 79, 2, (24, 12)
    sd = {}
    adims = (obs_n,) + h + (act_n,)
    for prefix in ("actor.mu", "actor_target.mu"):
        for i in range(len(adims) - 1):
            sd[f"{prefix}.{2*i}.weight"], sd[f"{prefix}.{2*i}.bias"] = \
                _lin(adims[i+1], adims[i], g)
    qdims = (obs_n + act_n,) + h + (1,)
    for crit in ("critic", "critic_target"):
        for qf in ("qf0", "qf1"):
            for i in range(len(qdims) - 1):
                sd[f"{crit}.{qf}.{2*i}.weight"], \
                    sd[f"{crit}.{qf}.{2*i}.bias"] = \
                    _lin(qdims[i+1], qdims[i], g)
    path = _zip_policy(tmp_path, sd)

    loaded = load_sb3_td3_params(path)
    assert loaded["hidden"] == h
    actor = DeterministicActor(action_size=act_n, hidden=h)
    qnet = TwinQ(hidden=h)

    rng = np.random.RandomState(3)
    for _ in range(3):
        obs = rng.randn(obs_n).astype(np.float32)
        act = np.tanh(rng.randn(act_n)).astype(np.float32)
        a = actor.apply(loaded["actor"], jnp.asarray(obs))
        at = actor.apply(loaded["actor_target"], jnp.asarray(obs))
        q1, _ = qnet.apply(loaded["q"], jnp.asarray(obs), jnp.asarray(act))
        tq1, _ = qnet.apply(loaded["q_target"], jnp.asarray(obs),
                            jnp.asarray(act))
        x = torch.tensor(obs)[None]
        with torch.no_grad():
            def t_actor(prefix):
                y = x
                for i in range(len(adims) - 2):
                    y = F.relu(F.linear(y, sd[f"{prefix}.{2*i}.weight"],
                                        sd[f"{prefix}.{2*i}.bias"]))
                i = len(adims) - 2
                return torch.tanh(F.linear(y, sd[f"{prefix}.{2*i}.weight"],
                                           sd[f"{prefix}.{2*i}.bias"]))

            def t_q(crit):
                y = torch.cat([x, torch.tensor(act)[None]], dim=-1)
                for i in range(len(qdims) - 2):
                    y = F.relu(F.linear(y, sd[f"{crit}.qf0.{2*i}.weight"],
                                        sd[f"{crit}.qf0.{2*i}.bias"]))
                i = len(qdims) - 2
                return F.linear(y, sd[f"{crit}.qf0.{2*i}.weight"],
                                sd[f"{crit}.qf0.{2*i}.bias"])

            t_a, t_at = t_actor("actor.mu"), t_actor("actor_target.mu")
            t_q1, t_tq1 = t_q("critic"), t_q("critic_target")
        np.testing.assert_allclose(np.asarray(a), t_a.numpy()[0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(at), t_at.numpy()[0],
                                   atol=1e-6)
        np.testing.assert_allclose(float(q1), t_q1.numpy()[0, 0], atol=1e-4)
        np.testing.assert_allclose(float(tq1), t_tq1.numpy()[0, 0],
                                   atol=1e-4)
