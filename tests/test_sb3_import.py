"""SB3 checkpoint interop: reference-trained policies load bit-exactly."""
import os

import numpy as np
import pytest

CKPT = "/root/reference/rl_logs/ppo/ppo_model_30000_steps.zip"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not os.path.exists(CKPT),
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
