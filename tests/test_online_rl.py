import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacorl_tpu.data.online_datamodule import OnlineRLDataModule
from tacorl_tpu.data.replay_buffer import ReplayBuffer
from tacorl_tpu.envs.fake_calvin import FakeCalvinEnv
from tacorl_tpu.modules.cql_online import CQLOnlineModule
from tacorl_tpu.modules.sac import SACModule

ENC = {
    "networks": {
        "rgb_static": {
            "_target_": "tacorl_tpu.networks.encoders.LMPVisionEncoder",
            "latent_dim": 8,
            "hidden_dim": 16,
        }
    }
}

SAC_CFG = {
    "action_dim": 7,
    "actor_lr": 1e-3,
    "critic_lr": 1e-3,
    "obs_modalities": ["rgb_static"],
    "goal_modalities": ["rgb_static"],
    "actor_encoder": ENC,
    "critic_encoder": ENC,
    "goal_encoder": {"hidden_size": 16},
    "policy": {"num_layers": 2, "hidden_dim": 16},
    "q_network": {"num_layers": 2, "hidden_dim": 16},
    "warm_start_steps": 24,
    "replay_buffer_size": 1000,
    "transforms": {"rgb_static": {"kind": "rgb", "size": [48, 48], "pad": 2}},
}


def make_env():
    return FakeCalvinEnv(image_hw=48, max_episode_steps=20)


def test_replay_buffer_roundtrip(tmp_path):
    buf = ReplayBuffer(100)
    for i in range(10):
        obs = {"observation": {"rgb_static": np.full((4, 4, 3), i, np.uint8)},
               "goal": {"rgb_static": np.zeros((4, 4, 3), np.uint8)}}
        buf.add_transition(obs, np.ones(7) * i, obs, float(i), i % 2 == 0)
    batch = buf.sample(4, np.random.default_rng(0))
    assert batch["actions"].shape == (4, 7)
    assert batch["observations"]["observation"]["rgb_static"].shape == (4, 4, 4, 3)
    buf.save(tmp_path / "rb")
    buf2 = ReplayBuffer(100)
    assert buf2.load(tmp_path / "rb")
    assert len(buf2) == 10
    t0 = buf2.buffer[3]
    assert float(t0.reward) == 3.0
    assert t0.state["observation"]["rgb_static"][0, 0, 0] == 3


@pytest.fixture(scope="module")
def sac_module():
    module = SACModule(dict(SAC_CFG))
    module.attach_env(make_env())
    return module


def test_sac_populate_and_train(sac_module, rng):
    sac_module.populate(None)
    assert len(sac_module.replay_buffer) == 24
    batch = sac_module.replay_buffer.sample(4)
    state = sac_module.init_state(rng, batch)
    train_step = sac_module.make_train_step()
    buffer_before = len(sac_module.replay_buffer)
    state, metrics = train_step(state, batch, rng, {"bc_phase": jnp.asarray(0.0)})
    # env interaction happened inside the step
    assert len(sac_module.replay_buffer) == buffer_before + 1
    for key in ("actor_loss", "alpha", "bellman_q1_loss", "q1_loss"):
        assert np.isfinite(float(metrics[key])), key
    # no conservative penalty in SAC
    assert "conservative_q1_loss" not in metrics


def test_cql_online_has_conservative(rng):
    cfg = dict(SAC_CFG)
    cfg["n_action_samples"] = 3
    module = CQLOnlineModule(cfg)
    module.attach_env(make_env())
    module.populate(None, steps=8)
    batch = module.replay_buffer.sample(4)
    state = module.init_state(rng, batch)
    train_step = module.make_train_step()
    state, metrics = train_step(state, batch, rng, {"bc_phase": jnp.asarray(0.0)})
    assert "conservative_q1_loss" in metrics
    assert np.isfinite(float(metrics["conservative_q1_loss"]))


def test_online_datamodule(sac_module):
    dm = OnlineRLDataModule(batch_size=4, steps_per_epoch=3)
    dm.set_module(sac_module)
    sac_module.populate(None)
    dm.setup()
    loader = dm.train_loader()
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["actions"].shape == (4, 7)


def test_threaded_vec_env_and_parallel_populate(rng):
    from tacorl_tpu.envs.vec_env import ThreadedVecEnv

    vec = ThreadedVecEnv([lambda: make_env() for _ in range(3)])
    obs = vec.reset()
    assert len(obs) == 3
    actions = [np.zeros(7, np.float32) for _ in range(3)]
    next_obs, rewards, dones, infos = vec.step(actions)
    assert len(next_obs) == 3 and rewards.shape == (3,)
    vec.close()

    cfg = dict(SAC_CFG)
    cfg["num_parallel_envs"] = 3
    cfg["warm_start_steps"] = 12
    cfg["env"] = {
        "_target_": "tacorl_tpu.envs.fake_calvin.FakeCalvinEnv",
        "image_hw": 32,
        "max_episode_steps": 5,
    }
    module = SACModule(cfg)
    module.populate(None)
    assert len(module.replay_buffer) >= 12


def test_sac_refuses_scanned_step(sac_module):
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="cannot be scanned"):
        sac_module.make_scanned_train_step()
