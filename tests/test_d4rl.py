import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacorl_tpu.core.checkpoint import CheckpointManager
from tacorl_tpu.data.d4rl_dataset import (
    D4RLPlayDataset,
    D4RLTransitionDataset,
    episode_bounds_from_markers,
    generate_synthetic_d4rl,
)
from tacorl_tpu.data.loader import DataLoader
from tacorl_tpu.envs.fake_d4rl import FakeD4RLEnv
from tacorl_tpu.evaluation.agents import LatentPlanD4RLAgent, TACORLD4RLAgent
from tacorl_tpu.evaluation.rollout_manager_d4rl import (
    LatentPlanRolloutD4RL,
    RLRolloutD4RL,
    TACORLRolloutD4RL,
)
from tacorl_tpu.modules.cql import CQLModule
from tacorl_tpu.modules.play_lmp_d4rl import PlayLMPD4RLModule
from tacorl_tpu.modules.tacorl_d4rl import TACORLD4RLModule

OBS_DIM, ACT_DIM = 8, 4

LMP_CFG = {
    "_target_": "tacorl_tpu.modules.play_lmp_d4rl.PlayLMPD4RLModule",
    "lr": 1e-3,
    "latent_plan_dim": 8,
    "state_dim": OBS_DIM,
    "action_dim": ACT_DIM,
    "plan_recognition": {
        "num_heads": 4, "num_layers": 1, "encoder_hidden_size": 32,
        "fc_hidden_size": 32, "max_position_embeddings": 12,
    },
    "plan_proposal": {"policy": {"num_layers": 2, "hidden_dim": 32}},
    "action_decoder": {"hidden_size": 32, "num_layers": 1, "n_mixtures": 4},
}


@pytest.fixture(scope="module")
def d4rl_npz(tmp_path_factory):
    path = tmp_path_factory.mktemp("d4rl") / "antmaze.npz"
    generate_synthetic_d4rl(path, n_steps=400, episode_len=100, obs_dim=OBS_DIM,
                            act_dim=ACT_DIM)
    return path


def test_episode_bounds():
    timeouts = np.zeros(30, bool)
    timeouts[[9, 19, 29]] = True
    bounds = episode_bounds_from_markers(timeouts, np.zeros(30, bool), 5)
    assert bounds == [[0, 9], [10, 19], [20, 29]]


def test_d4rl_play_dataset(d4rl_npz):
    ds = D4RLPlayDataset(
        dataset_path=d4rl_npz, min_window_size=8, max_window_size=12,
        include_goal=True,
    )
    assert len(ds) > 0
    item = ds.sample(0, np.random.default_rng(0))
    assert item["observations"].shape == (12, OBS_DIM)
    assert item["actions"].shape == (12, ACT_DIM)
    assert item["goal"].shape == (2,)
    ws = int(item["window_size"])
    if ws < 12:
        np.testing.assert_array_equal(item["actions"][ws:], 0.0)
        np.testing.assert_array_equal(
            item["observations"][ws:], item["observations"][ws - 1 : ws]
        )


def test_d4rl_transition_dataset(d4rl_npz):
    ds = D4RLTransitionDataset(dataset_path=d4rl_npz)
    item = ds.sample(0, np.random.default_rng(0))
    assert item["observations"].shape == (OBS_DIM + 2,)
    assert item["next_observations"].shape == (OBS_DIM + 2,)
    assert item["rewards"] in (0.0, 1.0)


@pytest.fixture(scope="module")
def lmp_d4rl_ckpt(tmp_path_factory, d4rl_npz):
    module = PlayLMPD4RLModule(dict(LMP_CFG))
    ds = D4RLPlayDataset(dataset_path=d4rl_npz, min_window_size=8,
                         max_window_size=12, include_goal=True)
    loader = DataLoader(ds, batch_size=4, seed=0)
    batch = next(iter(loader))
    rng = jax.random.key(0)
    state = module.init_state(rng, batch)
    step = module.make_train_step()
    state, metrics = step(state, batch, rng, {"kl_beta": jnp.asarray(1e-3)})
    assert np.isfinite(float(metrics["total_loss"]))
    run_dir = tmp_path_factory.mktemp("lmp_d4rl_run")
    manager = CheckpointManager(run_dir, config={"module": dict(LMP_CFG)})
    manager.save(int(state.step), state)
    return run_dir, batch


def test_lmp_d4rl_val_and_rollout(lmp_d4rl_ckpt, rng):
    run_dir, batch = lmp_d4rl_ckpt
    module = PlayLMPD4RLModule(dict(LMP_CFG))
    state = module.init_state(rng, batch)
    val = module.make_val_step()
    metrics, outputs = val(state, batch, rng, {"kl_beta": jnp.asarray(1e-3)})
    assert outputs["sampled_plan_pp"].shape[1] == 8

    env = FakeD4RLEnv(obs_dim=OBS_DIM, act_dim=ACT_DIM, max_episode_steps=10)
    agent = LatentPlanD4RLAgent(module, state)
    out = LatentPlanRolloutD4RL(plan_duration=4).episode_rollout(agent, env)
    assert "score" in out and out["episode_length"] == 10


def test_tacorl_d4rl_end_to_end(lmp_d4rl_ckpt, rng):
    run_dir, batch = lmp_d4rl_ckpt
    cfg = {
        "play_lmp_dir": str(run_dir),
        "finetune_action_decoder": True,
        "with_lagrange": True,
        "n_action_samples": 3,
        "q_network": {"num_layers": 2, "hidden_dim": 16},
        "target_entropy": -float(ACT_DIM),
    }
    module = TACORLD4RLModule(cfg)
    batch = dict(batch)
    state = module.init_state(rng, batch)
    frozen_before = jax.tree.map(np.asarray, state.params["plan_recognition"])
    step = module.make_train_step()
    state, metrics = step(state, batch, rng, {"bc_phase": jnp.asarray(0.0)})
    assert np.isfinite(float(metrics["q1_loss"]))
    assert np.isfinite(float(metrics["action_loss"]))
    for a, b in zip(
        jax.tree.leaves(state.params["plan_recognition"]),
        jax.tree.leaves(frozen_before),
    ):
        np.testing.assert_array_equal(np.asarray(a), b)

    env = FakeD4RLEnv(obs_dim=OBS_DIM, act_dim=ACT_DIM, max_episode_steps=8)
    agent = TACORLD4RLAgent(module, state)
    out = TACORLRolloutD4RL(plan_duration=4).episode_rollout(agent, env)
    assert 0.0 <= out["score"] <= 8.0


def test_state_based_cql(d4rl_npz, rng):
    ds = D4RLTransitionDataset(dataset_path=d4rl_npz)
    loader = DataLoader(ds, batch_size=8, seed=0)
    batch = next(iter(loader))
    module = CQLModule({
        "state_based": True,
        "state_dim": OBS_DIM,
        "goal_dim": 2,
        "action_dim": ACT_DIM,
        "n_action_samples": 3,
        "with_lagrange": True,
        "policy": {"num_layers": 2, "hidden_dim": 16},
        "q_network": {"num_layers": 2, "hidden_dim": 16},
    })
    state = module.init_state(rng, batch)
    step = module.make_train_step()
    state, metrics = step(state, batch, rng, {"bc_phase": jnp.asarray(0.0)})
    assert np.isfinite(float(metrics["conservative_q1_loss"]))

    # flat-policy rollout on the fake env
    from tacorl_tpu.evaluation.agents import FlatPolicyAgent

    env = FakeD4RLEnv(obs_dim=OBS_DIM, act_dim=ACT_DIM, max_episode_steps=8)
    agent = FlatPolicyAgent(module, state)
    out = RLRolloutD4RL().episode_rollout(agent, env)
    assert "score" in out
