import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacorl_tpu.data.ril_dataset import RILDataset
from tacorl_tpu.data.synthetic import generate_synthetic_calvin
from tacorl_tpu.modules.ril import RILModule

CFG = {
    "lr": 1e-3,
    "action_dim": 7,
    "high_level_policy_modalities": ["rgb_static"],
    "low_level_policy_modalities": ["rgb_static"],
    "perceptual_encoder": {
        "networks": {
            "rgb_static": {
                "_target_": "tacorl_tpu.networks.encoders.LMPVisionEncoder",
                "latent_dim": 8,
                "hidden_dim": 16,
            }
        }
    },
    "goal_encoder": {"out_features": 8, "hidden_size": 16},
    "high_level_policy": {"num_layers": 2, "hidden_dim": 16},
    "low_level_policy": {"num_layers": 2, "hidden_dim": 16},
    "transforms": {"rgb_static": {"kind": "rgb", "size": [48, 48], "pad": 2}},
}


def make_batch(rng, b=4, hw=48):
    ks = jax.random.split(rng, 4)
    img = lambda k: (jax.random.uniform(k, (b, hw, hw, 3)) * 255).astype(jnp.uint8)
    return {
        "obs": {"rgb_static": img(ks[0])},
        "low_level_goal": {"rgb_static": img(ks[1])},
        "low_level_action": jnp.clip(jax.random.normal(ks[2], (b, 7)), -1, 1),
        "high_level_goal": {"rgb_static": img(ks[3])},
        "high_level_action": {"rgb_static": img(ks[0])},
    }


def test_ril_dataset(tmp_path):
    generate_synthetic_calvin(
        tmp_path, n_train_episodes=1, n_val_episodes=1, episode_len=40, image_hw=48
    )
    ds = RILDataset(
        tmp_path / "training",
        modalities=["rgb_static", "rel_actions_world"],
        max_low_level_window=5,
        max_high_level_window=20,
    )
    assert len(ds) == 39
    item = ds.sample(0, np.random.default_rng(0))
    for k in ("obs", "low_level_goal", "high_level_goal", "high_level_action"):
        assert item[k]["rgb_static"].shape == (48, 48, 3)
        assert "rel_actions_world" not in item[k]
    assert item["low_level_action"].shape == (7,)


def test_ril_train_and_policies(rng):
    module = RILModule(dict(CFG))
    batch = make_batch(rng)
    state = module.init_state(rng, batch)
    train_step = module.make_train_step()
    first = None
    for i in range(12):
        state, metrics = train_step(state, batch, jax.random.fold_in(rng, i), {})
        if first is None:
            first = float(metrics["total_loss"])
    assert float(metrics["total_loss"]) < first
    assert np.isfinite(float(metrics["low_level_loss"]))
    assert np.isfinite(float(metrics["high_level_loss"]))

    high, low = module.make_policy_fns()
    obs = {"rgb_static": batch["obs"]["rgb_static"][:1]}
    goal = {"rgb_static": batch["high_level_goal"]["rgb_static"][:1]}
    subgoal = high(state.params, obs, goal, rng)
    assert subgoal.shape == (1, 8)
    action = low(state.params, obs, subgoal, rng)
    assert action.shape == (1, 7)
    assert np.all(np.abs(np.asarray(action)) <= 1.0)

    val_step = module.make_val_step()
    metrics, _ = val_step(state, batch, rng, {})
    assert "total_loss" in metrics
