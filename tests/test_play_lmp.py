import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacorl_tpu.core.checkpoint import CheckpointManager
from tacorl_tpu.modules.play_lmp import PlayLMPModule

TINY_CFG = {
    "_target_": "tacorl_tpu.modules.play_lmp.PlayLMPModule",
    "lr": 1e-3,
    "kl_beta": 1e-3,
    "latent_plan_dim": 8,
    "plan_proposal_obs_modalities": ["rgb_static"],
    "plan_proposal_goal_modalities": ["rgb_static"],
    "plan_recognition_modalities": ["rgb_static"],
    "action_decoder_modalities": ["rgb_static"],
    "perceptual_encoder": {
        "networks": {
            "rgb_static": {
                "_target_": "tacorl_tpu.networks.encoders.LMPVisionEncoder",
                "latent_dim": 16,
                "hidden_dim": 32,
            }
        }
    },
    "goal_encoder": {"hidden_size": 32},
    "plan_recognition": {
        "num_heads": 4,
        "num_layers": 1,
        "encoder_hidden_size": 32,
        "fc_hidden_size": 32,
        "max_position_embeddings": 8,
    },
    "plan_proposal": {
        "policy": {"num_layers": 2, "hidden_dim": 32}
    },
    "action_decoder": {
        "hidden_size": 32,
        "num_layers": 1,
        "n_mixtures": 4,
        "out_features": 7,
    },
    "transforms": {
        "rgb_static": {
            "kind": "rgb", "size": [64, 64], "pad": 4,
            "brightness": 0.1, "contrast": 0.1, "hue": 0.02,
        }
    },
    "log_random_plan_loss": True,
}


def make_batch(rng, b=4, t=8, hw=64):
    k1, k2 = jax.random.split(rng)
    return {
        "states": {
            "rgb_static": (jax.random.uniform(k1, (b, t, hw, hw, 3)) * 255).astype(
                jnp.uint8
            )
        },
        "actions": jnp.clip(jax.random.normal(k2, (b, t, 7)), -1, 1)
        .at[..., -1]
        .set(1.0),
        "idx": jnp.arange(b),
        "window_size": jnp.full((b,), t),
    }


@pytest.fixture(scope="module")
def module():
    return PlayLMPModule(dict(TINY_CFG))


def test_init_and_train_step(module, rng):
    batch = make_batch(rng)
    state = module.init_state(rng, batch)
    train_step = module.make_train_step()
    scalars = {"kl_beta": jnp.asarray(module.kl_beta)}
    state2, metrics = train_step(state, batch, rng, scalars)
    assert int(state2.step) == 1
    for key in (
        "total_loss", "kl_loss", "action_loss", "gripper_accuracy",
        "random_plan_action_loss", "grad_norm",
    ):
        assert key in metrics and np.isfinite(float(metrics[key])), key


def test_loss_decreases(module, rng):
    batch = make_batch(rng)
    state = module.init_state(rng, batch)
    train_step = module.make_train_step()
    scalars = {"kl_beta": jnp.asarray(0.0)}
    first = None
    for i in range(30):
        state, metrics = train_step(state, batch, jax.random.fold_in(rng, i), scalars)
        if first is None:
            first = float(metrics["action_loss"])
    assert float(metrics["action_loss"]) < first


def test_val_step_outputs(module, rng):
    batch = make_batch(rng)
    state = module.init_state(rng, batch)
    val_step = module.make_val_step()
    metrics, outputs = val_step(
        state, batch, rng, {"kl_beta": jnp.asarray(1e-3)}
    )
    assert outputs["sampled_plan_pp"].shape == (4, 8)
    assert np.all(np.abs(np.asarray(outputs["sampled_plan_pp"])) <= 1.0)
    assert "total_loss" in metrics


def test_checkpoint_roundtrip_and_resume(module, rng, tmp_path):
    batch = make_batch(rng)
    state = module.init_state(rng, batch)
    train_step = module.make_train_step()
    scalars = {"kl_beta": jnp.asarray(1e-3)}
    state, _ = train_step(state, batch, rng, scalars)
    state, _ = train_step(state, batch, rng, scalars)

    manager = CheckpointManager(tmp_path / "run", config=dict(TINY_CFG))
    manager.save(int(state.step), state)

    restored = module.restore_state(manager)
    assert int(restored.step) == 2
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments restored too: one more identical step matches
    s1, m1 = train_step(state, batch, jax.random.fold_in(rng, 5), scalars)
    s2, m2 = train_step(restored, batch, jax.random.fold_in(rng, 5), scalars)
    np.testing.assert_allclose(
        float(m1["total_loss"]), float(m2["total_loss"]), rtol=1e-6
    )


def test_checkpoint_retention(tmp_path, rng, module):
    batch = make_batch(rng)
    state = module.init_state(rng, batch)
    manager = CheckpointManager(
        tmp_path / "run", max_to_keep=2, monitor="acc", mode="max"
    )
    for step, acc in ((1, 0.1), (2, 0.9), (3, 0.5), (4, 0.2)):
        manager.save(step, state, metrics={"acc": acc})
    steps = manager.all_steps()
    assert 4 in steps  # latest always kept
    assert 2 in steps  # best by metric
    assert len(steps) == 2
    assert manager.best_step() == 2


def test_checkpoint_best_step_restore(module, rng, tmp_path):
    batch = make_batch(rng)
    state = module.init_state(rng, batch)
    manager = CheckpointManager(
        tmp_path / "run", max_to_keep=3, monitor="acc", mode="max"
    )
    for step, acc in ((1, 0.2), (2, 0.9), (3, 0.4)):
        object.__setattr__(state, "step", jnp.asarray(step))
        manager.save(step, state, metrics={"acc": acc})
    restored = module.restore_state(manager, step="best")
    assert int(restored.step) == 2
