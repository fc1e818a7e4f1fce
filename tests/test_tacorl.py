import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacorl_tpu.core.checkpoint import CheckpointManager
from tacorl_tpu.modules.play_lmp import PlayLMPModule
from tacorl_tpu.modules.tacorl import TACORLModule
from tests.test_play_lmp import TINY_CFG, make_batch


@pytest.fixture(scope="module")
def lmp_ckpt_dir(tmp_path_factory):
    """Train a tiny Play-LMP for one step and checkpoint it with its config."""
    rng = jax.random.key(0)
    module = PlayLMPModule(dict(TINY_CFG))
    batch = make_batch(rng)
    state = module.init_state(rng, batch)
    train_step = module.make_train_step()
    state, _ = train_step(state, batch, rng, {"kl_beta": jnp.asarray(1e-3)})
    run_dir = tmp_path_factory.mktemp("lmp_run")
    manager = CheckpointManager(run_dir, config={"module": dict(TINY_CFG)})
    manager.save(int(state.step), state)
    return run_dir


def tacorl_cfg(lmp_dir):
    return {
        "_target_": "tacorl_tpu.modules.tacorl.TACORLModule",
        "play_lmp_dir": str(lmp_dir),
        "finetune_action_decoder": True,
        "action_decoder_lr": 1e-3,
        "actor_lr": 1e-3,
        "critic_lr": 1e-3,
        "discount": 0.95,
        "with_lagrange": True,
        "reward_scale": 10.0,
        "n_action_samples": 3,
        "deterministic_backup": True,
        "target_entropy": -7.0,
        "q_network": {"num_layers": 2, "hidden_dim": 16},
        "transforms": dict(TINY_CFG["transforms"]),
    }


def make_goal_batch(rng, b=4, t=8, hw=64):
    batch = make_batch(rng, b, t, hw)
    batch["goal"] = {
        "rgb_static": (
            jax.random.uniform(jax.random.fold_in(rng, 7), (b, hw, hw, 3)) * 255
        ).astype(jnp.uint8)
    }
    batch["disp"] = jnp.asarray([1, 2, -1, 1])
    return batch


@pytest.fixture(scope="module")
def module(lmp_ckpt_dir):
    return TACORLModule(tacorl_cfg(lmp_ckpt_dir))


def test_grafting_and_freeze_structure(module, rng):
    batch = make_goal_batch(rng)
    state = module.init_state(rng, batch)
    # actor encoder grafted from LMP perceptual encoder
    lmp_pe = module._lmp_state.params["perceptual_encoder"]
    for a, b in zip(
        jax.tree.leaves(state.params["actor"]["encoder"]), jax.tree.leaves(lmp_pe)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # frozen groups have no optimizer entries
    assert "perceptual_encoder" not in module.optimizer.groups
    assert "plan_recognition" not in module.optimizer.groups
    assert "action_decoder" in module.optimizer.groups  # finetuned


def test_train_step_updates_rl_but_not_frozen(module, rng):
    batch = make_goal_batch(rng)
    state = module.init_state(rng, batch)
    frozen_before = jax.tree.map(np.asarray, state.params["perceptual_encoder"])
    decoder_before = jax.tree.map(np.asarray, state.params["action_decoder"])
    train_step = module.make_train_step()
    scalars = {"bc_phase": jnp.asarray(0.0)}
    state, metrics = train_step(state, batch, rng, scalars)
    # reward relabeling: disp==1 for 2 of 4
    np.testing.assert_allclose(float(metrics["rl_batch_success_rate"]), 0.5)
    assert np.isfinite(float(metrics["action_loss"]))
    assert np.isfinite(float(metrics["q1_loss"]))
    # frozen encoder unchanged
    for a, b in zip(
        jax.tree.leaves(state.params["perceptual_encoder"]),
        jax.tree.leaves(frozen_before),
    ):
        np.testing.assert_array_equal(np.asarray(a), b)
    # decoder finetuned (moved)
    moved = any(
        not np.array_equal(np.asarray(a), b)
        for a, b in zip(
            jax.tree.leaves(state.params["action_decoder"]),
            jax.tree.leaves(decoder_before),
        )
    )
    assert moved


def test_latent_plan_actions_bounded(module, rng):
    batch = make_goal_batch(rng)
    state = module.init_state(rng, batch)
    propose, decode = module.make_plan_and_decode_fns()
    obs = {
        "observation": {"rgb_static": batch["states"]["rgb_static"][:, 0]},
        "goal": batch["goal"],
    }
    plan = propose(state.params, obs, rng)
    assert plan.shape == (4, module.action_dim)
    assert np.all(np.abs(np.asarray(plan)) <= 1.0)
    action, carry = decode(
        state.params, rng, plan,
        {"rgb_static": batch["states"]["rgb_static"][:, 0]}, None,
    )
    assert action.shape == (4, 7)
    # streaming carry continues
    action2, carry = decode(
        state.params, rng, plan,
        {"rgb_static": batch["states"]["rgb_static"][:, 1]}, carry,
    )
    assert action2.shape == (4, 7)


def test_val_step(module, rng):
    batch = make_goal_batch(rng)
    state = module.init_state(rng, batch)
    val_step = module.make_val_step()
    metrics, _ = val_step(state, batch, rng, {"bc_phase": jnp.asarray(0.0)})
    assert np.isfinite(float(metrics["q1_loss"]))
