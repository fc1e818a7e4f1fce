import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacorl_tpu.modules.cql import CQLModule

ENC = {
    "networks": {
        "rgb_static": {
            "_target_": "tacorl_tpu.networks.encoders.LMPVisionEncoder",
            "latent_dim": 8,
            "hidden_dim": 16,
        }
    }
}

CFG = {
    "action_dim": 7,
    "actor_lr": 1e-3,
    "critic_lr": 1e-3,
    "obs_modalities": ["rgb_static"],
    "goal_modalities": ["rgb_static"],
    "actor_encoder": ENC,
    "critic_encoder": ENC,
    "goal_encoder": {"hidden_size": 16},
    "policy": {"num_layers": 2, "hidden_dim": 16, "discrete_gripper": True},
    "q_network": {"num_layers": 2, "hidden_dim": 16},
    "n_action_samples": 3,
    "with_lagrange": True,
    "reward_scale": 10.0,
    "bc_epochs": 1,
    "transforms": {
        "rgb_static": {"kind": "rgb", "size": [48, 48], "pad": 2}
    },
}


def make_batch(rng, bs=4, hw=48):
    ks = jax.random.split(rng, 4)
    img = lambda k: (jax.random.uniform(k, (bs, hw, hw, 3)) * 255).astype(jnp.uint8)
    obs = {"observation": {"rgb_static": img(ks[0])}, "goal": {"rgb_static": img(ks[1])}}
    next_obs = {"observation": {"rgb_static": img(ks[2])}, "goal": obs["goal"]}
    actions = jnp.clip(jax.random.normal(ks[3], (bs, 7)), -1, 1).at[:, -1].set(1.0)
    return {
        "observations": obs,
        "actions": actions,
        "next_observations": next_obs,
        "rewards": jnp.zeros((bs,)).at[0].set(1.0),
        "terminals": jnp.zeros((bs,)).at[0].set(1.0),
    }


@pytest.fixture(scope="module")
def module():
    return CQLModule(dict(CFG))


@pytest.fixture(scope="module")
def batch():
    return make_batch(jax.random.key(1))


def test_init_structure(module, batch, rng):
    state = module.init_state(rng, batch)
    assert set(state.params) == {"actor", "q1", "q2", "log_alpha", "log_alpha_prime"}
    assert set(state.aux) == {"target_q1", "target_q2"}
    # targets start identical to critics
    for a, b in zip(
        jax.tree.leaves(state.params["q1"]), jax.tree.leaves(state.aux["target_q1"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_metrics_and_updates(module, batch, rng):
    state = module.init_state(rng, batch)
    q1_before = jax.tree.map(np.asarray, state.params["q1"])
    target_before = jax.tree.map(np.asarray, state.aux["target_q1"])
    train_step = module.make_train_step()
    scalars = {"bc_phase": jnp.asarray(0.0)}
    state, metrics = train_step(state, batch, rng, scalars)
    for key in (
        "actor_loss", "alpha", "alpha_loss", "alpha_prime", "alpha_prime_loss",
        "bellman_q1_loss", "conservative_q1_loss", "q1_loss", "q1_data",
        "q1_random", "q1_policy", "bellman_q2_loss", "q2_loss",
    ):
        assert key in metrics, key
        assert np.isfinite(float(metrics[key])), key
    # params moved
    moved = any(
        not np.array_equal(np.asarray(a), b)
        for a, b in zip(jax.tree.leaves(state.params["q1"]), jax.tree.leaves(q1_before))
    )
    assert moved
    # Polyak: target moved slightly toward new online params
    t_after = jax.tree.leaves(state.aux["target_q1"])
    t_before = jax.tree.leaves(target_before)
    diffs = [
        float(np.max(np.abs(np.asarray(a) - b))) for a, b in zip(t_after, t_before)
    ]
    assert 0 < max(diffs) < 0.01  # tau=0.005 keeps the step small


def test_conservative_penalty_pushes_random_q_down(module, batch, rng):
    state = module.init_state(rng, batch)
    train_step = module.make_train_step()
    scalars = {"bc_phase": jnp.asarray(0.0)}
    first = None
    for i in range(25):
        state, metrics = train_step(state, batch, jax.random.fold_in(rng, i), scalars)
        gap = float(metrics["q1_data"]) - float(metrics["q1_random"])
        if first is None:
            first = gap
    assert gap > first  # data Q rises relative to random-action Q


def test_bc_phase_uses_log_prob(module, batch, rng):
    state = module.init_state(rng, batch)
    train_step = module.make_train_step()
    state, m_bc = train_step(state, batch, rng, {"bc_phase": jnp.asarray(1.0)})
    assert np.isfinite(float(m_bc["actor_loss"]))


def test_val_step_no_mutation(module, batch, rng):
    state = module.init_state(rng, batch)
    val_step = module.make_val_step()
    metrics, _ = val_step(state, batch, rng, {"bc_phase": jnp.asarray(0.0)})
    assert np.isfinite(float(metrics["q1_loss"]))
    assert int(state.step) == 0


def test_policy_fn(module, batch, rng):
    state = module.init_state(rng, batch)
    policy = module.make_policy_fn(deterministic=True)
    a = policy(state.params, batch["observations"], rng)
    assert a.shape == (4, 7)
    assert np.all(np.abs(np.asarray(a)) <= 1.0)


def test_no_lagrange_variant(batch, rng):
    cfg = dict(CFG)
    cfg["with_lagrange"] = False
    cfg["with_dr3"] = True
    cfg["deterministic_backup"] = True
    module = CQLModule(cfg)
    state = module.init_state(rng, batch)
    assert "log_alpha_prime" not in state.params
    train_step = module.make_train_step()
    state, metrics = train_step(state, batch, rng, {"bc_phase": jnp.asarray(0.0)})
    assert "alpha_prime" not in metrics
    assert np.isfinite(float(metrics["q1_dr3_loss"]))
