"""Goal-horizon curriculum inside REAL training runs (VERDICT r4 #2).

The linear and uncertainty-gated curricula drive `scripts/train.py` runs of
the flat-CQL experiment (cql_fake) on tiny expert-play data: horizon growth
is visible in the metrics log, and the uncertainty variant's persisted
horizon survives a mid-run kill + resume — the reference persists it inside
the Lightning checkpoint (increase_horizon_uncertainty.py:87-114).
"""

import json
from pathlib import Path

import pytest


def _series(run_dir, key):
    vals = []
    with open(Path(run_dir) / "metrics.jsonl") as f:
        for line in f:
            d = json.loads(line)
            if key in d:
                vals.append((d["step"], d[key]))
    return vals


@pytest.fixture(scope="module")
def tiny_play(tmp_path_factory):
    from tacorl_tpu.data.expert_play import generate_expert_play

    root = tmp_path_factory.mktemp("tiny_play")
    generate_expert_play(
        root, n_train_episodes=3, n_val_episodes=2, tasks_per_episode=2,
        seed=7,
    )
    return root


TINY_NETS = [
    "module.actor_encoder.networks.rgb_static.latent_dim=8",
    "module.actor_encoder.networks.rgb_static.hidden_dim=16",
    "module.critic_encoder.networks.rgb_static.latent_dim=8",
    "module.critic_encoder.networks.rgb_static.hidden_dim=16",
    "module.policy.hidden_dim=16",
    "module.policy.num_layers=2",
    "module.q_network.hidden_dim=16",
    "module.q_network.num_layers=2",
    "module.goal_encoder.hidden_size=16",
    "module.bc_epochs=1",
    "datamodule.batch_size=8",
    "trainer.log_every_n_steps=5",
    "callbacks.rollout.num_rollouts_per_task=1",
]


def test_linear_horizon_grows_in_real_training(tiny_play, tmp_path):
    """The default cql_fake curriculum (IncreaseHorizonLinear from
    /callbacks/offline_rl) grows the sampling horizon every epoch of a real
    CLI run (reference increase_horizon.py:5-28)."""
    from scripts.train import main

    run_dir = tmp_path / "run"
    main(
        [
            "experiment=cql_fake",
            f"data_dir={tiny_play}",
            f"run_dir={run_dir}",
            "trainer.max_steps=40",
            "datamodule.dataset.initial_horizon=4",
            "datamodule.dataset.horizon_step=4",
            *TINY_NETS,
        ]
    )
    horizons = [h for _, h in _series(run_dir, "train/goal_horizon")]
    assert horizons[0] == 4.0, horizons
    assert horizons[-1] > horizons[0], horizons
    # linear: +horizon_step per epoch (increase_horizon.py:5-24 semantics)
    assert horizons[1] - horizons[0] == 4.0, horizons


def test_uncertainty_horizon_persists_across_resume(tiny_play, tmp_path):
    """Uncertainty-gated curriculum in a real run: MC-dropout Q-std gates
    growth (threshold set huge so every epoch passes), and a mid-run stop +
    resume CONTINUES from the persisted horizon instead of resetting to
    initial_horizon (reference increase_horizon_uncertainty.py:87-114)."""
    from scripts.train import main

    run_dir = tmp_path / "run"
    overrides = [
        "experiment=cql_fake",
        f"data_dir={tiny_play}",
        f"run_dir={run_dir}",
        "callbacks/increase_horizon=uncertainty",
        "callbacks.increase_horizon.std_threshold=1e9",
        "callbacks.increase_horizon.forward_passes=2",
        "module.q_network.with_dropout=true",
        "module.q_network.dropout_p=0.5",
        "datamodule.dataset.initial_horizon=4",
        "datamodule.dataset.horizon_step=4",
        *TINY_NETS,
    ]
    main(overrides + ["trainer.max_steps=20"])
    first = [h for _, h in _series(run_dir, "train/goal_horizon")]
    assert first and first[-1] > 4.0, first
    # the persisted callback state carries the grown horizon
    state_files = list(run_dir.glob("**/callback*state*")) + list(
        run_dir.glob("**/*.json")
    )
    assert any("current_horizon" in p.read_text() for p in state_files
               if p.is_file()), state_files

    # resume: the very first logged horizon must be the persisted one
    main(overrides + ["trainer.max_steps=40"])
    resumed = [h for _, h in _series(run_dir, "train/goal_horizon")]
    after = resumed[len(first):]
    assert after, resumed
    assert after[0] >= first[-1], (first, after)
    assert after[-1] > after[0], after
