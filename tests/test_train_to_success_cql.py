"""Flat goal-conditioned CQL trains to task success (VERDICT r4 #1).

The last reference family with no learning evidence: goal-conditioned CQL in
its native 7-dim action space (not over latent plans), trained through
``scripts/train.py experiment=cql_fake_state`` on scripted-expert play
transitions with geometric + increasing-horizon goal relabeling, the REAL
rollout callback supplying ``val_accuracy`` through the
FlatPolicyAgent/RLRollout path, and the linear goal-horizon curriculum LIVE
(VERDICT r4 #2). Afterwards the monitored-best checkpoint is evaluated
offline through the ``scripts/evaluate.py`` single-task protocol (the
cql_easy preset's shape).

State modalities because on this hermetic env pure BC/Q gradients leave a
conv GOAL head collapsed (probe archived in
results/r5_train_to_success/cql_visual_goal_collapse.json) — state vectors
are goal-discriminative by construction and isolate the CQL update, matching
the reference's own state-mode flat CQL
(modules/cql/cql_offline_lightning_d4rl.py).

Reference: config/experiment/cql_offline_goal_cond.yaml:1-30,
modules/cql/cql_offline_lightning.py:24-574, scripts/evaluate.py:114-181.

Marked ``slow`` + ``e2e``; the r5 flagship-dataset run is recorded in
BASELINE.md and archived in results/r5_train_to_success/.
"""

import json
from pathlib import Path

import pytest

pytestmark = [pytest.mark.slow, pytest.mark.e2e]

SUCCESS_BAR = 0.8
CQL_MAX_STEPS = 9000


@pytest.fixture(scope="module")
def play_data(tmp_path_factory):
    from tacorl_tpu.data.expert_play import generate_expert_play

    root = tmp_path_factory.mktemp("play_data")
    generate_expert_play(
        root,
        n_train_episodes=150,
        n_val_episodes=15,
        tasks_per_episode=4,
        idle_steps=(3, 7),
        seed=3,
        distinct_tasks=True,
    )
    return root


def _val_accuracies(run_dir: Path):
    accs = []
    with open(run_dir / "metrics.jsonl") as f:
        for line in f:
            d = json.loads(line)
            if "val_accuracy" in d:
                accs.append((d["step"], d["val_accuracy"]))
    return accs


def _horizons(run_dir: Path):
    hs = []
    with open(run_dir / "metrics.jsonl") as f:
        for line in f:
            d = json.loads(line)
            if "train/goal_horizon" in d:
                hs.append(d["train/goal_horizon"])
    return hs


@pytest.fixture(scope="module")
def cql_run(play_data, tmp_path_factory):
    from scripts.train import main

    run_dir = tmp_path_factory.mktemp("cql_run")
    main(
        [
            "experiment=cql_fake_state",
            f"data_dir={play_data}",
            f"run_dir={run_dir}",
            f"trainer.max_steps={CQL_MAX_STEPS}",
            # this dataset is ~1/3 the flagship's (326 steps/epoch vs 857);
            # stretch the BC warm-start to keep gradient-step parity with the
            # archived run's BC phase (~6.9k steps; BASELINE.md recipe) —
            # critic bellman + conservative losses train from step 0 either
            # way, and the last ~3 epochs run the full CQL actor update
            "module.bc_epochs=24",
        ]
    )
    return run_dir


def test_flat_cql_trains_to_task_success(cql_run):
    accs = _val_accuracies(cql_run)
    best_step, best = max(accs, key=lambda sa: sa[1])
    assert best >= SUCCESS_BAR, (
        f"best val_accuracy {best:.3f} @ step {best_step} < {SUCCESS_BAR} "
        f"(curve: {[round(a, 2) for _, a in accs]})"
    )
    ckpts = list((cql_run / "ckpts").iterdir())
    assert ckpts, "no checkpoints written"


def test_flat_cql_horizon_curriculum_ran(cql_run):
    """The goal-horizon curriculum was live during the run (VERDICT r4 #2):
    the logged horizon starts at initial_horizon and grows."""
    hs = _horizons(cql_run)
    assert hs, "goal_horizon never logged — curriculum not wired"
    assert hs[0] == 16.0, hs[:3]  # cql_fake_state initial_horizon
    assert hs[-1] > hs[0], hs


def test_flat_cql_offline_eval(cql_run, play_data, tmp_path_factory):
    """Monitored-best checkpoint through the offline single-task protocol
    (scripts/evaluate.py:114-181; cql_easy preset shape)."""
    from scripts.evaluate import main

    out = tmp_path_factory.mktemp("cql_eval") / "cql_easy_tasks.json"
    results = main(
        [
            f"module_path={cql_run}",
            "epoch=best",
            f"data_dir={play_data}/validation",
            "env=fake_calvin",
            "env.image_hw=64",
            "env.max_episode_steps=56",
            "env.task_set=hard",
            "env.modalities=[robot_obs,scene_obs]",
            "env.goal_modalities=[robot_obs,scene_obs]",
            "eval_type=short_horizon",
            "min_seq_len=1",
            "max_seq_len=64",
            "max_rollouts=8",
            f"filename={out}",
            "platform=cpu",
        ]
    )
    assert out.is_file()
    per_task = {t: r["accuracy"] for t, r in results.items()}
    overall = sum(
        r["accuracy"] * r["num_rollouts"] for r in results.values()
    ) / sum(r["num_rollouts"] for r in results.values())
    assert overall >= 0.5, (overall, per_task)
