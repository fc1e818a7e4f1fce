"""Learning evidence for the baseline families (VERDICT r3 #5): Relay-IL
trained to rollout success on expert play data, and online SAC learning a
dense-reward task through the real ``play_step`` loop — both through
``scripts/train.py`` with the real rollout callback supplying the monitored
metrics (reference: relay_imitation_learning.py:101-181,
sac_lightning.py:391-444, utils/callbacks/rollout.py:391-416).

Marked ``slow`` + ``e2e``; the r4 reference runs are recorded in BASELINE.md.
"""

import json
from pathlib import Path

import pytest

pytestmark = [pytest.mark.slow, pytest.mark.e2e]


def _series(run_dir: Path, key: str):
    vals = []
    with open(Path(run_dir) / "metrics.jsonl") as f:
        for line in f:
            d = json.loads(line)
            if key in d:
                vals.append((d["step"], d[key]))
    assert vals, f"{key} never logged in {run_dir}"
    return vals


@pytest.fixture(scope="module")
def play_data(tmp_path_factory):
    # same recipe as test_train_to_success.play_data (one generator, one
    # on-disk layout — reference data semantics in data/expert_play.py)
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


def test_ril_trains_to_task_success(play_data, tmp_path_factory):
    """Two-level BC: high-level subgoal regression in goal-embedding space +
    low-level goal-conditioned actions, evaluated by the hierarchical RIL
    rollout agent (reference rollout_manager.py:434-557)."""
    from scripts.train import main

    run_dir = tmp_path_factory.mktemp("ril_run")
    main(
        [
            "experiment=ril_fake",
            f"data_dir={play_data}",
            f"run_dir={run_dir}",
            "trainer.max_steps=8000",
            "platform=cpu",
        ]
    )
    accs = _series(run_dir, "val_accuracy")
    step, best = max(accs, key=lambda sv: sv[1])
    assert best >= 0.5, (
        f"best RIL val_accuracy {best:.3f} @ {step} "
        f"(curve: {[round(a, 2) for _, a in accs]})"
    )


def test_online_sac_learns(tmp_path_factory):
    """Online SAC on the dense-reward fake play table: episode return rises
    from the random-policy floor to the success bar, and the val_accuracy
    rollouts complete the task (reference sac_lightning.py:391-444)."""
    from scripts.train import main

    run_dir = tmp_path_factory.mktemp("sac_run")
    main(
        [
            "experiment=sac_online_fake",
            f"run_dir={run_dir}",
            "trainer.max_steps=12000",
            "platform=cpu",
        ]
    )
    # bars from the archived r4 evidence run (BASELINE.md "Online SAC"):
    # val_episode_return climbs -35 -> -10.8 and val_accuracy 0 -> 0.7
    # by ~12k env steps under the tuned shaping
    returns = _series(run_dir, "val_episode_return")
    first = returns[0][1]
    step, best = max(returns, key=lambda sv: sv[1])
    assert best >= first + 10.0, (
        f"return never clearly improved: first {first:.1f}, best {best:.1f} "
        f"(returns: {[round(r, 1) for _, r in returns]})"
    )
    accs = _series(run_dir, "val_accuracy")
    _, best_acc = max(accs, key=lambda sv: sv[1])
    assert best_acc >= 0.5, (
        f"best SAC val_accuracy {best_acc:.3f} "
        f"(returns: {[round(r, 1) for _, r in returns]})"
    )
