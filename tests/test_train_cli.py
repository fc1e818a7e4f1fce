"""CLI launchability: every module family must be reachable through
``python scripts/train.py experiment=<name>`` (VERDICT.md round-1 item 3 —
SAC/CQL-online existed but had no experiment configs)."""

import os
import sys
from pathlib import Path

import pytest

from tacorl_tpu.config import compose

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"

sys.path.insert(0, str(CONFIG_DIR.parent / "scripts"))


def test_every_module_family_has_an_experiment():
    targets = set()
    for p in (CONFIG_DIR / "experiment").glob("*.yaml"):
        cfg = compose(
            CONFIG_DIR, "train",
            overrides=[f"experiment={p.stem}", "data_dir=/tmp/x",
                       "play_lmp_dir=/tmp/lmp", "dataset_path=/tmp/d.npz"],
        )
        targets.add(cfg["module"]["_target_"].rsplit(".", 1)[-1])
    for family in (
        "PlayLMPModule", "PlayLMPD4RLModule", "CQLModule", "CQLOnlineModule",
        "SACModule", "TACORLModule", "TACORLD4RLModule", "RILModule",
    ):
        assert family in targets, f"no experiment config targets {family}"


TINY_SAC_OVERRIDES = [
    "platform=cpu",
    "experiment=sac_online",
    "trainer.max_steps=2",
    "trainer.log_every_n_steps=1",
    "datamodule.batch_size=8",  # divisible by the conftest 8-device mesh
    "datamodule.steps_per_epoch=2",
    "module.warm_start_steps=8",
    "module.replay_buffer_size=100",
    "module.actor_encoder.networks.rgb_static.latent_dim=8",
    "module.actor_encoder.networks.rgb_static.hidden_dim=16",
    "module.critic_encoder.networks.rgb_static.latent_dim=8",
    "module.critic_encoder.networks.rgb_static.hidden_dim=16",
    "module.goal_encoder.hidden_size=16",
    "module.policy.hidden_dim=16",
    "module.q_network.hidden_dim=16",
    "env.image_hw=32",
    "env.max_episode_steps=10",
    "transforms.rgb_static.size=[48,48]",
    "transforms.rgb_static.pad=2",
]


@pytest.mark.slow
def test_sac_online_trains_from_cli(tmp_path):
    """`train.py experiment=sac_online` must train on FakeCalvinEnv
    end-to-end: warm-start fill, jitted SAC updates with env interaction,
    metrics + checkpoint written."""
    import json

    import train  # scripts/train.py

    run_dir = tmp_path / "sac"
    train.main(TINY_SAC_OVERRIDES + [f"run_dir={run_dir}"])
    lines = [
        json.loads(line)
        for line in (run_dir / "metrics.jsonl").read_text().splitlines()
    ]
    train_rows = [r for r in lines if "train/actor_loss" in r]
    assert train_rows, "no SAC training metrics logged"
    assert "train/q1_loss" in train_rows[-1]
    assert (run_dir / "ckpts").is_dir()
    assert (run_dir / "config.yaml").is_file()


@pytest.mark.slow
def test_play_lmp_d4rl_trains_from_cli(tmp_path):
    """`train.py experiment=play_lmp_d4rl dataset_path=...` must train the
    state-based CVAE end-to-end from a synthetic D4RL npz (the hermetic
    stand-in for env.get_dataset())."""
    import json

    import train

    from tacorl_tpu.data.d4rl_dataset import generate_synthetic_d4rl

    npz = tmp_path / "antmaze.npz"
    generate_synthetic_d4rl(npz, n_steps=300, episode_len=100, obs_dim=6,
                            act_dim=3)
    run_dir = tmp_path / "lmp_d4rl"
    train.main([
        "platform=cpu",
        "experiment=play_lmp_d4rl",
        f"dataset_path={npz}",
        f"run_dir={run_dir}",
        "trainer.max_steps=2",
        "trainer.log_every_n_steps=1",
        "datamodule.batch_size=8",
        "datamodule.dataset.min_window_size=4",
        "datamodule.dataset.max_window_size=8",
        "latent_plan_dim=8",
        "module.state_dim=6",
        "module.action_dim=3",
        "module.plan_recognition.num_heads=2",
        "module.plan_recognition.num_layers=1",
        "module.plan_recognition.encoder_hidden_size=16",
        "module.plan_recognition.fc_hidden_size=16",
        "module.plan_recognition.max_position_embeddings=8",
        "module.plan_proposal.policy.hidden_dim=16",
        "module.action_decoder.hidden_size=16",
        "module.action_decoder.num_layers=1",
        "module.action_decoder.n_mixtures=3",
    ])
    lines = [
        json.loads(line)
        for line in (run_dir / "metrics.jsonl").read_text().splitlines()
    ]
    assert any("train/total_loss" in r for r in lines)
    assert (run_dir / "config.yaml").is_file()


@pytest.mark.slow
def test_cql_d4rl_trains_from_cli(tmp_path):
    """`train.py experiment=cql_d4rl dataset_path=...`: flat state-based CQL
    on goal-relabeled synthetic D4RL transitions."""
    import json

    import train

    from tacorl_tpu.data.d4rl_dataset import generate_synthetic_d4rl

    npz = tmp_path / "maze.npz"
    generate_synthetic_d4rl(npz, n_steps=300, episode_len=100, obs_dim=6,
                            act_dim=3)
    run_dir = tmp_path / "cql_d4rl"
    train.main([
        "platform=cpu",
        "experiment=cql_d4rl",
        f"dataset_path={npz}",
        f"run_dir={run_dir}",
        "trainer.max_steps=2",
        "trainer.log_every_n_steps=1",
        "datamodule.batch_size=8",
        "module.state_dim=6",
        "module.action_dim=3",
        "module.bc_epochs=0",
        "module.n_action_samples=2",
        "module.policy.hidden_dim=16",
        "module.policy.num_layers=2",
        "module.q_network.hidden_dim=16",
        "module.q_network.num_layers=2",
    ])
    lines = [
        json.loads(line)
        for line in (run_dir / "metrics.jsonl").read_text().splitlines()
    ]
    assert any("train/q1_loss" in r for r in lines)
    assert (run_dir / "config.yaml").is_file()


TINY_LMP_OVERRIDES = [
    "platform=cpu",
    "trainer.max_steps=2",
    "trainer.log_every_n_steps=1",
    "datamodule.batch_size=8",  # divisible by the conftest 8-device mesh
    "datamodule.dataset.min_window_size=4",
    "datamodule.dataset.max_window_size=8",
    "module.perceptual_encoder.networks.rgb_static.latent_dim=8",
    "module.perceptual_encoder.networks.rgb_static.hidden_dim=16",
    "module.goal_encoder.hidden_size=16",
    "module.plan_recognition.num_heads=4",
    "module.plan_recognition.num_layers=1",
    "module.plan_recognition.encoder_hidden_size=16",
    "module.plan_recognition.fc_hidden_size=16",
    "module.plan_recognition.max_position_embeddings=8",
    "module.action_decoder.hidden_size=16",
    "module.action_decoder.num_layers=1",
    "module.action_decoder.n_mixtures=4",
    "module.plan_proposal.policy.hidden_dim=16",
    "transforms.rgb_static.size=[48,48]",
    "transforms.rgb_static.pad=2",
]


@pytest.mark.slow
def test_play_lmp_then_tacorl_chain_from_cli(tmp_path):
    """THE flagship workflow as the user runs it: synthetic CALVIN play data
    -> `train.py experiment=play_lmp_for_rl` -> `train.py experiment=tacorl
    play_lmp_dir=<run>` (checkpoint grafting across stages via the saved
    config round-trip)."""
    import json

    import train

    from tacorl_tpu.data.synthetic import generate_synthetic_calvin

    data = tmp_path / "calvin"
    generate_synthetic_calvin(data, 2, 1, 40, 48)
    lmp_dir = tmp_path / "lmp"
    train.main(
        ["experiment=play_lmp_for_rl", f"data_dir={data}",
         f"run_dir={lmp_dir}"] + TINY_LMP_OVERRIDES
    )
    assert (lmp_dir / "config.yaml").is_file()

    tacorl_dir = tmp_path / "tacorl"
    train.main([
        "experiment=tacorl",
        f"data_dir={data}",
        f"play_lmp_dir={lmp_dir}",
        f"run_dir={tacorl_dir}",
        "platform=cpu",
        "trainer.max_steps=2",
        "trainer.log_every_n_steps=1",
        "datamodule.batch_size=8",
        "datamodule.dataset.min_window_size=4",
        "datamodule.dataset.max_window_size=8",
        "module.q_network.hidden_dim=16",
        "module.n_action_samples=2",
        "module.bc_epochs=0",
        "transforms.rgb_static.size=[48,48]",
        "transforms.rgb_static.pad=2",
    ])
    lines = [
        json.loads(line)
        for line in (tacorl_dir / "metrics.jsonl").read_text().splitlines()
    ]
    row = next(r for r in lines if "train/q1_loss" in r)
    assert "train/action_loss" in row  # decoder finetune group active
    assert (tacorl_dir / "ckpts").is_dir()


@pytest.mark.slow
def test_kill_and_resume_from_cli(tmp_path):
    """Restart-recovery as users hit it (reference: restart-and-resume from
    last.ckpt, scripts/train.py:48-66 upstream): SIGKILL a real training
    process after its first checkpoint lands, re-run the SAME command, and
    the run must resume from the checkpointed step — not from zero — and
    finish."""
    import json
    import signal
    import subprocess
    import time

    from tacorl_tpu.data.synthetic import generate_synthetic_calvin

    data = tmp_path / "calvin"
    generate_synthetic_calvin(data, 2, 1, 40, 48)
    run_dir = tmp_path / "run"
    cmd = [
        sys.executable, str(CONFIG_DIR.parent / "scripts" / "train.py"),
        "experiment=play_lmp_for_rl", f"data_dir={data}",
        f"run_dir={run_dir}", "trainer.max_steps=24",  # 3 epochs at 8
        # batches/epoch -> a checkpoint lands at each epoch boundary
    ] + [
        o for o in TINY_LMP_OVERRIDES[1:]  # platform=cpu passed below
        if not o.startswith("trainer.max_steps")
    ]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        ["timeout", "600"] + cmd + ["platform=cpu"],
        cwd=CONFIG_DIR.parent, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    # wait for the first checkpoint, then kill hard
    deadline = time.time() + 420
    ckpts = run_dir / "ckpts"
    while time.time() < deadline:
        if ckpts.is_dir() and any(
            p.name.isdigit() for p in ckpts.iterdir()
        ):
            break
        if proc.poll() is not None:
            pytest.fail("training process exited before first checkpoint")
        time.sleep(1.0)
    else:
        proc.kill()
        pytest.fail("no checkpoint appeared before deadline")
    proc.send_signal(signal.SIGKILL)
    proc.wait()
    killed_at = max(int(p.name) for p in ckpts.iterdir() if p.name.isdigit())
    assert killed_at < 24

    # same command again: must auto-resume and complete
    proc = subprocess.run(
        ["timeout", "900"] + cmd + ["platform=cpu"],
        cwd=CONFIG_DIR.parent, env=env, capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [
        json.loads(line)
        for line in (run_dir / "metrics.jsonl").read_text().splitlines()
    ]
    steps = [r["step"] for r in lines if "train/total_loss" in r]
    # the resumed process continued past the kill point and finished
    assert max(steps) >= 24
    # no restart from zero after the kill: later log rows only move forward
    resumed = [s for s in steps if s > killed_at]
    assert resumed == sorted(resumed)


@pytest.mark.slow
def test_evaluate_cli_with_matrix_preset(tmp_path, monkeypatch):
    """scripts/evaluate.py with an evaluation-matrix preset: train a tiny
    Play-LMP, then run the short-horizon protocol by preset name on the fake
    env and check the per-task results JSON lands."""
    import json

    import evaluate  # scripts/evaluate.py
    import train

    from tacorl_tpu.data.synthetic import generate_synthetic_calvin

    data = tmp_path / "calvin"
    generate_synthetic_calvin(data, 2, 1, 40, 48)
    lmp_dir = tmp_path / "lmp"
    train.main(
        ["experiment=play_lmp_for_rl", f"data_dir={data}",
         f"run_dir={lmp_dir}"] + TINY_LMP_OVERRIDES
    )

    monkeypatch.chdir(tmp_path)  # results file is written to cwd
    evaluate.main([
        "platform=cpu",
        "evaluation=lmp_easy",           # module x protocol preset
        f"module_path={lmp_dir}",        # override the preset's models_dir
        f"data_dir={data}/validation",
        "env=fake_calvin",
        "env.image_hw=32",
        "env.max_episode_steps=6",
        "min_seq_len=2",
        "max_rollouts=2",
        "plan_duration=3",
    ])
    results = json.loads((tmp_path / "lmp_easy_tasks.json").read_text())
    assert results, "no per-task results written"
    for task, row in results.items():
        assert {"accuracy", "num_rollouts"} <= set(row), (task, row)
