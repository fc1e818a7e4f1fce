"""CLI launchability: every module family must be reachable through
``python scripts/train.py experiment=<name>`` (VERDICT.md round-1 item 3 —
SAC/CQL-online existed but had no experiment configs)."""

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
    "transforms.rgb_static.size=[32,32]",
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
