import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacorl_tpu.callbacks.horizon_uncertainty import IncreaseHorizonUncertainty
from tacorl_tpu.callbacks.kl_schedule import KLLinearSchedule, KLSigmoidSchedule
from tacorl_tpu.callbacks.rollout import RolloutCallback
from tacorl_tpu.callbacks.tsne_plot import TSNEPlotCallback
from tacorl_tpu.envs.fake_calvin import FakeCalvinEnv, FakeTasks


class StubModule:
    def __init__(self):
        self.kl_beta = None

    def set_kl_beta(self, v):
        self.kl_beta = v


def test_kl_schedules():
    m = StubModule()
    lin = KLLinearSchedule(start_epoch=10, end_epoch=20, max_kl_beta=0.1)
    lin.on_epoch_start(None, m, 5)
    assert m.kl_beta == 0.0
    lin.on_epoch_start(None, m, 15)
    assert abs(m.kl_beta - 0.05) < 1e-9
    lin.on_epoch_start(None, m, 25)
    assert m.kl_beta == 0.1

    sig = KLSigmoidSchedule(start_epoch=10, end_epoch=20, max_kl_beta=0.1)
    sig.on_epoch_start(None, m, 15)
    assert abs(m.kl_beta - 0.05) < 1e-3  # midpoint of the sigmoid
    sig.on_epoch_start(None, m, 5)
    assert m.kl_beta == 0.0


class StubSink:
    def __init__(self):
        self.logged = {}

    def log(self, metrics, step, prefix=None):
        self.logged.update(metrics)

    def log_image(self, name, image, step):
        self.logged[name] = image.shape


class StubTrainer:
    def __init__(self, tmp_path):
        self.sink = StubSink()
        self.global_step = 1
        self.epoch = 0
        self._last_val_metrics = {}
        self.datamodule = None
        self.state = None

        class Ckpt:
            dir = tmp_path

        self.ckpt = Ckpt()


def test_rollout_callback_on_fake_env(tmp_path):
    from tacorl_tpu.data.synthetic import generate_synthetic_calvin
    from tacorl_tpu.modules.play_lmp import PlayLMPModule
    from tests.test_play_lmp import TINY_CFG, make_batch

    root = tmp_path / "data"
    generate_synthetic_calvin(root, 1, 1, episode_len=40, image_hw=64)
    module = PlayLMPModule(dict(TINY_CFG))
    rng = jax.random.key(0)
    state = module.init_state(rng, make_batch(rng))

    trainer = StubTrainer(tmp_path)
    trainer.state = state
    env = FakeCalvinEnv(image_hw=64, max_episode_steps=6)
    cb = RolloutCallback(
        env=env,
        data_dir=str(root / "validation"),
        start_end_tasks=str(root / "validation" / "start_end_tasks.json"),
        num_rollouts=2,
        plan_duration=3,
        min_seq_len=2,
        max_seq_len=64,
    )
    cb.on_validation_end(trainer, module, {}, [], epoch=0)
    assert "val_accuracy" in trainer.sink.logged
    assert "val_episode_return" in trainer.sink.logged


def test_tsne_callback(tmp_path):
    trainer = StubTrainer(tmp_path)
    cb = TSNEPlotCallback(task_differ=FakeTasks(), perplexity=5.0)
    rs = np.random.RandomState(0)
    outputs = []
    for _ in range(2):
        n = 12
        scene_start = np.zeros((n, 24), np.float32)
        scene_end = np.zeros((n, 24), np.float32)
        scene_end[: n // 2, 0] = 1.0  # half completed open_drawer
        outputs.append(
            {
                "sampled_plan_pp": rs.randn(n, 8).astype(np.float32),
                "idx": np.arange(n),
                "state_info_initial": {
                    "robot_obs": np.zeros((n, 15), np.float32),
                    "scene_obs": scene_start,
                },
                "state_info_final": {
                    "robot_obs": np.zeros((n, 15), np.float32),
                    "scene_obs": scene_end,
                },
            }
        )
    cb.on_validation_end(trainer, None, {}, outputs, epoch=0)
    assert "tsne_plan_space" in trainer.sink.logged


def test_uncertainty_horizon_callback(tmp_path, rng):
    from tacorl_tpu.modules.cql import CQLModule
    from tests.test_cql import CFG, make_batch

    cfg = dict(CFG)
    cfg["q_network"] = {
        "num_layers": 2, "hidden_dim": 16, "with_dropout": True,
        "dropout_p": 0.5,
    }
    module = CQLModule(cfg)
    batch = make_batch(rng)
    state = module.init_state(rng, batch)

    class DS:
        goal_strategy_prob = {"increasing_horizon": 1.0}
        current_horizon = 8
        horizon_step = 4

        def increase_horizon_to(self, h):
            self.current_horizon = h

    class DM:
        train_dataset = DS()

    trainer = StubTrainer(tmp_path)
    trainer.datamodule = DM()
    trainer.state = state
    trainer._current_batch = batch
    cb = IncreaseHorizonUncertainty(forward_passes=2, std_threshold=1e9)
    cb.on_fit_start(trainer, module)
    cb.on_train_batch_end(trainer, module, {}, step=1)
    cb.on_epoch_end(trainer, module, epoch=0)
    # huge threshold -> horizon always increases
    assert trainer.datamodule.train_dataset.current_horizon == 12
    assert "Q_avg_std" in trainer.sink.logged
    assert trainer.sink.logged["Q_avg_std"] > 0.0  # dropout variance
    # state round trip
    sd = cb.state_dict()
    cb2 = IncreaseHorizonUncertainty()
    cb2.load_state_dict(sd)
    cb2.on_fit_start(trainer, module)
    assert trainer.datamodule.train_dataset.current_horizon == 12


# -- r3: reference-parity rollout callback features (rollout.py:53-60,
# 196-259,436-535) --------------------------------------------------------


class _ExpertManager:
    """Drives the fake env with its scripted expert — isolates the callback
    logic (strategies, aggregation, cadence) from policy quality."""

    def __init__(self, plan_duration: int = 15):
        self.plan_duration = plan_duration

    def episode_rollout(self, agent, env, reset_info=None, task=None):
        env.reset(**(reset_info or {}))
        episode_return, info, step = 0.0, {}, 0
        for step in range(1, env.max_episode_steps + 1):
            _obs, reward, done, info = env.step(env.expert_action())
            episode_return += reward
            if done:
                break
        return {
            "episode_length": step,
            "episode_return": episode_return,
            "success": bool(info.get("success", False)),
        }


def _expert_make_agent(module, state, use_cem=False):
    return None, _ExpertManager


def test_rollout_callback_env_tasks_static_dynamic(tmp_path, monkeypatch):
    import tacorl_tpu.callbacks.rollout as rollout_mod

    monkeypatch.setattr(rollout_mod, "make_agent", _expert_make_agent)
    trainer = StubTrainer(tmp_path)
    env = FakeCalvinEnv(image_hw=32, max_episode_steps=40)
    cb = RolloutCallback(env=env, eval_strategy="env_tasks")
    cb.on_validation_end(trainer, object(), {}, [], epoch=0)
    logged = trainer.sink.logged
    # per-task metrics for every env-provided task
    for task in env.get_possible_tasks():
        assert f"validation/{task}/accuracy" in logged
    # static/dynamic "block" split: lift_block is the dynamic group
    assert logged["validation/dynamic/accuracy"] == 1.0
    assert logged["validation/static/accuracy"] == 1.0
    # monitors present and equal to the group mean
    assert logged["val_accuracy"] == 1.0
    assert trainer._last_val_metrics["val_accuracy"] == 1.0


def test_rollout_callback_all_tasks_uses_per_task_budget(
    tmp_path, monkeypatch
):
    import tacorl_tpu.callbacks.rollout as rollout_mod
    from tacorl_tpu.data.synthetic import generate_synthetic_calvin

    monkeypatch.setattr(rollout_mod, "make_agent", _expert_make_agent)
    root = tmp_path / "data"
    generate_synthetic_calvin(root, 1, 1, episode_len=40, image_hw=32)
    trainer = StubTrainer(tmp_path)
    env = FakeCalvinEnv(image_hw=32, max_episode_steps=40)
    cb = RolloutCallback(
        env=env,
        data_dir=str(root / "validation"),
        start_end_tasks=str(root / "validation" / "start_end_tasks.json"),
        eval_strategy="all_tasks",
        num_rollouts_per_task=2,
        min_seq_len=2,
        max_seq_len=64,
    )
    cb.on_validation_end(trainer, object(), {}, [], epoch=0)
    logged = trainer.sink.logged
    assert "val_accuracy" in logged
    per_task = [k for k in logged if k.startswith("validation/") and
                k.endswith("/accuracy") and "static" not in k and
                "dynamic" not in k]
    assert per_task, logged


def test_rollout_callback_batch_cadence(tmp_path, monkeypatch):
    trainer = StubTrainer(tmp_path)
    env = FakeCalvinEnv(image_hw=32, max_episode_steps=4)
    cb = RolloutCallback(env=env, every_n_batches=10)
    fired = []
    monkeypatch.setattr(
        cb, "_run", lambda tr, mod, epoch, prefix: fired.append(prefix)
    )
    # epoch-cadence must NOT fire when only batch cadence is configured
    cb.on_validation_end(trainer, object(), {}, [], epoch=0)
    assert fired == []
    cb.on_train_batch_end(trainer, object(), {}, step=8)  # idx 0
    cb.on_train_batch_end(trainer, object(), {}, step=9)  # still idx 0
    cb.on_train_batch_end(trainer, object(), {}, step=12)  # idx 1 (scan jump)
    assert fired == ["batch_val", "batch_val"]
    # skip_first_n_epochs gates the batch path too
    cb2 = RolloutCallback(env=env, every_n_batches=1, skip_first_n_epochs=2)
    monkeypatch.setattr(
        cb2, "_run", lambda tr, mod, epoch, prefix: fired.append("skip")
    )
    cb2.on_train_batch_end(trainer, object(), {}, step=5)
    assert "skip" not in fired


def test_rollout_callback_episode_cadence(tmp_path, monkeypatch):
    class OnlineModule:
        episode_number = 0
        episode_done = False

    trainer = StubTrainer(tmp_path)
    env = FakeCalvinEnv(image_hw=32, max_episode_steps=4)
    cb = RolloutCallback(env=env, every_n_episodes=2)
    fired = []
    monkeypatch.setattr(
        cb, "_run", lambda tr, mod, epoch, prefix: fired.append(epoch)
    )
    m = OnlineModule()
    cb.on_validation_end(trainer, m, {}, [], epoch=0)  # no episode done
    assert fired == []
    m.episode_done, m.episode_number = True, 2
    cb.on_validation_end(trainer, m, {}, [], epoch=1)
    assert fired == [1]
    m.episode_number = 3  # off-cadence episode count
    cb.on_validation_end(trainer, m, {}, [], epoch=2)
    assert fired == [1]


def test_rollout_callback_skip_first_n_epochs(tmp_path, monkeypatch):
    trainer = StubTrainer(tmp_path)
    env = FakeCalvinEnv(image_hw=32, max_episode_steps=4)
    cb = RolloutCallback(env=env, every_n_epochs=1, skip_first_n_epochs=2)
    fired = []
    monkeypatch.setattr(
        cb, "_run", lambda tr, mod, epoch, prefix: fired.append(epoch)
    )
    for epoch in range(4):
        cb.on_validation_end(trainer, object(), {}, [], epoch=epoch)
    assert fired == [2, 3]
