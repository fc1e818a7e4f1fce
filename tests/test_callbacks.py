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
