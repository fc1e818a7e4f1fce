"""In-training CALVIN rollout evaluation callbacks
(reference: utils/callbacks/rollout.py:22-547,
utils/callbacks/rollout_long_horizon.py:13-132).

After validation, run goal-conditioned episodes against the env and log
``val_accuracy`` / ``val_episode_return`` (the checkpoint monitor metrics).
Episodes are sharded round-robin across JAX processes (the reference's DDP
rank sharding, rollout.py:161-170); each process evaluates its share and the
host-side mean is logged (single-process here; multihost aggregation hooks
into jax.experimental.multihost_utils when process_count > 1).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from tacorl_tpu.callbacks.base import Callback
from tacorl_tpu.config import instantiate
from tacorl_tpu.evaluation.agents import make_agent
from tacorl_tpu.evaluation.rollout_generator import (
    LongHorizonRolloutGenerator,
    SingleTaskRolloutGenerator,
)

logger = logging.getLogger("tacorl_tpu")

__all__ = ["RolloutCallback", "RolloutLongHorizonCallback"]


class _BaseRolloutCallback(Callback):
    def __init__(
        self,
        env: Any,
        data_dir: str,
        start_end_tasks: str,
        num_rollouts: int = 16,
        every_n_epochs: int = 1,
        plan_duration: int = 15,
        use_cem: bool = False,
        min_seq_len: int = 16,
        max_seq_len: int = 64,
        strategy: str = "longest",
    ):
        self.env = instantiate(env) if isinstance(env, dict) else env
        self.data_dir = data_dir
        self.start_end_tasks = start_end_tasks
        self.num_rollouts = num_rollouts
        self.every_n_epochs = every_n_epochs
        self.plan_duration = plan_duration
        self.use_cem = use_cem
        self.gen_kwargs = dict(
            data_dir=data_dir,
            start_end_tasks=start_end_tasks,
            min_seq_len=min_seq_len,
            max_seq_len=max_seq_len,
            strategy=strategy,
        )
        self._generator = None

    def _make_manager(self, manager_cls):
        from tacorl_tpu.evaluation.rollout_manager import RLRollout

        if manager_cls is RLRollout:
            return manager_cls()
        return manager_cls(plan_duration=self.plan_duration)

    def _shard(self, items: List) -> List:
        """Round-robin episode sharding by process (rollout.py:161-170)."""
        rank, world = jax.process_index(), jax.process_count()
        return items[rank::world]

    def _log(self, trainer, metrics: Dict[str, float]) -> None:
        if jax.process_count() > 1:  # pragma: no cover - multihost only
            from jax.experimental import multihost_utils

            arr = np.asarray([metrics[k] for k in sorted(metrics)])
            mean = multihost_utils.process_allgather(arr).mean(axis=0)
            metrics = dict(zip(sorted(metrics), mean.tolist()))
        trainer.sink.log(metrics, trainer.global_step)
        trainer._last_val_metrics.update(metrics)


class RolloutCallback(_BaseRolloutCallback):
    """Single-task rollouts -> val_accuracy / val_episode_return
    (rollout.py:436-546)."""

    def on_validation_end(self, trainer, module, metrics, outputs, epoch):
        if (epoch + 1) % self.every_n_epochs != 0:
            return
        if self._generator is None:
            self._generator = SingleTaskRolloutGenerator(**self.gen_kwargs)
        agent, manager_cls = make_agent(
            module, trainer.state, use_cem=self.use_cem
        )
        manager = self._make_manager(manager_cls)
        episodes = []
        for task, entries in self._generator.get_rollout_tasks().items():
            for idx in range(len(entries)):
                episodes.append((task, idx))
        episodes = self._shard(episodes)[: self.num_rollouts]
        if not episodes:
            return
        successes, returns, lengths = [], [], []
        for task, idx in episodes:
            reset_info = self._generator.get_reset_info(task, idx)
            out = manager.episode_rollout(agent, self.env, reset_info, task=task)
            successes.append(float(out["success"]))
            returns.append(float(out["episode_return"]))
            lengths.append(float(out["episode_length"]))
        self._log(
            trainer,
            {
                "val_accuracy": float(np.mean(successes)),
                "val_episode_return": float(np.mean(returns)),
                "val_episode_length": float(np.mean(lengths)),
            },
        )
        logger.info(
            "rollout eval: accuracy %.3f over %d episodes",
            float(np.mean(successes)),
            len(episodes),
        )


class RolloutD4RLCallback(Callback):
    """In-training D4RL evaluation: N episodes -> val_accuracy + val_score
    (reference: utils/callbacks/rollout_d4rl.py:17-182)."""

    def __init__(
        self,
        env: Any,
        num_rollouts: int = 10,
        every_n_epochs: int = 1,
        plan_duration: int = 15,
    ):
        self.env = instantiate(env) if isinstance(env, dict) else env
        self.num_rollouts = num_rollouts
        self.every_n_epochs = every_n_epochs
        self.plan_duration = plan_duration

    def on_validation_end(self, trainer, module, metrics, outputs, epoch):
        if (epoch + 1) % self.every_n_epochs != 0:
            return
        from tacorl_tpu.evaluation import agents
        from tacorl_tpu.evaluation import rollout_manager_d4rl as rm

        if module.name == "play_lmp_d4rl":
            agent = agents.LatentPlanD4RLAgent(module, trainer.state)
            manager = rm.LatentPlanRolloutD4RL(self.plan_duration)
        elif module.name == "tacorl_d4rl":
            agent = agents.TACORLD4RLAgent(module, trainer.state)
            manager = rm.TACORLRolloutD4RL(self.plan_duration)
        else:
            agent = agents.FlatPolicyAgent(module, trainer.state)
            manager = rm.RLRolloutD4RL()
        idx = list(range(self.num_rollouts))
        rank, world = jax.process_index(), jax.process_count()
        successes, scores = [], []
        for _ in idx[rank::world]:
            out = manager.episode_rollout(agent, self.env)
            successes.append(float(out["success"]))
            scores.append(float(out["score"]))
        if not successes:
            return
        result = {
            "val_accuracy": float(np.mean(successes)),
            "val_score": float(np.mean(scores)),
        }
        trainer.sink.log(result, trainer.global_step)
        trainer._last_val_metrics.update(result)


class RolloutLongHorizonCallback(_BaseRolloutCallback):
    """Long-horizon chains -> per-depth LH_{i}_accuracy
    (rollout_long_horizon.py:13-132)."""

    def __init__(self, tasks_per_rollout: int = 2, **kwargs):
        super().__init__(**kwargs)
        self.tasks_per_rollout = tasks_per_rollout

    def on_validation_end(self, trainer, module, metrics, outputs, epoch):
        if (epoch + 1) % self.every_n_epochs != 0:
            return
        if self._generator is None:
            self._generator = LongHorizonRolloutGenerator(
                tasks_per_rollout=self.tasks_per_rollout, **self.gen_kwargs
            )
        agent, manager_cls = make_agent(
            module, trainer.state, use_cem=self.use_cem
        )
        manager = self._make_manager(manager_cls)
        tasks = self._shard(list(range(len(self._generator.get_rollout_tasks()))))
        tasks = tasks[: self.num_rollouts]
        if not tasks:
            return
        accum = np.zeros(self.tasks_per_rollout)
        for idx in tasks:
            reset_info = self._generator.get_reset_info(idx)
            out = manager.episode_rollout(agent, self.env, reset_info)
            n_done = len(out.get("successful_tasks", []))
            accum[:n_done] += 1
        result = {
            f"LH_{i + 1}_accuracy": float(accum[i] / len(tasks))
            for i in range(self.tasks_per_rollout)
        }
        self._log(trainer, result)
