"""In-training CALVIN rollout evaluation callbacks
(reference: utils/callbacks/rollout.py:22-547,
utils/callbacks/rollout_long_horizon.py:13-132).

Capability parity with the reference callback:
  * cadence by epochs, episodes (online RL), or batches
    (rollout.py:53-60,498-535), plus ``skip_first_n_epochs``;
  * eval strategies ``all_tasks`` (per-task rollouts from
    start_end_tasks.json, rollout.py:107-126,149-170), ``env_tasks``
    (env-provided stored start/goal pairs, :264-303) and ``plain``
    (N unconditioned episodes, :391-416);
  * static vs dynamic "block" task aggregation: per-task metrics, the
    static/dynamic group means, and an overall score that averages the two
    groups (:196-259) — tasks whose name contains "block" move objects and
    are the dynamic group;
  * ``val_accuracy`` / ``val_episode_return`` monitor metrics for
    checkpointing (:542-546).

Episodes are sharded round-robin across JAX processes with the goal list
padded to a multiple of the world size so every process evaluates an equal
share (the reference's DDP rank sharding, rollout.py:161-170) and the
host-side process-mean equals the global metric.
"""

from __future__ import annotations

import logging
import math
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
        data_dir: Optional[str] = None,
        start_end_tasks: Optional[str] = None,
        num_rollouts: int = 16,
        every_n_epochs: Optional[int] = None,
        every_n_episodes: Optional[int] = None,
        every_n_batches: Optional[int] = None,
        skip_first_n_epochs: int = 0,
        plan_duration: int = 15,
        use_cem: bool = False,
        min_seq_len: int = 16,
        max_seq_len: int = 64,
        strategy: str = "shortest",
    ):
        self.env = instantiate(env) if isinstance(env, dict) else env
        self.data_dir = data_dir
        self.start_end_tasks = start_end_tasks
        self.num_rollouts = num_rollouts
        # reference asserts one cadence is set (rollout.py:53-57); default to
        # every epoch so epoch-only configs stay terse
        if every_n_epochs is None and every_n_episodes is None and (
            every_n_batches is None
        ):
            every_n_epochs = 1
        self.every_n_epochs = every_n_epochs
        self.every_n_episodes = every_n_episodes
        self.every_n_batches = every_n_batches
        self.skip_first_n_epochs = skip_first_n_epochs
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
        self._last_batch_fire = -1

    # cadence position persists across resume: without it a resumed run with
    # every_n_batches set fires a rollout eval on its very first batch
    # regardless of where in the cadence the interrupted run stopped
    def state_dict(self) -> Dict[str, Any]:
        if self.every_n_batches is None:
            return {}
        return {"last_batch_fire": self._last_batch_fire}

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        if "last_batch_fire" in state:
            self._last_batch_fire = int(state["last_batch_fire"])

    def _make_manager(self, manager_cls):
        from tacorl_tpu.evaluation.rollout_manager import RLRollout

        if manager_cls is RLRollout:
            return manager_cls()
        return manager_cls(plan_duration=self.plan_duration)

    # -- cadence (rollout.py:498-535) -------------------------------------

    def _epoch_cadence_hit(self, module, epoch: int) -> bool:
        if epoch < self.skip_first_n_epochs:
            return False
        episode_cond = (
            self.every_n_episodes is not None
            and getattr(module, "episode_done", False)
            and getattr(module, "episode_number", 0) % self.every_n_episodes
            == 0
        )
        epoch_cond = (
            self.every_n_epochs is not None
            and epoch % self.every_n_epochs == 0
        )
        return episode_cond or epoch_cond

    def on_train_batch_end(self, trainer, module, metrics, step) -> None:
        if self.every_n_batches is None:
            return
        if trainer.epoch < self.skip_first_n_epochs:
            return
        # global_step advances by steps_per_call under scanned dispatch, so
        # fire whenever a cadence boundary was crossed since the last fire
        fire_idx = step // self.every_n_batches
        if fire_idx > self._last_batch_fire:
            self._last_batch_fire = fire_idx
            self._run(trainer, module, trainer.epoch, prefix="batch_val")

    def on_validation_end(self, trainer, module, metrics, outputs, epoch):
        if self._epoch_cadence_hit(module, epoch):
            self._run(trainer, module, epoch, prefix="validation")

    def _run(self, trainer, module, epoch: int, prefix: str) -> None:
        raise NotImplementedError

    # -- rank sharding ------------------------------------------------------

    def _goal_list(self, num_rollouts: int, num_available: int) -> List[int]:
        """This process's share of rollout indices, padded so every process
        evaluates ceil(k/world) episodes (rollout.py:161-170): equal local
        counts make the process-mean equal the global metric."""
        rank, world = jax.process_index(), jax.process_count()
        num_goals = world * math.ceil(num_rollouts / world)
        goals = [g for g in range(num_goals) if g % world == rank]
        if num_available <= 0:
            return []
        return [g % num_available for g in goals]

    def _log(self, trainer, metrics: Dict[str, float]) -> None:
        if jax.process_count() > 1:  # pragma: no cover - multihost only
            from jax.experimental import multihost_utils

            arr = np.asarray([metrics[k] for k in sorted(metrics)])
            mean = multihost_utils.process_allgather(arr).mean(axis=0)
            metrics = dict(zip(sorted(metrics), mean.tolist()))
        trainer.sink.log(metrics, trainer.global_step)
        trainer._last_val_metrics.update(metrics)


def _summarize(episodes: List[Dict[str, float]]) -> Dict[str, float]:
    return {
        "accuracy": float(np.mean([e["success"] for e in episodes])),
        "avg_episode_return": float(
            np.mean([e["episode_return"] for e in episodes])
        ),
        # the reference logs np.mean(succesful_episodes) as avg length in its
        # plain path (rollout.py:430) — a documented defect we don't copy
        "avg_episode_length": float(
            np.mean([e["episode_length"] for e in episodes])
        ),
    }


class RolloutCallback(_BaseRolloutCallback):
    """Single-task rollouts -> val_accuracy / val_episode_return
    (rollout.py:22-547).

    ``eval_strategy``:
      * ``all_tasks`` (reference default) — ``num_rollouts_per_task``
        episodes per task from start_end_tasks.json, static/dynamic
        aggregation;
      * ``env_tasks`` — tasks and stored start/goal indices from
        ``env.get_possible_tasks()``;
      * ``plain`` — ``num_rollouts`` unconditioned episodes;
      * ``flat`` — this framework's r2 behavior (flat task/idx list capped
        at ``num_rollouts``), kept for cheap smoke tests.
    """

    EVAL_STRATEGIES = ("all_tasks", "env_tasks", "plain", "flat")

    def __init__(
        self,
        *args,
        eval_strategy: str = "all_tasks",
        num_rollouts_per_task: int = 3,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        # a misspelled strategy must not silently become `plain` (the
        # reference falls through, rollout.py:436-464 — a foot-gun we
        # deliberately don't copy); the only tolerated fallback is
        # env_tasks -> plain when the env lacks get_possible_tasks (below)
        if eval_strategy not in self.EVAL_STRATEGIES:
            raise ValueError(
                f"unknown eval_strategy {eval_strategy!r}; "
                f"expected one of {self.EVAL_STRATEGIES}"
            )
        self.eval_strategy = eval_strategy
        self.num_rollouts_per_task = num_rollouts_per_task

    # -- episode drivers ---------------------------------------------------

    def _need_generator(self):
        if self._generator is None:
            self._generator = SingleTaskRolloutGenerator(**self.gen_kwargs)
        return self._generator

    def _rollout(self, agent, manager, reset_info, task=None) -> Dict:
        out = manager.episode_rollout(agent, self.env, reset_info, task=task)
        return {
            "success": float(out["success"]),
            "episode_return": float(out["episode_return"]),
            "episode_length": float(out["episode_length"]),
        }

    def _evaluate_task_groups(
        self, trainer, agent, manager, task_specs, prefix: str
    ) -> Optional[Dict[str, float]]:
        """Shared all_tasks/env_tasks loop: per-task metrics plus the
        static/dynamic split keyed on "block" in the task name
        (rollout.py:196-259)."""
        groups: Dict[str, List[Dict]] = {"static": [], "dynamic": []}
        per_task: Dict[str, float] = {}
        total = 0
        for task, reset_infos in task_specs:
            episodes = [
                self._rollout(agent, manager, ri, task=task)
                for ri in reset_infos
            ]
            if not episodes:
                continue
            total += len(episodes)
            summary = _summarize(episodes)
            for k, v in summary.items():
                per_task[f"{prefix}/{task}/{k}"] = v
            groups["dynamic" if "block" in task else "static"].extend(
                episodes
            )
        if total == 0:
            return None
        metrics = dict(per_task)
        group_summaries = {}
        for name, episodes in groups.items():
            if not episodes:
                continue
            group_summaries[name] = _summarize(episodes)
            for k, v in group_summaries[name].items():
                metrics[f"{prefix}/{name}/{k}"] = v
        # overall = unweighted mean of the static and dynamic group scores
        # (rollout.py:446-460); with one group present it is that group
        overall = {
            k: float(np.mean([s[k] for s in group_summaries.values()]))
            for k in ("accuracy", "avg_episode_return", "avg_episode_length")
        }
        self._log(trainer, metrics)
        return overall

    # -- strategies ---------------------------------------------------------

    def _run_all_tasks(self, trainer, agent, manager, prefix):
        gen = self._need_generator()
        task_specs = []
        for task, entries in gen.get_rollout_tasks().items():
            goal_list = self._goal_list(
                self.num_rollouts_per_task, len(entries)
            )
            task_specs.append(
                (task, [gen.get_reset_info(task, g) for g in goal_list])
            )
        return self._evaluate_task_groups(
            trainer, agent, manager, task_specs, prefix
        )

    def _run_env_tasks(self, trainer, agent, manager, prefix):
        task_specs = []
        for task, num_goals in self.env.get_possible_tasks().items():
            goal_list = self._goal_list(num_goals, num_goals)
            task_specs.append(
                (
                    task,
                    [
                        {"task_info": {"task": task, "index": g}}
                        for g in goal_list
                    ],
                )
            )
        return self._evaluate_task_groups(
            trainer, agent, manager, task_specs, prefix
        )

    def _run_plain(self, trainer, agent, manager, prefix):
        episodes = [
            self._rollout(agent, manager, None)
            for _ in self._goal_list(self.num_rollouts, self.num_rollouts)
        ]
        if not episodes:
            return None
        return _summarize(episodes)

    def _run_flat(self, trainer, agent, manager, prefix):
        gen = self._need_generator()
        episodes = []
        for task, entries in gen.get_rollout_tasks().items():
            for idx in range(len(entries)):
                episodes.append((task, idx))
        rank, world = jax.process_index(), jax.process_count()
        episodes = episodes[rank::world][: self.num_rollouts]
        if not episodes:
            return None
        return _summarize(
            [
                self._rollout(
                    agent, manager, gen.get_reset_info(task, idx), task=task
                )
                for task, idx in episodes
            ]
        )

    def _run(self, trainer, module, epoch: int, prefix: str) -> None:
        agent, manager_cls = make_agent(
            module, trainer.state, use_cem=self.use_cem
        )
        manager = self._make_manager(manager_cls)
        if self.eval_strategy == "all_tasks":
            overall = self._run_all_tasks(trainer, agent, manager, prefix)
        elif self.eval_strategy == "env_tasks":
            if hasattr(self.env, "get_possible_tasks"):
                overall = self._run_env_tasks(trainer, agent, manager, prefix)
            else:
                logger.warning(
                    "eval_strategy=env_tasks but %s has no "
                    "get_possible_tasks; falling back to plain episodes",
                    type(self.env).__name__,
                )
                overall = self._run_plain(trainer, agent, manager, prefix)
        elif self.eval_strategy == "flat":
            overall = self._run_flat(trainer, agent, manager, prefix)
        else:
            overall = self._run_plain(trainer, agent, manager, prefix)
        if overall is None:
            return
        if prefix == "validation":
            # checkpoint monitor metrics (rollout.py:542-546)
            self._log(
                trainer,
                {
                    "val_accuracy": overall["accuracy"],
                    "val_episode_return": overall["avg_episode_return"],
                    "val_episode_length": overall["avg_episode_length"],
                },
            )
            # online RL self-checkpoints (+ replay-buffer snapshot) after
            # each rollout eval (rollout.py:530-532, sac_lightning.py:446-451)
            if hasattr(module, "save_checkpoint_extras"):
                module.save_checkpoint_extras()
        else:
            self._log(
                trainer,
                {f"{prefix}/{k}": v for k, v in overall.items()},
            )
        logger.info(
            "rollout eval [%s/%s]: accuracy %.3f",
            prefix,
            self.eval_strategy,
            overall["accuracy"],
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
        if epoch % self.every_n_epochs != 0:
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

    def _run(self, trainer, module, epoch: int, prefix: str) -> None:
        if self._generator is None:
            self._generator = LongHorizonRolloutGenerator(
                tasks_per_rollout=self.tasks_per_rollout, **self.gen_kwargs
            )
        agent, manager_cls = make_agent(
            module, trainer.state, use_cem=self.use_cem
        )
        manager = self._make_manager(manager_cls)
        n_available = len(self._generator.get_rollout_tasks())
        tasks = self._goal_list(
            min(self.num_rollouts, max(n_available, 1)), n_available
        )
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
