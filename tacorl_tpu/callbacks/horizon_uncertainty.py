"""Uncertainty-gated goal-horizon curriculum
(reference: utils/callbacks/increase_horizon_uncertainty.py:12-114).

After each train batch, run ``forward_passes`` MC-dropout evaluations of both
critics on (obs, dataset actions); at epoch end, if the mean prediction std is
below ``std_threshold`` the goal horizon grows by one step. The current
horizon is persisted through the trainer's callback state so resume continues
the curriculum (:87-114).

Requires critics built with ``q_network.with_dropout: true`` (the MC-dropout
variant, networks/critic.py)."""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from tacorl_tpu.callbacks.base import Callback
from tacorl_tpu.utils import stable_fold as _stable_fold

__all__ = ["IncreaseHorizonUncertainty"]


class IncreaseHorizonUncertainty(Callback):
    def __init__(self, forward_passes: int = 3, std_threshold: float = 0.125):
        # coerce: YAML 1.1 scalars like "1e9" arrive as strings
        self.forward_passes = int(forward_passes)
        self.std_threshold = float(std_threshold)
        self._stds: List[float] = []
        self._mc_fn = None
        self._last_batch = None

    def _dataset(self, trainer):
        return getattr(trainer.datamodule, "train_dataset", None)

    def _active(self, trainer) -> bool:
        ds = self._dataset(trainer)
        return (
            ds is not None
            and hasattr(ds, "goal_strategy_prob")
            and "increasing_horizon" in ds.goal_strategy_prob
        )

    def _build_mc_fn(self, module):
        n = self.forward_passes
        transforms = module.transforms

        @jax.jit
        def mc_std(params, batch, key):
            obs = transforms(key, batch["observations"], train=False)
            actions = batch["actions"].astype(jnp.float32)
            preds = []
            for i in range(n):
                for name in ("q1", "q2"):
                    q = module.critic_net.apply(
                        {"params": params[name]},
                        obs,
                        actions,
                        rngs={
                            "dropout": jax.random.fold_in(
                                key, i * 2 + _stable_fold(name) % 97
                            )
                        },
                    )
                    preds.append(q)
            stacked = jnp.stack(preds, axis=0)  # (2n, B, 1)
            return jnp.std(stacked, axis=0).mean()

        return mc_std

    def on_train_batch_end(self, trainer, module, metrics, step) -> None:
        if not self._active(trainer):
            return
        if self._mc_fn is None:
            self._mc_fn = self._build_mc_fn(module)
        # evaluate on the current device batch (kept by the trainer loop)
        batch = getattr(trainer, "_current_batch", None)
        if batch is None:
            return
        std = self._mc_fn(
            trainer.state.params, batch, jax.random.key(step)
        )
        self._stds.append(std)  # device scalar; sync at epoch end

    def on_epoch_end(self, trainer, module, epoch: int) -> None:
        if not self._active(trainer) or not self._stds:
            return
        ds = self._dataset(trainer)
        avg_std = float(np.mean([float(s) for s in self._stds]))
        self._stds = []
        trainer.sink.log(
            {"goal_horizon": float(ds.current_horizon), "Q_avg_std": avg_std},
            trainer.global_step,
            prefix="train",
        )
        if avg_std < self.std_threshold:
            ds.increase_horizon_to(ds.current_horizon + ds.horizon_step)

    # callback state rides in the trainer checkpoint dir ------------------------

    _restored_horizon: Any = None

    def state_dict(self) -> Dict[str, Any]:
        ds = self._dataset(self._trainer) if self._trainer else None
        if ds is not None and hasattr(ds, "current_horizon"):
            return {"current_horizon": int(ds.current_horizon)}
        return {}

    _trainer = None

    def on_fit_start(self, trainer, module) -> None:
        self._trainer = trainer
        ds = self._dataset(trainer)
        if (
            self._restored_horizon is not None
            and ds is not None
            and hasattr(ds, "increase_horizon_to")
        ):
            ds.increase_horizon_to(self._restored_horizon)

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        if "current_horizon" in state:
            self._restored_horizon = int(state["current_horizon"])
