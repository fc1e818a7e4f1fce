"""Algorithm-module base: config-driven construction + checkpoint restore.

A module owns (a) flax network definitions, (b) an optax optimizer, (c) the
jitted train/val steps, and (d) host-side glue (device transforms, schedule
state). The trainer drives it through this protocol — the functional
counterpart of the reference's LightningModule layer (SURVEY.md §1 L4).
"""

from __future__ import annotations

from typing import Any, Dict, Optional


import jax

from tacorl_tpu.core.checkpoint import CheckpointManager
from tacorl_tpu.core.train_state import TrainState

__all__ = ["AlgorithmModule"]


class AlgorithmModule:
    name: str = "module"

    def __init__(self, cfg: Dict[str, Any], full_config: Optional[dict] = None):
        self.cfg = dict(cfg)
        self.full_config = full_config or {}
        self.build()

    # subclasses implement ------------------------------------------------
    def build(self) -> None:
        raise NotImplementedError

    def init_state(self, rng, example_batch) -> TrainState:
        raise NotImplementedError

    def make_train_step(self):
        raise NotImplementedError

    def make_val_step(self):
        raise NotImplementedError

    # scalar schedule values passed into the jitted step each iteration
    # (e.g. kl_beta annealing) — callbacks mutate these host attributes
    def step_scalars(self) -> Dict[str, float]:
        return {}

    # pure train steps (no host side effects) may be scanned K-per-dispatch;
    # online modules with env interaction override this to False
    supports_scan: bool = True

    def make_scanned_train_step(self):
        """K train steps per device dispatch via lax.scan over a stacked
        batch pytree (leaves (K, B, ...)). Amortizes per-dispatch overhead —
        essential through remote-execution tunnels, harmless on local chips.
        Returns the final state and the last step's metrics."""
        if not self.supports_scan:
            raise RuntimeError(
                f"{type(self).__name__} interacts with the environment "
                "inside its train step and cannot be scanned"
            )
        import functools

        step = self.make_train_step()  # inlined under the outer jit

        @functools.partial(jax.jit, donate_argnums=(0,))
        def scanned(state, stacked_batch, rng, scalars):
            def body(carry, batch):
                st, metrics = step(carry, batch, rng, scalars)
                return st, metrics

            state, metrics = jax.lax.scan(body, state, stacked_batch)
            return state, jax.tree.map(lambda m: m[-1], metrics)

        return scanned

    # ----------------------------------------------------------------------

    def make_state_target(self, params, aux_template=None) -> TrainState:
        """Abstract state structure for a given params tree; subclasses with
        aux pytrees (target networks etc.) override aux_template handling."""
        return TrainState.create(
            params, self.optimizer.init(params), aux=aux_template
        )

    def restore_state(
        self, manager: CheckpointManager, step: int = -1
    ) -> TrainState:
        """Rebuild a TrainState from a checkpoint without example data: first
        a raw (structure-free) restore yields params and the aux template,
        then a structured restore fills the re-initialized optimizer state."""
        step = step if step is not None else -1
        raw = manager.restore(step)
        params = raw["params"]
        target = self.make_state_target(params, aux_template=raw.get("aux"))
        return manager.restore(step, target=target)
