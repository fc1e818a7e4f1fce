"""Per-group optimizer bundle.

The reference steps five-to-six Adam optimizers manually per batch
(cql_offline_lightning.py:553-574, compute_update:470-542). Here every group
(actor / q1 / q2 / alpha / alpha_prime / ...) owns an optax transform keyed by
a top-level entry of the params tree; the whole multi-optimizer update runs
inside one jitted step.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple


import optax

__all__ = ["GroupOptimizer"]


class GroupOptimizer:
    def __init__(self, groups: Dict[str, optax.GradientTransformation]):
        self.groups = dict(groups)

    def init(self, params: Dict[str, Any]) -> Dict[str, Any]:
        return {
            name: tx.init(params[name]) for name, tx in self.groups.items()
        }

    def update_group(
        self,
        name: str,
        grads: Any,
        opt_state: Dict[str, Any],
        params: Dict[str, Any],
    ) -> Tuple[Any, Dict[str, Any]]:
        """Apply one group's update; returns (new_group_params, new_opt_state
        dict). ``grads`` is the gradient of that group's sub-tree only."""
        updates, new_state = self.groups[name].update(
            grads, opt_state[name], params[name]
        )
        new_params = optax.apply_updates(params[name], updates)
        new_opt_state = dict(opt_state)
        new_opt_state[name] = new_state
        return new_params, new_opt_state
