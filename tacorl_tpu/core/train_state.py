"""Generic train-state pytree used by all algorithm modules."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

__all__ = ["TrainState"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """step + params + optimizer state (+ optional auxiliary pytrees such as
    target-network params or learnable temperature states)."""

    step: jax.Array
    params: Any
    opt_state: Any
    aux: Optional[Any] = None

    @classmethod
    def create(cls, params: Any, opt_state: Any, aux: Any = None) -> "TrainState":
        return cls(
            step=jnp.zeros((), dtype=jnp.int32),
            params=params,
            opt_state=opt_state,
            aux=aux,
        )
