"""Dict-of-modalities observation pytree utilities.

The disciplined replacement for the reference's ad-hoc dict/list reshaping
(utils/misc.py:36-153): observations are nested dicts of arrays; every helper
here is a pure pytree transform usable inside jit.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

__all__ = [
    "batch_size_of",
    "expand_obs",
    "flatten_obs_time",
    "unflatten_obs_time",
    "index_obs",
    "obs_map",
]


def _first_leaf(obs: Any):
    return jax.tree.leaves(obs)[0]


def batch_size_of(obs: Any) -> int:
    """Leading-axis size of an obs pytree (utils/networks.py:18-29)."""
    return _first_leaf(obs).shape[0]


def expand_obs(obs: Any, n: int, reshape: bool = True) -> Any:
    """Tile each leaf n times along a new leading axis; optionally flatten to
    (n * bs, ...). Mirrors reference expand_obs (utils/misc.py:132-153) used
    by the CQL conservative term."""

    def _expand(x):
        out = jnp.broadcast_to(x[None], (n,) + x.shape)
        if reshape:
            return out.reshape((n * x.shape[0],) + x.shape[1:])
        return out

    return jax.tree.map(_expand, obs)


def flatten_obs_time(obs: Any) -> Any:
    """(B, T, ...) -> (B*T, ...) on every leaf."""
    return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), obs)


def unflatten_obs_time(obs: Any, batch: int, time: int) -> Any:
    return jax.tree.map(lambda x: x.reshape((batch, time) + x.shape[1:]), obs)


def index_obs(obs: Any, idx) -> Any:
    """Index every leaf along the leading axis (or any numpy-style index)."""
    return jax.tree.map(lambda x: x[idx], obs)


def obs_map(fn, obs: Dict) -> Dict:
    return jax.tree.map(fn, obs)
