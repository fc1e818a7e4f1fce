"""Cross-entropy-method action optimizer for eval-time planning
(reference: modules/cem/cem.py:10-104 — the reference's q2_value defect,
computing both values from q1, is NOT replicated).

Fully jitted: the CEM refinement loop is a lax.scan over iterations; the
critic is evaluated on the whole population in one batch.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

__all__ = ["cem_optimize"]


@functools.partial(
    jax.jit,
    static_argnames=(
        "q_fn",
        "num_iterations",
        "population_size",
        "num_elites",
        "discrete_gripper",
    ),
)
def cem_optimize(
    key: Array,
    q_fn: Callable[[Array], Array],
    initial_mean: Array,
    num_iterations: int = 3,
    population_size: int = 64,
    num_elites: int = 8,
    init_std: float = 0.3,
    discrete_gripper: bool = False,
) -> Array:
    """Maximize min(Q1, Q2) (folded into q_fn) over actions in [-1, 1]^A.

    initial_mean: (B, A) deterministic policy action used as the CEM seed.
    q_fn: (B * population_size, A) -> (B * population_size, 1) values.
    Returns the refined (B, A) action mean."""
    b, a = initial_mean.shape

    def body(carry, it_key):
        mean, std = carry
        eps = jax.random.normal(it_key, (population_size, b, a))
        population = jnp.clip(mean[None] + std[None] * eps, -1.0, 1.0)
        if discrete_gripper:
            population = population.at[..., -1].set(
                jnp.where(population[..., -1] >= 0, 1.0, -1.0)
            )
        values = q_fn(population.reshape(population_size * b, a))
        values = values.reshape(population_size, b)
        elite_idx = jax.lax.top_k(values.T, num_elites)[1]  # (B, k)
        elites = jnp.take_along_axis(
            jnp.moveaxis(population, 0, 1), elite_idx[..., None], axis=1
        )  # (B, k, A)
        new_mean = elites.mean(axis=1)
        new_std = elites.std(axis=1) + 1e-6
        return (new_mean, new_std), None

    keys = jax.random.split(key, num_iterations)
    init = (initial_mean, jnp.full_like(initial_mean, init_std))
    (mean, _), _ = jax.lax.scan(body, init, keys)
    if discrete_gripper:
        mean = mean.at[..., -1].set(jnp.where(mean[..., -1] >= 0, 1.0, -1.0))
    return jnp.clip(mean, -1.0, 1.0)
