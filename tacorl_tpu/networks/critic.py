"""Q-networks: Q(s ⊕ g ⊕ a) -> scalar over MLP / D2RL / DenseNet trunks
(reference: networks/actor_critic/critic.py:9-127)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from tacorl_tpu.networks.layers import TorchDense, get_activation

__all__ = ["Critic", "MLPQNetwork", "D2RLQNetwork", "DenseNetQNetwork"]


class MLPQNetwork(nn.Module):
    hidden_dim: int = 256
    num_layers: int = 2
    last_layer_activation: str = "Identity"
    init_w: float = 1e-3
    with_dropout: bool = False
    dropout_p: float = 0.3

    def _trunk(self, x: Array) -> Array:
        for i in range(self.num_layers):
            x = jax.nn.silu(TorchDense(self.hidden_dim, name=f"fc{i}")(x))
        return x

    @nn.compact
    def __call__(self, q_input: Array, *, train: bool = False) -> Array:
        x = self._trunk(q_input)
        if self.with_dropout:
            # MC-dropout stays ACTIVE at eval for the uncertainty-gated
            # horizon curriculum (increase_horizon_uncertainty.py:40-70);
            # callers disable it by constructing with with_dropout=False.
            x = nn.Dropout(self.dropout_p, deterministic=False)(x)
        out = TorchDense(1, init_w=self.init_w, name="out")(x)
        return get_activation(self.last_layer_activation)(out)


class D2RLQNetwork(MLPQNetwork):
    def _trunk(self, x: Array) -> Array:
        inp = x
        x = jax.nn.silu(TorchDense(self.hidden_dim, name="fc0")(x))
        for i in range(1, self.num_layers):
            x = jnp.concatenate([x, inp], axis=-1)
            x = jax.nn.silu(TorchDense(self.hidden_dim, name=f"fc{i}")(x))
        return x


class DenseNetQNetwork(MLPQNetwork):
    def _trunk(self, x: Array) -> Array:
        for i in range(self.num_layers):
            h = jax.nn.silu(TorchDense(self.hidden_dim, name=f"fc{i}")(x))
            x = jnp.concatenate([x, h], axis=-1)
        return x


class Critic(nn.Module):
    """Concatenate (obs_emb, action) and evaluate the Q trunk
    (critic.py:9-30)."""

    q_network: nn.Module
    state_dim: int = 0
    goal_dim: int = 0
    action_dim: int = 0

    @nn.compact
    def __call__(self, obs_emb: Array, action: Array, *, train: bool = False):
        if action.ndim == 2 and action.shape[0] == 1 and obs_emb.ndim == 1:
            obs_emb = obs_emb[None]
        q_input = jnp.concatenate([obs_emb, action], axis=-1)
        return self.q_network(q_input, train=train)
