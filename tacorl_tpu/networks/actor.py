"""Policy networks: TanhNormal actor with optional discrete (Gumbel-softmax)
gripper, over MLP / D2RL / DenseNet trunks
(reference: networks/actor_critic/actor.py:18-322).

The actor is a flax module returning distribution parameters; sampling takes
explicit PRNG keys (``reparameterize`` selects gradient flow via
stop_gradient, the JAX analogue of torch sample vs rsample).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from tacorl_tpu.core.distributions import (
    TanhNormal,
    gumbel_softmax_log_prob,
    gumbel_softmax_rsample,
    gumbel_softmax_sample,
)
from tacorl_tpu.networks.layers import TorchDense

LOG_SIG_MAX = 2.0
LOG_SIG_MIN = -5.0
MEAN_MIN = -9.0
MEAN_MAX = 9.0

__all__ = ["Actor", "MLPPolicy", "D2RLPolicy", "DenseNetPolicy"]


class MLPPolicy(nn.Module):
    """Plain MLP trunk, silu activations; clamped mean/log_std heads with
    small last-layer init (actor.py:217-270)."""

    action_dim: int
    num_layers: int = 2
    hidden_dim: int = 256
    init_w: float = 1e-3
    discrete_gripper: bool = False

    def _trunk(self, x: Array) -> Array:
        for i in range(self.num_layers):
            x = jax.nn.silu(TorchDense(self.hidden_dim, name=f"fc{i}")(x))
        return x

    @nn.compact
    def __call__(self, x: Array):
        x = self._trunk(x)
        cont_dim = self.action_dim - (1 if self.discrete_gripper else 0)
        mean = TorchDense(cont_dim, init_w=self.init_w, name="fc_mean")(x)
        mean = jnp.clip(mean, MEAN_MIN, MEAN_MAX)
        log_std = TorchDense(cont_dim, init_w=self.init_w, name="fc_log_std")(x)
        log_std = jnp.clip(log_std, LOG_SIG_MIN, LOG_SIG_MAX)
        std = jnp.exp(log_std)
        if self.discrete_gripper:
            grip = TorchDense(2, init_w=self.init_w, name="gripper_action")(x)
            return mean, std, grip
        return mean, std


class D2RLPolicy(MLPPolicy):
    """Input-skip trunk: each hidden layer sees [h, input]
    (actor.py:159-214)."""

    def _trunk(self, x: Array) -> Array:
        inp = x
        x = jax.nn.silu(TorchDense(self.hidden_dim, name="fc0")(x))
        for i in range(1, self.num_layers):
            x = jnp.concatenate([x, inp], axis=-1)
            x = jax.nn.silu(TorchDense(self.hidden_dim, name=f"fc{i}")(x))
        return x


class DenseNetPolicy(MLPPolicy):
    """Dense concatenation trunk (actor.py:273-322). Note the reference
    DenseNet variant has no discrete-gripper head; we keep it available."""

    def _trunk(self, x: Array) -> Array:
        for i in range(self.num_layers):
            h = jax.nn.silu(TorchDense(self.hidden_dim, name=f"fc{i}")(x))
            x = jnp.concatenate([x, h], axis=-1)
        return x


class Actor(nn.Module):
    """Distribution-producing policy head over a trunk module
    (actor.py:18-156). All sampling entry points take explicit keys."""

    policy: nn.Module
    action_dim: int
    state_dim: int = 0
    goal_dim: int = 0
    discrete_gripper: bool = False
    gumbel_temperature: float = 0.5

    def _forward(self, state_emb: Array, goal_emb: Optional[Array] = None):
        x = (
            jnp.concatenate([state_emb, goal_emb], axis=-1)
            if goal_emb is not None
            else state_emb
        )
        return self.policy(x)

    def __call__(self, state_emb: Array, goal_emb: Optional[Array] = None):
        return self._forward(state_emb, goal_emb)

    def get_dist(
        self, state_emb: Array, goal_emb: Optional[Array] = None
    ) -> TanhNormal:
        out = self._forward(state_emb, goal_emb)
        mean, std = out[0], out[1]
        return TanhNormal(mean, std)

    def get_actions(
        self,
        obs_emb: Array,
        key: Optional[Array] = None,
        deterministic: bool = False,
        reparameterize: bool = False,
    ) -> Tuple[Array, Array]:
        """Returns (actions, log_pi). Matches reference get_actions
        (actor.py:65-111) incl. the discrete-gripper composition."""
        out = self._forward(obs_emb)
        if self.discrete_gripper:
            mean, std, grip_logits = out
            if deterministic:
                actions = jnp.tanh(mean)
                grip = jnp.argmax(grip_logits, axis=-1)[..., None] * 2.0 - 1.0
                actions = jnp.concatenate([actions, grip], axis=-1)
                return actions, jnp.zeros_like(actions)
            k1, k2 = jax.random.split(key)
            dist = TanhNormal(mean, std)
            if reparameterize:
                actions, log_pi = dist.sample_and_log_prob(k1)
                grip_onehot = gumbel_softmax_rsample(
                    k2, grip_logits, self.gumbel_temperature, hard=True
                )
                grip_idx = jnp.argmax(grip_onehot, axis=-1)
            else:
                value, z = dist.sample_with_pretanh(k1)
                actions = jax.lax.stop_gradient(value)
                log_pi = dist.log_prob(
                    actions, jax.lax.stop_gradient(z)
                )
                grip_idx = gumbel_softmax_sample(k2, grip_logits)
            grip_log_pi = gumbel_softmax_log_prob(grip_logits, grip_idx)
            log_pi = log_pi + grip_log_pi
            grip_action = grip_idx[..., None].astype(actions.dtype) * 2.0 - 1.0
            actions = jnp.concatenate([actions, grip_action], axis=-1)
            return actions, log_pi
        mean, std = out
        if deterministic:
            actions = jnp.tanh(mean)
            return actions, jnp.zeros_like(actions)
        dist = TanhNormal(mean, std)
        if reparameterize:
            return dist.sample_and_log_prob(key)
        value, z = dist.sample_with_pretanh(key)
        actions = jax.lax.stop_gradient(value)
        return actions, dist.log_prob(actions, jax.lax.stop_gradient(z))

    def sample_n_with_log_prob(
        self, obs_emb: Array, key: Array, n_actions: int
    ) -> Tuple[Array, Array]:
        """(n, bs, action_dim), (n, bs, 1) — reference actor.py:113-138."""
        out = self._forward(obs_emb)
        if self.discrete_gripper:
            mean, std, grip_logits = out
            k1, k2 = jax.random.split(key)
            dist = TanhNormal(mean, std)
            actions, z = dist.sample_with_pretanh(k1, (n_actions,))
            log_pi = dist.log_prob(actions, z)
            grip_idx = gumbel_softmax_sample(
                k2, jnp.broadcast_to(grip_logits, (n_actions,) + grip_logits.shape)
            )
            grip_log_pi = gumbel_softmax_log_prob(grip_logits, grip_idx)
            grip_action = grip_idx[..., None].astype(actions.dtype) * 2.0 - 1.0
            actions = jnp.concatenate([actions, grip_action], axis=-1)
            return actions, log_pi + grip_log_pi
        mean, std = out
        dist = TanhNormal(mean, std)
        actions, z = dist.sample_with_pretanh(key, (n_actions,))
        return actions, dist.log_prob(actions, z)

    def log_prob(self, obs_emb: Array, actions: Array) -> Array:
        """Log-density of given actions (BC warm-start path, actor.py:140-156).
        """
        out = self._forward(obs_emb)
        if self.discrete_gripper:
            mean, std, grip_logits = out
            cont = actions[..., :-1]
            log_pi = TanhNormal(mean, std).log_prob(cont)
            grip_value = actions[..., -1] / 2.0 + 0.5
            log_pi = log_pi + gumbel_softmax_log_prob(grip_logits, grip_value)
            return log_pi
        mean, std = out
        return TanhNormal(mean, std).log_prob(actions)
