"""Action decoders: RNN over [latent_plan; perceptual_emb; (goal)] with a
discretized-logistic-mixture head (+ discrete gripper CE) or a Gaussian MDN
head (reference: networks/action_decoders/action_decoder_logistic.py:21-300,
action_decoder_gaussian.py:20-202, rnn_models.py:5-54).

TPU design: the window RNN runs as a lax.scan over time (one fused step per
frame); the streaming rollout path carries explicit RNN state through the
jitted act function (no module-held hidden_state — the reference's stateful
``self.hidden_state`` :96-100 becomes an explicit carry pytree).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from tacorl_tpu.core.distributions import (
    DiagNormal,
    logistic_mixture_log_prob,
    logistic_mixture_sample,
)
from tacorl_tpu.networks.layers import TorchDense, get_activation

LOG_SIG_MIN = -5.0
LOG_SIG_MAX = 2.0

__all__ = ["StackedRNN", "ActionDecoderLogistic", "ActionDecoderGaussian"]


def _torch_rnn_init(hidden_size: int):
    bound = 1.0 / math.sqrt(hidden_size)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class _RecurrentKernel(nn.Module):
    """Bare (H, H) kernel scoped so the param tree reads ``<name>/kernel`` —
    layout-compatible with flax SimpleCell's ``h`` Dense."""

    features: int

    @nn.compact
    def __call__(self) -> Array:
        return self.param(
            "kernel", _torch_rnn_init(self.features),
            (self.features, self.features),
        )


class _HoistedSimpleRNNLayer(nn.Module):
    """ReLU RNN layer with the input projection hoisted out of the time scan.

    ``z = x @ W_i + b`` for the whole (B, T) window runs as ONE large
    MXU-friendly matmul; the sequential lax.scan then carries only the
    (B, H) @ (H, H) recurrence — half the scan-chain FLOPs of the naive
    per-step cell (the cuDNN RNN trick, TPU-sized). Param tree is identical
    to nn.RNN(nn.SimpleCell): ``{i: {kernel, bias}, h: {kernel}}``, so
    checkpoints and the torch converter are unaffected."""

    features: int
    unroll: int = 8
    # bf16 matmuls with f32 accumulation and an f32 carry: MXU-native speed
    # for the 2048x2048 recurrence without recurrent-precision decay. Off by
    # default (torch-parity tests compare at 1e-5); production TPU configs
    # enable it.
    bf16_matmul: bool = False

    @nn.compact
    def __call__(self, x: Array, h0: Array) -> Tuple[Array, Array]:
        init = _torch_rnn_init(self.features)
        z = nn.Dense(
            self.features, kernel_init=init, bias_init=init, name="i",
            dtype=jnp.bfloat16 if self.bf16_matmul else None,
        )(x).astype(jnp.float32)
        wh = _RecurrentKernel(self.features, name="h")()
        if self.bf16_matmul:
            wh = wh.astype(jnp.bfloat16)

            def step(h, z_t):
                hh = jax.lax.dot(
                    h.astype(jnp.bfloat16), wh,
                    preferred_element_type=jnp.float32,
                )
                h_new = jax.nn.relu(z_t + hh)
                return h_new, h_new

        else:

            def step(h, z_t):
                h_new = jax.nn.relu(z_t + h @ wh)
                return h_new, h_new

        h_final, ys = jax.lax.scan(
            step, h0.astype(jnp.float32), z.swapaxes(0, 1), unroll=self.unroll
        )
        return ys.swapaxes(0, 1), h_final


class StackedRNN(nn.Module):
    """num_layers-deep unidirectional RNN/GRU/LSTM (or an MLP stand-in) over
    (B, T, D); returns (outputs, carry). ``carry`` is a tuple of per-layer
    cell carries, usable for streaming single-step decoding."""

    rnn_type: str  # "rnn" | "gru" | "lstm" | "mlp"
    hidden_size: int
    num_layers: int = 2
    dropout: float = 0.0
    # unroll the time scan so XLA can pipeline the small sequential matmuls
    # (play windows are 8-32 steps; full unroll is cheap to compile)
    unroll: int = 8
    # mixed-precision recurrence (see _HoistedSimpleRNNLayer); "rnn" only
    bf16_matmul: bool = False
    # hoist the input projection out of the scan ("rnn" only); param-tree
    # compatible either way, so this is a pure execution-strategy knob
    hoisted: bool = True

    def _make_cell(self, idx: int) -> nn.Module:
        init = _torch_rnn_init(self.hidden_size)
        kwargs = dict(
            features=self.hidden_size,
            kernel_init=init,
            recurrent_kernel_init=init,
            bias_init=init,
            name=f"cell{idx}",
        )
        if self.rnn_type == "rnn":
            return nn.SimpleCell(activation_fn=jax.nn.relu, **kwargs)
        if self.rnn_type == "gru":
            return nn.GRUCell(**kwargs)
        if self.rnn_type == "lstm":
            return nn.OptimizedLSTMCell(**kwargs)
        raise ValueError(f"unknown rnn_type {self.rnn_type!r}")

    @nn.compact
    def __call__(
        self,
        x: Array,
        carry: Optional[Tuple[Any, ...]] = None,
        *,
        train: bool = False,
    ) -> Tuple[Array, Tuple[Any, ...]]:
        if self.rnn_type == "mlp":
            # rnn_models.mlp_decoder: 3 Linear+ReLU layers, stateless
            act = get_activation("ReLU")
            h = act(TorchDense(self.hidden_size, name="mlp0")(x))
            h = act(TorchDense(self.hidden_size, name="mlp1")(h))
            h = TorchDense(self.hidden_size, name="mlp2")(h)
            return h, ()
        new_carries = []
        h = x
        for i in range(self.num_layers):
            if self.rnn_type == "rnn" and self.hoisted:
                # hoisted fast path, param-compatible with nn.RNN(SimpleCell)
                h0 = (
                    carry[i]
                    if carry is not None
                    else jnp.zeros(
                        h.shape[:1] + (self.hidden_size,), dtype=h.dtype
                    )
                )
                h, final_carry = _HoistedSimpleRNNLayer(
                    self.hidden_size, unroll=self.unroll,
                    bf16_matmul=self.bf16_matmul, name=f"cell{i}",
                )(h, h0)
            else:
                cell = self._make_cell(i)
                init_carry = (
                    carry[i]
                    if carry is not None
                    else cell.initialize_carry(
                        jax.random.key(0), h.shape[:1] + h.shape[2:]
                    )
                )
                final_carry, h = nn.RNN(
                    cell, return_carry=True, unroll=self.unroll, name=f"rnn{i}"
                )(h, initial_carry=init_carry)
            new_carries.append(final_carry)
            if self.dropout > 0.0 and i < self.num_layers - 1:
                h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return h, tuple(new_carries)


def _setup_action_bounds(
    act_max_bound: Sequence[float],
    act_min_bound: Sequence[float],
    discrete_gripper: bool,
):
    """Returns (cont_min (A,1), cont_max (A,1), gripper_bounds (2,) | None),
    mirroring action_decoder_logistic.py:140-182."""
    if discrete_gripper:
        gripper = jnp.asarray(
            [act_min_bound[-1], act_max_bound[-1]], dtype=jnp.float32
        )
        act_max_bound = act_max_bound[:-1]
        act_min_bound = act_min_bound[:-1]
    else:
        gripper = None
    lo = jnp.asarray(act_min_bound, dtype=jnp.float32)[:, None]
    hi = jnp.asarray(act_max_bound, dtype=jnp.float32)[:, None]
    return lo, hi, gripper


class ActionDecoderLogistic(nn.Module):
    """Logistic-mixture action decoder (action_decoder_logistic.py:21-300)."""

    state_dim: int = 32
    goal_dim: int = 32
    latent_plan_dim: int = 16
    hidden_size: int = 256
    out_features: int = 7
    act_max_bound: Sequence[float] = (1.0,) * 7
    act_min_bound: Sequence[float] = (-1.0,) * 7
    gripper_alpha: float = 1.0
    policy_rnn_dropout_p: float = 0.0
    num_layers: int = 2
    rnn_model: str = "rnn_decoder"
    discrete_gripper: bool = True
    include_goal: bool = False
    num_classes: int = 10
    n_mixtures: int = 10
    bf16_matmul: bool = False  # mixed-precision RNN recurrence (TPU configs)
    hoisted_rnn: bool = True  # hoist input projections out of the time scan
    rnn_unroll: int = 8  # time-scan unroll factor (full window = 16)

    @property
    def cont_features(self) -> int:
        return self.out_features - (1 if self.discrete_gripper else 0)

    def setup(self):
        rnn_type = self.rnn_model.replace("_decoder", "")
        self.rnn = StackedRNN(
            rnn_type, self.hidden_size, self.num_layers,
            self.policy_rnn_dropout_p, unroll=self.rnn_unroll,
            bf16_matmul=self.bf16_matmul, hoisted=self.hoisted_rnn,
        )
        n_out = self.cont_features * self.n_mixtures
        self.mean_fc = TorchDense(n_out)
        self.log_scale_fc = TorchDense(n_out)
        self.prob_fc = TorchDense(n_out)
        if self.discrete_gripper:
            self.gripper_fc = TorchDense(2)
        lo, hi, grip = _setup_action_bounds(
            list(self.act_max_bound), list(self.act_min_bound),
            self.discrete_gripper,
        )
        self.action_min_bound = lo
        self.action_max_bound = hi
        self.gripper_bounds = grip

    def __call__(
        self,
        latent_plan: Array,
        perceptual_emb: Array,
        latent_goal: Optional[Array] = None,
        carry: Optional[Tuple] = None,
        *,
        train: bool = False,
    ):
        """Returns (logit_probs, log_scales, means, gripper_logits, carry);
        mixture params are (B, T, A, K)."""
        b, s = perceptual_emb.shape[:2]
        plan = jnp.broadcast_to(
            latent_plan[:, None], (b, s, latent_plan.shape[-1])
        )
        x = jnp.concatenate([plan, perceptual_emb], axis=-1)
        if self.include_goal:
            goal = jnp.broadcast_to(
                latent_goal[:, None], (b, s, latent_goal.shape[-1])
            )
            x = jnp.concatenate([x, goal], axis=-1)
        h, carry = self.rnn(x, carry, train=train)
        shape = (b, s, self.cont_features, self.n_mixtures)
        logit_probs = self.prob_fc(h).reshape(shape)
        means = self.mean_fc(h).reshape(shape)
        log_scales = jnp.clip(self.log_scale_fc(h), min=LOG_SIG_MIN).reshape(shape)
        gripper_logits = self.gripper_fc(h) if self.discrete_gripper else None
        return logit_probs, log_scales, means, gripper_logits, carry

    # -- losses ---------------------------------------------------------

    def _logistic_loss(self, logit_probs, log_scales, means, actions) -> Array:
        lp = logistic_mixture_log_prob(
            actions,
            logit_probs,
            means,
            log_scales,
            self.action_min_bound,
            self.action_max_bound,
            self.num_classes,
            LOG_SIG_MIN,
        )
        return -jnp.sum(lp, axis=-1).mean()

    def _loss(self, logit_probs, log_scales, means, gripper_logits, actions):
        if self.discrete_gripper:
            logistics_loss = self._logistic_loss(
                logit_probs, log_scales, means, actions[..., :-1]
            )
            gripper_gt = (actions[..., -1] > 0).astype(jnp.int32)  # -1 -> 0
            ce = -jnp.take_along_axis(
                jax.nn.log_softmax(gripper_logits, axis=-1),
                gripper_gt[..., None],
                axis=-1,
            ).mean()
            return logistics_loss + self.gripper_alpha * ce
        return self._logistic_loss(logit_probs, log_scales, means, actions)

    def loss(
        self,
        latent_plan: Array,
        perceptual_emb: Array,
        actions: Array,
        latent_goal: Optional[Array] = None,
        *,
        train: bool = False,
    ) -> Array:
        out = self(latent_plan, perceptual_emb, latent_goal, train=train)
        return self._loss(out[0], out[1], out[2], out[3], actions)

    def loss_and_act(
        self,
        key: Array,
        latent_plan: Array,
        perceptual_emb: Array,
        actions: Array,
        latent_goal: Optional[Array] = None,
        *,
        train: bool = False,
    ) -> Tuple[Array, Array]:
        logit_probs, log_scales, means, gripper_logits, _ = self(
            latent_plan, perceptual_emb, latent_goal, train=train
        )
        pred = self._sample(key, logit_probs, log_scales, means, gripper_logits)
        loss = self._loss(logit_probs, log_scales, means, gripper_logits, actions)
        return loss, pred

    def act(
        self,
        key: Array,
        latent_plan: Array,
        perceptual_emb: Array,
        latent_goal: Optional[Array] = None,
        carry: Optional[Tuple] = None,
    ) -> Tuple[Array, Tuple]:
        """Streaming action sampling with explicit RNN carry."""
        logit_probs, log_scales, means, gripper_logits, carry = self(
            latent_plan, perceptual_emb, latent_goal, carry
        )
        pred = self._sample(key, logit_probs, log_scales, means, gripper_logits)
        return pred, carry

    def _sample(self, key, logit_probs, log_scales, means, gripper_logits):
        actions = logistic_mixture_sample(key, logit_probs, means, log_scales)
        if self.discrete_gripper:
            grip = self.gripper_bounds[jnp.argmax(gripper_logits, axis=-1)]
            return jnp.concatenate([actions, grip[..., None]], axis=-1)
        return actions


class ActionDecoderGaussian(nn.Module):
    """Gaussian MDN decoder head (action_decoder_gaussian.py:20-202)."""

    state_dim: int = 32
    goal_dim: int = 32
    latent_plan_dim: int = 16
    hidden_size: int = 256
    out_features: int = 7
    policy_rnn_dropout_p: float = 0.0
    num_layers: int = 2
    rnn_model: str = "lstm_decoder"
    n_mixtures: int = 10
    include_goal: bool = False
    discrete_gripper: bool = False  # capability parity: MDN head has none

    def setup(self):
        rnn_type = self.rnn_model.replace("_decoder", "")
        self.rnn = StackedRNN(
            rnn_type, self.hidden_size, self.num_layers, self.policy_rnn_dropout_p
        )
        self.pi_fc = TorchDense(self.n_mixtures)
        self.log_var_fc = TorchDense(self.out_features * self.n_mixtures)
        self.mu_fc = TorchDense(self.out_features * self.n_mixtures)

    def __call__(
        self,
        latent_plan: Array,
        perceptual_emb: Array,
        latent_goal: Optional[Array] = None,
        carry: Optional[Tuple] = None,
        *,
        train: bool = False,
    ):
        """Returns (log_pi (B,T,K), sigma (B,T,K,O), mu (B,T,K,O), carry)."""
        b, s = perceptual_emb.shape[:2]
        plan = jnp.broadcast_to(latent_plan[:, None], (b, s, latent_plan.shape[-1]))
        parts = [plan, perceptual_emb]
        if self.include_goal and latent_goal is not None:
            parts.append(
                jnp.broadcast_to(latent_goal[:, None], (b, s, latent_goal.shape[-1]))
            )
        x = jnp.concatenate(parts, axis=-1)
        h, carry = self.rnn(x, carry, train=train)
        log_pi = jax.nn.log_softmax(self.pi_fc(h), axis=-1)
        shape = (b, s, self.n_mixtures, self.out_features)
        sigma = jnp.exp(
            jnp.clip(self.log_var_fc(h), LOG_SIG_MIN, LOG_SIG_MAX)
        ).reshape(shape)
        mu = self.mu_fc(h).reshape(shape)
        return log_pi, sigma, mu, carry

    def _mixture_log_prob(self, log_pi, sigma, mu, target) -> Array:
        comp_lp = DiagNormal(mu, sigma).log_prob(target[..., None, :])  # B,T,K
        return jax.scipy.special.logsumexp(log_pi + comp_lp, axis=-1)

    def loss(
        self,
        latent_plan: Array,
        perceptual_emb: Array,
        actions: Array,
        latent_goal: Optional[Array] = None,
        *,
        train: bool = False,
    ) -> Array:
        log_pi, sigma, mu, _ = self(
            latent_plan, perceptual_emb, latent_goal, train=train
        )
        return -self._mixture_log_prob(log_pi, sigma, mu, actions).mean()

    def loss_and_act(
        self,
        key: Array,
        latent_plan: Array,
        perceptual_emb: Array,
        actions: Array,
        latent_goal: Optional[Array] = None,
        *,
        train: bool = False,
    ) -> Tuple[Array, Array]:
        log_pi, sigma, mu, _ = self(
            latent_plan, perceptual_emb, latent_goal, train=train
        )
        loss = -self._mixture_log_prob(log_pi, sigma, mu, actions).mean()
        return loss, self._sample(key, log_pi, sigma, mu)

    def act(
        self,
        key: Array,
        latent_plan: Array,
        perceptual_emb: Array,
        latent_goal: Optional[Array] = None,
        carry: Optional[Tuple] = None,
    ) -> Tuple[Array, Tuple]:
        log_pi, sigma, mu, carry = self(latent_plan, perceptual_emb, latent_goal, carry)
        return self._sample(key, log_pi, sigma, mu), carry

    def _sample(self, key, log_pi, sigma, mu) -> Array:
        k1, k2 = jax.random.split(key)
        comp = jax.random.categorical(k1, log_pi, axis=-1)  # B,T
        onehot = jax.nn.one_hot(comp, log_pi.shape[-1])[..., None]  # B,T,K,1
        sel_mu = jnp.sum(mu * onehot, axis=-2)
        sel_sigma = jnp.sum(sigma * onehot, axis=-2)
        eps = jax.random.normal(k2, sel_mu.shape, dtype=sel_mu.dtype)
        return sel_mu + sel_sigma * eps
