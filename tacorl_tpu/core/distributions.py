"""Probability distributions used across the framework, as pure functions /
pytree dataclasses over explicit PRNG keys.

Capability parity with the reference's distribution toolkit
(reference: src/tacorl/utils/distributions.py:15-153,
networks/action_decoders/action_decoder_logistic.py:184-266), re-derived in
numerically-stable logspace and written JAX-first (no mutable state, explicit
keys, fully jit/vmap-compatible).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

__all__ = [
    "DiagNormal",
    "TanhNormal",
    "kl_diag_normal",
    "balanced_kl",
    "gumbel_softmax_rsample",
    "gumbel_softmax_sample",
    "gumbel_softmax_log_prob",
    "logistic_mixture_log_prob",
    "logistic_mixture_sample",
]

_LOG2 = math.log(2.0)


def _atanh_clipped(x: Array, eps: float = 1e-6) -> Array:
    """atanh with the reference's clamping semantics (utils/misc.py:297-300):
    0.5 * log((1+x)/(1-x)) with both terms clamped to >= eps."""
    one_plus = jnp.clip(1.0 + x, min=eps)
    one_minus = jnp.clip(1.0 - x, min=eps)
    return 0.5 * jnp.log(one_plus / one_minus)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiagNormal:
    """Independent Normal over the last axis (event dim = last axis)."""

    mean: Array
    std: Array

    def log_prob(self, value: Array) -> Array:
        var = jnp.square(self.std)
        lp = -0.5 * (
            jnp.square(value - self.mean) / var
            + 2.0 * jnp.log(self.std)
            + math.log(2.0 * math.pi)
        )
        return jnp.sum(lp, axis=-1)

    def sample(self, key: Array, sample_shape: Tuple[int, ...] = ()) -> Array:
        shape = sample_shape + self.mean.shape
        eps = jax.random.normal(key, shape, dtype=self.mean.dtype)
        return self.mean + self.std * eps

    @property
    def mode(self) -> Array:
        return self.mean


def kl_diag_normal(p: DiagNormal, q: DiagNormal) -> Array:
    """KL(p || q) for independent diagonal normals; sums over the last axis."""
    var_p = jnp.square(p.std)
    var_q = jnp.square(q.std)
    kl = 0.5 * (
        var_p / var_q
        + jnp.square(q.mean - p.mean) / var_q
        - 1.0
        + jnp.log(var_q)
        - jnp.log(var_p)
    )
    return jnp.sum(kl, axis=-1)


def balanced_kl(
    posterior: "DiagNormal", prior: "DiagNormal", alpha: float = 0.8
) -> Array:
    """KL balancing (reference: play_lmp_for_rl.py:273-283):
    alpha * KL(sg(posterior) || prior) + (1-alpha) * KL(posterior || sg(prior)).

    Returns the per-example KL (mean is taken by the caller)."""
    sg = jax.lax.stop_gradient
    post_sg = DiagNormal(sg(posterior.mean), sg(posterior.std))
    prior_sg = DiagNormal(sg(prior.mean), sg(prior.std))
    return alpha * kl_diag_normal(post_sg, prior) + (1.0 - alpha) * kl_diag_normal(
        posterior, prior_sg
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TanhNormal:
    """X = tanh(Z), Z ~ N(mean, std); event dim = last axis.

    log_prob uses the stable tanh-bijector correction
    -2 * (log 2 - z - softplus(-2z)) per dim (equivalent to
    -log(1 - tanh(z)^2)); matches reference utils/distributions.py:86-96
    including the returned trailing singleton axis.
    """

    mean: Array  # pre-tanh mean
    std: Array

    @property
    def normal(self) -> DiagNormal:
        return DiagNormal(self.mean, self.std)

    @property
    def mode(self) -> Array:
        return jnp.tanh(self.mean)

    @property
    def stddev(self) -> Array:
        return self.std

    def sample_with_pretanh(
        self, key: Array, sample_shape: Tuple[int, ...] = ()
    ) -> Tuple[Array, Array]:
        z = self.normal.sample(key, sample_shape)
        return jnp.tanh(z), z

    def sample(self, key: Array, sample_shape: Tuple[int, ...] = ()) -> Array:
        return self.sample_with_pretanh(key, sample_shape)[0]

    def log_prob(self, value: Array, pre_tanh_value: Optional[Array] = None) -> Array:
        """Returns shape (..., 1) like the reference (keepdim semantics)."""
        if pre_tanh_value is None:
            value = jnp.clip(value, -0.999, 0.999)
            pre_tanh_value = _atanh_clipped(value)
        base = self.normal.log_prob(pre_tanh_value)
        correction = -2.0 * jnp.sum(
            _LOG2 - pre_tanh_value - jax.nn.softplus(-2.0 * pre_tanh_value), axis=-1
        )
        return (base + correction)[..., None]

    def sample_and_log_prob(self, key: Array) -> Tuple[Array, Array]:
        value, z = self.sample_with_pretanh(key)
        return value, self.log_prob(value, z)

    def sample_n_with_log_prob(self, key: Array, n: int) -> Tuple[Array, Array]:
        """Returns ((n, ..., d) actions, (n, ..., 1) log-probs)."""
        value, z = self.sample_with_pretanh(key, (n,))
        return value, self.log_prob(value, z)


# ---------------------------------------------------------------------------
# Gumbel softmax (relaxed one-hot categorical)
# ---------------------------------------------------------------------------


def _uniform_open(key: Array, shape, dtype=jnp.float32) -> Array:
    """Uniform on the open interval (eps, 1-eps) to keep log(-log(u)) finite."""
    eps = 1e-6
    return jax.random.uniform(key, shape, dtype=dtype, minval=eps, maxval=1.0 - eps)


def gumbel_softmax_sample(key: Array, logits: Array) -> Array:
    """Hard categorical sample via Gumbel-max; returns integer indices
    (reference: GumbelSoftmax.sample, utils/distributions.py:28-38)."""
    u = _uniform_open(key, logits.shape, logits.dtype)
    noisy = logits - jnp.log(-jnp.log(u))
    return jnp.argmax(noisy, axis=-1)


def gumbel_softmax_rsample(
    key: Array, logits: Array, temperature: float = 0.5, hard: bool = False
) -> Array:
    """Reparameterized relaxed one-hot sample; ``hard`` applies the
    straight-through trick (utils/distributions.py:40-48)."""
    u = _uniform_open(key, logits.shape, logits.dtype)
    gumbel = -jnp.log(-jnp.log(u))
    y_soft = jax.nn.softmax((logits + gumbel) / temperature, axis=-1)
    if hard:
        index = jnp.argmax(y_soft, axis=-1)
        y_hard = jax.nn.one_hot(index, logits.shape[-1], dtype=y_soft.dtype)
        return jax.lax.stop_gradient(y_hard - y_soft) + y_soft
    return y_soft


def gumbel_softmax_log_prob(logits: Array, value: Array) -> Array:
    """sum(value * log_softmax(logits)) with keepdim — the reference's fixed
    log_prob (utils/distributions.py:50-58). ``value`` may be one-hot/relaxed
    (trailing dim == n_classes) or integer class indices."""
    if value.ndim == 0 or value.shape[-1] != logits.shape[-1]:
        value = jax.nn.one_hot(value.astype(jnp.int32), logits.shape[-1])
    return jnp.sum(value * jax.nn.log_softmax(logits, axis=-1), axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Discretized logistic mixture (PixelCNN++-style), the action-decoder head
# ---------------------------------------------------------------------------


def logistic_mixture_log_prob(
    actions: Array,
    logit_probs: Array,
    means: Array,
    log_scales: Array,
    act_min_bound: Array,
    act_max_bound: Array,
    num_classes: int = 10,
    log_scale_min: float = -5.0,
) -> Array:
    """Log-likelihood of ``actions`` under a per-dimension mixture of
    discretized logistics.

    Shapes: actions (..., A); mixture params (..., A, K); bounds (A,) or
    broadcastable. Returns per-element log-prob (..., A), i.e. the
    log-sum-exp over mixture components (caller sums over A and means over
    batch). Semantics match the piecewise CDF-edge construction of the
    reference (action_decoder_logistic.py:184-235) with bin half-width
    act_range/2/(num_classes-1).
    """
    log_scales = jnp.clip(log_scales, min=log_scale_min)
    a = actions[..., None]  # (..., A, 1) broadcast over K
    centered = a - means
    inv_stdv = jnp.exp(-log_scales)
    act_range = (act_max_bound - act_min_bound) / 2.0
    half_bin = act_range / (num_classes - 1)

    plus_in = inv_stdv * (centered + half_bin)
    min_in = inv_stdv * (centered - half_bin)
    cdf_plus = jax.nn.sigmoid(plus_in)
    cdf_min = jax.nn.sigmoid(min_in)

    # Edge cases: log CDF at the low edge, log(1-CDF) at the high edge.
    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)
    # Mid-bin PDF fallback when the CDF delta underflows.
    mid_in = inv_stdv * centered
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)
    cdf_delta = cdf_plus - cdf_min

    log_probs = jnp.where(
        a < act_min_bound + 1e-3,
        log_cdf_plus,
        jnp.where(
            a > act_max_bound - 1e-3,
            log_one_minus_cdf_min,
            jnp.where(
                cdf_delta > 1e-5,
                jnp.log(jnp.clip(cdf_delta, min=1e-12)),
                log_pdf_mid - math.log((num_classes - 1) / 2.0),
            ),
        ),
    )
    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
    return jax.scipy.special.logsumexp(log_probs, axis=-1)


def logistic_mixture_sample(
    key: Array,
    logit_probs: Array,
    means: Array,
    log_scales: Array,
) -> Array:
    """Sample actions: Gumbel-max over mixture components, then logistic
    inversion sampling (action_decoder_logistic.py:237-266).

    Shapes: params (..., A, K) -> sample (..., A)."""
    k_mix, k_u = jax.random.split(key)
    r1, r2 = 1e-5, 1.0 - 1e-5
    temp = jax.random.uniform(
        k_mix, means.shape, dtype=means.dtype, minval=r1, maxval=r2
    )
    noisy = logit_probs - jnp.log(-jnp.log(temp))
    onehot = jax.nn.one_hot(
        jnp.argmax(noisy, axis=-1), means.shape[-1], dtype=means.dtype
    )
    sel_log_scales = jnp.sum(onehot * log_scales, axis=-1)
    sel_means = jnp.sum(onehot * means, axis=-1)
    u = jax.random.uniform(
        k_u, sel_means.shape, dtype=means.dtype, minval=r1, maxval=r2
    )
    return sel_means + jnp.exp(sel_log_scales) * (jnp.log(u) - jnp.log(1.0 - u))
