"""Plan-recognition posterior networks: transformer and bidirectional-RNN
variants (reference: networks/plan_encoders/*).

TPU notes: the transformer runs over short play windows (8-32 frames), so the
whole sequence fits one attention call — no KV caching or blocking needed; the
biRNN variants use lax.scan (forward + reversed) which XLA pipelines well at
these lengths.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from tacorl_tpu.core.distributions import DiagNormal, TanhNormal
from tacorl_tpu.networks.layers import TorchDense

__all__ = [
    "PlanRecognitionTransformer",
    "PlanRecognitionBiRNN",
    "PlanRecognitionTanhBiRNN",
]


class _PostLNEncoderLayer(nn.Module):
    """Post-LayerNorm transformer encoder layer matching
    torch.nn.TransformerEncoderLayer's default (norm_first=False) structure:
    x = LN1(x + attn(x)); x = LN2(x + ffn(x))."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.d_model,
            dropout_rate=self.dropout,
            deterministic=not train,
        )(x, x)
        attn = nn.Dropout(self.dropout)(attn, deterministic=not train)
        x = nn.LayerNorm()(x + attn)
        h = TorchDense(self.dim_feedforward)(x)
        h = jax.nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = TorchDense(self.d_model)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return nn.LayerNorm()(x + h)


class PlanRecognitionTransformer(nn.Module):
    """TransformerEncoder (learned position embeddings, mean-pool) ->
    TanhNormal posterior (plan_recognition_transformer.py:10-105), including
    the zero-pad to head-divisibility (:36-41)."""

    state_dim: int
    latent_plan_dim: int
    num_heads: int = 8
    num_layers: int = 2
    encoder_hidden_size: int = 2048
    fc_hidden_size: int = 4096
    encoder_normalize: bool = False
    positional_normalize: bool = False
    max_position_embeddings: int = 16
    dropout_p: float = 0.01
    min_std: float = 1e-4

    @property
    def d_model(self) -> int:
        mod = self.state_dim % self.num_heads
        return self.state_dim + (self.num_heads - mod if mod else 0)

    @nn.compact
    def __call__(self, perceptual_emb: Array, *, train: bool = False) -> TanhNormal:
        b, s, d = perceptual_emb.shape
        pad = self.d_model - d
        x = perceptual_emb
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((b, s, pad), dtype=x.dtype)], axis=-1
            )
        positions = nn.Embed(self.max_position_embeddings, self.d_model)(
            jnp.arange(s)
        )
        x = x + positions[None]
        if self.positional_normalize:
            x = nn.LayerNorm()(x)
        x = nn.Dropout(self.dropout_p)(x, deterministic=not train)
        for _ in range(self.num_layers):
            x = _PostLNEncoderLayer(
                self.d_model, self.num_heads, self.encoder_hidden_size,
                self.dropout_p,
            )(x, train=train)
        if self.encoder_normalize:
            x = nn.LayerNorm()(x)
        x = TorchDense(self.fc_hidden_size)(x)
        x = jnp.mean(x, axis=1)  # gather sequence info
        mean = TorchDense(self.latent_plan_dim)(x)
        var = TorchDense(self.latent_plan_dim)(x)
        std = jax.nn.softplus(var) + self.min_std
        return TanhNormal(mean, std)


class _BiRNN(nn.Module):
    """num_layers-deep bidirectional simple-RNN (relu), concatenated
    directions per layer — the torch nn.RNN(bidirectional=True) topology."""

    hidden_size: int
    num_layers: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        import math

        bound = 1.0 / math.sqrt(self.hidden_size)
        uni = nn.initializers.uniform(scale=2 * bound)  # [0, 2b) shifted below

        def make_cell():
            return nn.SimpleCell(
                features=self.hidden_size,
                activation_fn=jax.nn.relu,
                kernel_init=lambda k, s, d=jnp.float32: jax.random.uniform(
                    k, s, d, minval=-bound, maxval=bound
                ),
                recurrent_kernel_init=lambda k, s, d=jnp.float32: (
                    jax.random.uniform(k, s, d, minval=-bound, maxval=bound)
                ),
            )

        del uni
        for _ in range(self.num_layers):
            fwd = nn.RNN(make_cell())(x)
            bwd = jnp.flip(nn.RNN(make_cell())(jnp.flip(x, axis=1)), axis=1)
            x = jnp.concatenate([fwd, bwd], axis=-1)
        return x


class PlanRecognitionBiRNN(nn.Module):
    """2-layer biRNN(relu) -> DiagNormal(softplus std + min_std) posterior
    (plan_recognition_net.py:14-56); uses the final timestep features."""

    state_dim: int
    latent_plan_dim: int
    hidden_size: int = 2048
    num_layers: int = 2
    min_std: float = 1e-4

    @nn.compact
    def __call__(self, perceptual_emb: Array, *, train: bool = False) -> DiagNormal:
        x = _BiRNN(self.hidden_size, self.num_layers)(perceptual_emb)
        x = x[:, -1]
        mean = TorchDense(self.latent_plan_dim)(x)
        var = TorchDense(self.latent_plan_dim)(x)
        std = jax.nn.softplus(var) + self.min_std
        return DiagNormal(mean, std)


class PlanRecognitionTanhBiRNN(nn.Module):
    """biRNN variant returning a TanhNormal posterior
    (plan_recognition_tanh_net.py:10-52)."""

    state_dim: int
    latent_plan_dim: int
    hidden_size: int = 2048
    num_layers: int = 2
    min_std: float = 1e-4

    @nn.compact
    def __call__(self, perceptual_emb: Array, *, train: bool = False) -> TanhNormal:
        x = _BiRNN(self.hidden_size, self.num_layers)(perceptual_emb)
        x = x[:, -1]
        mean = TorchDense(self.latent_plan_dim)(x)
        var = TorchDense(self.latent_plan_dim)(x)
        std = jax.nn.softplus(var) + self.min_std
        return TanhNormal(mean, std)
