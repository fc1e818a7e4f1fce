"""Visual encoder family.

Capability parity with the reference encoder zoo
(networks/visual_encoders/encoder.py, networks/visual_encoders/utils.py),
re-designed NHWC/TPU-first: convs run in channels-last layout so XLA tiles
them straight onto the MXU; the per-frame encoder is applied over flattened
(batch*time) frame stacks (the dominant-FLOPs path, SURVEY.md §3.1).

All encoders expose ``latent_dim`` and map (N, H, W, C) -> (N, latent_dim).
VIB-enabled encoders additionally expose ``get_dist`` returning a DiagNormal.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from tacorl_tpu.core.distributions import DiagNormal
from tacorl_tpu.networks.layers import TorchConv, TorchDense, get_activation

MEAN_MIN, MEAN_MAX = -9.0, 9.0
LOG_SIG_MIN, LOG_SIG_MAX = -5.0, 2.0

__all__ = [
    "SpatialSoftArgmax",
    "LMPVisionEncoder",
    "CustomEncoder",
    "ResNetRLEncoder",
    "DeepSpatialEncoder",
    "VectorEncoder",
]


class SpatialSoftArgmax(nn.Module):
    """Soft keypoint extraction (N, H, W, C) -> (N, 2C), interleaved (x, y)
    per channel; learnable temperature when ``temperature`` is None
    (reference: visual_encoders/utils.py:22-77)."""

    temperature: Optional[float] = None
    normalize: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n, h, w, c = x.shape
        if self.temperature is None:
            temp = self.param("temperature", nn.initializers.ones, (1,))
        else:
            temp = jnp.asarray([self.temperature], dtype=x.dtype)
        # softmax over spatial positions, per channel
        flat = x.reshape(n, h * w, c) / temp
        softmax = jax.nn.softmax(flat, axis=1).reshape(n, h, w, c)

        x_range = jnp.arange(w, dtype=x.dtype)
        y_range = jnp.arange(h, dtype=x.dtype)
        if self.normalize:
            x_range = (x_range / (w - 1)) * 2 - 1
            y_range = (y_range / (h - 1)) * 2 - 1
        # expected x (width) and y (height) coordinates per channel
        ex = jnp.einsum("nhwc,w->nc", softmax, x_range)
        ey = jnp.einsum("nhwc,h->nc", softmax, y_range)
        return jnp.stack([ex, ey], axis=-1).reshape(n, 2 * c)


class LMPVisionEncoder(nn.Module):
    """3-conv CNN (8/4, 4/2, 3/1) + SpatialSoftArgmax + FC head -> latent
    (reference: encoder.py:349-428). Optional VIB head and output LayerNorm."""

    latent_dim: int = 32
    hidden_dim: int = 256
    activation_function: str = "ReLU"
    dropout: float = 0.0
    temperature: Optional[float] = None
    normalize_spatial_softmax: bool = False
    normalize_output: bool = False
    vib: bool = False
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16

    def setup(self):
        self.conv1 = TorchConv(32, 8, 4, dtype=self.compute_dtype)
        self.conv2 = TorchConv(64, 4, 2, dtype=self.compute_dtype)
        self.conv3 = TorchConv(64, 3, 1, dtype=self.compute_dtype)
        self.ssam = SpatialSoftArgmax(
            self.temperature, self.normalize_spatial_softmax
        )
        if self.vib:
            self.fc_mean = TorchDense(self.latent_dim)
            self.fc_log_std = TorchDense(self.latent_dim)
        else:
            self.fc1 = TorchDense(self.hidden_dim)
            self.drop = nn.Dropout(self.dropout)
            self.fc2 = TorchDense(self.latent_dim)
        if self.normalize_output:
            self.layernorm = nn.LayerNorm()

    def conv_forward(self, x: Array) -> Array:
        act = get_activation(self.activation_function)
        x = act(self.conv1(x))
        x = act(self.conv2(x))
        x = act(self.conv3(x))
        if 0 in x.shape[-3:-1]:
            # XLA happily reduces over zero-size dims, so without this guard
            # a too-small input (e.g. 32x32 through the 8/4,4/2,3/1 stack)
            # SILENTLY yields an empty feature map and a constant embedding
            raise ValueError(
                f"LMPVisionEncoder conv stack collapsed to spatial size "
                f"{x.shape[-3:-1]} — input image too small for the "
                f"8/4, 4/2, 3/1 conv strides (needs >= ~48px)"
            )
        return self.ssam(x.astype(jnp.float32))

    def get_dist(self, x: Array) -> DiagNormal:
        assert self.vib, "get_dist requires vib=True"
        feat = self.conv_forward(x)
        mean = jnp.clip(self.fc_mean(feat), MEAN_MIN, MEAN_MAX)
        log_std = jnp.clip(self.fc_log_std(feat), LOG_SIG_MIN, LOG_SIG_MAX)
        return DiagNormal(mean, jnp.exp(log_std))

    def __call__(
        self, x: Array, *, train: bool = False, rng: Optional[Array] = None
    ) -> Array:
        if self.vib:
            dist = self.get_dist(x)
            key = rng if rng is not None else self.make_rng("sample")
            return dist.sample(key)
        act = get_activation(self.activation_function)
        feat = self.conv_forward(x)
        h = act(self.fc1(feat))
        h = self.drop(h, deterministic=not train)
        out = self.fc2(h)
        if self.normalize_output:
            out = self.layernorm(out)
        return out


class CustomEncoder(nn.Module):
    """Fully configurable conv+FC encoder (reference: encoder.py:18-230):
    arbitrary conv stack, optional max-pooling, dropout, FC head, VIB."""

    latent_dim: int = 32
    conv_channels: Sequence[int] = (32, 64, 64)
    kernel_sizes: Sequence[int] = (8, 4, 3)
    strides: Sequence[int] = (4, 2, 1)
    paddings: Sequence[int] = (0, 0, 0)
    hidden_dim: int = 256
    activation_function: str = "ReLU"
    dropout: float = 0.0
    max_pool: bool = False
    normalize_output: bool = False
    vib: bool = False
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        act = get_activation(self.activation_function)
        for ch, k, s, p in zip(
            self.conv_channels, self.kernel_sizes, self.strides, self.paddings
        ):
            x = act(TorchConv(ch, k, s, padding=p, dtype=self.compute_dtype)(x))
            if self.max_pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        if self.vib:
            mean = jnp.clip(TorchDense(self.latent_dim)(x), MEAN_MIN, MEAN_MAX)
            log_std = jnp.clip(
                TorchDense(self.latent_dim)(x), LOG_SIG_MIN, LOG_SIG_MAX
            )
            return DiagNormal(mean, jnp.exp(log_std)).sample(
                self.make_rng("sample")
            )
        x = act(TorchDense(self.hidden_dim)(x))
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        x = TorchDense(self.latent_dim)(x)
        if self.normalize_output:
            x = nn.LayerNorm()(x)
        return x


class _ResidualBlock(nn.Module):
    hidden_channels: int
    residual_hidden_channels: int
    activation_function: str = "ReLU"
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = get_activation(self.activation_function)
        h = act(x)
        h = TorchConv(
            self.residual_hidden_channels,
            3,
            1,
            padding=1,
            use_bias=False,
            dtype=self.compute_dtype,
        )(h)
        h = act(h)
        h = TorchConv(
            self.hidden_channels, 1, 1, use_bias=False, dtype=self.compute_dtype
        )(h)
        return x + h


class ResNetRLEncoder(nn.Module):
    """Conv downsampling stack + VQ-VAE-style residual stack
    (reference: encoder.py:233-346, utils.py:141-170)."""

    latent_dim: int = 32
    hidden_channels: int = 128
    num_residual_blocks: int = 3
    residual_hidden_channels: int = 64
    activation_function: str = "ReLU"
    normalize_output: bool = False
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        act = get_activation(self.activation_function)
        ch = self.hidden_channels
        x = act(TorchConv(ch // 2, 4, 2, padding=1, dtype=self.compute_dtype)(x))
        x = act(TorchConv(ch, 4, 2, padding=1, dtype=self.compute_dtype)(x))
        x = TorchConv(ch, 3, 1, padding=1, dtype=self.compute_dtype)(x)
        for _ in range(self.num_residual_blocks):
            x = _ResidualBlock(
                ch,
                self.residual_hidden_channels,
                self.activation_function,
                self.compute_dtype,
            )(x)
        x = act(x)
        x = SpatialSoftArgmax()(x.astype(jnp.float32))
        x = TorchDense(self.latent_dim)(x)
        if self.normalize_output:
            x = nn.LayerNorm()(x)
        return x


class DeepSpatialEncoder(nn.Module):
    """Levine'15 deep spatial autoencoder backbone
    (reference: encoder.py:431-470). latent_dim fixed at 32 (= 2 * 16 ch)."""

    temperature: Optional[float] = None
    normalize: bool = False
    activation_function: str = "ReLU"
    use_batch_norm: bool = True
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16

    latent_dim: int = 32

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        act = get_activation(self.activation_function)
        for ch, k, s in ((64, 7, 2), (32, 5, 1), (16, 5, 1)):
            x = TorchConv(ch, k, s, dtype=self.compute_dtype)(x)
            if self.use_batch_norm:
                x = nn.BatchNorm(use_running_average=not train)(
                    x.astype(jnp.float32)
                )
            x = act(x)
        return SpatialSoftArgmax(self.temperature, self.normalize)(
            x.astype(jnp.float32)
        )


class VectorEncoder(nn.Module):
    """Identity/MLP encoder for vector modalities (robot_obs, scene_obs).
    With no hidden layers it passes vectors through, matching the reference's
    vector-modality handling (representation_network.py:55-60)."""

    latent_dim: int
    hidden: Sequence[int] = ()
    activation_function: str = "ReLU"

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        if not self.hidden:
            return x
        act = get_activation(self.activation_function)
        for h in self.hidden:
            x = act(TorchDense(h)(x))
        return TorchDense(self.latent_dim)(x)
