"""ResNet-18 visual encoder family
(reference: networks/visual_encoders/encoder.py:473-543 — torchvision
resnet18 backbone, optionally frozen/imagenet-initialized, and a frozen R3M
backbone + MLP head).

The backbone is implemented natively in flax (NHWC, bf16 compute); pretrained
torchvision/R3M weights can be grafted through
tacorl_tpu.utils.torch_convert primitives when the torch checkpoints are
available. Freezing is an optimizer-mask concern (core/checkpoint.freeze_mask)
rather than a module flag.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from tacorl_tpu.networks.layers import TorchDense

__all__ = ["ResNet18Encoder", "R3MEncoder"]


class _BasicBlock(nn.Module):
    features: int
    strides: int = 1
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f, (k, k), (s, s), padding=[(k // 2, k // 2)] * 2, use_bias=False,
            dtype=self.compute_dtype, name=name,
        )
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, dtype=jnp.float32, name=name
        )
        residual = x
        y = conv(self.features, 3, self.strides, "conv1")(x)
        y = nn.relu(norm("bn1")(y.astype(jnp.float32)))
        y = conv(self.features, 3, 1, "conv2")(y)
        y = norm("bn2")(y.astype(jnp.float32))
        if residual.shape[-1] != self.features or self.strides != 1:
            residual = conv(self.features, 1, self.strides, "downsample_conv")(x)
            residual = norm("downsample_bn")(residual.astype(jnp.float32))
        return nn.relu(y + residual)


class ResNet18Encoder(nn.Module):
    """ResNet-18 -> global average pool -> latent head; (N, H, W, C) ->
    (N, latent_dim)."""

    latent_dim: int = 32
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    width: int = 64
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        x = nn.Conv(
            self.width, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.compute_dtype, name="stem_conv",
        )(x)
        x = nn.relu(
            nn.BatchNorm(use_running_average=not train, name="stem_bn")(
                x.astype(jnp.float32)
            )
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, n_blocks in enumerate(self.stage_sizes):
            for block in range(n_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = _BasicBlock(
                    self.width * (2**stage), strides, self.compute_dtype,
                    name=f"stage{stage}_block{block}",
                )(x, train=train)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # global avg pool
        return TorchDense(self.latent_dim, name="head")(x)


class R3MEncoder(nn.Module):
    """Frozen R3M-style backbone + trainable MLP head (encoder.py:506-543).
    The backbone is the flax ResNet-18 above; R3M released weights load via
    the torch converter when available (the r3m package itself is an external
    dependency absent here)."""

    latent_dim: int = 32
    hidden_dim: int = 256
    backbone_latent: int = 512

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        feats = ResNet18Encoder(
            latent_dim=self.backbone_latent, name="backbone"
        )(x, train=False)  # backbone always frozen-mode stats
        feats = jax.lax.stop_gradient(feats)
        h = nn.relu(TorchDense(self.hidden_dim, name="head1")(feats))
        return TorchDense(self.latent_dim, name="head2")(h)
