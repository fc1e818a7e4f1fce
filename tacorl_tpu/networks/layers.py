"""Shared layer primitives.

``TorchDense`` / ``TorchConv`` reproduce PyTorch's default initialization
(kaiming-uniform(a=sqrt(5)) kernel + fan-in-uniform bias) so training dynamics
match the reference stack without importing torch. The reference additionally
initializes policy/critic output heads with small uniform weights
(actor.py:188-193 — init_w=1e-3 per arXiv:2006.05990); pass ``init_w`` for
those layers.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

__all__ = ["TorchDense", "TorchConv", "get_activation", "MLP"]


def get_activation(name: str) -> Callable[[Array], Array]:
    """Map the reference's torch.nn activation names onto jax.nn fns."""
    table = {
        "ReLU": jax.nn.relu,
        "SiLU": jax.nn.silu,
        "GELU": jax.nn.gelu,
        "ELU": jax.nn.elu,
        "Tanh": jnp.tanh,
        "LeakyReLU": jax.nn.leaky_relu,
        "Sigmoid": jax.nn.sigmoid,
        "Identity": lambda x: x,
        "Softplus": jax.nn.softplus,
        "Mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    }
    if name not in table:
        raise ValueError(f"unknown activation {name!r}")
    return table[name]


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class TorchDense(nn.Module):
    """Dense layer with torch.nn.Linear default init (or uniform(init_w))."""

    features: int
    init_w: Optional[float] = None
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_dim = x.shape[-1]
        bound = self.init_w if self.init_w is not None else 1.0 / math.sqrt(in_dim)
        kernel = self.param("kernel", _uniform_init(bound), (in_dim, self.features))
        y = jnp.dot(
            x.astype(self.dtype) if self.dtype else x,
            kernel.astype(self.dtype) if self.dtype else kernel,
        )
        if self.use_bias:
            bias = self.param("bias", _uniform_init(bound), (self.features,))
            y = y + bias
        return y


class TorchConv(nn.Module):
    """NHWC conv with torch.nn.Conv2d default init. VALID padding by default
    (torch's padding=0)."""

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[str, int] = 0
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ks = (
            (self.kernel_size, self.kernel_size)
            if isinstance(self.kernel_size, int)
            else tuple(self.kernel_size)
        )
        strides = (
            (self.strides, self.strides)
            if isinstance(self.strides, int)
            else tuple(self.strides)
        )
        in_ch = x.shape[-1]
        fan_in = in_ch * ks[0] * ks[1]
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param(
            "kernel", _uniform_init(bound), ks + (in_ch, self.features)
        )
        if isinstance(self.padding, int):
            padding = [(self.padding, self.padding)] * 2
        else:
            padding = self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype) if self.dtype else x,
            kernel.astype(self.dtype) if self.dtype else kernel,
            window_strides=strides,
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", _uniform_init(bound), (self.features,))
            y = y + bias
        return y


class MLP(nn.Module):
    """Simple MLP trunk: hidden sizes + activation, optional final layer."""

    hidden: Sequence[int]
    activation: str = "ReLU"
    out_features: Optional[int] = None
    out_init_w: Optional[float] = None
    activate_last: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = get_activation(self.activation)
        for h in self.hidden:
            x = act(TorchDense(h)(x))
        if self.out_features is not None:
            x = TorchDense(self.out_features, init_w=self.out_init_w)(x)
            if self.activate_last:
                x = act(x)
        return x
