"""Goal-embedding MLP (reference: networks/visual_encoders/goal_encoder.py)."""

from __future__ import annotations

import flax.linen as nn
from jax import Array

from tacorl_tpu.networks.layers import TorchDense, get_activation

__all__ = ["VisualGoalEncoder"]


class VisualGoalEncoder(nn.Module):
    """3-layer MLP over a concatenated goal embedding, optional LayerNorm and
    last-layer activation (goal_encoder.py:5-33)."""

    out_features: int = 32
    hidden_size: int = 256
    activation_function: str = "ReLU"
    last_layer_activation: str = "Identity"
    normalize_output: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = get_activation(self.activation_function)
        x = act(TorchDense(self.hidden_size)(x))
        x = act(TorchDense(self.hidden_size)(x))
        x = TorchDense(self.out_features)(x)
        if self.normalize_output:
            x = nn.LayerNorm()(x)
        return get_activation(self.last_layer_activation)(x)
