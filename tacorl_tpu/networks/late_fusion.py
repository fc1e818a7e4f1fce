"""LateFusion perceptual encoder: one encoder per modality, concatenated
latents (reference: networks/representation/representation_network.py:9-71).

Construction is config-driven: ``networks`` maps modality -> encoder config
(``_target_`` dicts resolved through tacorl_tpu.config.instantiate-style
class lookup), filtered by ``modalities``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from tacorl_tpu.config import get_class

__all__ = ["LateFusion", "build_late_fusion"]


def _is_image(modality: str) -> bool:
    return "rgb" in modality or "depth" in modality


class LateFusion(nn.Module):
    """``encoders``: tuple of (modality, flax module). Vector modalities pass
    through (their latent_dim = raw feature dim, supplied in ``vector_dims``).
    """

    encoders: Tuple[Tuple[str, nn.Module], ...]
    vector_dims: Dict[str, int]

    @property
    def networks(self) -> Dict[str, nn.Module]:
        return {name: mod for name, mod in self.encoders}

    def latent_dim_of(self, modality: str) -> int:
        if modality in self.vector_dims:
            return self.vector_dims[modality]
        return self.networks[modality].latent_dim

    def calc_state_dim(self, modalities: Sequence[str]) -> int:
        return sum(self.latent_dim_of(m) for m in modalities)

    def encode(
        self,
        observation: Dict[str, Array],
        modalities: Sequence[str],
        cat_output: bool = True,
        train: bool = False,
    ):
        """Encode a dict observation; image modalities go through their
        encoder, vector modalities pass through as float
        (reference get_state_from_observation,
        representation_network.py:36-65)."""
        if not isinstance(observation, dict):
            return observation
        state = {}
        for modality in modalities:
            value = observation[modality]
            if _is_image(modality):
                squeeze = value.ndim == 3
                if squeeze:
                    value = value[None]
                out = self.networks[modality](value, train=train)
                state[modality] = out[0] if squeeze else out
            else:
                state[modality] = value.astype(jnp.float32)
        if cat_output:
            return jnp.concatenate([state[m] for m in modalities], axis=-1)
        return state

    def __call__(
        self,
        observation: Dict[str, Array],
        modalities: Optional[Sequence[str]] = None,
        cat_output: bool = True,
        train: bool = False,
    ):
        if modalities is None:
            modalities = [name for name, _ in self.encoders] + list(
                self.vector_dims
            )
            modalities = [m for m in modalities if m in observation]
        return self.encode(observation, modalities, cat_output, train)


def build_late_fusion(
    networks: Dict[str, Dict[str, Any]],
    modalities: Sequence[str],
    vector_dims: Optional[Dict[str, int]] = None,
) -> LateFusion:
    """Instantiate per-modality encoders from `_target_` configs, keeping only
    the requested modalities (representation_network.py:15-28)."""
    vector_dims = dict(vector_dims or {})
    encoders = []
    for modality in modalities:
        if modality in vector_dims:
            continue
        if modality not in networks:
            raise ValueError(f"network configuration for {modality!r} is missing")
        cfg = dict(networks[modality])
        cls = get_class(cfg.pop("_target_"))
        encoders.append((modality, cls(**cfg)))
    return LateFusion(encoders=tuple(encoders), vector_dims=vector_dims)
