"""Dict-observation adapters around Actor/Critic: encode obs+goal modalities
through a LateFusion encoder (+ optional goal encoder), concatenate, delegate
(reference: networks/actor_critic/visual_actor_wrapper.py:7-81,
visual_critic_wrapper.py:7-76)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from tacorl_tpu.networks.actor import Actor
from tacorl_tpu.networks.critic import Critic
from tacorl_tpu.networks.late_fusion import LateFusion

Obs = Union[Dict[str, Any], Array]

__all__ = ["VisualActorWrapper", "VisualCriticWrapper"]


class _VisualWrapperBase(nn.Module):
    encoder: LateFusion
    goal_encoder: Optional[nn.Module]
    env_modalities: Tuple[str, ...]
    goal_modalities: Tuple[str, ...]

    def get_emb_obs_representation(self, obs: Obs, train: bool = False) -> Array:
        """Embedding of the observation alone (DR3 path,
        visual_critic_wrapper.py:35-48)."""
        if not isinstance(obs, dict):
            return obs
        obs_dict = (
            obs["observation"]
            if len(self.goal_modalities) > 0 and "goal" in obs
            else obs
        )
        return self.encoder.encode(obs_dict, self.env_modalities, train=train)

    def get_emb_representation(self, obs: Obs, train: bool = False) -> Array:
        if not isinstance(obs, dict):
            return obs
        if len(self.goal_modalities) > 0 and "goal" in obs:
            emb_obs = self.encoder.encode(
                obs["observation"], self.env_modalities, train=train
            )
            emb_goal = self.encoder.encode(
                obs["goal"], self.goal_modalities, train=train
            )
            if self.goal_encoder is not None:
                emb_goal = self.goal_encoder(emb_goal)
            return jnp.concatenate([emb_obs, emb_goal], axis=-1)
        return self.encoder.encode(obs, self.env_modalities, train=train)


class VisualActorWrapper(_VisualWrapperBase):
    actor: Actor = None  # type: ignore[assignment]

    @property
    def action_dim(self) -> int:
        return self.actor.action_dim

    @property
    def discrete_gripper(self) -> bool:
        return self.actor.discrete_gripper

    def __call__(self, obs: Obs, *args, train: bool = False, **kwargs):
        return self.actor(self.get_emb_representation(obs, train), *args, **kwargs)

    def get_dist(self, obs: Obs, train: bool = False):
        return self.actor.get_dist(self.get_emb_representation(obs, train))

    def get_actions(
        self,
        obs: Obs,
        key: Optional[Array] = None,
        deterministic: bool = False,
        reparameterize: bool = False,
        train: bool = False,
    ):
        emb = self.get_emb_representation(obs, train)
        return self.actor.get_actions(emb, key, deterministic, reparameterize)

    def sample_n_with_log_prob(
        self, obs: Obs, key: Array, n_actions: int, train: bool = False
    ):
        emb = self.get_emb_representation(obs, train)
        return self.actor.sample_n_with_log_prob(emb, key, n_actions)

    def log_prob(self, obs: Obs, actions: Array, train: bool = False):
        return self.actor.log_prob(
            self.get_emb_representation(obs, train), actions
        )


class VisualCriticWrapper(_VisualWrapperBase):
    critic: Critic = None  # type: ignore[assignment]

    def __call__(self, obs: Obs, action: Array, *, train: bool = False):
        return self.critic(
            self.get_emb_representation(obs, train), action, train=train
        )

    def get_vib_distribution(self, obs: Obs):
        """VIB prior-matching distribution of the rgb_static encoder
        (visual_critic_wrapper.py:25-33)."""
        obs_dict = (
            obs["observation"]
            if len(self.goal_modalities) > 0 and "goal" in obs
            else obs
        )
        return self.encoder.networks["rgb_static"].get_dist(obs_dict["rgb_static"])
