"""Relay Imitation Learning: two-level behavior cloning
(reference: modules/relay_imitation_learning/relay_imitation_learning.py:
13-225).

Low level: log-prob of dataset actions given (obs, near-goal embedding).
High level: log-prob of the stop-gradient SUBGOAL EMBEDDING given (obs,
far-goal embedding) — subgoal regression in the shared latent space.
One Adam over everything; one jitted step.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from jax import Array

from tacorl_tpu.config import get_class
from tacorl_tpu.core.train_state import TrainState
from tacorl_tpu.data.transforms import DeviceTransforms
from tacorl_tpu.modules.base import AlgorithmModule
from tacorl_tpu.networks.actor import Actor
from tacorl_tpu.utils import stable_fold
from tacorl_tpu.networks.goal_encoder import VisualGoalEncoder
from tacorl_tpu.networks.late_fusion import LateFusion, build_late_fusion

__all__ = ["RILNet", "RILModule"]


class RILNet(nn.Module):
    perceptual_encoder: LateFusion
    goal_encoder: nn.Module
    high_level_policy: Actor
    low_level_policy: Actor
    hl_modalities: Tuple[str, ...]
    ll_modalities: Tuple[str, ...]

    @property
    def all_modalities(self) -> Tuple[str, ...]:
        seen: List[str] = []
        for m in self.hl_modalities + self.ll_modalities:
            if m not in seen:
                seen.append(m)
        return tuple(seen)

    def _emb(self, states: Dict[str, Array], modalities) -> Array:
        emb = self.perceptual_encoder.encode(
            states, self.all_modalities, cat_output=False
        )
        return jnp.concatenate([emb[m] for m in modalities], axis=-1)

    def compute_loss(self, batch: Dict) -> Tuple[Array, Dict[str, Array]]:
        """(relay_imitation_learning.py:101-181)"""
        ll_state = self._emb(batch["obs"], self.ll_modalities)
        hl_state = self._emb(batch["obs"], self.hl_modalities)

        ll_goal = self.goal_encoder(
            self._emb(batch["low_level_goal"], self.ll_modalities)
        )
        ll_input = jnp.concatenate([ll_state, ll_goal], axis=-1)
        low_level_loss = -self.low_level_policy.log_prob(
            ll_input, batch["low_level_action"]
        ).mean()

        hl_goal = self.goal_encoder(
            self._emb(batch["high_level_goal"], self.hl_modalities)
        )
        hl_action = jax.lax.stop_gradient(
            self.goal_encoder(
                self._emb(batch["high_level_action"], self.hl_modalities)
            )
        )
        hl_input = jnp.concatenate([hl_state, hl_goal], axis=-1)
        high_level_loss = -self.high_level_policy.log_prob(
            hl_input, hl_action
        ).mean()

        total = low_level_loss + high_level_loss
        return total, {
            "low_level_loss": low_level_loss,
            "high_level_loss": high_level_loss,
            "total_loss": total,
        }

    # -- rollout-time (rollout_manager.py:480-510 semantics) --------------------

    def high_level_action(self, obs: Dict, goal: Dict) -> Array:
        state = self._emb(obs, self.hl_modalities)
        goal_emb = self.goal_encoder(self._emb(goal, self.hl_modalities))
        x = jnp.concatenate([state, goal_emb], axis=-1)
        mean, _std = self.high_level_policy(x)
        return jnp.tanh(mean)

    def low_level_action(self, obs: Dict, subgoal: Array) -> Array:
        state = self._emb(obs, self.ll_modalities)
        x = jnp.concatenate([state, subgoal], axis=-1)
        # deterministic Actor path: tanh(mean) + argmax gripper when the
        # actor is discrete-gripper (reference rollout_manager.py:480-510)
        actions, _ = self.low_level_policy.get_actions(x, deterministic=True)
        return actions

    def encode_goal(self, goal: Dict) -> Array:
        """Embed a goal observation into the subgoal space the low level
        conditions on — the same encoder+goal-encoder path training uses for
        ``low_level_goal`` (compute_loss above). Lets an oracle high level
        supply ground-truth subgoals (VERDICT r4 #6: isolate the low level)."""
        return self.goal_encoder(self._emb(goal, self.ll_modalities))


class RILModule(AlgorithmModule):
    name = "ril"

    def build(self) -> None:
        cfg = self.cfg
        self.hl_mods = tuple(cfg.get("high_level_policy_modalities", ["rgb_static"]))
        self.ll_mods = tuple(cfg.get("low_level_policy_modalities", ["rgb_static"]))
        vector_dims = dict(cfg.get("vector_dims", {}))
        all_mods = list(dict.fromkeys(self.hl_mods + self.ll_mods))
        encoder = build_late_fusion(
            cfg["perceptual_encoder"]["networks"], all_mods, vector_dims
        )
        goal_cfg = dict(cfg.get("goal_encoder", {}))
        goal_cfg.pop("_target_", None)
        goal_out = int(goal_cfg.pop("out_features", 32))
        goal_encoder = VisualGoalEncoder(out_features=goal_out, **goal_cfg)

        def make_actor(policy_key: str, action_dim: int, state_dim: int) -> Actor:
            p_cfg = dict(cfg.get(policy_key, {}))
            p_cls = get_class(
                p_cfg.pop("_target_", "tacorl_tpu.networks.actor.MLPPolicy")
            )
            # the reference's low level is a discrete-gripper actor
            # (relay_imitation_learning.yaml: actor@low_level_policy:
            # discrete_gripper) — TanhNormal on the +-1 gripper targets fits
            # the boundary poorly and degrades low-level BC. The flag shapes
            # both the trunk heads (MLPPolicy) and the Actor, like cql.py.
            # It stays in p_cfg for the MLPPolicy-family trunks; custom
            # _target_ classes that don't declare it (ADVICE r4) get it
            # stripped here rather than failing opaquely at flax init.
            discrete_gripper = bool(p_cfg.get("discrete_gripper", False))
            import inspect

            fields = inspect.signature(p_cls.__init__).parameters
            if "discrete_gripper" not in fields and not any(
                p.kind is inspect.Parameter.VAR_KEYWORD for p in fields.values()
            ):
                p_cfg.pop("discrete_gripper", None)
            return Actor(
                policy=p_cls(action_dim=action_dim, **p_cfg),
                action_dim=action_dim,
                state_dim=state_dim,
                goal_dim=goal_out,
                discrete_gripper=discrete_gripper,
            )

        hl_dim = encoder.calc_state_dim(self.hl_mods)
        ll_dim = encoder.calc_state_dim(self.ll_mods)
        self.net = RILNet(
            perceptual_encoder=encoder,
            goal_encoder=goal_encoder,
            # high level acts in the goal-embedding space
            high_level_policy=make_actor("high_level_policy", goal_out, hl_dim),
            low_level_policy=make_actor(
                "low_level_policy", int(cfg.get("action_dim", 7)), ll_dim
            ),
            hl_modalities=self.hl_mods,
            ll_modalities=self.ll_mods,
        )
        self.transforms = DeviceTransforms(cfg.get("transforms"))
        self.optimizer = optax.adam(float(cfg.get("lr", 1e-4)))

    def _transform_batch(self, key, batch, train):
        out = dict(batch)
        for k in ("obs", "low_level_goal", "high_level_goal", "high_level_action"):
            out[k] = self.transforms(jax.random.fold_in(key, stable_fold(k)),
                                     batch[k], train=train)
        out["low_level_action"] = batch["low_level_action"].astype(jnp.float32)
        return out

    def init_state(self, rng: Array, example_batch: Dict) -> TrainState:
        k_aug, k_params = jax.random.split(rng)
        example_batch = jax.tree.map(
            lambda x: x[:2] if getattr(x, "ndim", 0) >= 1 else x, example_batch
        )
        batch = self._transform_batch(k_aug, example_batch, train=False)
        variables = self.net.init(k_params, batch, method="compute_loss")
        params = variables["params"]
        return TrainState.create(params, self.optimizer.init(params))

    def make_train_step(self):
        net, optimizer = self.net, self.optimizer

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state, batch, rng, scalars):
            rng = jax.random.fold_in(rng, state.step)
            batch = self._transform_batch(rng, batch, train=True)

            def loss_fn(params):
                total, metrics = net.apply(
                    {"params": params}, batch, method="compute_loss"
                )
                return total, metrics

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(state.step + 1, params, opt_state, state.aux),
                metrics,
            )

        return train_step

    def make_val_step(self):
        net = self.net

        @jax.jit
        def val_step(state, batch, rng, scalars):
            batch = self._transform_batch(rng, batch, train=False)
            _total, metrics = net.apply(
                {"params": state.params}, batch, method="compute_loss"
            )
            return metrics, {}

        return val_step

    def make_policy_fns(self):
        """(high_level, low_level) jitted fns for the RIL rollout agent."""
        net, transforms = self.net, self.transforms

        @jax.jit
        def high(params, obs, goal, key):
            obs_t = transforms(key, obs, train=False)
            goal_t = transforms(key, goal, train=False)
            return net.apply(
                {"params": params}, obs_t, goal_t, method="high_level_action"
            )

        @jax.jit
        def low(params, obs, subgoal, key):
            obs_t = transforms(key, obs, train=False)
            return net.apply(
                {"params": params}, obs_t, subgoal, method="low_level_action"
            )

        return high, low
