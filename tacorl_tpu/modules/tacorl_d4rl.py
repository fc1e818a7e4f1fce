"""TACO-RL on D4RL states (reference: modules/tacorl/tacorl_d4rl.py:17-173):
loads a state-based Play-LMP, reuses the plan proposal as the latent-plan
actor, freezes the posterior, optionally finetunes the decoder; the RL batch
is (concat(obs_0, goal), latent_plan, concat(obs_T, goal), r = goal_reached).
"""

from __future__ import annotations

import copy
from typing import Dict

import jax
import jax.numpy as jnp
import optax
from jax import Array

from tacorl_tpu.config import get_class
from tacorl_tpu.core.checkpoint import load_module_from_checkpoint
from tacorl_tpu.core.train_state import TrainState
from tacorl_tpu.modules.cql import CQLModule
from tacorl_tpu.networks.critic import Critic
from tacorl_tpu.networks.late_fusion import build_late_fusion
from tacorl_tpu.networks.visual_wrappers import (
    VisualActorWrapper,
    VisualCriticWrapper,
)

__all__ = ["TACORLD4RLModule"]


class TACORLD4RLModule(CQLModule):
    name = "tacorl_d4rl"

    def build(self) -> None:
        cfg = self.cfg
        self.play_lmp_dir = cfg["play_lmp_dir"]
        self.lmp_epoch_to_load = int(cfg.get("lmp_epoch_to_load", -1))
        self.finetune_action_decoder = bool(
            cfg.get("finetune_action_decoder", False)
        )
        self.action_decoder_lr = float(cfg.get("action_decoder_lr", 1e-4))
        self.lmp, self._lmp_state = load_module_from_checkpoint(
            self.play_lmp_dir,
            step=self.lmp_epoch_to_load,
            overwrite_cfg=cfg.get("overwrite_lmp_cfg") or None,
        )
        cfg.setdefault("action_dim", self.lmp.latent_plan_dim)
        super().build()
        if self.finetune_action_decoder:
            self.optimizer.groups["action_decoder"] = optax.adam(
                self.action_decoder_lr
            )

    def build_networks(self) -> None:
        lmp_net = self.lmp.net
        proposal = lmp_net.plan_proposal
        empty = build_late_fusion({}, [], {})
        self.actor_net = VisualActorWrapper(
            encoder=empty, goal_encoder=None,
            env_modalities=(), goal_modalities=(), actor=proposal,
        )
        q_cfg = dict(self.cfg.get("q_network", {}))
        q_cls = get_class(
            q_cfg.pop("_target_", "tacorl_tpu.networks.critic.MLPQNetwork")
        )
        q_cfg.setdefault("num_layers", proposal.policy.num_layers)
        q_cfg.setdefault("hidden_dim", proposal.policy.hidden_dim)
        self.critic_net = VisualCriticWrapper(
            encoder=build_late_fusion({}, [], {}), goal_encoder=None,
            env_modalities=(), goal_modalities=(),
            critic=Critic(
                q_network=q_cls(**q_cfg),
                state_dim=proposal.state_dim, goal_dim=proposal.goal_dim,
                action_dim=self.action_dim,
            ),
        )

    def init_state(self, rng: Array, example_batch: Dict) -> TrainState:
        lmp_params = self._lmp_state.params
        k_q1, k_q2 = jax.random.split(rng)
        example_batch = jax.tree.map(
            lambda x: x[:2] if getattr(x, "ndim", 0) >= 1 else x, example_batch
        )
        obs0 = jnp.asarray(
            example_batch["observations"][:, 0], dtype=jnp.float32
        )
        goal = jnp.asarray(example_batch["goal"], dtype=jnp.float32)
        flat_obs = jnp.concatenate([obs0, goal], axis=-1)
        latent_plan = jnp.zeros((2, self.action_dim))
        q1_params = self.critic_net.init(k_q1, flat_obs, latent_plan)["params"]
        q2_params = self.critic_net.init(k_q2, flat_obs, latent_plan)["params"]
        params = {
            "actor": {"actor": copy.deepcopy(lmp_params["plan_proposal"])},
            "q1": q1_params,
            "q2": q2_params,
            "log_alpha": jnp.zeros((1,)),
            "plan_recognition": copy.deepcopy(lmp_params["plan_recognition"]),
            "action_decoder": copy.deepcopy(lmp_params["action_decoder"]),
        }
        if self.with_lagrange:
            params["log_alpha_prime"] = jnp.zeros((1,))
        aux = {
            "target_q1": jax.tree.map(jnp.copy, q1_params),
            "target_q2": jax.tree.map(jnp.copy, q2_params),
        }
        return TrainState.create(params, self.optimizer.init(params), aux=aux)

    def _compute_update(self, state, batch, rng, scalars, optimize):
        k_plan, k_cql = jax.random.split(rng)
        observations = batch["observations"].astype(jnp.float32)
        actions = batch["actions"].astype(jnp.float32)
        goal = batch["goal"].astype(jnp.float32)
        reached = batch["goal_reached"].astype(jnp.float32)

        pr_dist = self.lmp.net.plan_recognition.apply(
            {"params": state.params["plan_recognition"]}, observations
        )
        latent_plan = jax.lax.stop_gradient(pr_dist.sample(k_plan))

        metrics: Dict[str, Array] = {}
        new_params = dict(state.params)
        opt_state = state.opt_state

        def decoder_loss(decoder_params):
            return self.lmp.net.action_decoder.apply(
                {"params": decoder_params},
                latent_plan,
                observations[:, :-1],
                actions[:, :-1],
                method="loss",
            )

        dec_loss, dec_grads = jax.value_and_grad(decoder_loss)(
            state.params["action_decoder"]
        )
        metrics["action_loss"] = dec_loss
        if optimize and self.finetune_action_decoder:
            new_dec, opt_state = self.optimizer.update_group(
                "action_decoder", dec_grads, opt_state, state.params
            )
            new_params["action_decoder"] = new_dec

        rl_batch = {
            "observations": jnp.concatenate([observations[:, 0], goal], axis=-1),
            "actions": latent_plan,
            "next_observations": jnp.concatenate(
                [observations[:, -1], goal], axis=-1
            ),
            "rewards": reached,
            "terminals": reached,
        }
        metrics["rl_batch_success_rate"] = reached.mean()
        mid_state = TrainState(
            step=state.step, params=new_params, opt_state=opt_state,
            aux=state.aux,
        )
        new_state, cql_metrics = super()._compute_update(
            mid_state, rl_batch, k_cql, scalars, optimize
        )
        metrics.update(cql_metrics)
        return new_state, metrics

    # -- rollout --------------------------------------------------------------

    def make_plan_and_decode_fns(self):
        @jax.jit
        def propose(params, obs_goal, key, deterministic=True):
            plan, _ = self._actor_apply(
                params["actor"], "get_actions",
                obs_goal.astype(jnp.float32), key, deterministic, False,
            )
            return plan

        @jax.jit
        def decode(params, key, latent_plan, obs, carry):
            action, carry = self.lmp.net.action_decoder.apply(
                {"params": params["action_decoder"]},
                key, latent_plan, obs.astype(jnp.float32)[:, None], None, carry,
                method="act",
            )
            return action[:, 0], carry

        return propose, decode
