"""Play-LMP on D4RL state vectors
(reference: modules/play_lmp/play_lmp_d4rl.py:17-241): no perceptual encoder
— raw observation vectors feed the posterior/prior directly; the goal is the
xy of the window's last observation; the decoder bounds come from the env's
action space."""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from jax import Array

from tacorl_tpu.config import get_class
from tacorl_tpu.core.distributions import balanced_kl, kl_diag_normal
from tacorl_tpu.core.train_state import TrainState
from tacorl_tpu.modules.base import AlgorithmModule
from tacorl_tpu.modules.play_lmp import _base_normal
from tacorl_tpu.networks.actor import Actor

__all__ = ["PlayLMPD4RLNet", "PlayLMPD4RLModule"]


class PlayLMPD4RLNet(nn.Module):
    plan_recognition: nn.Module
    plan_proposal: Actor
    action_decoder: nn.Module
    kl_balancing: bool = True
    kl_alpha: float = 0.8
    add_random_plan_loss: bool = False

    def process_batch(self, observations: Array, train: bool = False):
        """pp_state = first obs, pp_goal = last obs xy
        (play_lmp_d4rl.py:108-115)."""
        pp_state = observations[:, 0]
        pp_goal = observations[:, -1, :2]
        pp_dist = self.plan_proposal.get_dist(pp_state, pp_goal)
        pr_dist = self.plan_recognition(observations, train=train)
        return pp_dist, pr_dist

    def compute_loss(
        self,
        key: Array,
        observations: Array,
        actions: Array,
        kl_beta: Array,
        train: bool = True,
    ):
        k_plan, k_rand, k_pp = jax.random.split(key, 3)
        pp_dist, pr_dist = self.process_batch(observations, train)
        posterior, prior = _base_normal(pr_dist), _base_normal(pp_dist)
        if self.kl_balancing:
            kl_loss = balanced_kl(posterior, prior, self.kl_alpha).mean()
        else:
            kl_loss = kl_diag_normal(posterior, prior).mean()
        kl_scaled = kl_loss * kl_beta

        latent_plan = pr_dist.sample(k_plan)
        action_loss = self.action_decoder.loss(
            latent_plan, observations[:, :-1], actions[:, :-1], train=train
        )
        random_plan = jax.random.uniform(
            k_rand, pr_dist.mean.shape, minval=-1.0, maxval=1.0
        )
        random_loss = self.action_decoder.loss(
            random_plan, observations[:, :-1], actions[:, :-1], train=train
        )
        total = kl_scaled + action_loss
        if self.add_random_plan_loss:
            total = total - random_loss
        metrics = {
            "kl_loss": kl_loss,
            "kl_loss_scaled": kl_scaled,
            "action_loss": action_loss,
            "random_plan_action_loss": random_loss,
            "total_loss": total,
        }
        return total, metrics, pp_dist.sample(k_pp)

    # rollout-time pieces
    def propose_plan(self, obs: Array, goal_xy: Array):
        return self.plan_proposal.get_dist(obs, goal_xy)

    def recognize_plan(self, observations: Array):
        return self.plan_recognition(observations)

    def decode_action(self, key, latent_plan, obs, carry):
        action, carry = self.action_decoder.act(
            key, latent_plan, obs[:, None], None, carry
        )
        return action[:, 0], carry


class PlayLMPD4RLModule(AlgorithmModule):
    name = "play_lmp_d4rl"

    def build(self) -> None:
        cfg = self.cfg
        self.latent_plan_dim = int(cfg.get("latent_plan_dim", 16))
        state_dim = int(cfg["state_dim"])
        action_dim = int(cfg.get("action_dim", 8))
        self.pp_obs = self.pr_mods = self.ad_mods = ()

        pr_cfg = dict(cfg.get("plan_recognition", {}))
        pr_cls = get_class(
            pr_cfg.pop(
                "_target_",
                "tacorl_tpu.networks.plan_recognition.PlanRecognitionTransformer",
            )
        )
        plan_recognition = pr_cls(
            state_dim=state_dim, latent_plan_dim=self.latent_plan_dim, **pr_cfg
        )
        pp_cfg = dict(cfg.get("plan_proposal", {}))
        policy_cfg = dict(pp_cfg.pop("policy", {}))
        policy_cls = get_class(
            policy_cfg.pop("_target_", "tacorl_tpu.networks.actor.MLPPolicy")
        )
        plan_proposal = Actor(
            policy=policy_cls(action_dim=self.latent_plan_dim, **policy_cfg),
            action_dim=self.latent_plan_dim,
            state_dim=state_dim,
            goal_dim=2,
            **pp_cfg,
        )
        ad_cfg = dict(cfg.get("action_decoder", {}))
        ad_cls = get_class(
            ad_cfg.pop(
                "_target_",
                "tacorl_tpu.networks.action_decoder.ActionDecoderLogistic",
            )
        )
        ad_cfg.setdefault("out_features", action_dim)
        ad_cfg.setdefault("discrete_gripper", False)
        ad_cfg.setdefault("act_max_bound", [1.0] * action_dim)
        ad_cfg.setdefault("act_min_bound", [-1.0] * action_dim)
        action_decoder = ad_cls(
            state_dim=state_dim,
            goal_dim=2,
            latent_plan_dim=self.latent_plan_dim,
            **ad_cfg,
        )
        self.net = PlayLMPD4RLNet(
            plan_recognition=plan_recognition,
            plan_proposal=plan_proposal,
            action_decoder=action_decoder,
            kl_balancing=bool(cfg.get("kl_balancing", True)),
            kl_alpha=float(cfg.get("kl_alpha", 0.8)),
            add_random_plan_loss=bool(cfg.get("add_random_plan_loss", False)),
        )
        self.optimizer = optax.adam(float(cfg.get("lr", 1e-4)))
        self.kl_beta = float(cfg.get("kl_beta", 1e-3))

    def set_kl_beta(self, kl_beta: float) -> None:
        self.kl_beta = float(kl_beta)

    def step_scalars(self) -> Dict[str, float]:
        return {"kl_beta": self.kl_beta}

    def init_state(self, rng: Array, example_batch: Dict) -> TrainState:
        k_params, k_drop, k_loss = jax.random.split(rng, 3)
        example_batch = jax.tree.map(
            lambda x: x[:2, :2] if getattr(x, "ndim", 0) >= 2 else x,
            example_batch,
        )
        variables = self.net.init(
            {"params": k_params, "dropout": k_drop},
            k_loss,
            jnp.asarray(example_batch["observations"], dtype=jnp.float32),
            jnp.asarray(example_batch["actions"], dtype=jnp.float32),
            jnp.asarray(0.0),
            False,
            method="compute_loss",
        )
        params = variables["params"]
        return TrainState.create(params, self.optimizer.init(params))

    def make_train_step(self):
        net, optimizer = self.net, self.optimizer

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state, batch, rng, scalars):
            rng = jax.random.fold_in(rng, state.step)
            k_drop, k_loss = jax.random.split(rng)
            obs = batch["observations"].astype(jnp.float32)
            actions = batch["actions"].astype(jnp.float32)

            def loss_fn(params):
                total, metrics, _ = net.apply(
                    {"params": params},
                    k_loss, obs, actions, scalars["kl_beta"], True,
                    method="compute_loss", rngs={"dropout": k_drop},
                )
                return total, metrics

            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return TrainState(state.step + 1, params, opt_state, state.aux), metrics

        return train_step

    def make_val_step(self):
        net = self.net

        @jax.jit
        def val_step(state, batch, rng, scalars):
            obs = batch["observations"].astype(jnp.float32)
            actions = batch["actions"].astype(jnp.float32)
            _total, metrics, sampled_plan_pp = net.apply(
                {"params": state.params},
                rng, obs, actions, scalars["kl_beta"], False,
                method="compute_loss",
            )
            return metrics, {
                "sampled_plan_pp": sampled_plan_pp, "idx": batch["idx"]
            }

        return val_step
