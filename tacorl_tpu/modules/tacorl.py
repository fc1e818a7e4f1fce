"""TACO-RL: CQL over frozen latent plans.

Capability parity with the reference TACORL module
(modules/tacorl/tacorl.py:21-300): loads a pretrained Play-LMP run, reuses
its plan-proposal network as the RL actor over the latent-plan action space,
builds fresh twin critics (+targets) whose encoders mirror the LMP encoder
dims, freezes the perceptual encoder + plan-recognition posterior, optionally
finetunes the action decoder with its own optimizer, and trains with the CQL
update on relabeled transitions (s_0, goal, latent_plan, r = [disp == 1]).

TPU-first differences:
  * checkpoint grafting is param-tree surgery: the actor wrapper's params are
    assembled from the LMP subtrees at init (tacorl.py:51-70 equivalent);
    freezing = simply no optimizer group for those subtrees.
  * get_rl_batch's python per-trajectory loop (tacorl.py:142-179) becomes
    vectorized slicing of the already-augmented window tensors.
  * posterior sampling + decoder finetune + full CQL update run in the same
    single jitted step.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import Array

from tacorl_tpu.config import get_class
from tacorl_tpu.core.checkpoint import load_module_from_checkpoint
from tacorl_tpu.core.optimizers import GroupOptimizer
from tacorl_tpu.core.train_state import TrainState
from tacorl_tpu.modules.cql import CQLModule
from tacorl_tpu.networks.critic import Critic
from tacorl_tpu.networks.late_fusion import build_late_fusion
from tacorl_tpu.networks.visual_wrappers import (
    VisualActorWrapper,
    VisualCriticWrapper,
)

__all__ = ["TACORLModule"]


class TACORLModule(CQLModule):
    name = "tacorl"

    def build(self) -> None:
        cfg = self.cfg
        self.play_lmp_dir = cfg["play_lmp_dir"]
        self.lmp_epoch_to_load = int(cfg.get("lmp_epoch_to_load", -1))
        self.finetune_action_decoder = bool(
            cfg.get("finetune_action_decoder", False)
        )
        self.action_decoder_lr = float(cfg.get("action_decoder_lr", 1e-4))
        # Load the pretrained LMP (module + weights) before the CQL build so
        # build_networks can graft from it (tacorl.py:44-50).
        self.lmp, self._lmp_state = load_module_from_checkpoint(
            self.play_lmp_dir,
            step=self.lmp_epoch_to_load,
            overwrite_cfg=cfg.get("overwrite_lmp_cfg") or None,
        )
        cfg.setdefault("action_dim", self.lmp.latent_plan_dim)
        cfg["obs_modalities"] = list(self.lmp.pp_obs)
        cfg["goal_modalities"] = list(self.lmp.pp_goal)
        super().build()
        if self.finetune_action_decoder:
            self.optimizer.groups["action_decoder"] = optax.adam(
                self.action_decoder_lr
            )

    # -- networks ---------------------------------------------------------------

    def build_networks(self) -> None:
        cfg = self.cfg
        lmp_net = self.lmp.net
        # Actor = LMP plan-proposal behind the LMP encoder + goal encoder
        self.actor_net = VisualActorWrapper(
            encoder=lmp_net.perceptual_encoder,
            goal_encoder=lmp_net.goal_encoder,
            env_modalities=self.obs_modalities,
            goal_modalities=self.goal_modalities,
            actor=lmp_net.plan_proposal,
        )
        # Critics: encoder latent dims mirror the LMP encoder (tacorl.py:82-92)
        critic_enc_cfg = cfg.get("critic_encoder", {}).get("networks")
        if critic_enc_cfg is None:
            critic_enc_cfg = self.lmp.cfg["perceptual_encoder"]["networks"]
        all_mods = list(dict.fromkeys(self.obs_modalities + self.goal_modalities))
        vector_dims = dict(self.lmp.cfg.get("vector_dims", {}))
        policy = lmp_net.plan_proposal.policy
        q_cfg = dict(cfg.get("q_network", {}))
        q_cls = get_class(
            q_cfg.pop("_target_", "tacorl_tpu.networks.critic.MLPQNetwork")
        )
        q_cfg.setdefault("num_layers", policy.num_layers)
        q_cfg.setdefault("hidden_dim", policy.hidden_dim)
        self.critic_net = VisualCriticWrapper(
            encoder=build_late_fusion(critic_enc_cfg, all_mods, vector_dims),
            goal_encoder=lmp_net.goal_encoder,
            env_modalities=self.obs_modalities,
            goal_modalities=self.goal_modalities,
            critic=Critic(
                q_network=q_cls(**q_cfg),
                state_dim=lmp_net.plan_proposal.state_dim,
                goal_dim=lmp_net.plan_proposal.goal_dim,
                action_dim=self.action_dim,
            ),
        )

    # -- state: graft pretrained weights -----------------------------------------

    def init_state(self, rng: Array, example_batch: Dict) -> TrainState:
        lmp_params = self._lmp_state.params
        k_aug, k_q1, k_q2 = jax.random.split(rng, 3)
        example_batch = jax.tree.map(
            lambda x: x[:2] if getattr(x, "ndim", 0) >= 1 else x, example_batch
        )
        states = self.transforms(k_aug, example_batch["states"], train=False)
        s0 = {m: states[m][:, 0] for m in states}
        goal = self.transforms(
            jax.random.fold_in(k_aug, 1), example_batch["goal"], train=False
        )
        obs = {"observation": s0, "goal": goal}
        latent_plan = jnp.zeros((2, self.action_dim))

        # actor params grafted straight from the LMP checkpoint
        actor_params = {
            "encoder": copy.deepcopy(lmp_params["perceptual_encoder"]),
            "goal_encoder": copy.deepcopy(lmp_params["goal_encoder"]),
            "actor": copy.deepcopy(lmp_params["plan_proposal"]),
        }
        q1_params = self.critic_net.init(k_q1, obs, latent_plan)["params"]
        q2_params = self.critic_net.init(k_q2, obs, latent_plan)["params"]
        if bool(self.cfg.get("init_critic_encoder_from_lmp", False)):
            # Warm-start the critics' perceptual/goal encoders from the
            # pretrained LMP (recovery recipe for the visual CQL phase,
            # VERDICT r4 #4): fresh conv critics must first relearn
            # task-relevant features before their Q-landscape means anything,
            # and until then the actor's Q-ascent walks the BC-warm-started
            # proposal off the plan manifold. Grafting the (trainable copies
            # of the) LMP features makes Q accurate early. The reference
            # builds critics fresh (tacorl.py:82-92) — this is a
            # config-gated extension, off by default.
            for q_params in (q1_params, q2_params):
                for sub in ("encoder", "goal_encoder"):
                    src = lmp_params[
                        "perceptual_encoder" if sub == "encoder" else sub
                    ]
                    dst = q_params.get(sub)
                    if (
                        dst is not None
                        and jax.tree.structure(dst)
                        == jax.tree.structure(src)
                        and all(
                            a.shape == b.shape
                            for a, b in zip(
                                jax.tree.leaves(dst), jax.tree.leaves(src)
                            )
                        )
                    ):
                        q_params[sub] = copy.deepcopy(src)
        params = {
            "actor": actor_params,
            "q1": q1_params,
            "q2": q2_params,
            "log_alpha": jnp.zeros((1,)),
            # frozen LMP parts (no optimizer group -> never updated)
            "perceptual_encoder": copy.deepcopy(
                lmp_params["perceptual_encoder"]
            ),
            "plan_recognition": copy.deepcopy(lmp_params["plan_recognition"]),
            "goal_encoder": copy.deepcopy(lmp_params["goal_encoder"]),
            # trainable iff finetune_action_decoder
            "action_decoder": copy.deepcopy(lmp_params["action_decoder"]),
        }
        if self.with_lagrange:
            params["log_alpha_prime"] = jnp.zeros((1,))
        aux = {
            "target_q1": jax.tree.map(jnp.copy, q1_params),
            "target_q2": jax.tree.map(jnp.copy, q2_params),
        }
        return TrainState.create(params, self.optimizer.init(params), aux=aux)

    # -- LMP pieces ----------------------------------------------------------------

    def _lmp_embed(self, params, states: Dict[str, Array]) -> Dict[str, Array]:
        """(B, T, ...) states -> per-modality (B, T, d) embeddings through the
        frozen perceptual encoder."""
        return self.lmp.net.apply(
            {"params": {"perceptual_encoder": params["perceptual_encoder"]}},
            states,
            method="get_emb_states",
        )

    def _posterior_plan(self, params, emb, key: Array) -> Array:
        """Frozen plan-recognition posterior sample (get_pr_latent_plan,
        tacorl.py:235-252) — torch .sample(): no gradient."""
        pr_states = jnp.concatenate(
            [emb[m] for m in self.lmp.pr_mods], axis=-1
        )
        pr_dist = self.lmp.net.plan_recognition.apply(
            {"params": params["plan_recognition"]}, pr_states
        )
        return jax.lax.stop_gradient(pr_dist.sample(key))

    def _decoder_loss(self, decoder_params, emb, actions, latent_plan) -> Array:
        """Imitation loss for optional decoder finetuning
        (compute_action_decoder_update, tacorl.py:206-233)."""
        ad_states = jnp.concatenate(
            [emb[m] for m in self.lmp.ad_mods], axis=-1
        )
        return self.lmp.net.action_decoder.apply(
            {"params": decoder_params},
            jax.lax.stop_gradient(latent_plan),
            jax.lax.stop_gradient(ad_states[:, :-1]),
            actions[:, :-1],
            method="loss",
        )

    # -- update --------------------------------------------------------------------

    def _tacorl_update(self, state, batch, rng, scalars, optimize: bool):
        k_aug, k_plan, k_cql = jax.random.split(rng, 3)
        states = self.transforms(k_aug, batch["states"], train=optimize)
        goal = self.transforms(
            jax.random.fold_in(k_aug, 1), batch["goal"], train=optimize
        )
        actions = batch["actions"].astype(jnp.float32)
        disp = batch["disp"].astype(jnp.float32)

        emb = self._lmp_embed(state.params, states)
        latent_plan = self._posterior_plan(state.params, emb, k_plan)

        metrics: Dict[str, Array] = {}
        new_params = dict(state.params)
        opt_state = state.opt_state
        dec_loss, dec_grads = jax.value_and_grad(self._decoder_loss)(
            state.params["action_decoder"], emb, actions, latent_plan
        )
        metrics["action_loss"] = dec_loss
        if optimize and self.finetune_action_decoder:
            new_dec, opt_state = self.optimizer.update_group(
                "action_decoder", dec_grads, opt_state, state.params
            )
            new_params["action_decoder"] = new_dec

        # vectorized get_rl_batch (tacorl.py:142-179)
        s0 = {m: states[m][:, 0] for m in states}
        s_last = {m: states[m][:, -1] for m in states}
        success = (disp == 1.0).astype(jnp.float32)
        rl_batch = {
            "observations": {"observation": s0, "goal": goal},
            "actions": latent_plan,
            "next_observations": {"observation": s_last, "goal": goal},
            "rewards": success,
            "terminals": success,
        }
        metrics["rl_batch_success_rate"] = success.mean()

        # CQL update on the relabeled batch — pass pre-transformed obs
        mid_state = TrainState(
            step=state.step, params=new_params, opt_state=opt_state,
            aux=state.aux,
        )
        new_state, cql_metrics = self._compute_update_core(
            mid_state, rl_batch, k_cql, scalars, optimize
        )
        metrics.update(cql_metrics)
        return new_state, metrics

    def _compute_update_core(self, state, batch, rng, scalars, optimize):
        """CQL update without re-running image transforms (they were applied
        to the full window already)."""
        return super()._compute_update(
            state, batch, rng, scalars, optimize, apply_transforms=False
        )

    def _compute_update(self, state, batch, rng, scalars, optimize):
        return self._tacorl_update(state, batch, rng, scalars, optimize)

    # -- rollout support --------------------------------------------------------------

    def make_plan_and_decode_fns(self):
        """Rollout helpers: actor emits a latent plan; the (finetuned) decoder
        streams actions (evaluation/rollout_manager.py:310-431 semantics)."""

        @jax.jit
        def propose(params, obs, key, deterministic=True):
            obs_t = self.transforms(key, obs, train=False)
            plan, _ = self._actor_apply(
                params["actor"], "get_actions", obs_t, key, deterministic, False
            )
            return plan

        @jax.jit
        def decode(params, key, latent_plan, obs, carry):
            obs_t = self.transforms(key, obs, train=False)
            emb = self.lmp.net.apply(
                {"params": {"perceptual_encoder": params["perceptual_encoder"]}},
                obs_t,
                self.lmp.ad_mods,
                method="encode_frame",
            )
            action, carry = self.lmp.net.action_decoder.apply(
                {"params": params["action_decoder"]},
                key,
                latent_plan,
                emb[:, None],
                None,
                carry,
                method="act",
            )
            return action[:, 0], carry

        return propose, decode
