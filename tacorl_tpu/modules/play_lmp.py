"""Play-LMP: sequence-level conditional VAE over play windows.

Capability parity with the reference PlayLMP LightningModule
(modules/play_lmp/play_lmp_for_rl.py:17-368): a LateFusion encoder embeds the
window, the plan-recognition posterior and plan-proposal prior define a
balanced KL, and an RNN action decoder scores actions with a
discretized-logistic-mixture NLL. TPU-first: the ENTIRE step — uint8
augmentation, encoder over (B*T) frames, posterior/prior, KL, decoder NLL,
backward, and the Adam update — is one jitted function; KL-beta annealing is
a device scalar argument so schedule changes never retrace.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from jax import Array

from tacorl_tpu.config import get_class
from tacorl_tpu.core.distributions import DiagNormal, TanhNormal, balanced_kl, kl_diag_normal
from tacorl_tpu.core.train_state import TrainState
from tacorl_tpu.data.transforms import DeviceTransforms
from tacorl_tpu.modules.base import AlgorithmModule
from tacorl_tpu.networks.actor import Actor
from tacorl_tpu.networks.late_fusion import LateFusion, build_late_fusion

__all__ = ["PlayLMPNet", "PlayLMPModule"]


def _base_normal(dist) -> DiagNormal:
    """KL is computed between the base normals when the posterior is
    tanh-squashed (play_lmp_for_rl.py:266-271)."""
    return dist.normal if isinstance(dist, TanhNormal) else dist


class PlayLMPNet(nn.Module):
    perceptual_encoder: LateFusion
    goal_encoder: nn.Module
    plan_recognition: nn.Module
    plan_proposal: Actor
    action_decoder: nn.Module
    pp_obs_modalities: Tuple[str, ...]
    pp_goal_modalities: Tuple[str, ...]
    pr_modalities: Tuple[str, ...]
    ad_modalities: Tuple[str, ...]
    kl_balancing: bool = True
    kl_alpha: float = 0.8
    add_random_plan_loss: bool = False
    log_random_plan_loss: bool = False

    @property
    def all_modalities(self) -> Tuple[str, ...]:
        seen: List[str] = []
        for m in (
            self.pp_obs_modalities
            + self.pp_goal_modalities
            + self.pr_modalities
            + self.ad_modalities
        ):
            if m not in seen:
                seen.append(m)
        return tuple(seen)

    # -- embeddings --------------------------------------------------------

    def get_emb_states(
        self, states: Dict[str, Array], train: bool = False
    ) -> Dict[str, Array]:
        """Encode every modality over flattened (B*T) frames, back to
        (B, T, d) (play_lmp_for_rl.py:187-198)."""
        b, t = next(iter(states.values())).shape[:2]
        flat = {k: v.reshape((b * t,) + v.shape[2:]) for k, v in states.items()}
        emb = self.perceptual_encoder.encode(
            flat, self.all_modalities, cat_output=False, train=train
        )
        return {k: v.reshape(b, t, -1) for k, v in emb.items()}

    def process_batch(self, states: Dict[str, Array], train: bool = False):
        emb = self.get_emb_states(states, train)
        pp_state = jnp.concatenate(
            [emb[m][:, 0] for m in self.pp_obs_modalities], axis=-1
        )
        pp_goal = jnp.concatenate(
            [emb[m][:, -1] for m in self.pp_goal_modalities], axis=-1
        )
        pp_goal = self.goal_encoder(pp_goal)
        pp_dist = self.plan_proposal.get_dist(pp_state, pp_goal)
        pr_states = jnp.concatenate(
            [emb[m] for m in self.pr_modalities], axis=-1
        )
        pr_dist = self.plan_recognition(pr_states, train=train)
        return emb, pp_dist, pr_dist, pp_goal

    # -- losses --------------------------------------------------------------

    def compute_kl_loss(self, pr_dist, pp_dist) -> Array:
        posterior, prior = _base_normal(pr_dist), _base_normal(pp_dist)
        if self.kl_balancing:
            return balanced_kl(posterior, prior, self.kl_alpha).mean()
        return kl_diag_normal(posterior, prior).mean()

    def _action_loss(
        self, key, ad_states, actions, latent_plan, latent_goal, train
    ) -> Tuple[Array, Array, Array]:
        """Returns (loss, pred_actions, gripper_accuracy). Without
        include_goal the final frame is dropped: a plan explains actions up
        to S_g, not the action in S_g (play_lmp_for_rl.py:141-155)."""
        include_goal = self.action_decoder.include_goal
        if include_goal:
            loss, pred = self.action_decoder.loss_and_act(
                key, latent_plan, ad_states, actions, latent_goal, train=train
            )
            gt_gripper = actions[..., -1]
        else:
            loss, pred = self.action_decoder.loss_and_act(
                key, latent_plan, ad_states[:, :-1], actions[:, :-1], train=train
            )
            gt_gripper = actions[:, :-1, -1]
        pred_gripper = jnp.where(pred[..., -1] > 0, 1.0, -1.0)
        grip_acc = jnp.mean((gt_gripper == pred_gripper).astype(jnp.float32))
        return loss, pred, grip_acc

    def compute_loss(
        self,
        key: Array,
        states: Dict[str, Array],
        actions: Array,
        kl_beta: Array,
        train: bool = True,
    ):
        """Full ELBO step (play_lmp_for_rl.py:221-257). Returns
        (total_loss, metrics, sampled_plan_pp)."""
        k_plan, k_dec, k_rand_plan, k_rand_goal, k_rand_dec, k_pp = (
            jax.random.split(key, 6)
        )
        emb, pp_dist, pr_dist, lat_goal = self.process_batch(states, train)
        kl_loss = self.compute_kl_loss(pr_dist, pp_dist)
        kl_scaled = kl_loss * kl_beta

        ad_states = jnp.concatenate(
            [emb[m] for m in self.ad_modalities], axis=-1
        )
        latent_plan = pr_dist.sample(k_plan)  # rsample: gradients flow
        action_loss, _, grip_acc = self._action_loss(
            k_dec, ad_states, actions, latent_plan, lat_goal, train
        )

        metrics = {
            "kl_loss": kl_loss,
            "kl_loss_scaled": kl_scaled,
            "action_loss": action_loss,
            "gripper_accuracy": grip_acc,
        }
        total = kl_scaled + action_loss

        if self.add_random_plan_loss or self.log_random_plan_loss:
            random_plan = jax.random.uniform(
                k_rand_plan, pr_dist.mean.shape, minval=-1.0, maxval=1.0
            )
            random_goal = jax.random.uniform(
                k_rand_goal, lat_goal.shape, minval=-1.0, maxval=1.0
            )
            rand_loss, _, rand_acc = self._action_loss(
                k_rand_dec, ad_states, actions, random_plan, random_goal, train
            )
            metrics["random_plan_action_loss"] = rand_loss
            metrics["random_plan_gripper_accuracy"] = rand_acc
            if self.add_random_plan_loss:
                total = total - rand_loss

        metrics["total_loss"] = total
        sampled_plan_pp = pp_dist.sample(k_pp)
        return total, metrics, sampled_plan_pp

    # -- rollout-time interfaces (used by evaluation managers) -------------

    def encode_frame(self, obs: Dict[str, Array], modalities, train: bool = False):
        return self.perceptual_encoder.encode(
            obs, tuple(modalities), cat_output=True, train=train
        )

    def propose_plan(self, obs: Dict[str, Array], goal: Dict[str, Array]):
        """Plan-proposal prior over latent plans from current obs + goal image
        (evaluation/rollout_manager.py:215-235 semantics)."""
        pp_state = self.encode_frame(obs, self.pp_obs_modalities)
        pp_goal = self.encode_frame(goal, self.pp_goal_modalities)
        pp_goal = self.goal_encoder(pp_goal)
        return self.plan_proposal.get_dist(pp_state, pp_goal)

    def recognize_plan(self, states: Dict[str, Array], train: bool = False):
        emb = self.get_emb_states(states, train)
        pr_states = jnp.concatenate([emb[m] for m in self.pr_modalities], axis=-1)
        return self.plan_recognition(pr_states, train=train)

    def decode_action(
        self,
        key: Array,
        latent_plan: Array,
        obs: Dict[str, Array],
        carry,
        latent_goal: Optional[Array] = None,
    ):
        """One streaming decoder step: encode the frame, run one RNN step."""
        emb = self.encode_frame(obs, self.ad_modalities)
        action, carry = self.action_decoder.act(
            key, latent_plan, emb[:, None], latent_goal, carry
        )
        return action[:, 0], carry


class PlayLMPModule(AlgorithmModule):
    name = "play_lmp"

    def build(self) -> None:
        cfg = self.cfg
        self.latent_plan_dim = int(cfg.get("latent_plan_dim", 16))
        self.pp_obs = tuple(cfg.get("plan_proposal_obs_modalities", ["rgb_static"]))
        self.pp_goal = tuple(cfg.get("plan_proposal_goal_modalities", ["rgb_static"]))
        self.pr_mods = tuple(cfg.get("plan_recognition_modalities", ["rgb_static"]))
        self.ad_mods = tuple(cfg.get("action_decoder_modalities", ["rgb_static"]))
        vector_dims = dict(cfg.get("vector_dims", {}))
        all_mods: List[str] = []
        for m in self.pp_obs + self.pp_goal + self.pr_mods + self.ad_mods:
            if m not in all_mods:
                all_mods.append(m)

        encoder = build_late_fusion(
            cfg["perceptual_encoder"]["networks"], all_mods, vector_dims
        )
        pp_state_dim = encoder.calc_state_dim(self.pp_obs)
        pp_goal_dim = encoder.calc_state_dim(self.pp_goal)
        pr_dim = encoder.calc_state_dim(self.pr_mods)
        ad_dim = encoder.calc_state_dim(self.ad_mods)

        goal_cfg = dict(cfg.get("goal_encoder", {}))
        goal_cls = get_class(
            goal_cfg.pop("_target_", "tacorl_tpu.networks.goal_encoder.VisualGoalEncoder")
        )
        goal_encoder = goal_cls(out_features=pp_goal_dim, **goal_cfg)

        pr_cfg = dict(cfg.get("plan_recognition", {}))
        pr_cls = get_class(
            pr_cfg.pop(
                "_target_",
                "tacorl_tpu.networks.plan_recognition.PlanRecognitionTransformer",
            )
        )
        plan_recognition = pr_cls(
            state_dim=pr_dim, latent_plan_dim=self.latent_plan_dim, **pr_cfg
        )

        pp_cfg = dict(cfg.get("plan_proposal", {}))
        policy_cfg = dict(pp_cfg.pop("policy", {}))
        policy_cls = get_class(
            policy_cfg.pop("_target_", "tacorl_tpu.networks.actor.MLPPolicy")
        )
        plan_proposal = Actor(
            policy=policy_cls(action_dim=self.latent_plan_dim, **policy_cfg),
            action_dim=self.latent_plan_dim,
            state_dim=pp_state_dim,
            goal_dim=pp_goal_dim,
            **pp_cfg,
        )

        ad_cfg = dict(cfg.get("action_decoder", {}))
        ad_cls = get_class(
            ad_cfg.pop(
                "_target_",
                "tacorl_tpu.networks.action_decoder.ActionDecoderLogistic",
            )
        )
        action_decoder = ad_cls(
            state_dim=ad_dim,
            goal_dim=pp_goal_dim,
            latent_plan_dim=self.latent_plan_dim,
            **ad_cfg,
        )

        self.net = PlayLMPNet(
            perceptual_encoder=encoder,
            goal_encoder=goal_encoder,
            plan_recognition=plan_recognition,
            plan_proposal=plan_proposal,
            action_decoder=action_decoder,
            pp_obs_modalities=self.pp_obs,
            pp_goal_modalities=self.pp_goal,
            pr_modalities=self.pr_mods,
            ad_modalities=self.ad_mods,
            kl_balancing=bool(cfg.get("kl_balancing", True)),
            kl_alpha=float(cfg.get("kl_alpha", 0.8)),
            add_random_plan_loss=bool(cfg.get("add_random_plan_loss", False)),
            log_random_plan_loss=bool(cfg.get("log_random_plan_loss", False)),
        )
        self.transforms = DeviceTransforms(cfg.get("transforms"))
        self.optimizer = optax.adam(float(cfg.get("lr", 1e-4)))
        self.kl_beta = float(cfg.get("kl_beta", 1e-3))

    # -- schedule ------------------------------------------------------------

    def set_kl_beta(self, kl_beta: float) -> None:
        """KL-schedule callback hook (play_lmp_for_rl.py:303-305)."""
        self.kl_beta = float(kl_beta)

    def step_scalars(self) -> Dict[str, float]:
        return {"kl_beta": self.kl_beta}

    # -- state -----------------------------------------------------------------

    def init_state(self, rng: Array, example_batch: Dict) -> TrainState:
        k_aug, k_params, k_drop, k_loss = jax.random.split(rng, 4)
        # parameters don't depend on batch/window size: init on a (2, 2) slice
        # to keep the init compile tiny
        example_batch = jax.tree.map(
            lambda x: x[:2, :2] if getattr(x, "ndim", 0) >= 2 else x,
            example_batch,
        )
        states = self.transforms(k_aug, example_batch["states"], train=False)
        variables = self.net.init(
            {"params": k_params, "dropout": k_drop},
            k_loss,
            states,
            jnp.asarray(example_batch["actions"]),
            jnp.asarray(0.0),
            False,
            method="compute_loss",
        )
        params = variables["params"]
        return TrainState.create(params, self.optimizer.init(params))

    # -- steps --------------------------------------------------------------

    def make_train_step(self):
        net, optimizer, transforms = self.net, self.optimizer, self.transforms

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch: Dict, rng: Array, scalars: Dict):
            rng = jax.random.fold_in(rng, state.step)
            k_aug, k_drop, k_loss = jax.random.split(rng, 3)
            states = transforms(k_aug, batch["states"], train=True)
            actions = batch["actions"].astype(jnp.float32)

            def loss_fn(params):
                total, metrics, _ = net.apply(
                    {"params": params},
                    k_loss,
                    states,
                    actions,
                    scalars["kl_beta"],
                    True,
                    method="compute_loss",
                    rngs={"dropout": k_drop},
                )
                return total, metrics

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                aux=state.aux,
            )
            metrics["grad_norm"] = optax.global_norm(grads)
            return new_state, metrics

        return train_step

    def make_val_step(self):
        net, transforms = self.net, self.transforms

        @jax.jit
        def val_step(state: TrainState, batch: Dict, rng: Array, scalars: Dict):
            k_aug, k_loss = jax.random.split(rng)
            states = transforms(k_aug, batch["states"], train=False)
            actions = batch["actions"].astype(jnp.float32)
            total, metrics, sampled_plan_pp = net.apply(
                {"params": state.params},
                k_loss,
                states,
                actions,
                scalars["kl_beta"],
                False,
                method="compute_loss",
            )
            outputs = {"sampled_plan_pp": sampled_plan_pp, "idx": batch["idx"]}
            if "state_info" in batch:
                # first/last sim states let callbacks recover the tasks a
                # window completed (play_lmp_for_rl.py:350-360 probing)
                outputs["state_info_initial"] = {
                    k: v[:, 0] for k, v in batch["state_info"].items()
                }
                outputs["state_info_final"] = {
                    k: v[:, -1] for k, v in batch["state_info"].items()
                }
            return metrics, outputs

        return val_step
