#!/usr/bin/env python
"""Measured PyTorch baseline for the Play-LMP training step (CPU).

The reference publishes no throughput numbers and this environment has no
GPU, so BASELINE.md's A100 figure is an estimate. This script brackets that
estimate with a *measured* number: a reference-shaped PyTorch Play-LMP
training step (same architecture dims as the reference defaults —
LMPVision encoder latent 32 / hidden 256, 2048/4096 2-layer 8-head
transformer posterior, 2048-hidden 2-layer RNN logistic-mixture decoder,
batch 64 x window 16 x 128x128 rgb_static; see
/root/reference/config/networks/*) run on this host's CPU.

Run the JAX counterpart on the same host with:
    JAX_PLATFORMS=cpu python bench.py
and compare the two for a hardware-free framework-vs-framework ratio.

The torch modules are the hand-written reference-shaped test doubles from
tests/torch_ref.py (used for checkpoint-parity tests) scaled to production
dims; the losses (balanced KL + discretized-logistic NLL + gripper CE)
reproduce the reference's compute shape (play_lmp_for_rl.py:221-301,
action_decoder_logistic.py:184-235).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": "steps/sec"}.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
from torch_ref import (  # noqa: E402
    TActionDecoderLogistic,
    TGoalEncoder,
    TLateFusion,
    TMLPPolicy,
    TPlanRecognitionTransformer,
)


class TorchPlayLMPStep(torch.nn.Module):
    """Full-size reference-shaped Play-LMP train step (fp32 CPU)."""

    def __init__(self, latent_plan_dim=16, n_mixtures=10, action_dim=7):
        super().__init__()
        self.encoder = TLateFusion(["rgb_static"], latent_dim=32, hidden_dim=256)
        state_dim = 32
        self.goal_encoder = TGoalEncoder(state_dim, state_dim, hidden_size=256)
        self.plan_recognition = TPlanRecognitionTransformer(
            state_dim, latent_plan_dim, num_heads=8, num_layers=2,
            encoder_hidden_size=2048, fc_hidden_size=4096,
            max_position_embeddings=16,
        )
        self.plan_proposal = TMLPPolicy(
            state_dim * 2, latent_plan_dim, num_layers=2, hidden_dim=256
        )
        self.action_decoder = TActionDecoderLogistic(
            state_dim + latent_plan_dim, hidden_size=2048, num_layers=2,
            out_features=action_dim, n_mixtures=n_mixtures,
            discrete_gripper=True,
        )
        self.n_classes = 10

    def forward(self, frames, goal, actions):
        b, t = frames.shape[:2]
        emb = self.encoder.encode(
            {"rgb_static": frames.reshape(b * t, *frames.shape[2:])},
            ["rgb_static"],
        ).reshape(b, t, -1)
        goal_emb = self.goal_encoder(
            self.encoder.encode({"rgb_static": goal}, ["rgb_static"])
        )
        # posterior + prior + balanced KL (play_lmp_for_rl.py:259-301)
        post_mean, post_std = self.plan_recognition(emb)
        prior_mean, prior_std = self.plan_proposal(
            torch.cat([emb[:, 0], goal_emb], dim=-1)
        )
        post = torch.distributions.Normal(post_mean, post_std)
        prior = torch.distributions.Normal(prior_mean, prior_std)
        kl_post = torch.distributions.kl_divergence(
            post, torch.distributions.Normal(prior_mean.detach(), prior_std.detach())
        ).mean()
        kl_prior = torch.distributions.kl_divergence(
            torch.distributions.Normal(post_mean.detach(), post_std.detach()), prior
        ).mean()
        kl = 0.8 * kl_post + 0.2 * kl_prior
        z = post.rsample()
        # decoder NLL (discretized logistic, action_decoder_logistic.py:184-235)
        logit_probs, log_scales, means, gripper = self.action_decoder(z, emb)
        cont = actions[..., :-1].unsqueeze(-1)
        centered = cont - means
        inv_std = torch.exp(-log_scales)
        plus = inv_std * (centered + 1.0 / (self.n_classes - 1))
        minus = inv_std * (centered - 1.0 / (self.n_classes - 1))
        cdf_delta = torch.sigmoid(plus) - torch.sigmoid(minus)
        log_prob = torch.log(torch.clamp(cdf_delta, min=1e-12))
        log_prob = log_prob + F.log_softmax(logit_probs, dim=-1)
        nll = -torch.logsumexp(log_prob, dim=-1).mean()
        grip_target = (actions[..., -1] > 0).long()
        ce = F.cross_entropy(gripper.reshape(-1, 2), grip_target.reshape(-1))
        return nll + ce + 1e-3 * kl


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--window", type=int, default=16)
    parser.add_argument("--hw", type=int, default=128)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--steps", type=int, default=10)
    args = parser.parse_args()

    torch.manual_seed(0)
    model = TorchPlayLMPStep()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    rng = np.random.default_rng(0)
    frames = torch.from_numpy(
        rng.standard_normal(
            (args.batch, args.window, 3, args.hw, args.hw), dtype=np.float32
        )
    )
    goal = frames[:, -1].clone()
    actions = torch.from_numpy(
        rng.uniform(-1, 1, (args.batch, args.window, 7)).astype(np.float32)
    )

    def step():
        opt.zero_grad()
        loss = model(frames, goal, actions)
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(args.warmup):
        loss = step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        loss = step()
    dt = time.perf_counter() - t0
    assert math.isfinite(loss)
    print(
        json.dumps(
            {
                "metric": "torch_cpu_play_lmp_train_steps_per_sec",
                "value": round(args.steps / dt, 4),
                "unit": "steps/sec",
                "threads": torch.get_num_threads(),
            }
        )
    )


if __name__ == "__main__":
    main()
