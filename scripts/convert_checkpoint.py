#!/usr/bin/env python
"""Convert a released reference PyTorch-Lightning checkpoint into this
framework's checkpoint format, for success-rate parity evaluation
(BASELINE.md; reference checkpoints: tacorl_calvin.zip, README.md:98-104).

Usage:
    python scripts/convert_checkpoint.py --ckpt /path/to/play_lmp.ckpt \
        --module-config configs_of_run.yaml --out runs/lmp_converted
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import jax.numpy as jnp  # noqa: E402

from tacorl_tpu.config import load_yaml  # noqa: E402
from tacorl_tpu.core.checkpoint import CheckpointManager  # noqa: E402
from tacorl_tpu.core.train_state import TrainState  # noqa: E402
from tacorl_tpu.utils.torch_convert import (  # noqa: E402
    assemble_play_lmp,
    load_lightning_state_dict,
)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--module-config", required=True,
                        help="our module config yaml for the run")
    parser.add_argument("--out", required=True)
    parser.add_argument("--kind", default="play_lmp", choices=["play_lmp"])
    args = parser.parse_args()

    sd = load_lightning_state_dict(args.ckpt)
    cfg = load_yaml(args.module_config)
    module_cfg = cfg.get("module", cfg)
    if args.kind == "play_lmp":
        pr_cfg = module_cfg.get("plan_recognition", {})
        ad_cfg = module_cfg.get("action_decoder", {})
        params = assemble_play_lmp(
            sd,
            image_modalities=module_cfg.get(
                "plan_recognition_modalities", ["rgb_static"]
            ),
            pp_num_layers=module_cfg.get("plan_proposal", {})
            .get("policy", {})
            .get("num_layers", 3),
            pr_num_layers=int(pr_cfg.get("num_layers", 2)),
            pr_num_heads=int(pr_cfg.get("num_heads", 8)),
            ad_num_layers=int(ad_cfg.get("num_layers", 2)),
            ad_rnn_type=ad_cfg.get("rnn_model", "rnn_decoder").replace(
                "_decoder", ""
            ),
            discrete_gripper=bool(ad_cfg.get("discrete_gripper", True)),
        )
    params = jnp.asarray(0.0), params  # keep tree import-light
    _, params = params

    import optax

    state = TrainState.create(params, optax.adam(1e-4).init(params))
    manager = CheckpointManager(args.out, config={"module": module_cfg})
    manager.save(0, state)
    print(f"converted checkpoint written to {args.out}")


if __name__ == "__main__":
    main()
