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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tacorl_tpu.config import load_yaml  # noqa: E402
from tacorl_tpu.core.checkpoint import CheckpointManager  # noqa: E402
from tacorl_tpu.core.train_state import TrainState  # noqa: E402
from tacorl_tpu.utils.torch_convert import (  # noqa: E402
    assemble_cql,
    assemble_play_lmp,
    assemble_ril,
    assemble_tacorl,
    load_lightning_state_dict,
)

KINDS = ["play_lmp", "tacorl", "cql", "ril"]


def _lmp_kwargs(module_cfg: dict) -> dict:
    pr_cfg = module_cfg.get("plan_recognition", {})
    ad_cfg = module_cfg.get("action_decoder", {})
    return {
        "pr_num_layers": int(pr_cfg.get("num_layers", 2)),
        "pr_num_heads": int(pr_cfg.get("num_heads", 8)),
        "ad_num_layers": int(ad_cfg.get("num_layers", 2)),
        "ad_rnn_type": ad_cfg.get("rnn_model", "rnn_decoder").replace(
            "_decoder", ""
        ),
    }


def _rl_kwargs(module_cfg: dict) -> dict:
    return {
        "policy_num_layers": int(
            module_cfg.get("policy", {}).get("num_layers", 3)
        ),
        "q_num_layers": int(
            module_cfg.get("q_network", {}).get("num_layers", 3)
        ),
    }


def convert(kind: str, sd: dict, module_cfg: dict):
    """Returns (params, aux) for the given released-checkpoint family
    (reference README.md:98-104: play_lmp / tacorl / cql / ril weights)."""
    modalities = list(
        module_cfg.get(
            "obs_modalities",
            module_cfg.get("plan_recognition_modalities", ["rgb_static"]),
        )
    )
    if kind == "play_lmp":
        lmp = _lmp_kwargs(module_cfg)
        ad_cfg = module_cfg.get("action_decoder", {})
        params = assemble_play_lmp(
            sd,
            image_modalities=modalities,
            pp_num_layers=module_cfg.get("plan_proposal", {})
            .get("policy", {})
            .get("num_layers", 3),
            discrete_gripper=bool(ad_cfg.get("discrete_gripper", True)),
            **lmp,
        )
        return params, None
    if kind == "cql":
        return assemble_cql(
            sd, modalities,
            discrete_gripper=bool(
                module_cfg.get("policy", {}).get("discrete_gripper", True)
            ),
            **_rl_kwargs(module_cfg),
        )
    if kind == "tacorl":
        ad_cfg = module_cfg.get("action_decoder", {})
        return assemble_tacorl(
            sd, modalities,
            ad_discrete_gripper=bool(ad_cfg.get("discrete_gripper", True)),
            **_rl_kwargs(module_cfg), **_lmp_kwargs(module_cfg),
        )
    if kind == "ril":
        params = assemble_ril(
            sd, modalities,
            hl_num_layers=int(
                module_cfg.get("high_level_policy", {}).get("num_layers", 3)
            ),
            ll_num_layers=int(
                module_cfg.get("low_level_policy", {}).get("num_layers", 3)
            ),
            ll_discrete_gripper=bool(
                module_cfg.get("low_level_policy", {}).get(
                    "discrete_gripper", False
                )
            ),
        )
        return params, None
    raise ValueError(f"unknown kind {kind!r}; choose from {KINDS}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--module-config", required=True,
                        help="our module config yaml for the run")
    parser.add_argument("--out", required=True)
    parser.add_argument("--kind", default="play_lmp", choices=KINDS)
    args = parser.parse_args()

    sd = load_lightning_state_dict(args.ckpt)
    cfg = load_yaml(args.module_config)
    module_cfg = cfg.get("module", cfg)
    params, aux = convert(args.kind, sd, module_cfg)
    params = jax.tree.map(jnp.asarray, params)

    # The saved opt_state must have the MODULE's optimizer structure (e.g.
    # CQL's per-group multi-transform) or restore_state's structured
    # restore will reject the checkpoint.
    if "_target_" in module_cfg:
        from tacorl_tpu.config import get_class

        module = get_class(module_cfg["_target_"])(dict(module_cfg))
        state = module.make_state_target(params, aux_template=aux or {})
    else:
        import optax

        state = TrainState.create(
            params, optax.adam(1e-4).init(params), aux=aux or {}
        )
    manager = CheckpointManager(args.out, config={"module": module_cfg})
    manager.save(0, state)
    print(f"converted {args.kind} checkpoint written to {args.out}")


if __name__ == "__main__":
    main()
