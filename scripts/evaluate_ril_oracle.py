#!/usr/bin/env python
"""Evaluate a trained RIL module's LOW LEVEL under a ground-truth high level.

The oracle high level (OracleSubgoalAgent) replans from the policy's current
env state: it deep-copies the live env, rolls the scripted expert
``lookahead`` steps forward, and embeds the reached state through the
module's own goal path. Success here means the low level can follow
reachable in-distribution subgoals; failure cleanly indicts the low level —
the controlled experiment VERDICT r4 #6 asked for (the r4 probe used
dataset future frames, which desynchronize from the rollout).

Usage:
    python scripts/evaluate_ril_oracle.py module_path=runs/ril_fake_state \
        data_dir=/path/validation env=fake_calvin lookahead=12 \
        plan_duration=8 filename=out.json [learned_hl=true]

``learned_hl=true`` evaluates the LEARNED high level through the identical
protocol instead (RILAgent), so the two numbers are directly comparable.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from tacorl_tpu.config import compose, instantiate  # noqa: E402
from tacorl_tpu.core.checkpoint import load_module_from_checkpoint  # noqa: E402
from tacorl_tpu.evaluation.agents import (  # noqa: E402
    OracleSubgoalAgent,
    RILAgent,
)
from tacorl_tpu.evaluation.manager import EvaluationManager  # noqa: E402
from tacorl_tpu.evaluation.rollout_generator import (  # noqa: E402
    SingleTaskRolloutGenerator,
)
from tacorl_tpu.evaluation.rollout_manager import RILRollout  # noqa: E402

logging.basicConfig(level=logging.INFO)


def main(argv=None) -> dict:
    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = compose(REPO_ROOT / "configs", "evaluate", overrides)
    if cfg.get("platform"):
        import jax

        jax.config.update("jax_platforms", cfg["platform"])

    module, state = load_module_from_checkpoint(
        cfg["module_path"],
        step=(lambda e: e if e == "best" else int(e))(cfg.get("epoch", -1)),
    )
    assert module.name == "ril", module.name
    env = instantiate(cfg["env"])
    if cfg.get("learned_hl"):
        agent = RILAgent(module, state)
    else:
        agent = OracleSubgoalAgent(
            module, state, env, lookahead=int(cfg.get("lookahead", 12))
        )
    manager = EvaluationManager(
        agent,
        env,
        RILRollout(plan_duration=int(cfg.get("plan_duration", 8))),
        single_task_generator=SingleTaskRolloutGenerator(
            data_dir=cfg["data_dir"],
            start_end_tasks=Path(cfg["data_dir"]).expanduser()
            / "start_end_tasks.json",
            strategy=cfg.get("strategy", "longest"),
            min_seq_len=int(cfg.get("min_seq_len", 1)),
            max_seq_len=int(cfg.get("max_seq_len", 400)),
        ),
    )
    results = manager.evaluate_all_tasks(
        filename=cfg.get("filename") or "ril_oracle_tasks.json",
        max_rollouts_per_task=int(cfg.get("max_rollouts", 50)),
    )
    overall = sum(r["accuracy"] * r["num_rollouts"] for r in results.values())
    n = sum(r["num_rollouts"] for r in results.values())
    print(
        f"overall accuracy: {overall / max(n, 1):.3f} over {n} rollouts "
        f"({'learned' if cfg.get('learned_hl') else 'oracle'} high level)"
    )
    return results


if __name__ == "__main__":
    main()
