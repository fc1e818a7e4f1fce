#!/usr/bin/env python
"""D4RL evaluation: N rollouts -> accuracy + normalized score JSON
(reference: scripts/evaluate_d4rl.py:21-84).

Usage:
    python scripts/evaluate_d4rl.py module_path=runs/tacorl_d4rl \
        env=fake_d4rl num_rollouts=20
"""

from __future__ import annotations

import json
import logging
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from tacorl_tpu.config import compose, instantiate  # noqa: E402
from tacorl_tpu.core.checkpoint import load_module_from_checkpoint  # noqa: E402

logging.basicConfig(level=logging.INFO)


def build_agent_and_manager(module, state, cfg):
    from tacorl_tpu.evaluation import agents
    from tacorl_tpu.evaluation import rollout_manager_d4rl as rm

    plan_duration = int(cfg.get("plan_duration", 15))
    if module.name == "play_lmp_d4rl":
        return (
            agents.LatentPlanD4RLAgent(module, state),
            rm.LatentPlanRolloutD4RL(plan_duration),
        )
    if module.name == "tacorl_d4rl":
        return (
            agents.TACORLD4RLAgent(module, state),
            rm.TACORLRolloutD4RL(plan_duration),
        )
    return agents.FlatPolicyAgent(module, state), rm.RLRolloutD4RL()


def main(argv=None):
    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = compose(REPO_ROOT / "configs", "evaluate_d4rl", overrides)
    if cfg.get("platform"):
        import jax

        jax.config.update("jax_platforms", cfg["platform"])
    module, state = load_module_from_checkpoint(
        cfg["module_path"], step=(lambda e: e if e == "best" else int(e))(cfg.get("epoch", -1))
    )
    env = instantiate(cfg["env"])
    agent, manager = build_agent_and_manager(module, state, cfg)

    n = int(cfg.get("num_rollouts", 100))
    results = {"episode_returns": [], "scores": [], "successes": 0}
    for _ in range(n):
        out = manager.episode_rollout(agent, env)
        results["episode_returns"].append(out["episode_return"])
        results["scores"].append(out["score"])
        results["successes"] += int(out["success"])
    summary = {
        "accuracy": results["successes"] / n,
        "avg_normalized_score": float(np.mean(results["scores"])),
        "avg_episode_return": float(np.mean(results["episode_returns"])),
        "num_rollouts": n,
    }
    filename = cfg.get("filename") or "d4rl_results.json"
    with open(filename, "w") as f:
        json.dump(summary, f, indent=4)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
