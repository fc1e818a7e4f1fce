#!/usr/bin/env python
"""Measure the evaluation protocols' CEILING with the scripted expert.

Runs the fake env's scripted expert (the same controller that generated the
demonstrations, at full gain and without noise) through the REAL evaluation
protocols — single-task, long-horizon, and sequential long-horizon
(reference: scripts/evaluate.py:114-181, :43-112, :183-253) — so every
learned-policy number has a measured upper bound beside it (VERDICT r4
missing #4: the lh_seq "env ceiling" claim was never measured).

Usage:
    python scripts/measure_protocol_ceiling.py data_dir=/path/validation \
        out_dir=results/r5 lh_seq_depth=3 lh_depth=2 max_episode_steps=112
"""

from __future__ import annotations

import json
import logging
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from tacorl_tpu.envs.fake_calvin import FakeCalvinEnv  # noqa: E402
from tacorl_tpu.evaluation.agents import ScriptedExpertAgent  # noqa: E402
from tacorl_tpu.evaluation.manager import EvaluationManager  # noqa: E402
from tacorl_tpu.evaluation.rollout_generator import (  # noqa: E402
    LongHorizonRolloutGenerator,
    LongHorizonSequentialRolloutGenerator,
    SingleTaskRolloutGenerator,
)
from tacorl_tpu.evaluation.rollout_manager import RLRollout  # noqa: E402

logging.basicConfig(level=logging.INFO)


def main(argv=None) -> dict:
    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    data_dir = Path(args["data_dir"]).expanduser()
    out_dir = Path(args.get("out_dir", "results/ceiling")).expanduser()
    out_dir.mkdir(parents=True, exist_ok=True)
    lh_depth = int(args.get("lh_depth", 2))
    lh_seq_depth = int(args.get("lh_seq_depth", 3))
    max_steps = int(args.get("max_episode_steps", 112))
    image_hw = int(args.get("image_hw", 64))

    env = FakeCalvinEnv(
        image_hw=image_hw,
        max_episode_steps=max_steps,
        task_set=args.get("task_set", "hard"),
        modalities=["rgb_static"],
        goal_modalities=["rgb_static"],
    )
    agent = ScriptedExpertAgent(env, gain=float(args.get("gain", 1.0)))
    gen_kw = dict(
        data_dir=data_dir,
        start_end_tasks=data_dir / "start_end_tasks.json",
        min_seq_len=int(args.get("min_seq_len", 1)),
        max_seq_len=int(args.get("max_seq_len", 400)),
    )
    manager = EvaluationManager(
        agent,
        env,
        RLRollout(),
        single_task_generator=SingleTaskRolloutGenerator(**gen_kw),
        lh_generator=LongHorizonRolloutGenerator(
            tasks_per_rollout=lh_depth, **gen_kw
        ),
        lh_seq_generator=LongHorizonSequentialRolloutGenerator(
            tasks_per_rollout=lh_seq_depth, **gen_kw
        ),
    )

    results = {}
    results["short_horizon"] = manager.evaluate_all_tasks(
        filename=str(out_dir / "expert_short_horizon.json")
    )
    results["long_horizon"] = manager.evaluate_lh_tasks(
        filename=str(out_dir / "expert_lh.json")
    )
    results["long_horizon_sequential"] = manager.evaluate_lh_seq_tasks(
        filename=str(out_dir / "expert_lh_seq.json")
    )
    summary = {
        "short_horizon": {
            t: r["accuracy"] for t, r in results["short_horizon"].items()
        },
        "long_horizon": {
            k: v
            for k, v in results["long_horizon"].items()
            if k.startswith("lh_") or k in ("avg_len", "num_rollouts")
        },
        "long_horizon_sequential": {
            k: v
            for k, v in results["long_horizon_sequential"].items()
            if k.startswith("lh_") or k in ("avg_len", "num_rollouts")
        },
    }
    with open(out_dir / "expert_ceiling_summary.json", "w") as f:
        json.dump(summary, f, indent=4)
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main()
