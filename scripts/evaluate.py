#!/usr/bin/env python
"""Goal-image evaluation entry point (reference: scripts/evaluate.py:256-270).

Usage:
    python scripts/evaluate.py module_path=runs/tacorl eval_type=short_horizon \
        data_dir=/path/to/calvin/validation env=fake_calvin

eval_type: short_horizon | long_horizon | long_horizon_sequential
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from tacorl_tpu.config import compose, get_class, instantiate  # noqa: E402
from tacorl_tpu.core.checkpoint import load_module_from_checkpoint  # noqa: E402
from tacorl_tpu.evaluation.manager import EvaluationManager  # noqa: E402
from tacorl_tpu.evaluation.rollout_generator import (  # noqa: E402
    LongHorizonRolloutGenerator,
    LongHorizonSequentialRolloutGenerator,
    SingleTaskRolloutGenerator,
)

logging.basicConfig(level=logging.INFO)


AGENTS = {
    "cql": ("tacorl_tpu.evaluation.agents.FlatPolicyAgent", "RLRollout"),
    "tacorl": ("tacorl_tpu.evaluation.agents.TACORLAgent", "TACORLRollout"),
    "play_lmp": ("tacorl_tpu.evaluation.agents.LatentPlanAgent", "LatentPlanRollout"),
    "ril": ("tacorl_tpu.evaluation.agents.RILAgent", "RILRollout"),
}


def build_agent_and_manager(module, state, cfg):
    agent_cls_name, manager_name = AGENTS[module.name]
    agent_cls = get_class(agent_cls_name)
    kwargs = {}
    if module.name in ("cql", "tacorl"):
        kwargs = {
            "use_cem": bool(cfg.get("use_cem", False)),
            "cem_cfg": cfg.get("cem") or {},
        }
    agent = agent_cls(module, state, **kwargs)
    import tacorl_tpu.evaluation.rollout_manager as rm

    manager_cls = getattr(rm, manager_name)
    if manager_name == "RLRollout":
        manager = manager_cls()
    else:
        manager = manager_cls(plan_duration=int(cfg.get("plan_duration", 15)))
    return agent, manager


def main(argv=None) -> None:
    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = compose(REPO_ROOT / "configs", "evaluate", overrides)
    if cfg.get("platform"):
        import jax

        jax.config.update("jax_platforms", cfg["platform"])

    module, state = load_module_from_checkpoint(
        cfg["module_path"],
        step=(lambda e: e if e == "best" else int(e))(cfg.get("epoch", -1)),
        # `+overwrite_module_cfg.play_lmp_dir=...` re-points the grafted LMP
        # run at eval time (reference README.md:93-96)
        overwrite_cfg=cfg.get("overwrite_module_cfg") or None,
    )
    env = instantiate(cfg["env"])
    agent, rollout_manager = build_agent_and_manager(module, state, cfg)

    data_dir = Path(cfg["data_dir"]).expanduser()
    start_end_tasks = cfg.get(
        "start_end_tasks", str(data_dir / "start_end_tasks.json")
    )
    gen_kwargs = dict(
        data_dir=data_dir,
        start_end_tasks=start_end_tasks,
        strategy=cfg.get("strategy", "longest"),
        min_seq_len=int(cfg.get("min_seq_len", 16)),
        max_seq_len=int(cfg.get("max_seq_len", 64)),
    )
    manager = EvaluationManager(
        agent=agent,
        env=env,
        rollout_manager=rollout_manager,
        single_task_generator=SingleTaskRolloutGenerator(**gen_kwargs),
        lh_generator=LongHorizonRolloutGenerator(
            tasks_per_rollout=int(cfg.get("lh_tasks_per_rollout", 2)),
            **gen_kwargs,
        ),
        lh_seq_generator=LongHorizonSequentialRolloutGenerator(
            tasks_per_rollout=int(cfg.get("lh_seq_tasks_per_rollout", 5)),
            **gen_kwargs,
        ),
    )
    eval_type = cfg.get("eval_type", "short_horizon")
    filename = cfg.get("filename", f"{eval_type}_results.json")
    if eval_type == "short_horizon":
        results = manager.evaluate_all_tasks(
            filename, max_rollouts_per_task=int(cfg.get("max_rollouts", 50))
        )
    elif eval_type == "long_horizon":
        results = manager.evaluate_lh_tasks(
            filename, max_rollouts=int(cfg.get("max_rollouts", 1000))
        )
    elif eval_type == "long_horizon_sequential":
        results = manager.evaluate_lh_seq_tasks(
            filename, max_rollouts=int(cfg.get("max_rollouts", 500))
        )
    else:
        raise ValueError(f"unknown eval_type {eval_type!r}")
    print(f"wrote {filename}")
    return results


if __name__ == "__main__":
    main()
