#!/usr/bin/env python
"""Real-robot goal-image evaluation (reference: scripts/evaluate_real_world.py
:12-53): load a trained module, read a goal image from disk, run one rollout
on the Franka Panda through the robot_io env.

Usage:
    python scripts/evaluate_real_world.py module_path=runs/tacorl \
        img_path=/path/to/goal.png
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from tacorl_tpu.config import compose, instantiate  # noqa: E402
from tacorl_tpu.core.checkpoint import load_module_from_checkpoint  # noqa: E402
from tacorl_tpu.evaluation.agents import make_agent  # noqa: E402

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("tacorl_tpu")


def main(argv=None):
    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = compose(REPO_ROOT / "configs", "evaluate_real_world", overrides)

    module, state = load_module_from_checkpoint(
        cfg["module_path"], step=(lambda e: e if e == "best" else int(e))(cfg.get("epoch", -1))
    )
    env = instantiate(cfg["env"])

    import cv2

    img = cv2.imread(str(cfg["img_path"]))
    assert img is not None, f"could not read goal image {cfg['img_path']}"
    goal = {"rgb_static": img[:, :, ::-1].copy()}
    reset_info = {"goal": goal}

    agent, manager_cls = make_agent(module, state)
    manager = manager_cls(plan_duration=int(cfg.get("plan_duration", 15)))
    logger.info("starting real-world evaluation rollout")
    out = manager.episode_rollout(agent, env, reset_info)
    logger.info("rollout finished: %s", out)
    return out


if __name__ == "__main__":
    main()
