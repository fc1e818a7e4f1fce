#!/usr/bin/env python
"""Training entry point (reference: scripts/train.py).

Usage:
    python scripts/train.py experiment=play_lmp_for_rl data_dir=/path/to/calvin \
        trainer.max_steps=1000 module.lr=3e-4

Composes configs/train.yaml with CLI overrides, builds the datamodule /
module / trainer, auto-resumes from the run dir's latest checkpoint, and
saves the composed config next to the checkpoints (the config round-trip the
cross-stage loaders rely on, utils/networks.py:107-117).
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

from tacorl_tpu.config import compose, get_class, instantiate  # noqa: E402
from tacorl_tpu.core.checkpoint import CheckpointManager  # noqa: E402
from tacorl_tpu.core.logging import MetricsSink  # noqa: E402
from tacorl_tpu.core.trainer import Trainer  # noqa: E402
from tacorl_tpu.data.datamodule import BasicDataModule  # noqa: E402

logging.basicConfig(
    level=logging.INFO, format="%(asctime)s %(name)s %(levelname)s %(message)s"
)


def build_callbacks(cfg: dict) -> list:
    callbacks = []
    for name, cb_cfg in (cfg.get("callbacks") or {}).items():
        if isinstance(cb_cfg, dict) and "_target_" in cb_cfg:
            callbacks.append(instantiate(cb_cfg))
    return callbacks


def main(argv=None) -> None:
    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = compose(REPO_ROOT / "configs", "train", overrides)

    # `platform=cpu` forces the CPU backend (e.g. smoke runs; the environment
    # may pin JAX_PLATFORMS to the TPU tunnel)
    if cfg.get("platform"):
        import jax

        jax.config.update("jax_platforms", cfg["platform"])
    # `multihost=true` on TPU pod slices: discovers peers over DCN so
    # jax.devices() spans the pod (the reference's DDP init, scripts/train.py
    # :75, replaced by jax.distributed)
    if cfg.get("multihost"):
        import jax

        jax.distributed.initialize()

    dm_cfg = dict(cfg["datamodule"])
    dm_cls = (
        get_class(dm_cfg.pop("_target_"))
        if "_target_" in dm_cfg
        else BasicDataModule
    )
    datamodule = dm_cls(**dm_cfg)

    # statistics.yaml action bounds override the configured defaults
    # (reference: action_decoder_logistic.py:140-158)
    stats = getattr(datamodule, "statistics", None)
    if stats and "act_max_bound" in stats and "action_decoder" in cfg["module"]:
        cfg["module"]["action_decoder"]["act_max_bound"] = stats["act_max_bound"]
        cfg["module"]["action_decoder"]["act_min_bound"] = stats["act_min_bound"]

    module_cls = get_class(cfg["module"]["_target_"])
    module = module_cls(cfg["module"], full_config=cfg)

    run_dir = Path(cfg["run_dir"]).expanduser()
    ckpt = CheckpointManager(
        run_dir,
        max_to_keep=int(cfg.get("ckpt_max_to_keep", 3)),
        monitor=cfg.get("ckpt_monitor", "validation/total_loss"),
        mode=cfg.get("ckpt_mode", "min"),
        config=cfg,
    )
    sink = MetricsSink(run_dir, **(cfg.get("logger") or {}))

    trainer_cfg = dict(cfg.get("trainer") or {})
    trainer = Trainer(
        ckpt_manager=ckpt,
        sink=sink,
        callbacks=build_callbacks(cfg),
        seed=int(cfg.get("seed", 0)),
        **trainer_cfg,
    )
    trainer.fit(module, datamodule, resume=bool(cfg.get("resume", True)))


if __name__ == "__main__":
    main()
