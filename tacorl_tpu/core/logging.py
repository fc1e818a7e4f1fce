"""Metrics sink: JSONL file + console, optional wandb when available.

Replaces the reference's wandb/Lightning logging surface
(utils/wandb_loggers/*, utils/misc.py:216-259): metric dicts are logged with
``<split>/<name>`` keys; rank-0 gating uses jax.process_index().
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Any, Dict, Optional, Union

import jax
import numpy as np

logger = logging.getLogger("tacorl_tpu")

__all__ = ["MetricsSink", "log_rank_0"]


def log_rank_0(msg: str, *args) -> None:
    if jax.process_index() == 0:
        logger.info(msg, *args)


def _to_float(value: Any) -> float:
    return float(np.asarray(value))


class MetricsSink:
    def __init__(
        self,
        directory: Union[str, Path, None] = None,
        use_wandb: bool = False,
        wandb_kwargs: Optional[dict] = None,
        console_every: int = 50,
    ):
        self.is_main = jax.process_index() == 0
        self.console_every = console_every
        self._file = None
        if directory is not None and self.is_main:
            path = Path(directory).expanduser()
            path.mkdir(parents=True, exist_ok=True)
            self._file = open(path / "metrics.jsonl", "a")
        self._wandb = None
        if use_wandb and self.is_main:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(**(wandb_kwargs or {}))
            except ImportError:
                logger.warning("wandb requested but not installed; using JSONL")
        self._t0 = time.time()

    def log(
        self, metrics: Dict[str, Any], step: int, prefix: Optional[str] = None
    ) -> None:
        if not self.is_main:
            return
        flat = {
            (f"{prefix}/{k}" if prefix else k): _to_float(v)
            for k, v in metrics.items()
        }
        record = {"step": int(step), "time": time.time() - self._t0, **flat}
        if self._file is not None:
            self._file.write(json.dumps(record) + "\n")
            self._file.flush()
        if self._wandb is not None:
            self._wandb.log(flat, step=int(step))
        if self.console_every and step % self.console_every == 0:
            brief = ", ".join(f"{k}={v:.4g}" for k, v in list(flat.items())[:6])
            logger.info("step %d | %s", step, brief)

    def log_image(self, name: str, image: np.ndarray, step: int) -> None:
        if self._wandb is not None:
            self._wandb.log({name: self._wandb.Image(image)}, step=int(step))

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
