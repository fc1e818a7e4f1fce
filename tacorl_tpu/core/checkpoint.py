"""Checkpoint store: Orbax-backed pytree checkpoints with a saved-config
round-trip and param-tree surgery.

Capability parity with the reference's checkpoint surface (SURVEY.md §5):
  * top-K-by-metric + always-keep-last retention (Lightning ModelCheckpoint,
    config/callbacks/checkpoint/accuracy.yaml:1-8)
  * auto-resume from the latest checkpoint (scripts/train.py:48-66)
  * cross-stage loading: re-instantiate a module from the config.yaml saved
    next to its checkpoints, optionally overriding config keys, then graft
    selected sub-trees into a new model (utils/networks.py:90-142,
    modules/tacorl/tacorl.py:44-70)
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

import jax
import numpy as np
import orbax.checkpoint as ocp

from tacorl_tpu.config import get_class, merge, save_yaml, load_yaml

__all__ = [
    "CheckpointManager",
    "load_module_from_checkpoint",
    "graft",
    "freeze_mask",
]


class CheckpointManager:
    """Directory layout:
        <dir>/config.yaml            — experiment config (round-trip record)
        <dir>/ckpts/<step>/          — orbax pytree checkpoints
        <dir>/ckpts/metrics.json     — step -> monitored metric
    """

    def __init__(
        self,
        directory: Union[str, Path],
        max_to_keep: int = 3,
        monitor: Optional[str] = None,
        mode: str = "max",
        config: Optional[dict] = None,
    ):
        self.dir = Path(directory).expanduser()
        self.ckpt_dir = self.dir / "ckpts"
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.max_to_keep = max_to_keep
        self._metrics_file = self.ckpt_dir / "metrics.json"
        self._metrics: Dict[str, float] = (
            json.loads(self._metrics_file.read_text())
            if self._metrics_file.is_file()
            else {}
        )
        self._ckptr = ocp.PyTreeCheckpointer()
        if config is not None:
            save_yaml(config, self.dir / "config.yaml")

    # -- core io -----------------------------------------------------------

    def _step_dir(self, step: int) -> Path:
        return self.ckpt_dir / str(step)

    def save(
        self,
        step: int,
        state: Any,
        metrics: Optional[Dict[str, float]] = None,
    ) -> None:
        path = self._step_dir(step)
        if path.exists():
            shutil.rmtree(path)
        self._ckptr.save(path, jax.tree.map(np.asarray, state))
        if metrics and self.monitor and self.monitor in metrics:
            self._metrics[str(step)] = float(metrics[self.monitor])
        else:
            self._metrics.setdefault(str(step), float("nan"))
        self._retention()
        self._metrics_file.write_text(json.dumps(self._metrics))

    def _retention(self) -> None:
        steps = sorted(int(s) for s in self._metrics)
        if len(steps) <= self.max_to_keep:
            return
        last = steps[-1]  # always keep the latest (save_last semantics)
        candidates = steps[:-1]
        if self.monitor:
            sign = 1.0 if self.mode == "max" else -1.0

            def score(s):
                v = self._metrics[str(s)]
                return sign * (v if np.isfinite(v) else -np.inf)

            candidates.sort(key=score, reverse=True)
        keep = set(candidates[: self.max_to_keep - 1]) | {last}
        for s in steps:
            if s not in keep:
                shutil.rmtree(self._step_dir(s), ignore_errors=True)
                self._metrics.pop(str(s), None)

    def all_steps(self) -> List[int]:
        return sorted(
            int(p.name) for p in self.ckpt_dir.iterdir()
            if p.is_dir() and p.name.isdigit()
        )

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def best_step(self) -> Optional[int]:
        scored = {
            int(s): v for s, v in self._metrics.items() if np.isfinite(v)
        }
        if not scored:
            return self.latest_step()
        fn = max if self.mode == "max" else min
        return fn(scored, key=scored.get)

    def restore(self, step: Optional[int] = None, target: Any = None) -> Any:
        if step == "best":
            step = self.best_step()
        elif step is None or (isinstance(step, int) and step < 0):
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.ckpt_dir}")
        if target is not None:
            return self._ckptr.restore(self._step_dir(step), item=target)
        return self._ckptr.restore(self._step_dir(step))

    def load_config(self) -> dict:
        return load_yaml(self.dir / "config.yaml")


def load_module_from_checkpoint(
    directory: Union[str, Path],
    step: int = -1,
    overwrite_cfg: Optional[dict] = None,
    module_key: str = "module",
):
    """Re-instantiate a module from its saved config.yaml and restore weights
    (utils/networks.py:90-142). The module class must accept its config dict
    and expose ``init_state``/``load_state_dict``-style restore via
    ``restore_state``. Returns (module, state)."""
    directory = Path(directory).expanduser()
    manager = CheckpointManager(directory)
    cfg = manager.load_config()
    if overwrite_cfg:
        # overrides target the MODULE config (the reference's cfg_overwrite,
        # utils/networks.py:107-117), wherever it sits in the saved tree
        if module_key in cfg:
            cfg = merge(cfg, {module_key: overwrite_cfg})
        else:
            cfg = merge(cfg, overwrite_cfg)
    module_cfg = cfg[module_key] if module_key in cfg else cfg
    cls = get_class(module_cfg["_target_"])
    module = cls(dict(module_cfg), full_config=cfg)
    state = module.restore_state(manager, step=step)
    return module, state


# ---------------------------------------------------------------------------
# param-tree surgery
# ---------------------------------------------------------------------------


def graft(target_params: Dict, source_params: Dict, mapping: Dict[str, str]) -> Dict:
    """Copy source sub-trees into a target param tree.

    ``mapping``: target_path -> source_path ('/'-separated). The TACO-RL
    construction grafts the pretrained LMP decoder/encoder/posterior into the
    RL model (tacorl.py:51-70)."""

    def get_path(tree, path):
        node = tree
        for part in path.split("/"):
            node = node[part]
        return node

    def set_path(tree, path, value):
        parts = path.split("/")
        node = tree
        for part in parts[:-1]:
            node = node[part]
        node[parts[-1]] = value

    import copy as _copy

    out = _copy.deepcopy(target_params)
    for dst, src in mapping.items():
        sub = get_path(source_params, src)
        ref = get_path(out, dst)
        chex_shapes = jax.tree.map(lambda x: jax.eval_shape(lambda: x).shape, ref)
        src_shapes = jax.tree.map(lambda x: jax.eval_shape(lambda: x).shape, sub)
        if jax.tree.structure(chex_shapes) != jax.tree.structure(src_shapes):
            raise ValueError(
                f"graft structure mismatch at {dst!r} <- {src!r}"
            )
        set_path(out, dst, _copy.deepcopy(sub))
    return out


def freeze_mask(params: Dict, frozen_prefixes: List[str]) -> Dict:
    """Boolean pytree: True where trainable, False under any frozen prefix —
    feeds optax.masked / multi_transform (the reference's requires_grad=False
    partitions, tacorl.py:125-126)."""

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, f"{path}/{k}" if path else k) for k, v in tree.items()}
        return not any(
            path == p or path.startswith(p + "/") for p in frozen_prefixes
        )

    return walk(params, "")
