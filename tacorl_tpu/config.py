"""Config composition + instantiation.

A small, dependency-free re-implementation of the capability set the reference
stack gets from Hydra/OmegaConf (reference: config/train.yaml:1-4,
config/experiment/play_lmp_for_rl.yaml:1-16, utils/networks.py:107-136):

  * named config groups composed through a ``defaults`` list
  * group retargeting  ``- /group@target.path: option``
  * ``_package_: _global_`` experiment patches merged at the root
  * ``${a.b.c}`` interpolation (full-value and embedded-in-string)
  * CLI overrides: ``a.b.c=value`` (value override), ``group=option``
    (defaults-choice override), ``+a.b=c`` (force-add)
  * ``_target_`` instantiation with ``_recursive_`` control
  * round-trip: a composed config serializes to YAML and re-instantiates the
    same experiment (checkpoint-side config record).

Configs are plain ``dict``/``list``/scalars throughout — no wrapper types.
"""

from __future__ import annotations

import copy
import importlib
import re
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import yaml

__all__ = [
    "compose",
    "load_yaml",
    "save_yaml",
    "merge",
    "resolve",
    "instantiate",
    "get_class",
    "set_by_path",
    "get_by_path",
    "MISSING",
]

MISSING = "???"

_INTERP_RE = re.compile(r"\$\{([^${}]+)\}")


# ---------------------------------------------------------------------------
# YAML io
# ---------------------------------------------------------------------------


def load_yaml(path: Union[str, Path]) -> Any:
    with open(path) as f:
        data = yaml.safe_load(f)
    return {} if data is None else data


def save_yaml(cfg: Any, path: Union[str, Path]) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)


# ---------------------------------------------------------------------------
# dict-path helpers
# ---------------------------------------------------------------------------


def get_by_path(cfg: Any, path: str, default: Any = KeyError) -> Any:
    node = cfg
    if path == "":
        return node
    for part in path.split("."):
        if isinstance(node, list):
            node = node[int(part)]
        elif isinstance(node, dict) and part in node:
            node = node[part]
        else:
            if default is KeyError:
                raise KeyError(f"config path not found: {path!r}")
            return default
    return node


def set_by_path(cfg: Dict, path: str, value: Any, *, merge_dicts: bool = True) -> None:
    parts = path.split(".")
    node = cfg
    for part in parts[:-1]:
        nxt = node.get(part) if isinstance(node, dict) else None
        if not isinstance(nxt, (dict, list)):
            node[part] = {}
            nxt = node[part]
        node = nxt
    last = parts[-1]
    if (
        merge_dicts
        and isinstance(node.get(last) if isinstance(node, dict) else None, dict)
        and isinstance(value, dict)
    ):
        node[last] = merge(node[last], value)
    else:
        node[last] = value


def delete_by_path(cfg: Dict, path: str) -> None:
    parts = path.split(".")
    node = cfg
    for part in parts[:-1]:
        node = node[part]
    node.pop(parts[-1], None)


def merge(base: Any, patch: Any) -> Any:
    """Deep merge: dicts merge key-wise, everything else is replaced."""
    if isinstance(base, dict) and isinstance(patch, dict):
        out = dict(base)
        for k, v in patch.items():
            out[k] = merge(base[k], v) if k in base else copy.deepcopy(v)
        return out
    return copy.deepcopy(patch)


# ---------------------------------------------------------------------------
# defaults-list composition
# ---------------------------------------------------------------------------


def _parse_default_entry(entry: Any):
    """Normalize a defaults entry to (group, option, target, absolute)."""
    if isinstance(entry, str):
        return entry, None, None, False  # "_self_" or bare group name
    if not isinstance(entry, dict) or len(entry) != 1:
        raise ValueError(f"bad defaults entry: {entry!r}")
    key, option = next(iter(entry.items()))
    absolute = key.startswith("/")
    key = key.lstrip("/")
    if "@" in key:
        group, target = key.split("@", 1)
    else:
        group, target = key, None
    return group, option, target, absolute


class _Composer:
    def __init__(self, config_dir: Union[str, Path], choices: Dict[str, str]):
        self.config_dir = Path(config_dir)
        self.choices = choices  # group-path -> option, from CLI

    def group_file(self, group: str, option: str) -> Path:
        return self.config_dir / group / f"{option}.yaml"

    def has_group(self, group: str) -> bool:
        return (self.config_dir / group).is_dir()

    def compose_file(self, path: Path, group: str = ""):
        """Compose one config file: its defaults tree, then (at the ``_self_``
        position, default last) its own body. Returns (body, package) where
        package is ``"_global_"`` for root-mounted experiment patches."""
        raw = load_yaml(path)
        if not isinstance(raw, dict):
            raise ValueError(f"{path} must contain a mapping")
        raw = dict(raw)
        pkg = raw.pop("_package_", None)
        defaults = raw.pop("defaults", [])

        body: Dict = {}
        self_seen = False
        for entry in defaults:
            grp, option, target, absolute = _parse_default_entry(entry)
            if grp == "_self_":
                body = merge(body, raw)
                self_seen = True
                continue
            full_group = grp if absolute or not group else f"{group}/{grp}"
            # CLI defaults-choice override wins
            option = self.choices.get(full_group, option)
            if option is None or option == "null":
                continue
            sub, sub_pkg = self.compose_file(
                self.group_file(full_group, option), group=full_group
            )
            if sub_pkg == "_global_":
                mount = "" if target is None else target
            else:
                mount = target if target is not None else grp.replace("/", ".")
            if mount in ("", "_global_"):
                body = merge(body, sub)
            else:
                patch: Dict = {}
                set_by_path(patch, mount, sub, merge_dicts=False)
                body = merge(body, patch)
        if not self_seen:
            body = merge(body, raw)
        return body, pkg

    def compose(self, name: str) -> Dict:
        return self.compose_file(self.config_dir / f"{name}.yaml")[0]


def _parse_override_value(text: str) -> Any:
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def compose(
    config_dir: Union[str, Path],
    config_name: str,
    overrides: Sequence[str] = (),
    resolve_interpolations: bool = True,
) -> Dict:
    """Compose ``<config_dir>/<config_name>.yaml`` with CLI-style overrides."""
    config_dir = Path(config_dir)
    choices: Dict[str, str] = {}
    value_overrides: List = []
    deletions: List[str] = []
    for ov in overrides:
        if ov.startswith("~"):
            deletions.append(ov[1:])
            continue
        forced_add = ov.startswith("+")
        key, _, val = ov.lstrip("+").partition("=")
        # `group=option` defaults-choice override when the key names a config
        # group directory; a nonexistent option is an error, not a silent
        # value override.
        if not forced_add and (config_dir / key).is_dir():
            if not (config_dir / key / f"{str(val)}.yaml").is_file():
                available = sorted(
                    p.stem for p in (config_dir / key).glob("*.yaml")
                )
                raise ValueError(
                    f"config group {key!r} has no option {val!r}; "
                    f"available: {available}"
                )
            choices[key] = str(val)
        else:
            value_overrides.append((key, _parse_override_value(val)))

    composer = _Composer(config_dir, choices)
    cfg = composer.compose(config_name)
    for key, val in value_overrides:
        set_by_path(cfg, key, val, merge_dicts=False)
    for key in deletions:
        delete_by_path(cfg, key)
    if resolve_interpolations:
        cfg = resolve(cfg)
    return cfg


# ---------------------------------------------------------------------------
# interpolation
# ---------------------------------------------------------------------------


def resolve(cfg: Any) -> Any:
    """Resolve ``${a.b.c}`` references against the config root."""

    root = copy.deepcopy(cfg)

    def _resolve_value(value: Any, stack: tuple) -> Any:
        if isinstance(value, str):
            full = _INTERP_RE.fullmatch(value.strip())
            if full:
                return _lookup(full.group(1).strip(), stack)
            if _INTERP_RE.search(value):
                return _INTERP_RE.sub(
                    lambda m: str(_lookup(m.group(1).strip(), stack)), value
                )
            return value
        if isinstance(value, dict):
            return {k: _resolve_value(v, stack) for k, v in value.items()}
        if isinstance(value, list):
            return [_resolve_value(v, stack) for v in value]
        return value

    def _lookup(path: str, stack: tuple) -> Any:
        if path in stack:
            raise ValueError(f"interpolation cycle at ${{{path}}}")
        target = get_by_path(root, path)
        return _resolve_value(target, stack + (path,))

    return _resolve_value(root, ())


# ---------------------------------------------------------------------------
# instantiation
# ---------------------------------------------------------------------------


def get_class(target: str) -> Any:
    module_name, _, attr = target.rpartition(".")
    module = importlib.import_module(module_name)
    return getattr(module, attr)


def instantiate(cfg: Any, *args, _recursive_: Optional[bool] = None, **kwargs) -> Any:
    """Instantiate ``{'_target_': 'pkg.mod.Cls', ...}`` nodes.

    ``_recursive_`` (default True, overridable per-node like Hydra's) controls
    whether nested ``_target_`` dicts are instantiated first; modules that
    inject computed dims before instantiating sub-configs rely on
    ``_recursive_: false`` (reference: modules construct sub-configs manually,
    play_lmp_for_rl.py:80-130).
    """
    if not isinstance(cfg, dict) or "_target_" in kwargs:
        raise TypeError("instantiate expects a dict config with _target_")
    node = dict(cfg)
    target = node.pop("_target_", None)
    if target is None:
        raise ValueError("config has no _target_")
    recursive = node.pop("_recursive_", True if _recursive_ is None else _recursive_)
    node.pop("_convert_", None)
    node.update(kwargs)
    if recursive:
        node = {k: _instantiate_children(v) for k, v in node.items()}
    fn: Callable = get_class(target)
    return fn(*args, **node)


def _instantiate_children(value: Any) -> Any:
    if isinstance(value, dict):
        if "_target_" in value:
            return instantiate(value)
        return {k: _instantiate_children(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_instantiate_children(v) for v in value]
    return value
