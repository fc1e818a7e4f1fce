import textwrap
from pathlib import Path

import pytest

from tacorl_tpu.config import (
    compose,
    get_by_path,
    instantiate,
    merge,
    resolve,
    save_yaml,
    set_by_path,
)


def write(path: Path, content: str) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(textwrap.dedent(content))


@pytest.fixture
def cfg_dir(tmp_path: Path) -> Path:
    d = tmp_path / "configs"
    write(
        d / "train.yaml",
        """
        defaults:
          - experiment: exp_a
          - _self_
        seed: 42
        """,
    )
    write(
        d / "experiment/exp_a.yaml",
        """
        _package_: _global_
        defaults:
          - /module: lmp
          - /datamodule: play
          - /networks/encoder@module.encoder: vision
          - _self_
        latent_dim: 16
        module:
          lr: 1.0e-4
        """,
    )
    write(
        d / "module/lmp.yaml",
        """
        name: play_lmp
        kl_beta: 0.001
        latent: ${latent_dim}
        window: ${datamodule.max_window}
        """,
    )
    write(d / "module/cql.yaml", "name: cql\n")
    write(d / "datamodule/play.yaml", "max_window: 16\nbatch_size: 64\n")
    write(d / "networks/encoder/vision.yaml", "hidden: 256\n")
    return d


def test_compose_groups_and_retarget(cfg_dir):
    cfg = compose(cfg_dir, "train")
    assert cfg["seed"] == 42
    assert cfg["module"]["name"] == "play_lmp"
    assert cfg["module"]["lr"] == 1.0e-4  # experiment body overrides group
    assert cfg["module"]["encoder"]["hidden"] == 256  # @retarget mount
    assert cfg["datamodule"]["batch_size"] == 64


def test_interpolation(cfg_dir):
    cfg = compose(cfg_dir, "train")
    assert cfg["module"]["latent"] == 16
    assert cfg["module"]["window"] == 16


def test_value_override(cfg_dir):
    cfg = compose(cfg_dir, "train", overrides=["module.kl_beta=0.5", "seed=7"])
    assert cfg["module"]["kl_beta"] == 0.5
    assert cfg["seed"] == 7


def test_group_override(cfg_dir):
    cfg = compose(cfg_dir, "train", overrides=["module=cql"])
    assert cfg["module"]["name"] == "cql"


def test_interpolation_tracks_overrides(cfg_dir):
    cfg = compose(cfg_dir, "train", overrides=["latent_dim=32"])
    assert cfg["module"]["latent"] == 32


def test_merge_semantics():
    base = {"a": {"x": 1, "y": 2}, "b": [1, 2]}
    patch = {"a": {"y": 3}, "b": [9]}
    out = merge(base, patch)
    assert out == {"a": {"x": 1, "y": 3}, "b": [9]}


def test_resolve_embedded_string():
    cfg = resolve({"name": "run-${seed}", "seed": 3})
    assert cfg["name"] == "run-3"


def test_resolve_cycle_detection():
    with pytest.raises(ValueError):
        resolve({"a": "${b}", "b": "${a}"})


def test_set_get_by_path():
    cfg = {}
    set_by_path(cfg, "a.b.c", 1)
    assert get_by_path(cfg, "a.b.c") == 1


class Dummy:
    def __init__(self, x, child=None):
        self.x = x
        self.child = child


def test_instantiate_recursive():
    cfg = {
        "_target_": "tests.test_config.Dummy",
        "x": 1,
        "child": {"_target_": "tests.test_config.Dummy", "x": 2},
    }
    obj = instantiate(cfg)
    assert obj.x == 1 and obj.child.x == 2


def test_instantiate_non_recursive():
    cfg = {
        "_target_": "tests.test_config.Dummy",
        "_recursive_": False,
        "x": 1,
        "child": {"_target_": "tests.test_config.Dummy", "x": 2},
    }
    obj = instantiate(cfg)
    assert isinstance(obj.child, dict)


def test_yaml_round_trip(cfg_dir, tmp_path):
    cfg = compose(cfg_dir, "train")
    save_yaml(cfg, tmp_path / "saved.yaml")
    cfg2 = compose(tmp_path, "saved")
    assert cfg2 == cfg
