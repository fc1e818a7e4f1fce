"""Expert-play data generator tests (the train-to-success pipeline's data):
verified task-completion spans, CALVIN on-disk layout, interior actions, and
the hard-task-table guarantees (untrained ~0 / expert 1.0 separation)."""

import json

import numpy as np
import pytest

from tacorl_tpu.data.expert_play import generate_expert_play
from tacorl_tpu.envs.fake_calvin import FakeCalvinEnv, FakeTasks, HARD_TASKS


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("expert_play")
    generate_expert_play(
        root, n_train_episodes=4, n_val_episodes=3, tasks_per_episode=3,
        seed=0,
    )
    return root


def test_layout_and_span_verification(data_root):
    for split in ("training", "validation"):
        d = data_root / split
        assert (d / "ep_start_end_ids.npy").is_file()
        assert (d / "statistics.yaml").is_file()
        spans = json.loads((d / "start_end_tasks.json").read_text())
        assert spans, "no completed spans recorded"
        differ = FakeTasks(HARD_TASKS)
        for s, ends in spans.items():
            for e, tasks in ends.items():
                fs = np.load(d / f"episode_{int(s):07d}.npz")
                fe = np.load(d / f"episode_{int(e):07d}.npz")
                achieved = differ.get_task_info(
                    {"scene_obs": fs["scene_obs"]},
                    {"scene_obs": fe["scene_obs"]},
                )
                # every recorded span actually completes its task
                assert set(tasks) <= achieved, (s, e, tasks, achieved)


def test_multi_depth_chain_spans(tmp_path):
    """With distinct_tasks=True every episode yields a verified depth-1..N
    chain {start: {end_1: [t1], end_2: [t1,t2], ...}} — the table shape the
    long-horizon generators consume (reference
    evaluation/rollout_generator.py:137-242)."""
    root = tmp_path / "lh_play"
    generate_expert_play(
        root, n_train_episodes=0, n_val_episodes=4, tasks_per_episode=3,
        seed=7, distinct_tasks=True,
    )
    d = root / "validation"
    spans = json.loads((d / "start_end_tasks.json").read_text())
    differ = FakeTasks(HARD_TASKS)
    max_depth = 0
    seq_chains = 0
    for s, ends in spans.items():
        depths = []
        for e, tasks in sorted(ends.items(), key=lambda kv: int(kv[0])):
            assert len(tasks) == len(set(tasks))
            fs = np.load(d / f"episode_{int(s):07d}.npz")
            fe = np.load(d / f"episode_{int(e):07d}.npz")
            achieved = differ.get_task_info(
                {"scene_obs": fs["scene_obs"]},
                {"scene_obs": fe["scene_obs"]},
            )
            assert set(tasks) <= achieved, (s, e, tasks, achieved)
            depths.append(len(tasks))
            max_depth = max(max_depth, len(tasks))
        # sequential-generator contract: depth increments by one per end
        if depths == list(range(1, len(depths) + 1)) and len(depths) >= 3:
            seq_chains += 1
    assert max_depth >= 2, "no multi-task chain spans recorded"
    assert seq_chains >= 1, "no monotone sequential chain recorded"


def test_default_sampling_rng_stream_unchanged(tmp_path):
    """The multi-depth span pass must not consume RNG: default-args frames
    are bit-identical to the r3 datasets (archived checkpoints stay valid)."""
    root = tmp_path / "rng_check"
    generate_expert_play(
        root, n_train_episodes=1, n_val_episodes=1, tasks_per_episode=2,
        seed=3,
    )
    f = np.load(root / "training" / "episode_0000000.npz")
    # regenerate into a second dir and compare a frame byte-for-byte
    root2 = tmp_path / "rng_check2"
    generate_expert_play(
        root2, n_train_episodes=1, n_val_episodes=1, tasks_per_episode=2,
        seed=3,
    )
    f2 = np.load(root2 / "training" / "episode_0000000.npz")
    for k in f.files:
        np.testing.assert_array_equal(f[k], f2[k])


def test_actions_are_interior(data_root):
    """Saturated (+-1) targets are degenerate for the discretized-logistic
    NLL (edge bins absorb tails without conditioning) — the generator must
    keep continuous dims strictly inside the bounds."""
    files = sorted((data_root / "training").glob("episode_*.npz"))
    acts = np.stack([np.load(f)["rel_actions_world"] for f in files])
    assert np.abs(acts[:, :6]).max() <= 0.95
    assert np.all(acts[:, -1] == -1.0)  # expert gripper convention


def test_frames_align_with_env_replay(data_root):
    """Recorded frame t + action t stepped through the env dynamics land on
    the recorded frame t+1 state (actions noise included at record time)."""
    d = data_root / "training"
    ep_ids = np.load(d / "ep_start_end_ids.npy")
    start, end = ep_ids[0]
    env = FakeCalvinEnv(image_hw=64, task_set="hard", max_episode_steps=10**9)
    f0 = np.load(d / f"episode_{start:07d}.npz")
    env.reset(robot_obs=f0["robot_obs"], scene_obs=f0["scene_obs"])
    for step in range(int(start), min(int(start) + 10, int(end))):
        frame = np.load(d / f"episode_{step:07d}.npz")
        np.testing.assert_allclose(
            env.robot_obs, frame["robot_obs"], atol=1e-5
        )
        env.step(frame["rel_actions_world"])


def test_hard_tasks_untrained_vs_expert_separation():
    """The corner-handle table makes success require directed travel: a
    do-nothing policy scores 0, the scripted expert 1.0."""
    env = FakeCalvinEnv(image_hw=32, max_episode_steps=30, task_set="hard")
    for task, pairs in env.initial_and_goal_states.items():
        env.reset(task_info={"task": task, "index": 0})
        for _ in range(env.max_episode_steps):
            _o, _r, done, info = env.step(np.zeros(7, dtype=np.float32))
            if done:
                break
        assert not info["success"], f"do-nothing completed {task}"
        env.reset(task_info={"task": task, "index": 0})
        for _ in range(env.max_episode_steps):
            _o, _r, done, info = env.step(env.expert_action(gain=0.7))
            if done:
                break
        assert info["success"], f"expert failed {task}"


def test_encoder_rejects_collapsed_spatial_map():
    """32x32 through the 8/4,4/2,3/1 stack yields a 0x0 feature map; the
    encoder must fail loudly instead of silently returning a constant
    embedding (the r3 train-to-success root cause)."""
    import jax
    import jax.numpy as jnp

    from tacorl_tpu.networks.encoders import LMPVisionEncoder

    enc = LMPVisionEncoder(latent_dim=8, hidden_dim=16)
    with pytest.raises(ValueError, match="too small"):
        enc.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
