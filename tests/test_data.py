import json

import numpy as np
import pytest

from tacorl_tpu.data.knn import build_nn_steps_from_step, knn_l2
from tacorl_tpu.data.loader import DataLoader, collate
from tacorl_tpu.data.play_dataset import PlayWindowDataset, validation_window_size
from tacorl_tpu.data.storage import (
    FrameDirStorage,
    PackedStorage,
    load_ep_start_end_ids,
    pack_frames,
)
from tacorl_tpu.data.synthetic import generate_synthetic_calvin

MODALITIES = ["rgb_static", "robot_obs", "rel_actions_world"]


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("calvin")
    generate_synthetic_calvin(
        root, n_train_episodes=2, n_val_episodes=1, episode_len=40, image_hw=32
    )
    return root


def test_frame_dir_storage(data_root):
    st = FrameDirStorage(data_root / "training")
    assert "rgb_static" in st.keys
    w = st.read_window(5, 9, ["rgb_static", "robot_obs"])
    assert w["rgb_static"].shape == (4, 32, 32, 3)
    # deterministic frame content: red channel == step % 251
    assert w["rgb_static"][0, 0, 0, 0] == 5
    assert w["rgb_static"][3, 0, 0, 0] == 8


def test_packed_storage_round_trip(data_root, tmp_path):
    packed = pack_frames(data_root / "training", tmp_path / "packed")
    st = FrameDirStorage(data_root / "training")
    a = st.read_window(10, 14, ["rgb_static", "robot_obs"])
    b = packed.read_window(10, 14, ["rgb_static", "robot_obs"])
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
    # reopen from disk
    st2 = PackedStorage(tmp_path / "packed")
    np.testing.assert_array_equal(
        st2.read_frame(11, ["robot_obs"])["robot_obs"], a["robot_obs"][1]
    )
    assert load_ep_start_end_ids(tmp_path / "packed", train=True).shape == (2, 2)


def test_validation_window_size_stable():
    sizes = [validation_window_size(i, 8, 16) for i in range(200)]
    assert all(8 <= s <= 16 for s in sizes)
    assert sizes == [validation_window_size(i, 8, 16) for i in range(200)]
    assert len(set(sizes)) > 4  # spreads over the range


def test_play_dataset_window_and_padding(data_root):
    ds = PlayWindowDataset(
        data_root / "training",
        modalities=MODALITIES,
        min_window_size=8,
        max_window_size=16,
        train=True,
    )
    # lookup: 2 episodes of len 40 -> (39 - 16 + 1) starts each
    assert len(ds) == 2 * (40 - 16)
    rng = np.random.default_rng(0)
    item = ds.sample(3, rng)
    ws = int(item["window_size"])
    assert 8 <= ws <= 16
    assert item["states"]["rgb_static"].shape == (16, 32, 32, 3)
    assert item["actions"].shape == (16, 7)
    # frames beyond window are repeats of the last real frame
    if ws < 16:
        np.testing.assert_array_equal(
            item["states"]["rgb_static"][ws - 1], item["states"]["rgb_static"][-1]
        )
        # rel action padding: zeros except repeated gripper channel
        np.testing.assert_array_equal(item["actions"][ws:, :-1], 0.0)
        np.testing.assert_array_equal(
            item["actions"][ws:, -1], item["actions"][ws - 1, -1]
        )
    # window alignment: frame step encoded in red channel
    start = int(ds.episode_lookup[3])
    assert item["states"]["rgb_static"][0, 0, 0, 0] == start % 251
    assert item["state_info"]["robot_obs"].shape == (16, 15)


def test_play_dataset_val_deterministic(data_root):
    ds = PlayWindowDataset(
        data_root / "validation",
        modalities=MODALITIES,
        min_window_size=8,
        max_window_size=16,
        train=False,
    )
    a = ds.sample(5, np.random.default_rng(1))
    b = ds.sample(5, np.random.default_rng(999))
    assert int(a["window_size"]) == int(b["window_size"])


def test_play_dataset_goals(data_root, tmp_path):
    ds = PlayWindowDataset(
        data_root / "training",
        modalities=MODALITIES,
        min_window_size=8,
        max_window_size=16,
        include_goal=True,
        goal_strategy_prob={"geometric": 0.5, "similar_robot_obs": 0.5},
        nn_steps_from_step_path=str(tmp_path / "nn.json"),
        num_nn=8,
    )
    rng = np.random.default_rng(0)
    disps = []
    for i in range(20):
        item = ds.sample(i % len(ds), rng)
        assert "goal" in item
        assert item["goal"]["rgb_static"].shape == (32, 32, 3)
        assert "rel_actions_world" not in item["goal"]
        disps.append(int(item["disp"]))
    assert any(d >= 1 for d in disps)  # geometric used
    assert any(d == -1 for d in disps)  # nn strategy used
    assert (tmp_path / "nn.json").is_file()
    with open(tmp_path / "nn.json") as f:
        cached = json.load(f)
    assert "train" in cached


def test_knn_exact():
    db = np.asarray([[0.0], [1.0], [2.0], [10.0]])
    idx = knn_l2(db, db, 2)
    np.testing.assert_array_equal(idx[:, 0], [0, 1, 2, 3])  # self first
    assert idx[0, 1] == 1 and idx[3, 1] == 2


def test_knn_margin_excludes_temporal_neighbors():
    steps = [0, 1, 2, 100]
    vecs = np.asarray([[0.0], [0.1], [0.2], [0.3]])
    nn = build_nn_steps_from_step(steps, vecs, num_nn=4, margin=2)
    assert 1 not in nn[0] and 0 not in nn[1]
    assert 100 in nn[0]


def test_dataloader_batches(data_root):
    ds = PlayWindowDataset(
        data_root / "training",
        modalities=MODALITIES,
        min_window_size=8,
        max_window_size=16,
    )
    dl = DataLoader(ds, batch_size=4, shuffle=True, seed=0, prefetch=2)
    batches = list(dl)
    assert len(batches) == len(ds) // 4
    b = batches[0]
    assert b["states"]["rgb_static"].shape == (4, 16, 32, 32, 3)
    assert b["states"]["rgb_static"].dtype == np.uint8
    assert b["actions"].shape == (4, 16, 7)
    assert b["idx"].shape == (4,)


def test_dataloader_percentage_and_determinism(data_root):
    ds = PlayWindowDataset(
        data_root / "training", modalities=MODALITIES,
        min_window_size=8, max_window_size=16,
    )
    dl1 = DataLoader(ds, batch_size=4, seed=7, percentage=0.5)
    dl2 = DataLoader(ds, batch_size=4, seed=7, percentage=0.5)
    assert len(dl1) == (len(ds) // 2) // 4
    b1, b2 = next(iter(dl1)), next(iter(dl2))
    np.testing.assert_array_equal(b1["idx"], b2["idx"])
    np.testing.assert_array_equal(b1["actions"], b2["actions"])


def test_collate_nested():
    items = [{"a": np.ones(2), "n": {"b": np.zeros(3)}} for _ in range(4)]
    out = collate(items)
    assert out["a"].shape == (4, 2) and out["n"]["b"].shape == (4, 3)


def test_dataloader_thread_pool_matches_sequential(data_root):
    """num_threads>1 (pooled per-item producers) must yield bit-identical
    batches in the same order as the single-thread path — RNG is keyed per
    (seed, epoch, batch, item), never by worker."""
    ds = PlayWindowDataset(
        data_root / "training", modalities=MODALITIES,
        min_window_size=8, max_window_size=16,
    )
    seq = list(DataLoader(ds, batch_size=4, seed=11, prefetch=0))
    pooled = list(DataLoader(ds, batch_size=4, seed=11, prefetch=2, num_threads=4))
    assert len(seq) == len(pooled)
    for b1, b2 in zip(seq, pooled):
        np.testing.assert_array_equal(b1["idx"], b2["idx"])
        np.testing.assert_array_equal(b1["actions"], b2["actions"])
        np.testing.assert_array_equal(
            b1["states"]["rgb_static"], b2["states"]["rgb_static"]
        )


def test_dataloader_thread_pool_surfaces_errors(data_root):
    class Boom:
        def __len__(self):
            return 16

        def sample(self, idx, rng):
            raise RuntimeError("boom")

    dl = DataLoader(Boom(), batch_size=4, seed=0, prefetch=1, num_threads=3)
    with pytest.raises(RuntimeError, match="boom"):
        list(dl)


def test_native_gather_matches_numpy(tmp_path):
    from tacorl_tpu.data.native import gather_rows, gather_windows, get_native_lib

    arr = np.arange(200 * 6, dtype=np.float32).reshape(200, 6)
    starts = [3, 50, 120]
    out = gather_windows(arr, starts, window_rows=5, pad_rows=3)
    assert out.shape == (3, 8, 6)
    for i, s in enumerate(starts):
        np.testing.assert_array_equal(out[i, :5], arr[s : s + 5])
        np.testing.assert_array_equal(out[i, 5:], np.tile(arr[s + 4], (3, 1)))
    rows = gather_rows(arr, [7, 0, 199])
    np.testing.assert_array_equal(rows, arr[[7, 0, 199]])
    assert get_native_lib() is not None, "native build should succeed here"


def test_packed_batched_window_gather(data_root, tmp_path):
    packed_dir = tmp_path / "packed_batch"
    pack_frames(data_root / "training", packed_dir)
    st = PackedStorage(packed_dir)
    batch = st.read_window_batch([2, 10], window=4, keys=["rgb_static"], pad_rows=2)
    single = st.read_window(2, 6, ["rgb_static"])
    np.testing.assert_array_equal(batch["rgb_static"][0, :4], single["rgb_static"])
    np.testing.assert_array_equal(
        batch["rgb_static"][0, 4:], np.stack([single["rgb_static"][-1]] * 2)
    )
    frames = st.read_frame_batch([5, 11], ["robot_obs"])
    np.testing.assert_array_equal(
        frames["robot_obs"][1], st.read_frame(11, ["robot_obs"])["robot_obs"]
    )


def test_play_dataset_batched_path_matches_per_item(data_root, tmp_path):
    packed_dir = tmp_path / "packed_ds"
    pack_frames(data_root / "training", packed_dir)
    kwargs = dict(
        modalities=MODALITIES, min_window_size=8, max_window_size=16,
        include_goal=True,
        goal_strategy_prob={"geometric": 1.0},
        nn_steps_from_step_path=str(tmp_path / "nn2.json"),
    )
    ds_packed = PlayWindowDataset(packed_dir, **kwargs)
    assert ds_packed.supports_batch()
    rng = np.random.default_rng(0)
    batch = ds_packed.sample_batch(np.arange(6), rng)
    assert batch["states"]["rgb_static"].shape == (6, 16, 32, 32, 3)
    assert batch["actions"].shape == (6, 16, 7)
    assert batch["goal"]["rgb_static"].shape == (6, 32, 32, 3)
    # padding semantics: rows beyond ws repeat frame ws-1, rel actions zeroed
    for i in range(6):
        ws = int(batch["window_size"][i])
        start = int(ds_packed.episode_lookup[i])
        # alignment: first frame red channel == start step
        assert batch["states"]["rgb_static"][i, 0, 0, 0, 0] == start % 251
        if ws < 16:
            np.testing.assert_array_equal(
                batch["states"]["rgb_static"][i, ws:],
                np.stack([batch["states"]["rgb_static"][i, ws - 1]] * (16 - ws)),
            )
            np.testing.assert_array_equal(batch["actions"][i, ws:, :-1], 0)
            np.testing.assert_array_equal(
                batch["actions"][i, ws:, -1], batch["actions"][i, ws - 1, -1]
            )

    # DataLoader uses the batched path and stays deterministic per seed
    dl1 = DataLoader(ds_packed, batch_size=4, seed=3)
    dl2 = DataLoader(ds_packed, batch_size=4, seed=3)
    b1, b2 = next(iter(dl1)), next(iter(dl2))
    np.testing.assert_array_equal(b1["actions"], b2["actions"])
    np.testing.assert_array_equal(b1["disp"], b2["disp"])


def test_saved_transition_dataset(tmp_path):
    from tacorl_tpu.data.replay_buffer import ReplayBuffer
    from tacorl_tpu.data.saved_transitions import SavedTransitionDataset

    buf = ReplayBuffer(100)
    for i in range(20):
        obs = {"observation": {"robot_obs": np.full(15, i, np.float32)}}
        buf.add_transition(obs, np.ones(7), obs, float(i), False)
    buf.save(tmp_path / "rb")
    ds = SavedTransitionDataset(tmp_path / "rb", train=True, val_percentage=0.1)
    assert len(ds) == 18
    item = ds.sample(0)
    assert item["actions"].shape == (7,)
    assert item["observations"]["observation"]["robot_obs"].shape == (15,)
    val = SavedTransitionDataset(tmp_path / "rb", train=False, val_percentage=0.1)
    assert len(val) == 2


def test_transform_noise_options(rng):
    import jax
    import jax.numpy as jnp

    from tacorl_tpu.data.transforms import DeviceTransforms

    tf = DeviceTransforms({
        "robot_obs": {"kind": "vector", "noise_std": 0.1},
        "depth_static": {
            "kind": "depth", "size": [16, 16], "pad": 2, "gamma_noise": True,
        },
    })
    states = {
        "robot_obs": jnp.zeros((4, 15)),
        "depth_static": jnp.ones((4, 20, 20)) * 1.0,
    }
    out_train = tf(jax.random.key(0), states, train=True)
    out_eval = tf(jax.random.key(0), states, train=False)
    # noise only at train time
    assert float(jnp.abs(out_train["robot_obs"]).sum()) > 0.0
    assert float(jnp.abs(out_eval["robot_obs"]).sum()) == 0.0
    assert out_train["depth_static"].shape == (4, 16, 16, 3)


def test_all_seven_goal_strategies(data_root, tmp_path):
    from tacorl_tpu.data.transition_dataset import GoalCondTransitionDataset

    # language annotations for task_future / filtering
    lang_dir = data_root / "training" / "lang_annotations"
    lang_dir.mkdir(exist_ok=True)
    ann = {
        "language": {"task": ["open_drawer", "move_slider_left"]},
        "info": {"indx": [(0, 15), (20, 35)]},
    }
    np.save(lang_dir / "auto_lang_ann.npy", ann)

    rng = np.random.default_rng(0)
    for strategy in (
        "random", "geometric", "increasing_horizon", "similar_robot_obs",
        "next_state", "episode_future", "task_future",
    ):
        ds = GoalCondTransitionDataset(
            data_root / "training",
            modalities=MODALITIES,
            goal_strategy_prob={strategy: 1.0},
            nn_steps_from_step_path=str(tmp_path / f"nn_{strategy}.json"),
            initial_horizon=4,
        )
        item = ds.sample(5, rng)
        assert item["observations"]["goal"]["rgb_static"].shape == (32, 32, 3)
        assert item["rewards"] in (0.0, 1.0), strategy
        if strategy == "next_state":
            # goal == next step -> reward 1 by construction
            assert item["rewards"] == 1.0
    # horizon curriculum hooks
    ds.increase_horizon(epoch=3)
    assert ds.current_horizon == 4 + 3 * 4
    ds.increase_horizon_to(10_000)
    assert ds.current_horizon == ds.max_horizon

    # task filtering restricts possible steps to annotated spans
    ds_f = GoalCondTransitionDataset(
        data_root / "training",
        modalities=MODALITIES,
        goal_strategy_prob={"geometric": 1.0},
        filter_by_tasks=True,
        tasks=["open_drawer"],
    )
    assert set(ds_f.possible_steps) <= set(range(0, 16))
