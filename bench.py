#!/usr/bin/env python
"""Benchmark: Play-LMP train steps/sec/chip on CALVIN-shaped play windows.

Runs the production-config Play-LMP training step (batch 64, window 16,
128x128 rgb_static, LMPVision encoder, 2048/4096 transformer posterior,
2048-hidden 2-layer RNN logistic-mixture decoder — the defaults of
config/trainer/default.yaml + config/experiment/play_lmp_for_rl.yaml in the
reference) on synthetic device-resident batches, so the number isolates the
fused compute path (augmentation + forward + backward + Adam).

Baseline: the reference publishes no throughput numbers (BASELINE.md). The
``vs_baseline`` denominator is the documented A100-PyTorch estimate in
BASELINE.md (analytic roofline + framework overhead; to be replaced by a real
A100 measurement when hardware is available).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Documented estimate of the reference PyTorch Play-LMP step rate on one A100
# (see BASELINE.md "A100 baseline estimate"): ~20 steps/s at batch 64.
A100_TORCH_STEPS_PER_SEC = 20.0

BATCH = 64
WINDOW = 16
HW = 128
WARMUP = 3
ITERS = 100
FETCH_EVERY = 10  # host-fetch the loss to force execution (async runtimes)


def main() -> None:
    sys.path.insert(0, ".")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from __graft_entry__ import _batch, _module

    platform = jax.devices()[0].platform
    print(f"# devices: {jax.devices()} (platform={platform})", file=sys.stderr)
    if platform == "cpu" and "cpu" not in str(
        jax.config.jax_platforms or ""
    ).split(",")[0]:
        # the tunnel silently falls back to CPU when another process holds
        # the TPU — a CPU number would be meaningless as the chip benchmark
        print("# WARNING: TPU unavailable, fell back to CPU", file=sys.stderr)

    module = _module(tiny=False)
    batch = _batch(b=BATCH, t=WINDOW, hw=HW)
    rng = jax.random.key(0)
    state = module.init_state(rng, batch)
    device_batch = jax.device_put(batch)
    train_step = module.make_train_step()
    scalars = {"kl_beta": jnp.asarray(1e-3)}

    for _ in range(WARMUP):
        state, metrics = train_step(state, device_batch, rng, scalars)
    jax.block_until_ready(state.params)

    losses = []
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics = train_step(state, device_batch, rng, scalars)
        if (i + 1) % FETCH_EVERY == 0:
            losses.append(float(metrics["total_loss"]))  # forces execution
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    assert all(np.isfinite(v) for v in losses)

    steps_per_sec = ITERS / dt
    assert np.isfinite(float(metrics["total_loss"]))
    print(
        json.dumps(
            {
                "metric": "play_lmp_train_steps_per_sec_per_chip",
                "value": round(steps_per_sec, 3),
                "unit": "steps/sec",
                "vs_baseline": round(steps_per_sec / A100_TORCH_STEPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
