#!/usr/bin/env python
"""Per-family train-step FLOP counts (XLA cost analysis) for the MFU rows in
BASELINE.md. Uses the same builders as bench.py / bench_modules.py, so the
counted computation is exactly the benchmarked one.

Usage: python scripts/bench_flops.py [families...]
Prints one line per family: flops/step and the MFU implied by a given
steps/s (pass rates as family=steps_per_sec to get MFU against the v5e's
~197 TFLOP/s bf16 peak).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))
sys.path.insert(0, str(REPO_ROOT / "scripts"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

V5E_PEAK_FLOPS = 197e12  # bf16


def count(module, batch, scalars, scan_k: int = 10) -> float:
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
    lowered = jax.jit(scanned).lower(state, stacked, rng, scalars)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost["flops"]) / scan_k


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from bench_modules import FAMILY_BUILDERS

    args = dict(
        a.split("=", 1) for a in sys.argv[1:] if "=" in a
    )
    names = [a for a in sys.argv[1:] if "=" not in a] or [
        "tacorl", "cql", "ril"
    ]
    for name in names:
        module, batch, scalars = FAMILY_BUILDERS[name]()
        flops = count(module, batch, scalars)
        line = f"{name}: {flops:.4g} FLOP/step"
        if name in args:
            sps = float(args[name])
            mfu = sps * flops / V5E_PEAK_FLOPS
            line += f"  @ {sps} steps/s -> {mfu * 100:.1f}% MFU"
        print(line)


if __name__ == "__main__":
    main()
