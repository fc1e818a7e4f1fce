#!/usr/bin/env python
"""Per-component timing of the production Play-LMP train step on one chip.

Times each stage with the honest tunnel protocol (K iterations chained via
lax.scan inside ONE executable, host fetch of a dependent scalar per call):

  aug        on-device transforms: resize 200->128, matmul shift, Pallas tail
  encoder_f  LMPVision encoder forward over B*T frames (bf16 convs)
  posterior  plan-recognition transformer forward
  decoder_f  logistic-mixture RNN decoder forward + NLL
  loss_f     full compute_loss forward
  train      full train step (fwd + bwd + Adam)

Stage inputs are precomputed on device so each timing isolates its stage.
Prints one JSON line per stage. Use after model/kernel changes to see where
the step time moved (BASELINE.md records the history).
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BATCH, WINDOW, RAW_HW = 64, 16, 200
SCAN_K = 10
TIMED_CALLS = 3


def timed(name, fn, *args):
    """fn must return a scalar-reducible pytree; scan K reps inside one jit.

    Anti-CSE: each rep's FIRST argument is perturbed by the (tiny, evolving)
    carry — or, for a PRNG-key first argument, folded with the rep index —
    so XLA cannot hoist the K identical pure calls out of the scan."""

    def _is_key(x):
        return jnp.issubdtype(getattr(x, "dtype", jnp.float32), jax.dtypes.prng_key)

    @jax.jit
    def k_reps(*a):
        def body(carry, i):
            first = a[0]
            if _is_key(first):
                first = jax.random.fold_in(first, i)
            else:
                first = jax.tree.map(
                    lambda x: x + carry
                    if jnp.issubdtype(x.dtype, jnp.floating)
                    else x,
                    first,
                )
            out = fn(first, *a[1:])
            s = jax.tree.reduce(
                lambda acc, x: acc + jnp.sum(jnp.asarray(x, jnp.float32)), out,
                jnp.float32(0),
            )
            return carry + s * 1e-38, None

        acc, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(SCAN_K), length=SCAN_K
        )
        return acc

    t0 = time.time()
    v = float(k_reps(*args))  # compile + first run
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(TIMED_CALLS):
        v = float(k_reps(*args))
    dt = time.perf_counter() - t0
    assert np.isfinite(v)
    ms = dt / (TIMED_CALLS * SCAN_K) * 1e3
    print(
        json.dumps(
            {"stage": name, "ms_per_step": round(ms, 3),
             "compile_s": round(compile_s, 1)}
        ),
        flush=True,
    )
    return ms


def main() -> None:
    global BATCH, WINDOW, RAW_HW
    sys.path.insert(0, ".")
    tiny = "--tiny" in sys.argv  # CPU smoke mode
    if tiny:
        jax.config.update("jax_platforms", "cpu")
        BATCH, WINDOW, RAW_HW = 4, 8, 48
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from __graft_entry__ import _batch, _module

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    module = _module(tiny=tiny)
    batch = _batch(b=BATCH, t=WINDOW, hw=RAW_HW)
    rng = jax.random.key(0)
    state = module.init_state(rng, batch)
    params = state.params
    net = module.net

    raw = jax.device_put(batch["states"])
    actions = jax.device_put(jnp.asarray(batch["actions"]))

    # stage inputs (computed once, on device)
    states = jax.jit(lambda k, s: module.transforms(k, s, train=True))(rng, raw)
    emb = jax.jit(
        lambda p, s: net.apply({"params": p}, s, method="get_emb_states")
    )(params, states)
    emb_cat = jnp.concatenate([emb[m] for m in module.pr_mods], axis=-1)

    timed("aug", lambda k, s: module.transforms(k, s, train=True), rng, raw)
    timed(
        "encoder_f",
        lambda p, s: net.apply({"params": p}, s, method="get_emb_states"),
        params, states,
    )
    timed(
        "posterior",
        lambda p, e, k: net.plan_recognition.apply(
            {"params": p["plan_recognition"]}, e
        ).sample(k),
        params, emb_cat, rng,
    )

    def decoder_nll(p, e, acts):
        plan = jnp.zeros((BATCH, module.latent_plan_dim))
        dec_in = jnp.concatenate([e[m] for m in module.ad_mods], axis=-1)
        return net.action_decoder.apply(
            {"params": p["action_decoder"]}, plan, dec_in, acts,
            method="loss",
        )

    timed("decoder_f", decoder_nll, params, emb, actions)

    def decoder_fb(p, e, acts):
        return jax.grad(
            lambda pp: decoder_nll({"action_decoder": pp}, e, acts)
        )(p["action_decoder"])

    timed("decoder_fb", decoder_fb, params, emb, actions)

    def full_loss(p, s, acts, k):
        st = module.transforms(k, s, train=True)
        total, _, _ = net.apply(
            {"params": p}, k, st, acts, jnp.asarray(1e-3), True,
            method="compute_loss", rngs={"dropout": k},
        )
        return total

    timed("loss_f", full_loss, params, raw, actions, rng)

    # full train step (scanned dispatch, as bench.py)
    stacked = jax.device_put(
        jax.tree.map(lambda x: np.broadcast_to(x, (SCAN_K,) + x.shape), batch)
    )
    scanned = module.make_scanned_train_step()
    scalars = {"kl_beta": jnp.asarray(1e-3)}
    t0 = time.time()
    state, metrics = scanned(state, stacked, rng, scalars)
    _ = float(metrics["total_loss"])
    print(f"# train compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    for _ in range(TIMED_CALLS):
        state, metrics = scanned(state, stacked, rng, scalars)
        _ = float(metrics["total_loss"])
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {"stage": "train", "ms_per_step": round(dt / (TIMED_CALLS * SCAN_K) * 1e3, 3)}
        )
    )


if __name__ == "__main__":
    main()
