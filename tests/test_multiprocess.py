"""REAL multi-process pod simulation (SURVEY.md §2.7): two OS processes join
via jax.distributed (gloo over localhost — the CPU stand-in for DCN), each
owning 4 virtual devices of a global 8-device dp mesh, each feeding only its
process-local half of the batch. This exercises the actual multihost code
path (make_array_from_process_local_data + cross-process collectives inside
the jitted train step) that the in-process 8-device tests cannot: there,
jax.process_count() == 1.

The reference delegates all of this to Lightning DDP and never tests it
(SURVEY.md §4 "Multi-node without a cluster: not tested at all")."""

import json
import socket
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_step_matches_single_process():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "multihost_child.py"),
             str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-3000:]
        outs.append(out)
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["pid"]] = r
    assert set(results) == {0, 1}, outs

    # both hosts observe the same GLOBAL loss/grad (psum'd inside jit)
    assert results[0]["total_loss"] == pytest.approx(
        results[1]["total_loss"], rel=1e-5
    )
    assert results[0]["grad_norm"] == pytest.approx(
        results[1]["grad_norm"], rel=1e-5
    )
    assert results[0]["step"] == results[1]["step"] == 1

    # rank-sharded rollouts are disjoint and cover everything; the
    # process_allgather'd metric mean is identical on both hosts
    assert results[0]["shard"] == [0, 2, 4, 6, 8]
    assert results[1]["shard"] == [1, 3, 5, 7, 9]
    assert results[0]["val_accuracy_mean"] == 0.5  # mean(0, 1) across hosts
    assert results[1]["val_accuracy_mean"] == 0.5

    # ...and it equals the single-process result on the concatenated batch
    # (this pytest process has the 8-device virtual mesh, process_count==1)
    from __graft_entry__ import _batch, _module
    from tacorl_tpu.parallel.mesh import (
        create_mesh,
        replicated_sharding,
        shard_batch,
    )

    module = _module(tiny=True)
    full = _batch(b=16, t=8, hw=32, seed=0)
    rng = jax.random.key(0)
    state = module.init_state(rng, full)
    mesh = create_mesh(devices=jax.devices()[:8])
    state = jax.device_put(state, replicated_sharding(mesh))
    sharded = shard_batch(full, mesh)
    _, metrics = module.make_train_step()(
        state, sharded, rng, {"kl_beta": jnp.asarray(1e-3)}
    )
    assert float(metrics["total_loss"]) == pytest.approx(
        results[0]["total_loss"], rel=1e-4
    )
    assert np.isfinite(results[0]["grad_norm"])

    # the CQL step ran on the same 2-process mesh: both hosts observe the
    # same global losses, and they match the single-process full-batch run
    assert results[0]["cql_q1_loss"] == pytest.approx(
        results[1]["cql_q1_loss"], rel=1e-5
    )
    assert results[0]["cql_actor_loss"] == pytest.approx(
        results[1]["cql_actor_loss"], rel=1e-5
    )
    from __graft_entry__ import _cql_batch, _cql_module

    cql = _cql_module()
    cql_full = _cql_batch(b=16)
    cql_state = jax.device_put(
        cql.init_state(rng, cql_full), replicated_sharding(mesh)
    )
    cql_scalars = {
        k: jnp.asarray(v, dtype=jnp.float32)
        for k, v in cql.step_scalars().items()
    }
    _, cql_metrics = cql.make_train_step()(
        cql_state, shard_batch(cql_full, mesh), rng, cql_scalars
    )
    assert float(cql_metrics["q1_loss"]) == pytest.approx(
        results[0]["cql_q1_loss"], rel=1e-4
    )
