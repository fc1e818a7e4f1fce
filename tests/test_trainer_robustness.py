"""Targeted tests for the r2-verdict trainer robustness fixes:
instance-level ``_last_val_metrics``, class-name-keyed callback state, and
logged partial-chunk drops in scanned dispatch (VERDICT r2 weak #4-6)."""

import json
import logging

import numpy as np

from tacorl_tpu.callbacks.base import Callback
from tacorl_tpu.core.trainer import Trainer, _stack_chunks


def test_last_val_metrics_is_instance_level():
    t1, t2 = Trainer(), Trainer()
    t1._last_val_metrics.update({"val_accuracy": 0.5})
    assert t2._last_val_metrics == {}
    # no shared class-level dict left behind
    assert "_last_val_metrics" not in Trainer.__dict__


class _CbA(Callback):
    def __init__(self):
        self.value = None

    def state_dict(self):
        return {"value": "A"}

    def load_state_dict(self, state):
        self.value = state["value"]


class _CbB(_CbA):
    def state_dict(self):
        return {"value": "B"}


class _CbStateless(Callback):
    pass


def _trainer_with(tmp_path, callbacks):
    t = Trainer(callbacks=callbacks)

    class Ckpt:
        dir = tmp_path

    t.ckpt = Ckpt()
    return t


def test_callback_state_survives_reordering(tmp_path):
    a, b = _CbA(), _CbB()
    _trainer_with(tmp_path, [a, b, _CbStateless()])._save_callback_states()
    saved = json.loads((tmp_path / "callbacks_state.json").read_text())
    assert set(saved) == {"_CbA", "_CbB"}  # stateless callback not persisted

    # reordered (and with the stateless callback first): each class still
    # receives its own state — positional zip would cross-load them
    a2, b2 = _CbA(), _CbB()
    t2 = _trainer_with(tmp_path, [_CbStateless(), b2, a2])
    t2._load_callback_states()
    assert a2.value == "A" and b2.value == "B"


def test_callback_state_legacy_positional_format(tmp_path):
    (tmp_path / "callbacks_state.json").write_text(
        json.dumps([{"value": "A"}, {"value": "B"}])
    )
    a, b = _CbA(), _CbB()
    t = _trainer_with(tmp_path, [a, b])
    t._load_callback_states()
    assert a.value == "A" and b.value == "B"


def test_stack_chunks_logs_partial_drop(caplog):
    batches = [{"x": np.full((2,), i, np.float32)} for i in range(10)]
    with caplog.at_level(logging.INFO, logger="tacorl_tpu"):
        chunks = list(_stack_chunks(iter(batches), 4))
    assert len(chunks) == 2  # 10 batches at K=4 -> 2 full chunks
    assert chunks[0]["x"].shape == (4, 2)
    assert any(
        "dropped a trailing partial chunk of 2/4" in r.message
        for r in caplog.records
    )
    # exact multiple: no drop line
    with caplog.at_level(logging.INFO, logger="tacorl_tpu"):
        caplog.clear()
        list(_stack_chunks(iter(batches[:8]), 4))
    assert not any("partial chunk" in r.message for r in caplog.records)
