"""Online-RL data module: an epoch is N batches sampled from the module's
live replay buffer (reference: datamodule/online_rl_data_module.py:12-36,
datamodule/dataset/rl_dataset.py:11-61)."""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

__all__ = ["OnlineRLDataModule"]


class _BufferLoader:
    def __init__(self, module, batch_size: int, steps_per_epoch: int, seed: int):
        self.module = module
        self.batch_size = batch_size
        self.steps_per_epoch = steps_per_epoch
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return self.steps_per_epoch

    def __iter__(self) -> Iterator:
        for _ in range(self.steps_per_epoch):
            yield self.module.replay_buffer.sample(self.batch_size, self.rng)


class OnlineRLDataModule:
    """The trainer injects the module via set_module (the reference's
    train.py:43-45 injection)."""

    def __init__(
        self,
        batch_size: int = 64,
        steps_per_epoch: int = 1000,
        seed: int = 0,
        **_,
    ):
        self.batch_size = batch_size
        self.steps_per_epoch = steps_per_epoch
        self.seed = seed
        self.module = None
        self.train_dataset = None

    def set_module(self, module) -> None:
        self.module = module

    def setup(self) -> None:
        assert self.module is not None, "call set_module(module) first"
        if len(self.module.replay_buffer) == 0:
            # warm start needs params; trainer populates after init. Here we
            # only assert the env is attached.
            assert self.module.env is not None

    def train_loader(self):
        return _BufferLoader(
            self.module, self.batch_size, self.steps_per_epoch, self.seed
        )

    def val_loader(self):
        return None
