"""Saved-transition datasets: read replay buffers persisted as
``transition_%09d.npz`` files (reference:
datamodule/dataset/replay_buffer_dataset.py:8-60,
offline_replay_buffer_dataset.py:8-55) for offline training on recorded
interaction data."""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

__all__ = ["SavedTransitionDataset"]


class SavedTransitionDataset:
    def __init__(
        self,
        data_dir: Union[str, Path],
        train: bool = True,
        val_percentage: float = 0.1,
        **_,
    ):
        self.data_dir = Path(data_dir).expanduser()
        files = sorted(self.data_dir.glob("transition_*.npz"))
        if not files:
            raise FileNotFoundError(f"no transition files in {self.data_dir}")
        n_val = int(len(files) * val_percentage)
        self.files = files[:-n_val] if (train and n_val) else (
            files[-n_val:] if n_val else files
        )

    def __len__(self) -> int:
        return len(self.files)

    def sample(self, idx: int, rng: Optional[np.random.Generator] = None) -> Dict:
        data = np.load(self.files[idx], allow_pickle=True)
        state = data["state"].item() if data["state"].dtype == object else data["state"]
        next_state = (
            data["next_state"].item()
            if data["next_state"].dtype == object
            else data["next_state"]
        )
        return {
            "observations": state,
            "actions": np.asarray(data["action"], dtype=np.float32),
            "next_observations": next_state,
            "rewards": np.float32(data["reward"]),
            "terminals": np.float32(data["done"]),
        }
