"""Dataset -> video dump (reference: utils/visualize_frames.py:7-51): render
a span of dataset frames to an mp4/gif for inspection."""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Union

import numpy as np

from tacorl_tpu.data.storage import load_ep_start_end_ids, open_storage
from tacorl_tpu.evaluation.video import VideoRecorder

__all__ = ["dump_episode_video"]


def dump_episode_video(
    data_dir: Union[str, Path],
    out_path: Union[str, Path],
    start: Optional[int] = None,
    end: Optional[int] = None,
    modality: str = "rgb_static",
    fps: int = 15,
    train: bool = True,
) -> Path:
    storage = open_storage(Path(data_dir))
    if start is None or end is None:
        bounds = load_ep_start_end_ids(Path(data_dir), train)
        start = int(bounds[0][0]) if start is None else start
        end = int(bounds[0][1]) if end is None else end
    recorder = VideoRecorder(fps=fps)
    first = storage.read_frame(start, [modality])[modality]
    recorder.new_video(np.asarray(first))
    for step in range(start + 1, end + 1):
        recorder.update(
            np.asarray(storage.read_frame(step, [modality])[modality])
        )
    return recorder.save(out_path)
