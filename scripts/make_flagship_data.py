"""Regenerate the round-5 flagship expert-play dataset (BASELINE.md "one
flagship dataset, every protocol strong"): 400 distinct-chain training
episodes + 40 validation episodes (=> 160/120/80/40 depth-1..4 validation
chains), seed=5, then pack both splits into memmap PackedStorage (the
tunnel-feedable production format, data/storage.py:pack_frames).

Usage:  python scripts/make_flagship_data.py [dest=/tmp/flagship_packed]

Reference data shape: the CALVIN play corpus the reference trains on
(/root/reference/src/tacorl/datasets/play_dataset.py); the scripted-expert
generator is this framework's hermetic stand-in.
"""

import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tacorl_tpu.data.expert_play import generate_expert_play
from tacorl_tpu.data.storage import pack_frames


def main(dest: Path) -> Path:
    raw = Path(tempfile.mkdtemp(prefix="flagship_raw_"))
    generate_expert_play(
        raw,
        n_train_episodes=400,
        n_val_episodes=40,
        tasks_per_episode=4,
        idle_steps=(3, 7),
        seed=5,
        distinct_tasks=True,
    )
    dest.mkdir(parents=True, exist_ok=True)
    for split in ("training", "validation"):
        pack_frames(raw / split, dest / split)
        # the span table + any aux metadata ride along for the eval pipeline
        for aux in (raw / split).glob("*.json"):
            shutil.copy(aux, dest / split / aux.name)
    shutil.rmtree(raw)
    print(f"flagship dataset packed at {dest}")
    return dest


if __name__ == "__main__":
    main(Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/flagship_packed"))
