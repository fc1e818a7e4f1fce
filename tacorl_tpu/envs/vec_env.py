"""Parallel env stepping for replay-buffer warm fill
(reference: SubprocVecEnv usage in sac_lightning.py:297-350).

PyBullet instances are process-bound in the reference, forcing subprocesses;
the fake/state envs here are plain Python, so a thread pool suffices (and a
process pool would only matter for sim-heavy envs, which the real-CALVIN
adapter can wrap externally). API: reset() -> list[obs], step(actions) ->
(list[obs], rewards, dones, infos); done envs auto-reset with the terminal
observation reported in info (SubprocVecEnv semantics)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, List, Sequence

import numpy as np

__all__ = ["ThreadedVecEnv"]


class ThreadedVecEnv:
    def __init__(self, env_fns: Sequence[Callable[[], Any]]):
        self.envs = [fn() for fn in env_fns]
        self._pool = ThreadPoolExecutor(max_workers=len(self.envs))

    def __len__(self) -> int:
        return len(self.envs)

    @property
    def num_envs(self) -> int:
        return len(self.envs)

    def reset(self) -> List[Any]:
        return list(self._pool.map(lambda e: e.reset(), self.envs))

    def step(self, actions: Sequence[np.ndarray]):
        def one(pair):
            env, action = pair
            obs, reward, done, info = env.step(action)
            if done:
                info = dict(info)
                info["terminal_observation"] = obs
                obs = env.reset()
            return obs, reward, done, info

        results = list(self._pool.map(one, zip(self.envs, actions)))
        obs, rewards, dones, infos = zip(*results)
        return list(obs), np.asarray(rewards), np.asarray(dones), list(infos)

    def close(self) -> None:
        self._pool.shutdown(wait=False)
