"""D4RL rollout managers: the three policy shapes over state vectors, with
the normalized score in the rollout info
(reference: evaluation/rollout_manager_d4rl.py:8-250)."""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

__all__ = ["RLRolloutD4RL", "LatentPlanRolloutD4RL", "TACORLRolloutD4RL"]


def _goal_of(env) -> np.ndarray:
    if hasattr(env, "target_goal"):
        return np.asarray(env.target_goal, dtype=np.float32)
    return np.asarray(env.goal_locations[0], dtype=np.float32)


class _BaseD4RL:
    def __init__(self, seed: int = 0):
        self._key = jax.random.key(seed)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    @staticmethod
    def _finish(env, step, episode_return, info) -> Dict:
        return {
            "episode_length": step,
            "episode_return": episode_return,
            "score": float(env.get_normalized_score(episode_return)),
            "success": bool(info.get("success", False)),
        }


class RLRolloutD4RL(_BaseD4RL):
    """Flat policy on concat(obs, goal) (rollout_manager_d4rl.py:46-104)."""

    def episode_rollout(self, agent, env, reset_info=None, **kw) -> Dict:
        agent.reset()
        obs = env.reset()
        goal = _goal_of(env)
        episode_return, info = 0.0, {}
        for step in range(1, env.max_episode_steps + 1):
            action = agent.act(
                np.concatenate([obs, goal]).astype(np.float32), self._next_key()
            )
            obs, reward, done, info = env.step(action)
            episode_return += reward
            if done:
                break
        return self._finish(env, step, episode_return, info)


class _PlanDecodeD4RL(_BaseD4RL):
    def __init__(self, plan_duration: int = 16, seed: int = 0):
        super().__init__(seed)
        self.plan_duration = plan_duration

    def _plan(self, agent, obs, goal, key):
        raise NotImplementedError

    def episode_rollout(self, agent, env, reset_info=None, **kw) -> Dict:
        agent.reset()
        obs = env.reset()
        goal = _goal_of(env)
        episode_return, info = 0.0, {}
        step, done = 0, False
        while not done and step < env.max_episode_steps:
            plan = self._plan(agent, obs, goal, self._next_key())
            for _ in range(self.plan_duration):
                action = agent.decode_step(
                    {"observation": obs}, plan, self._next_key()
                )
                obs, reward, done, info = env.step(action)
                episode_return += reward
                step += 1
                if done or step >= env.max_episode_steps:
                    break
        return self._finish(env, step, episode_return, info)


class LatentPlanRolloutD4RL(_PlanDecodeD4RL):
    """Plan sampled from the proposal prior given (obs, goal xy)
    (rollout_manager_d4rl.py:107-170)."""

    def _plan(self, agent, obs, goal, key):
        return agent.propose_plan_d4rl(obs, goal, key)


class TACORLRolloutD4RL(_PlanDecodeD4RL):
    """Plan from the RL actor on concat(obs, goal)
    (rollout_manager_d4rl.py:173-250)."""

    def _plan(self, agent, obs, goal, key):
        return agent.propose_plan_d4rl(obs, goal, key)
