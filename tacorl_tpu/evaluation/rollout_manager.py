"""Rollout managers: drive one agent through one episode of a host-side env
(reference: evaluation/rollout_manager.py:13-557).

Four manager shapes, matching the reference:
  * RLRollout          — flat policy, action per env step (optional CEM)
  * LatentPlanRollout  — sample plan from prior, stream decoder for
                         plan_duration steps, replan
  * TACORLRollout      — RL actor emits the plan (optionally CEM), decoder
                         streams actions
  * RILRollout         — high-level subgoal, low-level goal-conditioned policy

All managers return {"episode_length", "episode_return", "success"
[, "successful_tasks"]}.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np

from tacorl_tpu.evaluation.video import VideoRecorder

__all__ = ["RLRollout", "LatentPlanRollout", "TACORLRollout", "RILRollout"]


def _extract_img(obs: Dict) -> Optional[np.ndarray]:
    """First available image by modality priority (utils/misc.py:163-172)."""
    if isinstance(obs, dict) and "observation" in obs:
        return _extract_img(obs["observation"])
    for m in ("rgb_static", "depth_static", "rgb_gripper", "depth_gripper"):
        if isinstance(obs, dict) and m in obs:
            return obs[m]
    return None


class _BaseRolloutManager:
    def __init__(self, seed: int = 0):
        self._key = jax.random.key(seed)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def episode_rollout(self, agent, env, reset_info=None, **kwargs) -> Dict:
        raise NotImplementedError

    # -- shared episode bookkeeping -------------------------------------------

    def _start_recording(self, observation, recorder, task):
        if recorder is not None:
            recorder.new_video(_extract_img(observation), task=task)

    def _record(self, observation, recorder):
        if recorder is not None:
            recorder.update(_extract_img(observation))

    def _finish(
        self, observation, recorder, video_path, step, episode_return, info
    ) -> Dict:
        if recorder is not None:
            if isinstance(observation, dict) and observation.get("goal"):
                recorder.add_goal_thumbnail(_extract_img(observation["goal"]))
            if video_path is not None:
                recorder.save(video_path)
        out = {
            "episode_length": step,
            "episode_return": episode_return,
            "success": bool(info.get("success", False)),
        }
        if "successful_tasks" in info:
            out["successful_tasks"] = info["successful_tasks"]
        return out


class RLRollout(_BaseRolloutManager):
    def episode_rollout(
        self,
        agent,
        env,
        reset_info: Optional[dict] = None,
        recorder: Optional[VideoRecorder] = None,
        video_path=None,
        task: Optional[str] = None,
    ) -> Dict:
        agent.reset()
        observation = env.reset(**(reset_info or {}))
        self._start_recording(observation, recorder, task)
        episode_return, info = 0.0, {}
        for step in range(1, env.max_episode_steps + 1):
            action = agent.act(observation, self._next_key())
            observation, reward, done, info = env.step(action)
            episode_return += reward
            self._record(observation, recorder)
            if done:
                break
        return self._finish(
            observation, recorder, video_path, step, episode_return, info
        )


class _PlanDecodeRollout(_BaseRolloutManager):
    """Shared replanning loop: propose a plan every plan_duration env steps,
    stream the decoder between replans."""

    def __init__(self, plan_duration: int = 16, seed: int = 0):
        super().__init__(seed)
        self.plan_duration = plan_duration

    def episode_rollout(
        self,
        agent,
        env,
        reset_info: Optional[dict] = None,
        recorder: Optional[VideoRecorder] = None,
        video_path=None,
        task: Optional[str] = None,
    ) -> Dict:
        agent.reset()
        observation = env.reset(**(reset_info or {}))
        self._start_recording(observation, recorder, task)
        episode_return, info = 0.0, {}
        step, done = 0, False
        while not done and step < env.max_episode_steps:
            plan = agent.propose_plan(observation, self._next_key())
            for _ in range(self.plan_duration):
                action = agent.decode_step(observation, plan, self._next_key())
                observation, reward, done, info = env.step(action)
                episode_return += reward
                step += 1
                self._record(observation, recorder)
                if done or step >= env.max_episode_steps:
                    break
        return self._finish(
            observation, recorder, video_path, step, episode_return, info
        )


class LatentPlanRollout(_PlanDecodeRollout):
    """Play-LMP rollout (rollout_manager.py:183-307).

    Per-manager audit vs the reference: the replanning loop is identical for
    all three manager shapes upstream (propose every ``plan_duration`` env
    steps — 15 at eval per config/evaluation/{lmp,tacorl,ril}.yaml:14 — inner
    decode/act per step, break on done/max_steps). The behavior differences
    live in the agent, as upstream: LMP samples the plan *stochastically*
    from the proposal prior and clears the decoder hidden state on replan
    (:249-250) — see LatentPlanAgent.propose_plan."""


class TACORLRollout(_PlanDecodeRollout):
    """TACO-RL rollout (rollout_manager.py:310-431): the actor emits the plan
    deterministically (or CEM-refined, :363-375); decoder carry cleared on
    replan (:377) — see TACORLAgent."""


class RILRollout(_PlanDecodeRollout):
    """Relay-IL rollout (rollout_manager.py:434-557): subgoal renewal shares
    the same ``plan_duration`` cadence as the plan managers upstream
    (:501); the high level is deterministic (:497-499) and the low level is
    a stateless per-step policy — no hidden state to clear (see RILAgent,
    which accordingly has no carry)."""
