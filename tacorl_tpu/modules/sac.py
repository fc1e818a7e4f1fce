"""Online SAC with in-step environment interaction
(reference: modules/sac/sac_lightning.py:32-468, sac_agent.py:12-83).

The update math is the CQL update WITHOUT the conservative penalty
(use_conservative = False); the online part — env stepping, replay buffer,
warm-start population, buffer persistence — runs host-side around the jitted
update (the design split the reference approximates by forcing the gloo
backend to avoid NCCL deadlocks, scripts/train.py:75).
"""

from __future__ import annotations

import functools
from collections import deque
from typing import Any, Dict, Optional

import jax
import numpy as np

from tacorl_tpu.config import instantiate
from tacorl_tpu.data.replay_buffer import ReplayBuffer
from tacorl_tpu.modules.cql import CQLModule

__all__ = ["SACModule"]


class SACModule(CQLModule):
    name = "sac"
    use_conservative = False
    supports_scan = False  # env interaction inside the step (host-side)

    def build(self) -> None:
        cfg = self.cfg
        cfg.setdefault("with_lagrange", False)
        super().build()
        self.replay_buffer = ReplayBuffer(
            int(cfg.get("replay_buffer_size", 5_000_000))
        )
        self.replay_buffer_path = cfg.get("replay_buffer_path")
        self.warm_start_steps = int(cfg.get("warm_start_steps", 1000))
        self.fill_strategy = cfg.get("fill_strategy", "random")
        self.populate_replay_buffer = bool(
            cfg.get("populate_replay_buffer", True)
        )
        self.env = None
        if cfg.get("env"):
            self.env = (
                instantiate(cfg["env"])
                if isinstance(cfg["env"], dict)
                else cfg["env"]
            )
        self._policy_fn = None
        self._observation = None
        self._episode_return = 0.0
        self._episode_length = 0
        self.episodes_returns: deque = deque(maxlen=10)
        self.episodes_lengths: deque = deque(maxlen=10)
        # episode-cadence surface probed by the rollout callback
        # (rollout.py:505-512: pl_module.episode_number/episode_done)
        self.episode_number = 0
        self.episode_done = False
        self.accuracies: deque = deque(maxlen=10)
        self._rng = np.random.default_rng(int(cfg.get("seed", 0)))
        self._play_key = jax.random.key(int(cfg.get("seed", 0)) + 17)
        self._state_for_play = None

    def attach_env(self, env) -> None:
        self.env = env

    # -- env interaction (sac_agent.py:38-83) ------------------------------------

    def _policy(self, params, obs, key, deterministic):
        if self._policy_fn is None:
            net = self.actor_net
            transforms = self.transforms

            @functools.partial(jax.jit, static_argnums=(3,))
            def policy(params, obs, key, deterministic):
                obs_t = transforms(key, obs, train=True)
                a, _ = net.apply(
                    {"params": params},
                    obs_t,
                    key,
                    deterministic,
                    False,
                    method="get_actions",
                )
                return a

            self._policy_fn = policy
        return self._policy_fn(params, obs, key, deterministic)

    def get_action(self, params, observation, strategy: str = "stochastic"):
        if strategy in ("stochastic", "deterministic"):
            actor_params = params["actor"] if "actor" in params else params
            self._play_key, sub = jax.random.split(self._play_key)
            batched = jax.tree.map(lambda x: np.asarray(x)[None], observation)
            action = self._policy(
                actor_params, batched, sub, strategy == "deterministic"
            )
            return np.asarray(action[0])
        if strategy == "random":
            a = self._rng.uniform(-1.0, 1.0, self.action_dim).astype(np.float32)
            return a
        if strategy == "zeros":
            return np.zeros(self.action_dim, dtype=np.float32)
        raise ValueError(f"unknown strategy {strategy!r}")

    def play_step(self, params, strategy: str = "stochastic") -> Dict[str, Any]:
        """One env step + buffer append (sac_agent.py:38-59)."""
        assert self.env is not None, "attach_env() before online training"
        if self._observation is None:
            self._observation = self.env.reset()
        action = self.get_action(params, self._observation, strategy)
        next_observation, reward, done, info = self.env.step(action)
        self.replay_buffer.add_transition(
            self._observation, action, next_observation, float(reward), bool(done)
        )
        self._observation = next_observation
        self._episode_return += float(reward)
        self._episode_length += 1
        out = {"reward": float(reward), "done": bool(done)}
        self.episode_done = bool(done)
        if done:
            self.episode_number += 1
            self.accuracies.append(int(bool(info.get("success", False))))
            self.episodes_returns.append(self._episode_return)
            self.episodes_lengths.append(self._episode_length)
            out.update(
                episode_return=self._episode_return,
                episode_length=self._episode_length,
                success=bool(info.get("success", False)),
            )
            self._episode_return, self._episode_length = 0.0, 0
            self._observation = self.env.reset()
        return out

    def populate(self, params, steps: Optional[int] = None) -> None:
        """Warm-start buffer fill (sac_lightning.py:352-376); with
        num_parallel_envs > 1 and an env factory configured, a ThreadedVecEnv
        fills in parallel (the reference's SubprocVecEnv path
        :297-350)."""
        if self.replay_buffer.load(self.replay_buffer_path):
            return
        if not self.populate_replay_buffer or len(self.replay_buffer) > 0:
            return
        strategy = self.fill_strategy
        if params is None and strategy not in ("random", "zeros"):
            strategy = "random"
        steps = steps if steps is not None else self.warm_start_steps
        n_parallel = int(self.cfg.get("num_parallel_envs", 1))
        if n_parallel > 1 and self.cfg.get("env"):
            self._populate_parallel(params, steps, strategy, n_parallel)
        else:
            for _ in range(steps):
                self.play_step(params, strategy)
        self.replay_buffer.save(self.replay_buffer_path)

    def _populate_parallel(self, params, steps, strategy, n_parallel) -> None:
        from tacorl_tpu.envs.vec_env import ThreadedVecEnv

        env_cfg = self.cfg["env"]
        vec = ThreadedVecEnv(
            [lambda: instantiate(env_cfg) for _ in range(n_parallel)]
        )
        observations = vec.reset()
        filled = 0
        while filled < steps:
            actions = [
                self.get_action(params, obs, strategy) for obs in observations
            ]
            next_obs, rewards, dones, infos = vec.step(actions)
            for i, done in enumerate(dones):
                terminal = (
                    infos[i]["terminal_observation"] if done else next_obs[i]
                )
                self.replay_buffer.add_transition(
                    observations[i], actions[i], terminal,
                    float(rewards[i]), bool(done),
                )
                filled += 1
            observations = next_obs
        vec.close()

    # -- training: env step wrapped around the jitted update -----------------------

    def make_train_step(self):
        inner = super().make_train_step()

        def train_step(state, batch, rng, scalars):
            self.play_step(state.params, "stochastic")
            return inner(state, batch, rng, scalars)

        return train_step

    def save_checkpoint_extras(self) -> None:
        """Buffer snapshot alongside checkpoints (sac_lightning.py:446-451)."""
        self.replay_buffer.save(self.replay_buffer_path)
