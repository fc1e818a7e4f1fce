"""Contract tests for the real-environment adapters, with calvin_env /
robot_io injected as mock packages via sys.modules (the sims/hardware are
absent from CI). Catches signature drift against the adapter seams:
action-frame conversion (abs / rel_world / rel_tcp via utils/geometry),
TCP micro-repeat, goal-injected double reset, and robot_io action scaling
(reference: envs/rl_base_env.py:141-205, envs/real_world.py:10-79).
VERDICT.md round-1 item 6.
"""

import sys
import types

import numpy as np
import pytest


# -- mock calvin_env --------------------------------------------------------


class MockCamera:
    name = "static"

    def render(self):
        return (np.zeros((16, 16, 3), np.uint8), np.zeros((16, 16), np.float32))


class MockRobot:
    max_rel_pos = 0.02
    max_rel_orn = 0.05

    def __init__(self):
        self.tcp_pos = np.zeros(3)
        self.applied = []  # recorded apply_action calls

    def get_observation(self):
        robot_obs = np.concatenate([self.tcp_pos, np.zeros(12)])
        return robot_obs, {"tcp_pos": self.tcp_pos.copy(),
                           "tcp_orn": np.zeros(3)}

    def relative_to_absolute(self, action):
        # reference semantics: rel (normalized) -> abs target pose
        pos = self.tcp_pos + np.asarray(action[:3]) * self.max_rel_pos
        return (pos, np.asarray(action[3:6]) * self.max_rel_orn,
                [action[-1]])

    def apply_action(self, abs_action):
        self.applied.append(abs_action)
        # converge towards the target by half the gap per application
        target = np.asarray(abs_action[0])
        self.tcp_pos = self.tcp_pos + 0.5 * (target - self.tcp_pos)


class MockScene:
    def get_obs(self):
        return np.arange(24, dtype=np.float64) / 24.0

    def step(self):
        pass


class MockBullet:
    def stepSimulation(self, physicsClientId=0):
        pass


class MockPlayTableSimEnv:
    def __init__(self, **kwargs):
        self.kwargs = kwargs
        self.cameras = [MockCamera()]
        self.robot = MockRobot()
        self.scene = MockScene()
        self.p = MockBullet()
        self.cid = 0
        self.action_repeat = 2
        self.reset_calls = []

    def reset(self, robot_obs=None, scene_obs=None):
        self.reset_calls.append((robot_obs, scene_obs))
        if robot_obs is not None:
            self.robot.tcp_pos = np.asarray(robot_obs[:3], dtype=np.float64)

    def get_info(self):
        return {"robot_info": {"tcp_pos": self.robot.tcp_pos.copy()},
                "scene_info": {}}


class MockTasks:
    def __init__(self, completed=("open_drawer",)):
        self.completed = list(completed)

    def get_task_info(self, start_info, end_info):
        return list(self.completed)

    def get_task_info_for_set(self, start_info, end_info, task_set):
        return [t for t in self.completed if t in set(task_set)]


@pytest.fixture
def mock_calvin(monkeypatch):
    pkg = types.ModuleType("calvin_env")
    envs = types.ModuleType("calvin_env.envs")
    pt = types.ModuleType("calvin_env.envs.play_table_env")
    tasks = types.ModuleType("calvin_env.envs.tasks")
    pt.PlayTableSimEnv = MockPlayTableSimEnv
    tasks.Tasks = MockTasks
    pkg.envs = envs
    envs.play_table_env = pt
    envs.tasks = tasks
    for name, mod in [("calvin_env", pkg), ("calvin_env.envs", envs),
                      ("calvin_env.envs.play_table_env", pt),
                      ("calvin_env.envs.tasks", tasks)]:
        monkeypatch.setitem(sys.modules, name, mod)
    return pt


def _states(pos):
    return {"robot_obs": np.concatenate([pos, np.zeros(12)]),
            "scene_obs": np.zeros(24)}


def test_calvin_adapter_reset_and_step_rel_world(mock_calvin):
    from tacorl_tpu.envs.calvin import CalvinGoalConditionedEnv

    env = CalvinGoalConditionedEnv(
        modalities=["rgb_static"], goal_modalities=["rgb_static"],
        max_episode_steps=5, action_type="rel_world",
        tasks=MockTasks(["open_drawer"]),
    )
    obs = env.reset(task_info={
        "tasks": ["open_drawer"],
        "goal_info": _states(np.ones(3)),
        "start_info": _states(np.zeros(3)),
    })
    # goal captured at the goal state, then sim reset back to start
    assert obs["goal"]["rgb_static"].shape == (16, 16, 3)
    assert len(env.sim.reset_calls) == 2
    assert env.selected_tasks == ["open_drawer"]

    obs, reward, done, info = env.step(np.array([1, 0, 0, 0, 0, 0, 0.5]))
    # gripper discretized to +1, relative_to_absolute target = pos + 1*0.02
    first_target = np.asarray(env.sim.robot.applied[0][0])
    np.testing.assert_allclose(first_target, [0.02, 0, 0], atol=1e-9)
    assert env.sim.robot.applied[0][-1] == [1.0]
    # mock tasks report open_drawer complete -> success on selected set
    assert info["success"] and done and reward == 1


def test_calvin_adapter_micro_repeat_fires(mock_calvin):
    from tacorl_tpu.envs.calvin import CalvinGoalConditionedEnv

    env = CalvinGoalConditionedEnv(
        modalities=["rgb_static"], tasks=MockTasks([]), max_episode_steps=10,
    )
    env.reset(robot_obs=np.zeros(15), scene_obs=np.zeros(24))
    # large target + half-gap convergence: needs several applications,
    # capped at 4 (rl_base_env.py:160-194 semantics)
    env.step(np.array([1, 1, 1, 0, 0, 0, -0.2]))
    assert 2 <= len(env.sim.robot.applied) <= 4


def test_calvin_adapter_rel_tcp_frame_conversion(mock_calvin):
    from tacorl_tpu.envs.calvin import CalvinGoalConditionedEnv

    env = CalvinGoalConditionedEnv(
        modalities=["rgb_static"], tasks=MockTasks([]),
        action_type="rel_tcp", max_episode_steps=10,
    )
    env.reset(robot_obs=np.zeros(15), scene_obs=np.zeros(24))
    env.step(np.array([1, 0, 0, 0, 0, 0, 1.0]))
    # identity tcp orientation (mock) -> rel_tcp == rel_world
    np.testing.assert_allclose(
        np.asarray(env.sim.robot.applied[0][0]), [0.02, 0, 0], atol=1e-9
    )


def test_calvin_adapter_abs_and_unknown_action_type(mock_calvin):
    from tacorl_tpu.envs.calvin import CalvinGoalConditionedEnv

    env = CalvinGoalConditionedEnv(
        modalities=["rgb_static"], tasks=MockTasks([]), action_type="abs",
        max_episode_steps=10,
    )
    env.reset(robot_obs=np.zeros(15), scene_obs=np.zeros(24))
    env.step(np.array([0.3, 0, 0, 0, 0, 0, 1.0]))
    # abs action passed through unchanged
    np.testing.assert_allclose(
        np.asarray(env.sim.robot.applied[0][:6]).ravel()[:3], [0.3, 0, 0]
    )

    env.action_type = "nope"
    with pytest.raises(ValueError, match="unknown action_type"):
        env.step(np.zeros(7))


def test_calvin_play_table_dense_reward(mock_calvin):
    from tacorl_tpu.envs.calvin import CalvinPlayTableEnv

    env = CalvinPlayTableEnv(
        task="open_drawer", dense_reward=True, target_value=0.5,
        scene_dim=12, modalities=["rgb_static"], tasks=MockTasks([]),
        max_episode_steps=10,
    )
    env.reset(robot_obs=np.zeros(15), scene_obs=np.zeros(24))
    _obs, reward, _done, _info = env.step(np.zeros(7))
    np.testing.assert_allclose(reward, -abs(12 / 24.0 - 0.5))


def test_calvin_missing_package_has_clear_error(monkeypatch):
    import builtins

    real_import = builtins.__import__

    def deny_calvin(name, *a, **kw):
        if name.startswith("calvin_env"):
            raise ImportError(name)
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", deny_calvin)
    for mod in list(sys.modules):
        if mod.startswith("calvin_env"):
            monkeypatch.delitem(sys.modules, mod)
    from tacorl_tpu.envs.calvin import CalvinGoalConditionedEnv

    with pytest.raises(ImportError, match="calvin_env is required"):
        CalvinGoalConditionedEnv()


# -- mock robot_io ----------------------------------------------------------


class MockCameraManager:
    def get_images(self):
        return {"rgb_static": np.zeros((16, 16, 3), np.uint8)}


class MockIORobot:
    def get_state(self):
        return np.zeros(15)


class MockRobotEnv:
    def __init__(self, robot=None, **kwargs):
        self.robot = MockIORobot()
        self.camera_manager = MockCameraManager()
        self.reset_kwargs = []
        self.steps = []

    def reset(self, **kwargs):
        self.reset_kwargs.append(kwargs)

    def step(self, robot_action):
        self.steps.append(robot_action)
        return None, 0.0, False, {}


@pytest.fixture
def mock_robot_io(monkeypatch):
    pkg = types.ModuleType("robot_io")
    envs = types.ModuleType("robot_io.envs")
    renv = types.ModuleType("robot_io.envs.robot_env")
    renv.RobotEnv = MockRobotEnv
    pkg.envs = envs
    envs.robot_env = renv
    for name, mod in [("robot_io", pkg), ("robot_io.envs", envs),
                      ("robot_io.envs.robot_env", renv)]:
        monkeypatch.setitem(sys.modules, name, mod)
    return renv


def test_real_world_adapter_contract(mock_robot_io):
    from tacorl_tpu.envs.real_world import (
        MAX_REL_ORN,
        MAX_REL_POS,
        RealWorldEnv,
    )

    env = RealWorldEnv(modalities=["rgb_static"])
    goal = {"rgb_static": np.ones((16, 16, 3), np.uint8)}
    robot_obs = np.concatenate([[0.1, 0.2, 0.3], [0.0, 0.0, 0.0],
                                np.zeros(8), [1.0]])
    obs = env.reset(goal=goal, robot_obs=robot_obs)
    # goal-injected reset: target pose from robot_obs, open gripper
    kw = env._env.reset_kwargs[0]
    np.testing.assert_allclose(kw["target_pos"], [0.1, 0.2, 0.3])
    assert kw["gripper_state"] == "open"
    assert obs["goal"] is goal
    assert obs["observation"]["rgb_static"].shape == (16, 16, 3)

    # action scaling: clipped to [-1,1], scaled by MAX_REL_*, rel frame
    env.step(np.array([2.0, 0, 0, 1.0, 0, 0, -0.5]))
    motion = env._env.steps[0]["motion"]
    np.testing.assert_allclose(motion[0], [MAX_REL_POS, 0, 0])
    np.testing.assert_allclose(motion[1], [MAX_REL_ORN, 0, 0])
    assert motion[2] == -1
    assert env._env.steps[0]["ref"] == "rel"


def test_real_world_missing_package_has_clear_error(monkeypatch):
    import builtins

    real_import = builtins.__import__

    def deny(name, *a, **kw):
        if name.startswith("robot_io"):
            raise ImportError(name)
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", deny)
    for mod in list(sys.modules):
        if mod.startswith("robot_io"):
            monkeypatch.delitem(sys.modules, mod)
    from tacorl_tpu.envs.real_world import RealWorldEnv

    with pytest.raises(ImportError, match="robot_io is required"):
        RealWorldEnv()


# -- mock gym + d4rl --------------------------------------------------------


def test_d4rl_live_dataset_via_mock_gym(monkeypatch):
    from tacorl_tpu.data.d4rl_dataset import load_d4rl_dataset

    ds = {
        "observations": np.zeros((10, 29), np.float32),
        "actions": np.zeros((10, 8), np.float32),
        "rewards": np.zeros(10, np.float32),
        "terminals": np.zeros(10, bool),
        "timeouts": np.zeros(10, bool),
    }

    class MockGymEnv:
        def get_dataset(self):
            return ds

    gym = types.ModuleType("gym")
    gym.make = lambda name: MockGymEnv()
    d4rl = types.ModuleType("d4rl")
    monkeypatch.setitem(sys.modules, "gym", gym)
    monkeypatch.setitem(sys.modules, "d4rl", d4rl)
    out = load_d4rl_dataset(d4rl_env="antmaze-large-diverse-v0")
    assert out["observations"].shape == (10, 29)
