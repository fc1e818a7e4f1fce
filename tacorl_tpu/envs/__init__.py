from tacorl_tpu.envs.fake_calvin import FakeCalvinEnv  # noqa: F401
