from tacorl_tpu.callbacks.base import Callback  # noqa: F401
from tacorl_tpu.callbacks.kl_schedule import (  # noqa: F401
    KLConstantSchedule,
    KLLinearSchedule,
    KLSigmoidSchedule,
)
from tacorl_tpu.callbacks.horizon import (  # noqa: F401
    IncreaseHorizonConstant,
    IncreaseHorizonLinear,
)
