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
from tacorl_tpu.callbacks.horizon_uncertainty import (  # noqa: F401
    IncreaseHorizonUncertainty,
)
from tacorl_tpu.callbacks.rollout import (  # noqa: F401
    RolloutCallback,
    RolloutD4RLCallback,
    RolloutLongHorizonCallback,
)
