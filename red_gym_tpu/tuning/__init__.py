from red_gym_tpu.tuning.param_search import (  # noqa: F401
    CMAES, make_laptime_evaluator, search,
)
