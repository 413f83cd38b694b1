from nndetection_tpu.planning.planner import Plan, Planner
from nndetection_tpu.planning.architecture import (
    get_pool_and_conv_props,
    initial_patch_size,
    plan_decoder_levels,
)
from nndetection_tpu.planning.anchors_opt import optimize_anchors
from nndetection_tpu.planning.estimator import (
    DEFAULT_BUDGET,
    analytic_estimate,
    compile_estimate,
)

__all__ = [
    "Plan",
    "Planner",
    "get_pool_and_conv_props",
    "initial_patch_size",
    "plan_decoder_levels",
    "optimize_anchors",
    "DEFAULT_BUDGET",
    "analytic_estimate",
    "compile_estimate",
]
