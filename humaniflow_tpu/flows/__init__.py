from .autoregressive import (
    ConditionalAffineAutoregressive,
    ConditionalSplineAutoregressive,
    FlowBatchNorm,
)
from .dense_nn import apply_dense_nn, init_dense_nn
from .factory import ConditionalFlow, create_conditional_norm_flow
from .so3_flow import SO3FlowDistribution
from .spline import monotonic_rational_spline
from .transforms import (
    ConditionalAdditiveCoupling,
    ConditionalAffineCoupling,
    ConditionalLinearPLU,
    ConditionalSplineCoupling,
    LinearPLU,
    Permute,
    RadialTanh,
    ScaledRadialTanh,
)

__all__ = [
    "ConditionalAffineAutoregressive",
    "ConditionalSplineAutoregressive",
    "FlowBatchNorm",
    "apply_dense_nn",
    "init_dense_nn",
    "ConditionalFlow",
    "create_conditional_norm_flow",
    "SO3FlowDistribution",
    "monotonic_rational_spline",
    "ConditionalAdditiveCoupling",
    "ConditionalAffineCoupling",
    "ConditionalLinearPLU",
    "ConditionalSplineCoupling",
    "LinearPLU",
    "Permute",
    "RadialTanh",
    "ScaledRadialTanh",
]
