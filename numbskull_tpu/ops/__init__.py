"""TPU compute kernels: factor evaluation, sampling, Gibbs/SGD sweeps."""

from numbskull_tpu.ops.factor_eval import eval_factors, present_types_of  # noqa: F401
from numbskull_tpu.ops.sample import draw  # noqa: F401
from numbskull_tpu.ops.gibbs import (  # noqa: F401
    GibbsEngine, SamplerState, LearnParams,
)
