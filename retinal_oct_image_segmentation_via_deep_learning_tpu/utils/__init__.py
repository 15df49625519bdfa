from .debug import assert_finite, find_nonfinite, nan_debugging  # noqa: F401
from .dtype import DTypePolicy, resolve_dtype  # noqa: F401
from .logging import MetricLogger, export_prob_maps  # noqa: F401
from .profiling import count_params, flops_estimate  # noqa: F401
from .torch_compat import import_torch_state  # noqa: F401
