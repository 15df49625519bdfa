"""Evaluation metrics: five families, vectorized and (where possible) jit-able.

Re-designs the reference's ``Metrics/`` package (five NumPy/SciPy/sklearn
modules of free functions ``f(y_true, y_pred) -> float``) as JAX ops so that
eval can stay on the TPU. Numeric contract: values match the reference
formulas to 1e-4 on identical masks (golden-tested against NumPy/sklearn in
``tests/test_metrics.py``).

Family -> reference module map:
- confusion   -> ``Metrics/ConfusionMatrix_based_metrics.py``
- region      -> ``Metrics/Region_based_metrics.py``
- contour     -> ``Metrics/Contour_based_metrics.py``
- pixel_error -> ``Metrics/PixelError_based_metrics.py``
- biomarker   -> ``Metrics/Biomarker_based_metrics.py``
"""

from .confusion import (  # noqa: F401
    accuracy,
    auc_score,
    confusion_counts,
    precision as cm_precision,
    sensitivity,
    specificity,
)
from .region import (  # noqa: F401
    dice_coefficient,
    iou_score,
    precision,
    recall,
)
from .contour import (  # noqa: F401
    assd,
    find_contours,
    hausdorff_distance,
    hausdorff_distance_95,
    mad,
    surface_distances,
)
from .pixel_error import (  # noqa: F401
    mean_squared_error,
    root_mean_squared_error,
)
from .biomarker import (  # noqa: F401
    thickness_difference,
    vascularity_index,
)
