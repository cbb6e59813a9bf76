from .trajectory import (
    AbsoluteTrajectoryError,
    RelativePoseError,
    ScaleConsistency,
    ate_errors,
    rpe_errors,
    scale_factors,
)
from .reconstruction import ChamferDistanceMetrics
from .icp import ICPResult, iterative_closest_point
from .prepare import find_subsample_factor, prepare_data_for_metrics

__all__ = [
    "AbsoluteTrajectoryError", "RelativePoseError", "ScaleConsistency",
    "ate_errors", "rpe_errors", "scale_factors", "ChamferDistanceMetrics",
    "ICPResult", "iterative_closest_point", "find_subsample_factor",
    "prepare_data_for_metrics",
]
