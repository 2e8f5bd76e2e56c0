from mission_data_pipeline_spark.operators.decom import ParameterDefinition, decommutate
from mission_data_pipeline_spark.operators.calibration import Calibration, apply_calibrations
from mission_data_pipeline_spark.operators.filters import apid_filter
from mission_data_pipeline_spark.operators.dataset import (
    tidy_parameter,
    to_wide,
    union_datasets,
    parameter_stats,
)

__all__ = [
    "ParameterDefinition",
    "decommutate",
    "Calibration",
    "apply_calibrations",
    "apid_filter",
    "tidy_parameter",
    "to_wide",
    "union_datasets",
    "parameter_stats",
]
