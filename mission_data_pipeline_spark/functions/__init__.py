from mission_data_pipeline_spark.functions.decode import (
    slice_bytes,
    decode_uint,
    decode_int,
    decode_float,
    decode_bool,
    decode_string,
    decode_hex,
    tai_time,
)
from mission_data_pipeline_spark.functions.calibrate import (
    polynomial_expr,
    piecewise_linear_expr,
)
from mission_data_pipeline_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
    normalize,
)

__all__ = [
    "slice_bytes",
    "decode_uint",
    "decode_int",
    "decode_float",
    "decode_bool",
    "decode_string",
    "decode_hex",
    "tai_time",
    "polynomial_expr",
    "piecewise_linear_expr",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "normalize",
]
