"""User-defined aggregate and table functions — the §2.10 surface.

The reference's extension story is its plugin ABCs (no scalar/aggregate
UDF hooks at all); the engine's primary stance is the same — express
logic as DataFrame transformations and keep Python off the hot path.
These two registrations exist for the cases that genuinely need
user-defined *aggregation* or *table-generating* semantics:

- :func:`grouped_median` — an Arrow-batched GROUPED_AGG pandas UDF
  (the UDAF path): each group's values arrive as one NumPy array, so
  the Python cost is per-group, not per-row. Median is deliberately
  chosen as the demo statistic because it is order-independent
  (sort-based), making the result bit-deterministic across partition
  layouts — an accumulation-style UDAF (e.g. a float sum) would not be.
- :class:`TokenSpans` — a Python UDTF (table function): one input row
  fans out to one row per whitespace token with its position and
  length. Registered for LATERAL use in SQL; the same shape is
  expressible with ``posexplode`` (which a hot path should prefer —
  the UDTF exists to prove the extension point, and its docstring says
  so).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf("double")
def grouped_median(v: pd.Series) -> float:
    """Exact interpolated median (numpy sort-based) — GROUPED_AGG
    pandas UDF; order-independent, hence deterministic on any cluster
    layout. Matches PERCENTILE(x, 0.5) / QUANTILE_CONT semantics,
    including NULL handling: SQL quantile aggregates ignore NULLs, so
    drop them before the sort (a NULL→NaN leak would poison
    np.median); an all-NULL group yields NULL, not NaN."""
    arr = v.dropna().to_numpy(dtype="float64")
    return float(np.median(arr)) if arr.size else None


@udtf(returnType="tok string, pos int, tok_len int")
class TokenSpans:
    """UDTF: one row per whitespace token of ``text`` with 0-based
    position and length. Prefer ``posexplode(split(...))`` on hot
    paths — this class demonstrates the user-defined table-function
    extension point (lazy per-row Python)."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        if text:
            for i, t in enumerate(text.split(" ")):
                if t:
                    yield t, i, len(t)


def register_udx(spark: SparkSession) -> None:
    """Register the UDTF (and nothing else — the UDAF is used as a
    Column function, no registration needed) under stable SQL names."""
    spark.udtf.register("token_spans", TokenSpans)
