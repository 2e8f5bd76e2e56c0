"""Sequential-state time-series operators: EWMA smoothing and LTTB
downsampling.

Both algorithms carry state along the time axis (an exponential
recurrence; the previously selected point), so the per-SERIES
computation is inherently sequential — the distributed shape is
"parallel across series, sequential within a series", implemented with
``applyInPandas`` (one Arrow batch per series group). At 100 TB the
series key (parameter name, spacecraft, channel) gives millions of
independent groups; per-group work is a single ordered pass.

The SQL oracles replay the same recurrences as recursive CTEs (the
same technique as the ADPCM codec and BPE merge oracles), so both
operators carry exact value oracles despite being "non-relational".

No reference counterpart for LTTB (the reference has no downsampling);
EWMA generalizes the reference's calibration smoothing ideas. Both are
standard telemetry-store surface (TimescaleDB/InfluxDB ship both).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, types as T
from pyspark.sql import functions as F

__all__ = ["ewma", "lttb"]


def ewma(
    df: DataFrame,
    *,
    alpha: float,
    time_col: str,
    value_col: str,
    series_cols: list[str],
    order_cols: list[str] | None = None,
    max_rows_per_series: int | None = None,
) -> DataFrame:
    """Exponentially weighted moving average per series:
    ``s_0 = x_0; s_i = alpha*x_i + (1-alpha)*s_{i-1}``.

    Rows are ordered by ``(time_col, *order_cols)`` within each series
    (pass a unique tiebreaker for duplicate timestamps so the
    recurrence order — and therefore the float result — is total-order
    deterministic). Returns the input columns plus ``ewma``.

    Null values are SKIPPED by the recurrence: the row's ``ewma`` is
    NULL and the running state carries through unchanged — the same
    convention as SQL aggregates over NULL, and the one the recursive
    CTE oracle replays (NULL in ⇒ NULL out, never NaN).

    The recurrence is evaluated as the literal two-term float formula,
    one step per row, so an engine replaying the same IEEE-754 ops in
    the same order (the oracle's recursive CTE) reproduces it exactly.

    Memory bound: each series is ONE Arrow group in one task — a series
    with billions of rows will not fit.  At telemetry scale the series
    key (parameter, spacecraft, channel) gives millions of modest
    groups; for one pathological hot channel, shard it by time and
    carry the tail state across shards (each shard's output state is
    ``decay*state_in + c`` with per-shard constants, so shards chain
    with one tiny sequential pass over shard summaries).  Pass
    ``max_rows_per_series`` to fail loudly instead of OOMing when a
    group exceeds the bound.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    order = [time_col, *(order_cols or [])]
    cols = df.select(
        *series_cols, *order, F.col(value_col).cast("double").alias("__x")
    )
    out_schema = T.StructType(
        cols.schema.fields[:-1]
        + [
            T.StructField("value", T.DoubleType(), True),
            T.StructField("ewma", T.DoubleType(), True),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        if max_rows_per_series is not None and len(pdf) > max_rows_per_series:
            key = pdf.iloc[0][list(series_cols)].to_dict() if len(pdf) else {}
            raise ValueError(
                f"ewma: series {key} has {len(pdf)} rows > "
                f"max_rows_per_series={max_rows_per_series}; shard the "
                "series by time and chain tail state (see docstring)"
            )
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        xs = [None if pd.isna(x) else x for x in pdf["__x"].tolist()]
        smoothed, s = [], None
        for x in xs:
            if x is None:
                smoothed.append(None)
                continue
            s = x if s is None else alpha * x + (1.0 - alpha) * s
            smoothed.append(s)
        pdf = pdf.drop(columns=["__x"])
        # Nullable Float64 (masked) so None survives Arrow as SQL NULL —
        # a plain float64 column would smuggle it through as NaN.
        pdf["value"] = pd.array(xs, dtype="Float64")
        pdf["ewma"] = pd.array(smoothed, dtype="Float64")
        return pdf

    return cols.groupBy(*series_cols).applyInPandas(run, schema=out_schema)


def _lttb_series(ts: list, vs: list, n_out: int):
    """Classic largest-triangle-three-buckets over one ordered series.

    Interior points split into ``n_out - 2`` equal index buckets
    (``lo_i = floor(i*(N-2)/(n-2)) + 1``); each bucket keeps the point
    maximizing the triangle area with the PREVIOUS kept point and the
    NEXT bucket's average (the last point for the final bucket).
    Strictly-greater comparison keeps the first maximum, so integer
    inputs make the selection exact and engine-independent.
    """
    n = len(ts)
    if n_out >= n:
        return list(range(n))
    kept = [0]
    nb = n_out - 2
    for i in range(nb):
        lo = i * (n - 2) // nb + 1
        hi = (i + 1) * (n - 2) // nb + 1
        nlo = hi
        nhi = (i + 2) * (n - 2) // nb + 1 if i + 1 < nb else n
        if i + 1 == nb:
            nlo, nhi = n - 1, n
        avg_t = sum(ts[nlo:nhi]) / (nhi - nlo)
        avg_v = sum(vs[nlo:nhi]) / (nhi - nlo)
        pt, pv = ts[kept[-1]], vs[kept[-1]]
        best, best_area = lo, -1.0
        for j in range(lo, hi):
            area = abs(
                (pt - avg_t) * (vs[j] - pv) - (pt - ts[j]) * (avg_v - pv)
            )
            if area > best_area:
                best, best_area = j, area
        kept.append(best)
    kept.append(n - 1)
    return kept


def lttb(
    df: DataFrame,
    *,
    n_out: int,
    time_col: str,
    value_col: str,
    series_cols: list[str],
    max_rows_per_series: int | None = None,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling per series — the
    standard visually-faithful decimation for telemetry dashboards
    (Steinarsson 2013). Keeps first and last points plus the
    max-triangle-area point of each of ``n_out - 2`` equal index
    buckets; series shorter than ``n_out`` pass through.

    Duplicate timestamps resolve to their MAX value first (same
    determinism contract as
    :func:`~mission_data_pipeline_spark.operators.dataset.resample_grid`).
    Returns ``(*series_cols, time_col, value, kept_rank)`` with
    ``kept_rank`` the 0-based output position.

    Memory bound: one Arrow group per series (see :func:`ewma`); pass
    ``max_rows_per_series`` to fail loudly instead of OOMing on a
    pathological single-series input.  For a giant series, pre-bucket
    by coarse time windows and LTTB each window to ``n_out / n_windows``
    points — visually equivalent for dashboard decimation.
    """
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    cols = (
        df.select(
            *series_cols,
            F.col(time_col).cast("long").alias("__t"),
            F.col(value_col).cast("double").alias("__v"),
        )
        .groupBy(*series_cols, "__t")
        .agg(F.max("__v").alias("__v"))
    )
    out_schema = T.StructType(
        [cols.schema[c] for c in cols.schema.names if c not in ("__t", "__v")]
        + [
            T.StructField(time_col, T.LongType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("kept_rank", T.IntegerType(), True),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        if max_rows_per_series is not None and len(pdf) > max_rows_per_series:
            key = pdf.iloc[0][list(series_cols)].to_dict() if len(pdf) else {}
            raise ValueError(
                f"lttb: series {key} has {len(pdf)} rows > "
                f"max_rows_per_series={max_rows_per_series}; pre-bucket "
                "by coarse time windows (see docstring)"
            )
        pdf = pdf.sort_values("__t", kind="mergesort").reset_index(drop=True)
        ts, vs = pdf["__t"].tolist(), pdf["__v"].tolist()
        kept = _lttb_series(ts, vs, n_out)
        out = pdf.iloc[kept].reset_index(drop=True)
        out = out.rename(columns={"__t": time_col, "__v": "value"})
        out["kept_rank"] = range(len(kept))
        return out[[f.name for f in out_schema.fields]]

    return cols.groupBy(*series_cols).applyInPandas(run, schema=out_schema)
