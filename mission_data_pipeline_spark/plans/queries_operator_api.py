"""Operator-API queries: packing, timeseries, sampling, text/curation operators driven through their Python APIs.

Split from the original single-file ``plans/queries.py`` (round 11,
VERDICT r10 item 7) with ZERO semantic change: section text is verbatim;
registration still targets the shared ``QUERIES`` dict in
``plans.query_core``. See ``plans/queries.py`` for the public facade and
the module docstring with the cross-engine determinism rules.
"""

from __future__ import annotations

import itertools
import os
import shutil
import tempfile
import weakref
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from mission_data_pipeline_spark.sources.tables import (
    TABLES,
    load_table,
    parquet_row_count,
)
from mission_data_pipeline_spark.plans.query_core import (
    QUERIES,
    Query,
    _dialect,
    _dsum,
    _q,
    _same,
    _scratch_dir,
    _sql,
    register_views,
)
from mission_data_pipeline_spark.plans.queries_textdedup import (  # noqa: F401
    _GRAMS_SEEDED_DUCK,
    _GRAMS_SEEDED_SPARK,
    _MINHASH_BODY_DUCK,
    _MINHASH_BODY_SPARK,
    _MINHASH_DUCK,
    _MINHASH_SPARK,
)


# ---------------------------------------------------------------------------
# Operator-API queries: the dedup / similarity / multimodal / streaming
# operators invoked through their DataFrame functions (not SQL text), so
# the oracle checks the *operator implementations* themselves.
# ---------------------------------------------------------------------------


def _pack_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget pack assignment over documents, sharded by lang
    (operators/packing.py); the oracle reproduces the running-sum
    boundary-bucket math in window SQL."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.packing import (
        pack_stats,
        pack_token_budget,
    )

    register_views(spark, sf_dir)
    docs = spark.table("documents").select(
        "doc_id",
        "lang",
        F.size(
            F.filter(
                F.split(F.lower("text"), r"\s+"), lambda x: F.length(x) > 0
            )
        ).cast("long").alias("n_tokens"),
    )
    packed = pack_token_budget(
        docs, 500, order_cols=["doc_id"], shard_cols=["lang"]
    )
    return (
        pack_stats(packed, shard_cols=["lang"])
        .select("lang", "pack_id", "n_docs", "total_tokens")
        .orderBy("lang", "pack_id")
    )


_q(
    "curation_token_packing",
    Query(
        _pack_spark,
        """
        WITH d AS (
          SELECT doc_id, lang,
                 len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                 x -> length(x) > 0)) AS n_tokens
          FROM documents
        ),
        cum AS (
          SELECT doc_id, lang, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) - n_tokens
                   AS before
          FROM d
        )
        SELECT lang, CAST(FLOOR(before / 500) AS BIGINT) AS pack_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        FROM cum
        GROUP BY lang, FLOOR(before / 500)
        ORDER BY lang, pack_id
        """,
        "X-curation",
        "greedy token-budget sequence packing for training-batch "
        "construction (docs kept whole, per-shard running-sum boundary "
        "buckets — one window per shard, no global sort)",
    ),
)


def _chunk_tokens_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (operators/packing.py chunk_tokens):
    size=32, overlap=8 so the sf-test documents split into several
    overlapping chunks each."""
    from mission_data_pipeline_spark.operators.packing import chunk_tokens

    register_views(spark, sf_dir)
    out = chunk_tokens(spark.table("documents"), size=32, overlap=8)
    return out.orderBy("doc_id", "chunk_id")


_q(
    "curation_chunk_tokens",
    Query(
        _chunk_tokens_spark,
        r"""
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\s+'),
                             x -> length(x) > 0) AS toks
          FROM documents
        ),
        nz AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) > 0),
        ch AS (
          SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
                 list_slice(toks, CAST(i AS INT) * 24 + 1,
                            CAST(i AS INT) * 24 + 32) AS chunk
          FROM nz, UNNEST(range(0, greatest(n - 9, 0) // 24 + 1)) AS u(i)
        )
        SELECT doc_id, chunk_id, CAST(len(chunk) AS BIGINT) AS n_tokens,
               array_to_string(chunk, ' ') AS chunk_text
        FROM ch
        ORDER BY doc_id, chunk_id
        """,
        "X-curation",
        "fixed-token context-window chunking with overlap (stride = "
        "size - overlap; tail kept) — splits long documents down to the "
        "model sequence length, the complement of token-budget packing; "
        "zero-shuffle expression-only explode",
    ),
)


def _interp_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of null gaps per user over event time
    (operators/dataset.py interpolate_linear); oracle recomputes the
    time-weighted blend with IGNORE NULLS windows both directions."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.dataset import interpolate_linear

    register_views(spark, sf_dir)
    ev = spark.sql(
        "SELECT event_id, user_id, CAST(ts_ns DIV 1000 AS DOUBLE) AS t_us, "
        "       CASE WHEN event_type = 'purchase' THEN value END AS pv "
        "FROM events WHERE user_id <= 30 "
        "  AND event_id = (SELECT MIN(e2.event_id) FROM events e2 "
        "                  WHERE e2.user_id = events.user_id "
        # dedup at MICROsecond resolution to match the oracle's `ts` (µs)
        # equality — ts_ns-level dedup could keep two rows in the same µs
        "                  AND e2.ts_ns DIV 1000 = events.ts_ns DIV 1000)"
    )
    out = interpolate_linear(ev, ["pv"], time_col="t_us", partition_cols=["user_id"])
    return out.select(
        "event_id",
        "user_id",
        F.round("pv", 6).alias("pv_interp"),
    ).orderBy("event_id")


_q(
    "w_interpolate_linear",
    Query(
        _interp_spark,
        """
        WITH base AS (
          SELECT event_id, user_id, CAST(epoch_us(ts) AS DOUBLE) AS t_us,
                 CASE WHEN event_type = 'purchase' THEN value END AS pv
          FROM events WHERE user_id <= 30
            AND event_id = (SELECT MIN(e2.event_id) FROM events e2
                            WHERE e2.user_id = events.user_id AND e2.ts = events.ts)
        ),
        w AS (
          SELECT event_id, user_id, t_us, pv,
                 last_value(pv IGNORE NULLS) OVER wb AS prev_v,
                 last_value(CASE WHEN pv IS NOT NULL THEN t_us END IGNORE NULLS)
                   OVER wb AS prev_t,
                 first_value(pv IGNORE NULLS) OVER wf AS next_v,
                 first_value(CASE WHEN pv IS NOT NULL THEN t_us END IGNORE NULLS)
                   OVER wf AS next_t
          FROM base
          WINDOW
            wb AS (PARTITION BY user_id ORDER BY t_us
                   ROWS UNBOUNDED PRECEDING),
            wf AS (PARTITION BY user_id ORDER BY t_us
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT event_id, user_id,
               ROUND(CASE WHEN pv IS NOT NULL THEN pv
                          WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                          THEN prev_v + (next_v - prev_v) * (t_us - prev_t)
                                          / (next_t - prev_t)
                     END, 6) AS pv_interp
        FROM w
        ORDER BY event_id
        """,
        "W+,T7+",
        "linear interpolation of telemetry gaps (time-weighted blend of "
        "surrounding samples; strict — boundary nulls preserved)",
    ),
)


def _resample_grid_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid gap-fill resampling (operators/dataset.py
    resample_grid — the hypertable time_bucket_gapfill + locf/
    interpolate shape): each probe user's event values re-gridded to a
    6-hour cadence with both fill policies. Output is bounded by the
    user slice x the fixed 30-day/6-h grid regardless of corpus scale;
    the oracle rebuilds the grid with generate-series arithmetic and
    the identical ordered-window fills."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.dataset import resample_grid

    register_views(spark, sf_dir)
    ev = spark.sql(
        "SELECT user_id, ts_ns DIV 1000 AS t_us, value "
        "FROM events WHERE user_id < 20"
    )
    out = resample_grid(
        ev,
        time_col="t_us",
        value_col="value",
        period_us=21_600_000_000,
        series_cols=["user_id"],
    )
    return out.select(
        "user_id",
        "t_us",
        F.round("locf", 6).alias("locf"),
        F.round("interp", 6).alias("interp"),
    ).orderBy("user_id", "t_us")


_q(
    "w_resample_grid_gapfill",
    Query(
        _resample_grid_spark,
        """
        WITH s AS (
          SELECT user_id, epoch_us(ts) AS t, MAX(value) AS v
          FROM events WHERE user_id < 20
          GROUP BY user_id, epoch_us(ts)
        ),
        b AS (
          SELECT user_id,
                 (MIN(t) // 21600000000) * 21600000000 AS g0,
                 MAX(t) AS t1
          FROM s GROUP BY user_id
        ),
        grid AS (
          SELECT user_id, UNNEST(range(g0, t1 + 1, 21600000000)) AS t
          FROM b
        ),
        u AS (
          SELECT user_id, t, v, 0 AS isg FROM s
          UNION ALL
          SELECT user_id, t, NULL, 1 FROM grid
        ),
        w AS (
          SELECT user_id, t, v, isg,
                 LAST_VALUE(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY t, isg
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS pv,
                 LAST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
                   OVER (
                   PARTITION BY user_id ORDER BY t, isg
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS pt,
                 FIRST_VALUE(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY t, isg
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                 ) AS nv,
                 FIRST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
                   OVER (
                   PARTITION BY user_id ORDER BY t, isg
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                 ) AS nt
          FROM u
        )
        SELECT user_id, t AS t_us,
               ROUND(pv, 6) AS locf,
               ROUND(CASE
                 WHEN pt = t THEN pv
                 WHEN pv IS NOT NULL AND nv IS NOT NULL
                 THEN pv + (nv - pv) * CAST(t - pt AS DOUBLE)
                                     / CAST(nt - pt AS DOUBLE)
               END, 6) AS interp
        FROM w WHERE isg = 1
        ORDER BY user_id, t_us
        """,
        "W+,T7+",
        "regular-grid resampling with gap fill (time_bucket_gapfill + "
        "locf/interpolate): generated sequence grid, one ordered window "
        "per series, exact-hit grid points return the sample under both "
        "policies",
    ),
)


def _ewma_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA smoothing (operators/timeseries.py ewma): the exponential
    recurrence s_i = a*x_i + (1-a)*s_{i-1} per probe user, alpha=0.25.
    Both engines evaluate the literal two-term IEEE-754 formula one
    step per row in the same order ((t, event_id) tiebreak), so the
    oracle's recursive CTE reproduces the floats bit-exactly."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.timeseries import ewma

    register_views(spark, sf_dir)
    ev = spark.sql(
        "SELECT user_id, event_id, ts_ns DIV 1000 AS t_us, value "
        "FROM events WHERE user_id < 20"
    )
    out = ewma(
        ev,
        alpha=0.25,
        time_col="t_us",
        value_col="value",
        series_cols=["user_id"],
        order_cols=["event_id"],
    )
    # no rounding: the recurrence is the same IEEE-754 op sequence in
    # both engines, so the doubles are bit-identical — rounding would
    # only ADD half-tie divergence (seen at sf1: x.9853125 rounded
    # differently by Spark's BigDecimal HALF_UP vs DuckDB's float round)
    return out.select("user_id", "event_id", "t_us", "value", "ewma") \
        .orderBy("user_id", "t_us", "event_id")


_q(
    "w_ewma_smoothing",
    Query(
        _ewma_spark,
        """
        WITH RECURSIVE s AS (
          SELECT user_id, event_id, epoch_us(ts) AS t, value,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ) AS n
          FROM events WHERE user_id < 20
        ),
        -- st carries the last non-null smoothed state so NULL inputs are
        -- SKIPPED (row emits NULL, recurrence unchanged) — the same
        -- convention as the operator (timeseries.py ewma)
        rec AS (
          SELECT user_id, event_id, t, value, n,
                 value AS st, value AS ewma
          FROM s WHERE n = 1
          UNION ALL
          SELECT s.user_id, s.event_id, s.t, s.value, s.n,
                 CASE WHEN s.value IS NULL THEN rec.st
                      WHEN rec.st IS NULL THEN s.value
                      ELSE 0.25 * s.value + 0.75 * rec.st END,
                 CASE WHEN s.value IS NULL THEN NULL
                      WHEN rec.st IS NULL THEN s.value
                      ELSE 0.25 * s.value + 0.75 * rec.st END
          FROM rec JOIN s
            ON s.user_id = rec.user_id AND s.n = rec.n + 1
        )
        SELECT user_id, event_id, t AS t_us, value, ewma
        FROM rec
        ORDER BY user_id, t_us, event_id
        """,
        "W+",
        "exponentially weighted moving average per series: sequential "
        "recurrence replayed exactly by a recursive CTE (same IEEE ops, "
        "same order — the ADPCM oracle technique applied to analytics)",
    ),
)


def _ewma_sharded_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-sharded EWMA (operators/timeseries.py ewma_sharded): the
    parallel-prefix decomposition for a hot series too big for one task
    — per-(series, day) passes compute (c, d, cseed), a tiny per-series
    chain carries tail state across days, and the row output is
    c + d*s_in. The oracle replays the SAME decomposition (per-shard
    recursive CTE + shard-chain recursive CTE + the identical final
    arithmetic), so the floats are bit-exact — same IEEE ops, same
    order, in both engines."""
    from mission_data_pipeline_spark.operators.timeseries import ewma_sharded

    register_views(spark, sf_dir)
    ev = spark.sql(
        "SELECT user_id, event_id, ts_ns DIV 1000 AS t_us, "
        "       ts_ns DIV 1000 DIV 86400000000 AS day, value "
        "FROM events WHERE user_id < 12"
    )
    out = ewma_sharded(
        ev,
        alpha=0.25,
        time_col="t_us",
        value_col="value",
        series_cols=["user_id"],
        shard_col="day",
        order_cols=["event_id"],
    )
    return out.select(
        "user_id", "day", "t_us", "event_id", "value", "ewma"
    ).orderBy("user_id", "t_us", "event_id")


_q(
    "w_ewma_sharded",
    Query(
        _ewma_sharded_spark,
        """
        WITH RECURSIVE s AS (
          SELECT user_id, event_id, epoch_us(ts) AS t,
                 epoch_us(ts) // 86400000000 AS day, value,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id, epoch_us(ts) // 86400000000
                   ORDER BY epoch_us(ts), event_id
                 ) AS n
          FROM events WHERE user_id < 12
        ),
        -- per-(series, day) linear-scan coefficients, zero-state c,
        -- decay d, seeded companion cseed (the same recurrence the
        -- operator's stage-1 shard pass runs)
        rec AS (
          SELECT user_id, day, event_id, t, value, n,
                 0.25 * value AS c,
                 CAST(0.75 AS DOUBLE) AS d,  -- bare 0.75 types DECIMAL(3,2)
                 value AS cseed
          FROM s WHERE n = 1
          UNION ALL
          SELECT s.user_id, s.day, s.event_id, s.t, s.value, s.n,
                 0.25 * s.value + 0.75 * rec.c,
                 0.75 * rec.d,
                 0.25 * s.value + 0.75 * rec.cseed
          FROM rec JOIN s
            ON s.user_id = rec.user_id AND s.day = rec.day
           AND s.n = rec.n + 1
        ),
        -- shard summaries: rank AFTER the last-row filter (QUALIFY
        -- windows all compute pre-filter, so k must be in an outer
        -- select to number shards, not rows)
        summary AS (
          SELECT user_id, day, cc, dd, cs,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                   AS k
          FROM (
            SELECT user_id, day, c AS cc, d AS dd, cseed AS cs
            FROM rec
            QUALIFY n = MAX(n) OVER (PARTITION BY user_id, day)
          )
        ),
        -- incoming state per shard: s_in(k+1) = C_k + D_k * s_in(k)
        chain AS (
          SELECT user_id, day, k,
                 CAST(NULL AS DOUBLE) AS sin, cs AS sout
          FROM summary WHERE k = 1
          UNION ALL
          SELECT m.user_id, m.day, m.k, c.sout,
                 CASE WHEN c.sout IS NULL THEN m.cs
                      ELSE m.cc + m.dd * c.sout END
          FROM chain c JOIN summary m
            ON m.user_id = c.user_id AND m.k = c.k + 1
        )
        SELECT r.user_id, r.day, r.t AS t_us, r.event_id, r.value,
               CASE WHEN r.value IS NULL THEN NULL
                    WHEN ch.sin IS NULL THEN r.cseed
                    ELSE r.c + r.d * ch.sin END AS ewma
        FROM rec r JOIN chain ch
          ON ch.user_id = r.user_id AND ch.day = r.day
        ORDER BY r.user_id, t_us, r.event_id
        """,
        "W+",
        "time-sharded EWMA: parallel-prefix decomposition (per-shard "
        "zero-state scan + decay, tiny tail-state chain, map-side "
        "recombination) — the shape one hot channel needs at 100 TB; "
        "oracle replays the identical decomposition bit-exactly",
    ),
)


def _lttb_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB downsampling (operators/timeseries.py lttb): each probe
    user's series decimated to 12 visually-faithful points. Integer
    fixture values and series-rebased times keep every triangle-area
    product inside exact double range, so the argmax selection is
    engine-independent; the oracle replays the bucket walk (previous
    kept point carried as recursive state, next-bucket averages joined
    per step) as a recursive CTE over per-bucket candidate lists."""
    from pyspark.sql import Window, functions as F

    from mission_data_pipeline_spark.operators.timeseries import lttb

    register_views(spark, sf_dir)
    ev = spark.sql(
        "SELECT user_id, ts_ns DIV 1000 AS t_us, "
        "       CAST(event_id % 997 AS DOUBLE) AS v "
        "FROM events WHERE user_id < 20"
    )
    w = Window.partitionBy("user_id")
    ev = ev.withColumn("t_rel", F.col("t_us") - F.min("t_us").over(w))
    dedup = ev.groupBy("user_id", "t_rel").agg(F.max("v").alias("v"))
    dedup = dedup.withColumn("__n", F.count("*").over(w)).filter(
        F.col("__n") > 12
    )
    out = lttb(
        dedup, n_out=12, time_col="t_rel", value_col="v",
        series_cols=["user_id"],
    )
    return out.select(
        "user_id", "kept_rank", "t_rel", "value"
    ).orderBy("user_id", "kept_rank")


_q(
    "w_lttb_downsample",
    Query(
        _lttb_spark,
        """
        WITH RECURSIVE raw AS (
          SELECT user_id, epoch_us(ts) AS t,
                 CAST(event_id % 997 AS DOUBLE) AS v
          FROM events WHERE user_id < 20
        ),
        reb AS (
          SELECT user_id,
                 t - MIN(t) OVER (PARTITION BY user_id) AS t, v
          FROM raw
        ),
        s AS (SELECT user_id, t, MAX(v) AS v FROM reb GROUP BY user_id, t),
        idx AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY t) - 1 AS i,
                 COUNT(*) OVER (PARTITION BY user_id) AS n
          FROM s
        ),
        big AS (SELECT * FROM idx WHERE n > 12),
        bdef AS (
          SELECT DISTINCT user_id, n, b,
                 (b * (n - 2)) // 10 + 1 AS lo,
                 ((b + 1) * (n - 2)) // 10 + 1 AS hi
          FROM big, range(0, 10) rb(b)
        ),
        avgs AS (
          SELECT d.user_id, d.b,
                 CAST(SUM(p.t) AS DOUBLE) / COUNT(*) AS avg_t,
                 CAST(SUM(p.v) AS DOUBLE) / COUNT(*) AS avg_v
          FROM bdef d JOIN big p
            ON p.user_id = d.user_id AND p.i >= d.lo AND p.i < d.hi
          GROUP BY d.user_id, d.b
        ),
        nxt AS (
          SELECT user_id, b - 1 AS b, avg_t, avg_v FROM avgs WHERE b >= 1
          UNION ALL
          SELECT user_id, 9, CAST(t AS DOUBLE), v FROM big WHERE i = n - 1
        ),
        -- argmax per step as MAX over (area, -i, ...) structs: ties on
        -- equal area resolve to the smallest index, matching the
        -- operator's strictly-greater keep-first scan. (A list_reduce
        -- lambda formulation gave batch-size-dependent wrong captures
        -- in DuckDB 1.0 recursive CTEs — aggregates are reliable.)
        rec AS (
          SELECT user_id, -1 AS b, t AS sel_t, v AS sel_v
          FROM big WHERE i = 0
          UNION ALL
          SELECT user_id, b + 1, mx.t, mx.v FROM (
            SELECT r.user_id, r.b,
                   MAX(struct_pack(
                     area := abs((r.sel_t - nx.avg_t) * (p.v - r.sel_v)
                                 - (r.sel_t - p.t) * (nx.avg_v - r.sel_v)),
                     ni := -p.i, t := p.t, v := p.v)) AS mx
            FROM rec r
            JOIN bdef d ON d.user_id = r.user_id AND d.b = r.b + 1
            JOIN big p
              ON p.user_id = d.user_id AND p.i >= d.lo AND p.i < d.hi
            JOIN nxt nx ON nx.user_id = r.user_id AND nx.b = r.b + 1
            GROUP BY r.user_id, r.b
          )
        )
        SELECT user_id, CAST(b + 1 AS INT) AS kept_rank,
               sel_t AS t_rel, sel_v AS value
        FROM rec
        UNION ALL
        SELECT user_id, CAST(11 AS INT), t, v FROM big WHERE i = n - 1
        ORDER BY user_id, kept_rank
        """,
        "W+",
        "largest-triangle-three-buckets downsampling: per-series "
        "sequential bucket walk (previous kept point as recursive "
        "state) replayed exactly; integer fixtures keep the area argmax "
        "engine-independent",
    ),
)


def _ffill_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-and-hold: each event row carries the user's latest purchase
    value at-or-before it (operators/dataset.py forward_fill); oracle is
    last_value IGNORE NULLS over the same ordered window."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.dataset import forward_fill

    register_views(spark, sf_dir)
    ev = spark.sql(
        "SELECT event_id, user_id, ts_ns DIV 1000 AS ts_us, "
        "       CASE WHEN event_type = 'purchase' THEN value END AS purchase_value "
        "FROM events WHERE user_id <= 50"
    )
    out = forward_fill(
        ev,
        ["purchase_value"],
        order_cols=["ts_us", "event_id"],
        partition_cols=["user_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_us",
        F.round("purchase_value", 6).alias("held_value"),
    ).orderBy("event_id")


_q(
    "w_forward_fill_hold",
    Query(
        _ffill_spark,
        """
        SELECT event_id, user_id, epoch_us(ts) AS ts_us,
               ROUND(last_value(CASE WHEN event_type = 'purchase' THEN value END
                                IGNORE NULLS)
                     OVER (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id
                           ROWS UNBOUNDED PRECEDING), 6) AS held_value
        FROM events WHERE user_id <= 50
        ORDER BY event_id
        """,
        "W4,D3+",
        "forward fill / sample-and-hold (telemetry resampling: a parameter "
        "holds its last reported value between updates)",
    ),
)

# EWMA determinism: the frame's values are COLLECT_LIST'd in frame order
# (deterministic: ROWS frame over a total order), then both engines
# reduce the <=10-element list with integer-scaled weights —
# round(x * (1-a)^j * 1e6) as BIGINT — so no float addition-order or
# segment-tree-vs-sequential window-sum divergence can change the hash.
_q(
    "w_ewma_smooth",
    _dialect(
        """
        WITH ev AS (
          SELECT event_id, user_id, ts_ns DIV 1000 AS ts_us, value
          FROM events WHERE user_id <= 30
        ), fr AS (
          SELECT event_id, user_id, ts_us, value,
                 COLLECT_LIST(value) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS vals
          FROM ev
        )
        SELECT event_id, user_id, ts_us, ROUND(value, 6) AS value,
               ROUND(
                 CAST(AGGREGATE(SEQUENCE(0, SIZE(vals) - 1), 0L,
                        (acc, j) -> acc + CAST(ROUND(
                          ELEMENT_AT(vals, SIZE(vals) - j)
                          * POW(0.7, j) * 1e6) AS LONG)) AS DOUBLE)
                 / CAST(AGGREGATE(SEQUENCE(0, SIZE(vals) - 1), 0L,
                        (acc, j) -> acc + CAST(ROUND(
                          POW(0.7, j) * 1e6) AS LONG)) AS DOUBLE),
                 6) AS ewma
        FROM fr
        ORDER BY user_id, ts_us, event_id
        """,
        """
        WITH ev AS (
          SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
          FROM events WHERE user_id <= 30
        ), fr AS (
          SELECT event_id, user_id, ts_us, value,
                 list(value) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS vals
          FROM ev
        )
        SELECT event_id, user_id, ts_us, ROUND(value, 6) AS value,
               ROUND(
                 CAST(list_sum(list_transform(
                        generate_series(0, len(vals) - 1),
                        j -> CAST(ROUND(vals[len(vals) - j]
                                        * POW(0.7, j) * 1e6) AS BIGINT)))
                      AS DOUBLE)
                 / CAST(list_sum(list_transform(
                        generate_series(0, len(vals) - 1),
                        j -> CAST(ROUND(POW(0.7, j) * 1e6) AS BIGINT)))
                      AS DOUBLE),
                 6) AS ewma
        FROM fr
        ORDER BY user_id, ts_us, event_id
        """,
        "W+",
        "exponentially-weighted moving average over a trailing 10-row "
        "frame per user (alpha=0.3, normalized weights — the pandas "
        "ewm(adjust=True) convention): telemetry smoothing as a pure "
        "window + HOF reduction, one shuffle on the partition key",
    ),
)

# Rolling z-score: window sums run as DECIMAL (exact, order-independent)
# so Spark's sequential frame evaluation and DuckDB's segment-tree
# window aggregation cannot diverge; the variance/z arithmetic is then
# a single identical IEEE expression on both sides.
_q(
    "w_zscore_anomaly",
    _dialect(
        """
        WITH ev AS (
          SELECT event_id, user_id, ts_ns DIV 1000 AS ts_us, value,
                 CAST(ROUND(value, 6) AS DECIMAL(18,6)) AS v,
                 CAST(ROUND(value * value, 6) AS DECIMAL(28,6)) AS v2
          FROM events WHERE user_id <= 20
        ), st AS (
          SELECT event_id, user_id, ts_us, value,
                 COUNT(*) OVER w AS n,
                 SUM(v) OVER w AS s,
                 SUM(v2) OVER w AS s2
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        )
        SELECT event_id, user_id, ts_us, ROUND(value, 6) AS value,
               ROUND(z, 6) AS zscore,
               CASE WHEN z IS NOT NULL AND ABS(z) > 2.5
                    THEN 1 ELSE 0 END AS is_anomaly
        FROM (
          SELECT *,
                 CASE WHEN n >= 5
                           AND (CAST(s2 AS DOUBLE)
                                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                               / (n - 1) > 0
                      THEN (value - CAST(s AS DOUBLE) / n)
                           / SQRT((CAST(s2 AS DOUBLE)
                                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                                  / (n - 1))
                 END AS z
          FROM st) t
        ORDER BY user_id, ts_us, event_id
        """,
        """
        WITH ev AS (
          SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
                 CAST(ROUND(value, 6) AS DECIMAL(18,6)) AS v,
                 CAST(ROUND(value * value, 6) AS DECIMAL(28,6)) AS v2
          FROM events WHERE user_id <= 20
        ), st AS (
          SELECT event_id, user_id, ts_us, value,
                 COUNT(*) OVER w AS n,
                 SUM(v) OVER w AS s,
                 SUM(v2) OVER w AS s2
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        )
        SELECT event_id, user_id, ts_us, ROUND(value, 6) AS value,
               ROUND(z, 6) AS zscore,
               CASE WHEN z IS NOT NULL AND ABS(z) > 2.5
                    THEN 1 ELSE 0 END AS is_anomaly
        FROM (
          SELECT *,
                 CASE WHEN n >= 5
                           AND (CAST(s2 AS DOUBLE)
                                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                               / (n - 1) > 0
                      THEN (value - CAST(s AS DOUBLE) / n)
                           / SQRT((CAST(s2 AS DOUBLE)
                                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                                  / (n - 1))
                 END AS z
          FROM st) t
        ORDER BY user_id, ts_us, event_id
        """,
        "W+,A*+",
        "rolling z-score anomaly flag over a trailing 20-row frame per "
        "user (limit-check generalization: the threshold adapts to the "
        "parameter's own recent statistics instead of a fixed band)",
    ),
)


def _hash_sample_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible map-side hash-gate sample (operators/sampling.py);
    membership is a pure function of (seed, doc_id), oracle recomputes
    the same md5 bucket in SQL."""
    from mission_data_pipeline_spark.operators.sampling import hash_sample

    register_views(spark, sf_dir)
    docs = spark.table("documents")
    out = hash_sample(docs, 0.2, key_cols=["doc_id"], seed=7)
    return out.select("doc_id", "source", "lang").orderBy("doc_id")


_q(
    "curation_hash_sample",
    Query(
        _hash_sample_spark,
        """
        SELECT doc_id, source, lang
        FROM documents
        WHERE CAST(('0x' || substr(md5('7|' || CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) < 858993459
        ORDER BY doc_id
        """,
        "X-curation",
        "deterministic hash-gate corpus sampling: membership is a pure "
        "function of row content + seed (cluster-layout independent), "
        "map-side only — no shuffle at any corpus size",
    ),
)


def _stratified_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-n-per-stratum seeded sample (operators/sampling.py)."""
    from mission_data_pipeline_spark.operators.sampling import stratified_sample

    register_views(spark, sf_dir)
    docs = spark.table("documents")
    out = stratified_sample(
        docs, 5, strata_cols=["lang"], key_cols=["doc_id"], seed=3
    )
    return out.select("lang", "doc_id").orderBy("lang", "doc_id")


_q(
    "curation_stratified_sample",
    Query(
        _stratified_spark,
        """
        SELECT lang, doc_id FROM (
          SELECT lang, doc_id,
                 ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY CAST(('0x' || substr(md5('3|' || CAST(doc_id AS VARCHAR)),
                                  1, 8)) AS BIGINT), doc_id) AS rk
          FROM documents
        ) t WHERE rk <= 5
        ORDER BY lang, doc_id
        """,
        "X-curation",
        "exact n-per-stratum sampling with seeded-hash ranking — uniform "
        "within stratum, independent of physical row order",
    ),
)


def _mixture_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mixture rebalancing (operators/sampling.py
    mixture_sample): downsample to en 60 / de 15 / fr 15 / es 10 shares
    (zh dropped), deterministic seeded-hash gate, corpus never
    shuffles."""
    from mission_data_pipeline_spark.operators.sampling import mixture_sample

    register_views(spark, sf_dir)
    out = mixture_sample(
        spark.table("documents"),
        {"en": 0.60, "de": 0.15, "fr": 0.15, "es": 0.10},
        group_col="lang",
        key_cols=["doc_id"],
        seed=7,
    )
    return out.select("lang", "doc_id").orderBy("lang", "doc_id")


_q(
    "curation_mixture_sample",
    Query(
        _mixture_spark,
        """
        WITH masses AS (
          SELECT lang, CAST(COUNT(*) AS DOUBLE) AS m FROM documents GROUP BY lang
        ),
        tw AS (
          SELECT lang, m,
                 CASE lang WHEN 'en' THEN CAST(0.60 AS DOUBLE)
                           WHEN 'de' THEN CAST(0.15 AS DOUBLE)
                           WHEN 'fr' THEN CAST(0.15 AS DOUBLE)
                           WHEN 'es' THEN CAST(0.10 AS DOUBLE) END AS w
          FROM masses
        ),
        tmax AS (SELECT MIN(m / w) AS T FROM tw WHERE w IS NOT NULL),
        rates AS (
          SELECT lang, w * T / m AS rate FROM tw, tmax WHERE w IS NOT NULL
        )
        SELECT d.lang, d.doc_id
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE CAST(('0x' || substr(md5('7|' || CAST(d.doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT)
              < FLOOR(r.rate * 4294967296.0)
        ORDER BY d.lang, d.doc_id
        """,
        "X-curation",
        "domain/language mixture rebalancing: largest feasible output "
        "honoring target shares (binding group kept whole), per-group "
        "rates broadcast, map-side seeded-hash gate — no corpus shuffle",
    ),
)


def _temperature_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened language mixture (operators/sampling.py
    temperature_sample, the published multilingual-LM alpha-sampling
    scheme): alpha=0.3 flattens head languages toward the tail; the
    smallest language is kept whole. Membership is a pure function of
    (seed, doc_id, per-group rate), all SQL-reproducible."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.sampling import temperature_sample

    register_views(spark, sf_dir)
    out = temperature_sample(
        spark.table("documents"),
        0.3,
        group_col="lang",
        key_cols=["doc_id"],
        seed=7,
    )
    return (
        out.groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("lang")
    )


_q(
    "curation_temperature_sample",
    Query(
        _temperature_spark,
        """
        WITH masses AS (
          SELECT lang, CAST(COUNT(*) AS DOUBLE) AS m FROM documents GROUP BY lang
        ),
        mmin AS (SELECT MIN(m) AS mn FROM masses),
        rates AS (
          SELECT lang, ROUND(POWER(mn / m, 0.7), 9) AS rate FROM masses, mmin
        ),
        kept AS (
          SELECT d.lang, d.doc_id
          FROM documents d JOIN rates r ON d.lang = r.lang
          WHERE CAST(('0x' || substr(md5('7|' || CAST(d.doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT)
                < FLOOR(r.rate * 4294967296.0)
        )
        SELECT lang, COUNT(*) AS n_kept,
               MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
        FROM kept GROUP BY lang ORDER BY lang
        """,
        "X-curation",
        "temperature-flattened mixture (share ~ mass^alpha, alpha=0.3 — "
        "the multilingual-LM sampling recipe): heads downsampled toward "
        "tails, scarcest group kept whole, map-side gate, no corpus "
        "shuffle",
    ),
)


def _split_assign_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (operators/sampling.py
    split_assign): 80/10/10 on a seeded hash of doc_id; the per-split
    accounting (counts + doc_id digests) pins every row's assignment.
    Disjoint and exhaustive by construction (one CASE over one hash)."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.sampling import split_assign

    register_views(spark, sf_dir)
    out = split_assign(
        spark.table("documents"),
        {"train": 8, "val": 1, "test": 1},
        key_cols=["doc_id"],
        seed=13,
    )
    return (
        out.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("doc_id_sum"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("split")
    )


_q(
    "curation_split_assign",
    Query(
        _split_assign_spark,
        """
        WITH assigned AS (
          SELECT doc_id,
                 CASE WHEN CAST(('0x' || substr(md5('13|' || CAST(doc_id AS VARCHAR)),
                                 1, 8)) AS BIGINT) < 429496729 THEN 'test'
                      WHEN CAST(('0x' || substr(md5('13|' || CAST(doc_id AS VARCHAR)),
                                 1, 8)) AS BIGINT) < 3865470566 THEN 'train'
                      ELSE 'val' END AS split
          FROM documents
        )
        SELECT split, COUNT(*) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum,
               MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
        FROM assigned GROUP BY split ORDER BY split
        """,
        "X-curation",
        "hash-bucketed train/val/test split assignment (80/10/10): "
        "membership a pure function of row content + seed, disjoint and "
        "exhaustive structurally, zero shuffle — the reproducible-split "
        "primitive leakage audits depend on",
    ),
)


def _leakage_safe_split_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level train/val/test split (operators/sampling.py
    leakage_safe_split): near-dup clusters from the deterministic
    MinHash pair graph (the x2_duplicate_components construction) are
    assigned as UNITS, so no near-duplicate pair straddles splits —
    the eval-integrity property per-document hashing cannot give.
    The function raises loudly if any pair crosses splits; the output
    carries the cross-split pair count (must be 0) alongside per-split
    accounting, and the oracle recomputes assignment + violation count
    from the same recursive-CTE components and hash formula."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.sampling import (
        leakage_safe_split,
    )

    register_views(spark, sf_dir)
    docs = spark.table("documents").filter(F.col("doc_id") < 200)
    # pairs feed both the components fixpoint and the violation check;
    # the assignment feeds both the violation check and the report —
    # localCheckpoint each (pair-graph-/doc-sized) so neither the
    # MinHash construction nor the components fixpoint runs twice.
    pairs = spark.sql(
        f"SELECT doc_a, doc_b FROM ({_MINHASH_SPARK}) p"
    ).localCheckpoint()
    out = (
        leakage_safe_split(
            docs, pairs, {"train": 8, "val": 1, "test": 1}, seed=13
        )
        .select("doc_id", "split")
        .localCheckpoint()
    )
    a = out.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    b = out.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    viol = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    if viol:
        raise RuntimeError(f"{viol} near-dup pairs straddle splits")
    return (
        out.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("doc_id_sum"),
        )
        .withColumn("n_cross_split_pairs", F.lit(viol).cast("long"))
        .orderBy("split")
    )


_q(
    "curation_leakage_safe_split",
    Query(
        _leakage_safe_split_spark,
        f"""
        WITH RECURSIVE mh AS (
          SELECT doc_a, doc_b FROM ({_MINHASH_DUCK}) p
        ),
        edges AS (
          SELECT doc_a AS a, doc_b AS b FROM mh
          UNION SELECT doc_b, doc_a FROM mh
        ),
        gnodes AS (SELECT DISTINCT a AS node FROM edges),
        reach(src, node) AS (
          SELECT node, node FROM gnodes
          UNION
          SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a
        ),
        comps AS (
          SELECT src AS doc_id, CAST(MIN(node) AS BIGINT) AS component_id
          FROM reach GROUP BY src
        ),
        assigned AS (
          SELECT d.doc_id,
                 CAST(COALESCE(c.component_id, d.doc_id) AS VARCHAR) AS grp
          FROM documents d LEFT JOIN comps c ON d.doc_id = c.doc_id
          WHERE d.doc_id < 200
        ),
        split_of AS (
          SELECT doc_id,
                 CASE WHEN CAST(('0x' || substr(md5('13|' || grp), 1, 8))
                           AS BIGINT) < 429496729 THEN 'test'
                      WHEN CAST(('0x' || substr(md5('13|' || grp), 1, 8))
                           AS BIGINT) < 3865470566 THEN 'train'
                      ELSE 'val' END AS split
          FROM assigned
        ),
        viol AS (
          SELECT COUNT(*) AS n FROM mh
          JOIN split_of sa ON mh.doc_a = sa.doc_id
          JOIN split_of sb ON mh.doc_b = sb.doc_id
          WHERE sa.split != sb.split
        )
        SELECT split, COUNT(*) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum,
               CAST((SELECT n FROM viol) AS BIGINT) AS n_cross_split_pairs
        FROM split_of GROUP BY split ORDER BY split
        """,
        "X-curation,X2",
        "leakage-safe train/val/test split: duplicate clusters assigned "
        "as units (components of the MinHash pair graph), so no "
        "near-dup pair straddles splits; violation count pinned at 0 "
        "by both engines",
    ),
)


def _weighted_sample_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (operators/sampling.py
    weighted_sample, Efraimidis-Spirakis exponential keys): top-50 by
    u^(1/n_chars) — document selection probability proportional to
    length, so the sample tracks token mass, not doc count."""
    from mission_data_pipeline_spark.operators.sampling import weighted_sample

    register_views(spark, sf_dir)
    out = weighted_sample(
        spark.table("documents"),
        50,
        weight_col="n_chars",
        key_cols=["doc_id"],
        seed=17,
    )
    return out.select("doc_id", "lang", "n_chars").orderBy("doc_id")


_q(
    "curation_weighted_sample",
    Query(
        _weighted_sample_spark,
        """
        SELECT doc_id, lang, n_chars FROM (
          SELECT doc_id, lang, n_chars,
                 ROW_NUMBER() OVER (
                   ORDER BY ROUND(POWER(
                     (CAST(('0x' || substr(md5('17|' || CAST(doc_id AS VARCHAR)),
                            1, 8)) AS BIGINT) + 1) / 4294967296.0,
                     1.0 / n_chars), 12) DESC, doc_id) AS rk
          FROM documents WHERE n_chars > 0
        ) t WHERE rk <= 50
        ORDER BY doc_id
        """,
        "X-curation",
        "Efraimidis-Spirakis weighted sampling without replacement "
        "(key = u^(1/w), top-n): inclusion probability proportional to "
        "document weight; map-side keys + one exact top-n, rounded key "
        "with id tie-break for cross-engine determinism",
    ),
)


def _scrub_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub round-trip: synthetic emails/URLs/card numbers appended
    in-plan, redacted by operators/text.py scrub_text, digests compared
    against DuckDB running the identical Java∩RE2 pattern chain."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.text import scrub_text

    register_views(spark, sf_dir)
    doc = spark.table("documents").filter(F.col("doc_id") < 200)
    aug = doc.withColumn(
        "text",
        F.concat(
            "text",
            F.lit(" reach user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or https://site.example/p/"),
            F.col("doc_id").cast("string"),
            F.lit(" card 4111111111111111 tel 555-123-4567"),
        ),
    )
    out = scrub_text(aug)
    return out.select(
        "doc_id",
        F.md5("text").alias("scrubbed_md5"),
        F.length("text").cast("long").alias("n_chars"),
    ).orderBy("doc_id")


_q(
    "curation_pii_scrub",
    Query(
        _scrub_spark,
        r"""
        WITH aug AS (
          SELECT doc_id,
                 text || ' reach user' || CAST(doc_id AS VARCHAR)
                      || '@mail.example.com or https://site.example/p/'
                      || CAST(doc_id AS VARCHAR)
                      || ' card 4111111111111111 tel 555-123-4567' AS text
          FROM documents WHERE doc_id < 200
        ),
        scrubbed AS (
          SELECT doc_id,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(text,
                         '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}',
                         '<EMAIL>', 'g'),
                       'https?://[^\s]+', '<URL>', 'g'),
                     '\b\d{3}[-.]\d{3,4}[-.]\d{4}\b', '<PHONE>', 'g'),
                   '\b\d{13,19}\b', '<LONGNUM>', 'g') AS text
          FROM aug
        )
        SELECT doc_id, md5(text) AS scrubbed_md5,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM scrubbed ORDER BY doc_id
        """,
        "X-curation",
        "PII scrubbing (emails/URLs/phone/card-shaped spans -> typed "
        "placeholders) as a zero-shuffle regexp_replace chain; patterns "
        "constrained to the Java-RE2 common subset so both engines run "
        "the same strings",
    ),
)


def _repetition_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (operators/text.py
    repetition_signals). The documents table is single-line, so the
    query splits sentences onto lines first — both dialects apply the
    identical transform, then the identical dup-line / top-bigram
    math."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.text import repetition_signals

    register_views(spark, sf_dir)
    docs = spark.table("documents").withColumn(
        "text", F.regexp_replace("text", r"\. ", ".\n")
    )
    rep = repetition_signals(docs, ngram_n=2)
    return rep.select(
        "doc_id",
        "n_lines",
        F.round("dup_line_frac", 6).alias("dup_line_frac"),
        F.round("dup_line_char_frac", 6).alias("dup_line_char_frac"),
        F.round("top_ngram_frac", 6).alias("top_ngram_frac"),
    ).orderBy("doc_id")


_q(
    "x4_repetition_signals",
    Query(
        _repetition_spark,
        r"""
        WITH d AS (
          SELECT doc_id,
                 regexp_replace(text, '\. ', '.' || chr(10), 'g') AS text
          FROM documents
        ),
        lines AS (
          SELECT doc_id, trim(l) AS line
          FROM d, UNNEST(string_split(text, chr(10))) AS u(l)
          WHERE length(trim(l)) > 0
        ),
        per_line AS (
          SELECT doc_id, line, COUNT(*) AS cnt FROM lines GROUP BY 1, 2
        ),
        line_stats AS (
          SELECT doc_id,
                 CAST(SUM(cnt) AS BIGINT) AS n_lines,
                 ROUND(CAST(SUM(cnt - 1) AS DOUBLE)
                       / CAST(SUM(cnt) AS DOUBLE), 6) AS dup_line_frac,
                 ROUND(CAST(SUM((cnt - 1) * length(line)) AS DOUBLE)
                       / CAST(SUM(cnt * length(line)) AS DOUBLE), 6)
                   AS dup_line_char_frac
          FROM per_line GROUP BY doc_id
        ),
        toks AS (
          SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM d
        ),
        grams AS (
          SELECT doc_id, gram FROM (
            SELECT doc_id, array_to_string(t[j:j+1], ' ') AS gram
            FROM toks, UNNEST(range(1, greatest(len(t) - 2, 0) + 2)) AS u(j)
          ) WHERE length(gram) > 0
        ),
        per_gram AS (
          SELECT doc_id, gram, COUNT(*) AS cnt FROM grams GROUP BY 1, 2
        ),
        gram_stats AS (
          SELECT doc_id,
                 ROUND(CAST(MAX(cnt) AS DOUBLE)
                       / CAST(SUM(cnt) AS DOUBLE), 6) AS top_ngram_frac
          FROM per_gram GROUP BY doc_id
        )
        SELECT l.doc_id, l.n_lines, l.dup_line_frac, l.dup_line_char_frac,
               g.top_ngram_frac
        FROM line_stats l LEFT JOIN gram_stats g ON l.doc_id = g.doc_id
        ORDER BY l.doc_id
        """,
        "X4",
        "Gopher/MassiveText repetition quality signals: duplicate-line "
        "fraction (count and char weighted) + top word-bigram fraction, "
        "two explode->groupBy pipelines with map-side partial aggregation",
    ),
)


def _tfidf_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed TF-IDF sparse vectors (operators/text.py tfidf_sparse):
    md5 hashing-trick buckets so the oracle reproduces the bucketing;
    bucket-collision sums use the round-9/DECIMAL determinism pattern."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.text import tfidf_sparse

    register_views(spark, sf_dir)
    out = tfidf_sparse(
        spark.table("documents").filter(F.col("doc_id") < 100), dim=64
    )
    return out.orderBy("doc_id", "bucket")


_q(
    "x4_tfidf_sparse",
    Query(
        _tfidf_spark,
        r"""
        WITH toks AS (
          SELECT doc_id, t AS term
          FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
                FROM documents WHERE doc_id < 100),
               UNNEST(ts) AS u(t)
          WHERE length(t) > 0
        ),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        ),
        nd AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents
          WHERE doc_id < 100
        ),
        dfreq AS (
          SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
          FROM tf GROUP BY term
        )
        SELECT tf.doc_id,
               CAST(('0x' || substr(md5('0|' || tf.term), 1, 12)) AS BIGINT)
                 % 64 AS bucket,
               ROUND(CAST(CAST(SUM(CAST(ROUND(
                 CAST(tf.tf AS DOUBLE)
                 * (ln((n_docs + CAST(1.0 AS DOUBLE))
                       / (df + CAST(1.0 AS DOUBLE))) + CAST(1.0 AS DOUBLE)),
                 9) AS DECIMAL(20,9))) AS STRING) AS DOUBLE), 6) AS weight
        FROM tf JOIN dfreq USING (term) CROSS JOIN nd
        GROUP BY tf.doc_id, bucket
        ORDER BY doc_id, bucket
        """,
        "X4",
        "hashed TF-IDF document vectors (HashingTF+IDF restated as pure "
        "aggregation) in sparse (doc, bucket, weight) form — the "
        "text-to-vector bridge into the ANN path; md5 hashing-trick "
        "buckets, smoothed idf, DECIMAL-sum collision determinism",
    ),
)


def _unigram_logprob_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram LM score (operators/text.py unigram_logprob) — the
    model-free analog of CCNet's KenLM perplexity quality filter."""
    from mission_data_pipeline_spark.operators.text import unigram_logprob

    register_views(spark, sf_dir)
    return unigram_logprob(spark.table("documents")).orderBy("doc_id")


def _quality_tiers_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-tier bucketing for curriculum/sampling decisions: docs
    split into quartile tiers of their LM score. The scale shape is
    threshold-broadcast, NOT a global NTILE — exact quartile thresholds
    are one aggregate (three doubles), broadcast back, and the tier is
    a map-side CASE; a window-ntile over the corpus would funnel every
    row through one task."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.text import unigram_logprob

    register_views(spark, sf_dir)
    # The score table feeds BOTH the threshold aggregate and the tier
    # rows; localCheckpoint materializes it once (MEMORY_AND_DISK,
    # context-cleaned when the DF is GC'd) so the explode+join score
    # computation appears exactly once — the one-pass deployment shape,
    # not a demo that silently re-scores the corpus.
    scores = unigram_logprob(spark.table("documents")).localCheckpoint()
    qs = scores.agg(
        F.expr("percentile(neg_logprob, 0.25)").alias("q1"),
        F.expr("percentile(neg_logprob, 0.5)").alias("q2"),
        F.expr("percentile(neg_logprob, 0.75)").alias("q3"),
    )
    tier = (
        F.lit(1)
        + (F.col("neg_logprob") > F.col("q1")).cast("int")
        + (F.col("neg_logprob") > F.col("q2")).cast("int")
        + (F.col("neg_logprob") > F.col("q3")).cast("int")
    )
    return (
        scores.crossJoin(F.broadcast(qs))
        .select("doc_id", "n_tokens", "neg_logprob", tier.alias("tier"))
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.round(F.min("neg_logprob"), 6).alias("min_score"),
            F.round(F.max("neg_logprob"), 6).alias("max_score"),
        )
        .orderBy("tier")
    )


_UNIGRAM_SCORE_DUCK = r"""
        WITH toks AS (
          SELECT doc_id, t AS term
          FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
                FROM documents),
               UNNEST(ts) AS u(t)
          WHERE length(t) > 0
        ),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        ),
        freq AS (
          SELECT term, CAST(SUM(tf) AS DOUBLE) AS cf FROM tf GROUP BY term
        ),
        tot AS (SELECT SUM(cf) AS ctot FROM freq),
        scores AS (
          SELECT tf.doc_id,
                 CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
                 ROUND(CAST(CAST(SUM(CAST(ROUND(
                   -ln(freq.cf / tot.ctot) * CAST(tf.tf AS DOUBLE),
                   9) AS DECIMAL(20,9))) AS STRING) AS DOUBLE)
                   / SUM(tf.tf), 6) AS neg_logprob
          FROM tf JOIN freq USING (term) CROSS JOIN tot
          GROUP BY tf.doc_id
        )
"""

_q(
    "curation_quality_tiers",
    Query(
        _quality_tiers_spark,
        _UNIGRAM_SCORE_DUCK
        + """
        , qs AS (
          SELECT QUANTILE_CONT(neg_logprob, 0.25) AS q1,
                 QUANTILE_CONT(neg_logprob, 0.5) AS q2,
                 QUANTILE_CONT(neg_logprob, 0.75) AS q3
          FROM scores
        )
        SELECT 1 + CAST(neg_logprob > q1 AS INT)
                 + CAST(neg_logprob > q2 AS INT)
                 + CAST(neg_logprob > q3 AS INT) AS tier,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               ROUND(MIN(neg_logprob), 6) AS min_score,
               ROUND(MAX(neg_logprob), 6) AS max_score
        FROM scores CROSS JOIN qs
        GROUP BY tier ORDER BY tier
        """,
        "X4,X-curation",
        "quality-tier bucketing over the LM score (curriculum/sampling "
        "input): exact quartile thresholds broadcast back, tier as a "
        "map-side CASE — never a corpus-wide single-partition NTILE",
    ),
)

def _zipf_slope_spark(spark, sf_dir):
    """Zipf rank-frequency fit WITHOUT a global window (VERDICT r11
    item 5): the vocabulary's total order (cf DESC, term ASC) is
    realized as a RANGE-PARTITIONED TWO-PASS RANK —

    1. ``repartitionByRange`` on the sort key spreads the vocabulary
       over ordered, non-overlapping ranges (32 tasks, not 1), and an
       in-partition sort + ``monotonically_increasing_id`` gives each
       row its partition id and LOCAL position;
    2. per-partition row counts (ONE row per partition — a bounded
       collect by construction) become global offsets via a driver-side
       prefix sum, attached back as a LITERAL pid→offset map: global
       rank = offset[pid] + local position + 1, pure map-side.

    The rank is identical to ROW_NUMBER() OVER (ORDER BY cf DESC, term)
    for ANY range boundaries (ranges are ordered and disjoint; the key
    is unique), so the result is layout-invariant — the perturb gate
    checks that. The DuckDB oracle keeps the window form. The
    localCheckpoint pins the nondeterministic mid assignment so both
    passes see one materialization."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    freq = (
        spark.table("documents")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count("*").alias("cf"))
    )
    ordered = (
        freq.repartitionByRange(32, F.col("cf").desc(), F.col("term").asc())
        .sortWithinPartitions(F.col("cf").desc(), F.col("term").asc())
        .withColumn("_mid", F.monotonically_increasing_id())
        .localCheckpoint()
    )
    pid = F.shiftright("_mid", 33).cast("int")
    counts = sorted(
        ordered.groupBy(pid.alias("pid")).count().collect(),
        key=lambda r: r["pid"],
    )
    offsets, acc = [], 0
    for r in counts:
        offsets += [F.lit(r["pid"]), F.lit(acc).cast("long")]
        acc += r["count"]
    rank = (
        F.element_at(F.create_map(*offsets), pid)
        + F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1))
        + 1
    )
    xy = ordered.select(
        F.round(F.log(rank), 9).cast("decimal(12,9)").alias("x"),
        F.round(F.log("cf"), 9).cast("decimal(12,9)").alias("y"),
    )
    s = xy.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        n.alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


_q(
    "x4_zipf_slope",
    Query(
        _zipf_slope_spark,
        r"""
        WITH freq AS (
          SELECT t AS term, COUNT(*) AS cf FROM (
            SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
            FROM documents
          ) WHERE length(t) > 0 GROUP BY t
        ), ranked AS (
          SELECT CAST(ROUND(LN(ROW_NUMBER() OVER (ORDER BY cf DESC, term)), 9)
                      AS DECIMAL(12,9)) AS x,
                 CAST(ROUND(LN(cf), 9) AS DECIMAL(12,9)) AS y
          FROM freq
        ), sums AS (
          SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy, SUM(x * x) AS sxx
          FROM ranked
        )
        SELECT n AS n_terms,
               ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                     6) AS zipf_slope,
               ROUND((CAST(sy AS DOUBLE)
                      - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * CAST(sx AS DOUBLE)) / n, 6) AS intercept
        FROM sums
        """,
        "X4,A*+",
        "Zipf rank-frequency fit (least-squares slope of ln-freq vs "
        "ln-rank): the corpus-health diagnostic for vocabulary "
        "degeneration; the vocabulary rank is a range-partitioned "
        "two-pass rank (no global window, no single-partition funnel — "
        "scales with the vocabulary), and the regression sums are "
        "exact decimals so the fit is bit-reproducible cross-engine",
    ),
)

# In-engine closed-form model training: a 2-feature + intercept linear
# probe (vocabulary richness ~ token count + char count) fit by NORMAL
# EQUATIONS — ONE aggregation pass collects the 9 sufficient statistics
# (all integer sums: exact, order-independent), the 3x3 system is solved
# in-plan by Cramer's rule, coefficients broadcast back for the residual
# pass. This is the scale shape for fitting low-dimensional quality
# probes over a 100 TB corpus: sufficient statistics are a partial-agg
# reduction, never a driver-side solver over row data, and the feature
# dimension (not the corpus) bounds the closed-form expression. R^2 and
# the worst-residual doc come from the second (scoring) pass.
_PROBE_BODY = """
        sums AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(x1) AS DOUBLE) AS s1, CAST(SUM(x2) AS DOUBLE) AS s2,
                 CAST(SUM(x1*x1) AS DOUBLE) AS s11,
                 CAST(SUM(x1*x2) AS DOUBLE) AS s12,
                 CAST(SUM(x2*x2) AS DOUBLE) AS s22,
                 CAST(SUM(y) AS DOUBLE) AS sy,
                 CAST(SUM(x1*y) AS DOUBLE) AS s1y,
                 CAST(SUM(x2*y) AS DOUBLE) AS s2y
          FROM feats
        ),
        beta AS (
          SELECT n, sy,
                 (sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)
                    + s2*(s1y*s12 - s11*s2y))
                 / (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
                    + s2*(s1*s12 - s11*s2)) AS b0,
                 (n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)
                    + s2*(s1*s2y - s1y*s2))
                 / (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
                    + s2*(s1*s12 - s11*s2)) AS b1,
                 (n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
                    + sy*(s1*s12 - s11*s2))
                 / (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
                    + s2*(s1*s12 - s11*s2)) AS b2
          FROM sums
        ),
        scored AS (
          SELECT f.doc_id,
                 CAST(f.y AS DOUBLE) - (b.b0 + b.b1*f.x1 + b.b2*f.x2) AS r,
                 CAST(f.y AS DOUBLE) - b.sy / b.n AS dev
          FROM feats f CROSS JOIN beta b
        ),
        fit AS (
          SELECT CAST(CAST(SUM(CAST(ROUND(r*r, 6) AS DECIMAL(30,6)))
                      AS STRING) AS DOUBLE) AS sse,
                 CAST(CAST(SUM(CAST(ROUND(dev*dev, 6) AS DECIMAL(30,6)))
                      AS STRING) AS DOUBLE) AS sst
          FROM scored
        ),
        worst AS (
          SELECT doc_id AS worst_doc_id, ROUND(r, 6) AS worst_resid
          FROM scored ORDER BY ABS(ROUND(r, 6)) DESC, doc_id LIMIT 1
        )
        SELECT CAST(b.n AS BIGINT) AS n_docs,
               ROUND(b.b0, 6) AS b0, ROUND(b.b1, 6) AS b1,
               ROUND(b.b2, 6) AS b2,
               ROUND(1.0 - fit.sse / fit.sst, 6) AS r2,
               w.worst_doc_id, w.worst_resid
        FROM beta b CROSS JOIN fit CROSS JOIN worst w
"""

_q(
    "x4_linear_probe_fit",
    _dialect(
        r"""
        WITH feats AS (
          SELECT doc_id,
                 CAST(SIZE(SPLIT(TRIM(text), '\\s+')) AS BIGINT) AS x1,
                 CAST(LENGTH(text) AS BIGINT) AS x2,
                 CAST(SIZE(ARRAY_DISTINCT(SPLIT(TRIM(text), '\\s+'))) AS BIGINT) AS y
          FROM documents WHERE doc_id < 400
        ),
"""
        + _PROBE_BODY,
        r"""
        WITH feats AS (
          SELECT doc_id,
                 CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS x1,
                 CAST(LENGTH(text) AS BIGINT) AS x2,
                 CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS y
          FROM documents WHERE doc_id < 400
        ),
"""
        + _PROBE_BODY,
        "X4+,A*+",
        "in-engine closed-form linear-probe training: 2-feature +"
        " intercept least squares via normal equations — one partial-agg"
        " pass for the 9 integer sufficient statistics, Cramer 3x3 solve"
        " in-plan, coefficients broadcast for the residual/R^2 pass and"
        " the worst-residual doc; exact integer sums + shared expression"
        " text make the fit bit-reproducible cross-engine",
    ),
)


_q(
    "x4_unigram_logprob",
    Query(
        _unigram_logprob_spark,
        # Shares the scores CTE with curation_quality_tiers: the tier
        # thresholds must be computed over bit-identical per-doc scores,
        # so there is exactly ONE SQL definition of the score.
        _UNIGRAM_SCORE_DUCK
        + """
        SELECT doc_id, n_tokens, neg_logprob
        FROM scores
        ORDER BY doc_id
        """,
        "X4",
        "corpus-unigram language-model score per document (mean -ln "
        "p(token)) — the model-free stand-in for CCNet's KenLM perplexity "
        "filter; term-keyed tf join + broadcast corpus total, DECIMAL-sum "
        "determinism",
    ),
)


def _bigram_logprob_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-bigram conditional LM score (operators/text.py
    bigram_logprob) — order-sensitive quality scoring one n-gram order
    above the unigram filter."""
    from mission_data_pipeline_spark.operators.text import bigram_logprob

    register_views(spark, sf_dir)
    return bigram_logprob(spark.table("documents")).orderBy("doc_id")


_q(
    "x4_bigram_logprob",
    Query(
        _bigram_logprob_spark,
        r"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
          FROM documents
        ),
        grams AS (
          SELECT doc_id,
                 array_to_string(list_slice(t, CAST(i AS INT) + 1,
                                            CAST(i AS INT) + 2), ' ') AS gram
          FROM toks, UNNEST(range(0, greatest(len(t) - 2, 0) + 1)) AS u(i)
        ),
        g AS (SELECT * FROM grams WHERE contains(gram, ' ')),
        tf AS (SELECT doc_id, gram, COUNT(*) AS tf FROM g GROUP BY 1, 2),
        bigc AS (
          SELECT gram, CAST(SUM(tf) AS DOUBLE) AS cb FROM tf GROUP BY gram
        ),
        headc AS (
          SELECT split_part(gram, ' ', 1) AS head, SUM(cb) AS ch
          FROM bigc GROUP BY 1
        ),
        agg AS (
          SELECT tf.doc_id, SUM(tf.tf) AS n_bigrams,
                 SUM(CAST(ROUND(
                   -ln(bigc.cb / headc.ch) * CAST(tf.tf AS DOUBLE),
                   9) AS DECIMAL(20,9))) AS s
          FROM tf
          JOIN bigc USING (gram)
          JOIN headc ON headc.head = split_part(tf.gram, ' ', 1)
          GROUP BY tf.doc_id
        )
        SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
               ROUND(CAST(s AS DOUBLE) / n_bigrams, 6) AS neg_logprob
        FROM agg
        ORDER BY doc_id
        """,
        "X4",
        "corpus-bigram conditional LM score (mean -ln P(w2|w1)) — "
        "order-sensitive quality scoring toward KenLM-style n-gram "
        "perplexity filters; gram/vocab-keyed joins, DECIMAL-sum "
        "determinism",
    ),
)


def _heldout_backoff_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out stupid-backoff LM scoring (operators/text.py
    heldout_backoff_logprob): bigram counts from the doc_id<250 slice
    score the doc_id>=250 slice — the true CCNet/KenLM perplexity-
    filter shape, where backoff and OOV handling actually fire (self-
    scoring never exercises them). Returns per-doc score + backoff/OOV
    occurrence counts, the curation signals."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.text import (
        heldout_backoff_logprob,
    )

    register_views(spark, sf_dir)
    docs = spark.table("documents")
    # Seed the scored slice with an out-of-vocabulary marker token so
    # the OOV branch is exercised, not just declared (the de-vacuify
    # rule: an untested CASE arm is a hole, and the shared synthetic
    # vocabulary would otherwise never produce an unseen word).
    scored = docs.filter(
        (F.col("doc_id") >= 250) & (F.col("doc_id") < 500)
    ).withColumn(
        "text",
        F.concat(F.col("text"), F.lit(" zqxoov"), F.col("doc_id")),
    )
    out = heldout_backoff_logprob(
        docs.filter(F.col("doc_id") < 250), scored, alpha=0.4
    )
    return out.orderBy("doc_id")


_q(
    "x4_heldout_backoff_logprob",
    Query(
        _heldout_backoff_spark,
        r"""
        WITH tok_tr AS (
          SELECT t AS w FROM (
            SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
            FROM documents WHERE doc_id < 250
          ) u WHERE length(t) > 0
        ),
        gr AS (
          SELECT doc_id,
                 array_to_string(list_slice(t, CAST(i AS INT) + 1,
                                            CAST(i AS INT) + 2), ' ') AS gram
          FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
                FROM documents) d,
               UNNEST(range(0, greatest(len(t) - 2, 0) + 1)) AS u(i)
        ),
        g_tr AS (SELECT gram FROM gr
                 WHERE doc_id < 250 AND contains(gram, ' ')),
        cb AS (SELECT gram, CAST(COUNT(*) AS DOUBLE) AS cb
               FROM g_tr GROUP BY gram),
        ch AS (SELECT split_part(gram, ' ', 1) AS head,
                      CAST(COUNT(*) AS DOUBLE) AS ch
               FROM g_tr GROUP BY 1),
        cf AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS cf
               FROM tok_tr GROUP BY w),
        ctot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS ctot FROM tok_tr),
        g_sc AS (
          SELECT doc_id, gram, COUNT(*) AS tf
          FROM (
            SELECT doc_id,
                   array_to_string(list_slice(t, CAST(i AS INT) + 1,
                                              CAST(i AS INT) + 2), ' ') AS gram
            FROM (SELECT doc_id,
                         string_split_regex(
                           trim(lower(text || ' zqxoov' || doc_id)), '\s+') AS t
                  FROM documents
                  WHERE doc_id >= 250 AND doc_id < 500) d,
                 UNNEST(range(0, greatest(len(t) - 2, 0) + 1)) AS u(i)
          ) g WHERE contains(gram, ' ')
          GROUP BY doc_id, gram
        ),
        scored AS (
          SELECT s.doc_id, s.tf,
                 cb.cb, ch.ch, cf.cf, ctot.ctot,
                 CASE WHEN cb.cb IS NOT NULL THEN cb.cb / ch.ch
                      WHEN cf.cf IS NOT NULL THEN 0.4 * cf.cf / ctot.ctot
                      ELSE 0.4 / (ctot.ctot + 1.0) END AS p
          FROM g_sc s
          LEFT JOIN cb ON s.gram = cb.gram
          LEFT JOIN ch ON split_part(s.gram, ' ', 1) = ch.head
          LEFT JOIN cf ON split_part(s.gram, ' ', -1) = cf.w
          CROSS JOIN ctot
        )
        SELECT doc_id,
               CAST(SUM(tf) AS BIGINT) AS n_bigrams,
               CAST(SUM(CASE WHEN cb IS NULL AND cf IS NOT NULL
                             THEN tf ELSE 0 END) AS BIGINT) AS n_backoff,
               CAST(SUM(CASE WHEN cf IS NULL THEN tf ELSE 0 END)
                    AS BIGINT) AS n_oov,
               ROUND(CAST(CAST(SUM(CAST(ROUND(-ln(p) * tf, 9)
                                        AS DECIMAL(20,9)))
                               AS STRING) AS DOUBLE)
                     / SUM(tf), 6) AS neg_logprob
        FROM scored GROUP BY doc_id ORDER BY doc_id
        """,
        "X4+",
        "held-out stupid-backoff LM scoring (Brants 2007): counts from "
        "a train slice score a held-out slice, so backoff and OOV "
        "paths actually fire; per-doc backoff/OOV occurrence counts "
        "surface as curation signals; hash-keyed joins, DECIMAL-sum "
        "determinism",
    ),
)


_q(
    "x4_top_terms",
    _dialect(
        r"""
        SELECT lang, term, cnt, rnk FROM (
          SELECT lang, term, COUNT(*) AS cnt,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY COUNT(*) DESC, term) AS rnk
          FROM (
            SELECT lang, term
            FROM documents
            LATERAL VIEW explode(split(lower(text), '\\s+')) t AS term
            WHERE length(term) > 0
          ) toks
          GROUP BY lang, term
        ) ranked
        WHERE rnk <= 5
        ORDER BY lang, rnk
        """,
        r"""
        SELECT lang, term, cnt, rnk FROM (
          SELECT lang, term, COUNT(*) AS cnt,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY COUNT(*) DESC, term) AS rnk
          FROM (
            SELECT lang, t AS term
            FROM (SELECT lang, string_split_regex(trim(lower(text)), '\s+') AS ts
                  FROM documents),
                 UNNEST(ts) AS u(t)
            WHERE length(t) > 0
          ) toks
          GROUP BY lang, term
        ) ranked
        WHERE rnk <= 5
        ORDER BY lang, rnk
        """,
        "X4",
        "per-language heavy hitters: top-5 most frequent terms via "
        "explode -> partial-agg groupBy -> per-group rank (vocabulary-"
        "sized window input, never the token table)",
    ),
)


def _bpe_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting (operators/text.py bpe_token_count):
    GPT-2-style pre-tokenizer splits in the Java∩RE2 regex subset, so
    both engines run the identical pattern."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.text import bpe_token_count

    register_views(spark, sf_dir)
    docs = spark.table("documents")
    per_doc = docs.select(
        "doc_id", "lang", bpe_token_count("text").alias("n_bpe")
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bpe").cast("long").alias("total_bpe_tokens"),
            F.round(F.sum("n_bpe").cast("double") / F.count("*"), 6).alias(
                "avg_bpe_tokens"
            ),
        )
        .orderBy("lang")
    )


_q(
    "x4_token_count_bpe",
    Query(
        _bpe_spark,
        r"""
        WITH per_doc AS (
          SELECT doc_id, lang,
                 len(regexp_extract_all(text,
                   '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'
                 )) AS n_bpe
          FROM documents
        )
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
               ROUND(CAST(SUM(n_bpe) AS DOUBLE) / COUNT(*), 6) AS avg_bpe_tokens
        FROM per_doc GROUP BY lang ORDER BY lang
        """,
        "X4",
        "GPT-2-style BPE pre-tokenizer token counting ('how many tokens "
        "will this cost') as one JVM regex expression; pattern kept in "
        "the Java-RE2 common subset (no lookahead) so the oracle runs "
        "the identical string",
    ),
)


def _bpe_merges_sql_literal() -> str:
    """DEFAULT_MERGES as a DuckDB list literal — built from the same
    constant the operator uses, so the two dialects cannot drift."""
    from mission_data_pipeline_spark.operators.bpe import DEFAULT_MERGES

    return "[" + ", ".join(f"'{l}|{r}'" for l, r in DEFAULT_MERGES) + "]"


#: Default doc slice for the per-doc BPE oracles (the full-corpus
#: budget query builds its own docs CTE).
_BPE_DOCS_SRC_DEFAULT = "SELECT doc_id, text FROM documents WHERE doc_id < 500"

#: Recursive-CTE prelude shared by the BPE oracles: distinct words of
#: the ``{docs_src}`` slice, greedily re-merged under the literal rank
#: table with the SAME semantics as operators/bpe.py bpe_apply (lowest
#: rank first, all non-overlapping occurrences left-to-right per
#: iteration).
_BPE_ORACLE_PRELUDE = """
        WITH RECURSIVE docs AS (
          {docs_src}
        ),
        words AS (
          SELECT doc_id, w
          FROM docs, UNNEST(list_filter(
            string_split_regex(lower(text), '[^a-z]+'),
            x -> len(x) > 0)) t(w)
        ),
        pdw AS (
          SELECT doc_id, w, COUNT(*) AS occurrences
          FROM words GROUP BY doc_id, w
        ),
        dw AS (SELECT DISTINCT w FROM pdw),
        enc AS (
          SELECT w, string_split(w, '') AS toks, 0 AS it,
                 {merges} AS merges
          FROM dw
          UNION ALL
          SELECT w,
                 list_reduce(
                   list_transform(toks, t -> [t]),
                   (acc, x) -> CASE
                     WHEN len(acc) > 0
                          AND acc[-1] = string_split(merges[best], '|')[1]
                          AND x[1] = string_split(merges[best], '|')[2]
                     THEN acc[:len(acc)-1]
                          || [string_split(merges[best], '|')[1]
                              || string_split(merges[best], '|')[2]]
                     ELSE acc || x END),
                 it + 1, merges
          FROM (
            SELECT enc.*,
                   list_min(list_filter(
                     list_transform(range(1, len(toks)),
                       i -> list_position(merges,
                              toks[i] || '|' || toks[i+1])),
                     p -> p IS NOT NULL AND p > 0)) AS best
            FROM enc
          ) WHERE best IS NOT NULL
        ),
        fin AS (
          SELECT w, toks FROM (
            SELECT w, toks, it, MAX(it) OVER (PARTITION BY w) AS mx
            FROM enc
          ) WHERE it = mx
        )
"""


def _bpe_token_stats_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BPE token accounting (operators/bpe.py): per-document word
    and token counts under the fixed DEFAULT_MERGES rank table. The
    distinct vocabulary is encoded ONCE (Arrow-batched, memoized) and
    joined back — the Python step never touches the corpus-sized token
    stream. Oracle replays the greedy rank-order merge loop as a
    recursive CTE over the same literal merges."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.bpe import bpe_token_stats

    register_views(spark, sf_dir)
    docs = spark.table("documents").filter(F.col("doc_id") < 500)
    return bpe_token_stats(docs).orderBy("doc_id")


_q(
    "x4_bpe_token_stats",
    Query(
        _bpe_token_stats_spark,
        _BPE_ORACLE_PRELUDE.format(merges=_bpe_merges_sql_literal(),
                           docs_src=_BPE_DOCS_SRC_DEFAULT)
        + """
        SELECT p.doc_id,
               CAST(SUM(p.occurrences) AS BIGINT) AS n_words,
               CAST(SUM(p.occurrences * len(f.toks)) AS BIGINT) AS n_tokens
        FROM pdw p JOIN fin f ON p.w = f.w
        GROUP BY p.doc_id
        ORDER BY p.doc_id
        """,
        "X4",
        "Real BPE segmentation (Sennrich-style greedy rank-order "
        "merges): per-doc token budget; the oracle replays the merge "
        "state machine as a recursive CTE over the identical literal "
        "rank table",
    ),
)


def _bpe_vocab_freq_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-frequency histogram under the same BPE table —
    the tokenizer-coverage audit view. Distinct words encode once;
    token explosion happens on the vocabulary-sized table only."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.bpe import bpe_vocab_frequency

    register_views(spark, sf_dir)
    docs = spark.table("documents").filter(F.col("doc_id") < 500)
    return bpe_vocab_frequency(docs, top_n=25)


_q(
    "x4_bpe_vocab_freq",
    Query(
        _bpe_vocab_freq_spark,
        _BPE_ORACLE_PRELUDE.format(merges=_bpe_merges_sql_literal(),
                           docs_src=_BPE_DOCS_SRC_DEFAULT)
        + """
        , wc AS (SELECT w, COUNT(*) AS cnt FROM words GROUP BY w)
        SELECT token, CAST(SUM(cnt) AS BIGINT) AS freq
        FROM (SELECT w, UNNEST(toks) AS token FROM fin) x
             JOIN wc USING (w)
        GROUP BY token
        ORDER BY freq DESC, token
        LIMIT 25
        """,
        "X4",
        "BPE vocabulary histogram: top-25 token frequencies; same "
        "recursive-CTE replay, corpus weights joined back by word",
    ),
)


def _bpe_corpus_budget_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-corpus BPE token budget by language — the headline number a
    mixture-weighting/packing pipeline needs, over the ENTIRE documents
    table (no fixture slice: this query's cost scales with the corpus
    while its output stays language-bounded). The corpus-sized work is
    all JVM (explode → word groupBy → hash join → agg); the Python
    encode touches only the distinct vocabulary."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.bpe import bpe_token_stats

    register_views(spark, sf_dir)
    docs = spark.table("documents")
    per_doc = bpe_token_stats(docs)
    langs = docs.select(F.col("doc_id"), "lang")
    return (
        per_doc.join(langs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.round(
                F.sum("n_tokens").cast("double") / F.sum("n_words"), 6
            ).alias("tokens_per_word"),
        )
        .orderBy("lang")
    )


_q(
    "x4_bpe_corpus_budget",
    Query(
        _bpe_corpus_budget_spark,
        """
        WITH RECURSIVE words AS (
          SELECT doc_id, w
          FROM documents, UNNEST(list_filter(
            string_split_regex(lower(text), '[^a-z]+'),
            x -> len(x) > 0)) t(w)
        ),
        pdw AS (
          SELECT doc_id, w, COUNT(*) AS occurrences
          FROM words GROUP BY doc_id, w
        ),
        dw AS (SELECT DISTINCT w FROM pdw),
        enc AS (
          SELECT w, string_split(w, '') AS toks, 0 AS it,
                 {merges} AS merges
          FROM dw
          UNION ALL
          SELECT w,
                 list_reduce(
                   list_transform(toks, t -> [t]),
                   (acc, x) -> CASE
                     WHEN len(acc) > 0
                          AND acc[-1] = string_split(merges[best], '|')[1]
                          AND x[1] = string_split(merges[best], '|')[2]
                     THEN acc[:len(acc)-1]
                          || [string_split(merges[best], '|')[1]
                              || string_split(merges[best], '|')[2]]
                     ELSE acc || x END),
                 it + 1, merges
          FROM (
            SELECT enc.*,
                   list_min(list_filter(
                     list_transform(range(1, len(toks)),
                       i -> list_position(merges,
                              toks[i] || '|' || toks[i+1])),
                     p -> p IS NOT NULL AND p > 0)) AS best
            FROM enc
          ) WHERE best IS NOT NULL
        ),
        fin AS (
          SELECT w, len(toks) AS n FROM (
            SELECT w, toks, it, MAX(it) OVER (PARTITION BY w) AS mx
            FROM enc
          ) WHERE it = mx
        ),
        per_doc AS (
          SELECT p.doc_id,
                 SUM(p.occurrences) AS n_words,
                 SUM(p.occurrences * f.n) AS n_tokens
          FROM pdw p JOIN fin f ON p.w = f.w
          GROUP BY p.doc_id
        )
        SELECT d.lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(pd.n_words) AS BIGINT) AS n_words,
               CAST(SUM(pd.n_tokens) AS BIGINT) AS n_tokens,
               ROUND(CAST(SUM(pd.n_tokens) AS DOUBLE) / SUM(pd.n_words), 6)
                 AS tokens_per_word
        FROM per_doc pd JOIN documents d USING (doc_id)
        GROUP BY d.lang
        ORDER BY d.lang
        """.replace("{merges}", _bpe_merges_sql_literal()),
        "X4",
        "Corpus-wide BPE token budget by language: full-table scan "
        "scales with data, output stays language-bounded; oracle is "
        "the same recursive merge replay over the corpus vocabulary",
    ),
)


def _c4_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning-rule verdicts (operators/text.py c4_signals) — the
    documents table is single-line, so line semantics come from the
    same sentence→line transform as x4_repetition_signals."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.text import c4_signals

    register_views(spark, sf_dir)
    docs = spark.table("documents").withColumn(
        "text", F.regexp_replace("text", r"\. ", ".\n")
    )
    out = c4_signals(docs)
    return out.select(
        "doc_id",
        "n_words",
        F.round("frac_lines_terminal_punct", 6).alias("frac_term"),
        "has_curly_brace",
        "has_lorem_ipsum",
        "keep",
    ).orderBy("doc_id")


_q(
    "curation_c4_signals",
    Query(
        _c4_spark,
        r"""
        WITH d AS (
          SELECT doc_id,
                 regexp_replace(text, '\. ', '.' || chr(10), 'g') AS text
          FROM documents
        ),
        sig AS (
          SELECT doc_id,
                 CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                      x -> length(x) > 0)) AS BIGINT) AS n_words,
                 list_filter(list_transform(string_split(text, chr(10)),
                                            x -> trim(x)),
                             x -> length(x) > 0) AS lines,
                 (text LIKE '%{%' OR text LIKE '%}%') AS has_curly_brace,
                 contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum
          FROM d
        )
        SELECT doc_id, n_words,
               ROUND(CASE WHEN len(lines) > 0
                 THEN CAST(len(list_filter(lines,
                        x -> regexp_matches(x, '[.!?"]$'))) AS DOUBLE)
                      / CAST(len(lines) AS DOUBLE)
                 ELSE 0.0 END, 6) AS frac_term,
               has_curly_brace, has_lorem_ipsum,
               (n_words >= 5
                AND CASE WHEN len(lines) > 0
                  THEN CAST(len(list_filter(lines,
                         x -> regexp_matches(x, '[.!?"]$'))) AS DOUBLE)
                       / CAST(len(lines) AS DOUBLE)
                  ELSE 0.0 END >= CAST(0.5 AS DOUBLE)
                AND NOT has_curly_brace AND NOT has_lorem_ipsum) AS keep
        FROM sig ORDER BY doc_id
        """,
        "X-curation",
        "C4 cleaning-rule verdicts (word count, terminal-punctuation "
        "line fraction, brace/lorem-ipsum tells, composite keep) as "
        "zero-shuffle higher-order array expressions riding the scan",
    ),
)


def _decontaminate_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/text.py decontaminate):
    docs with doc_id % 20 == 0 act as the held-out eval set; the rest of
    the corpus is flagged on any shared word 8-gram (13 is the published
    convention; 8 keeps hits non-trivial at the synthetic doc length)."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.text import decontaminate

    register_views(spark, sf_dir)
    docs = spark.table("documents")
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    out = decontaminate(corpus, bench, n=8)
    return out.select(
        "doc_id", "n_contaminated_grams", "is_contaminated"
    ).orderBy("doc_id")


_q(
    "curation_decontaminate",
    Query(
        _decontaminate_spark,
        r"""
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
          FROM documents
        ),
        grams AS (
          SELECT DISTINCT doc_id, gram FROM (
            SELECT doc_id, array_to_string(t[j:j+7], ' ') AS gram
            FROM toks, UNNEST(range(1, greatest(len(t) - 8, 0) + 2)) AS u(j)
          ) WHERE length(gram) > 0
        ),
        bench AS (
          SELECT DISTINCT gram FROM grams WHERE doc_id % 20 = 0
        ),
        hits AS (
          SELECT g.doc_id, COUNT(*) AS n
          FROM grams g JOIN bench b ON g.gram = b.gram
          WHERE g.doc_id % 20 != 0
          GROUP BY g.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(h.n, 0) AS BIGINT) AS n_contaminated_grams,
               COALESCE(h.n, 0) > 0 AS is_contaminated
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        WHERE d.doc_id % 20 != 0
        ORDER BY d.doc_id
        """,
        "X-curation",
        "train/eval decontamination: flag corpus docs sharing any word "
        "8-gram with a benchmark set; benchmark grams dedup + broadcast "
        "so the corpus-side gram table never shuffles before the join",
    ),
)


def _bm25_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed term bag
    via operators/text.py bm25_scores; the oracle reproduces the same
    tf/df/dl/avgdl pipeline and scoring formula in SQL (double-cast
    literals so DuckDB's decimal arithmetic matches IEEE)."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.text import bm25_scores

    register_views(spark, sf_dir)
    docs = spark.table("documents")
    out = bm25_scores(docs, ["spark", "query", "join", "vector"])
    return out.orderBy("doc_id")


_q(
    "x4_bm25_relevance",
    Query(
        _bm25_spark,
        """
        WITH toks AS (
          SELECT doc_id, t.term
          FROM documents, UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS t(term)
          WHERE length(t.term) > 0
        ),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
        hits AS (SELECT * FROM tf WHERE term IN ('spark','query','join','vector')),
        dfreq AS (
          SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
          FROM hits GROUP BY term
        ),
        scored AS (
          SELECT h.doc_id,
                 ln(1.0 + (s.n_docs - d.df + CAST(0.5 AS DOUBLE))
                          / (d.df + CAST(0.5 AS DOUBLE)))
                   * CAST(h.tf AS DOUBLE)
                   * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))
                   / (CAST(h.tf AS DOUBLE)
                      + CAST(1.2 AS DOUBLE)
                        * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                           + CAST(0.75 AS DOUBLE) * l.dl / s.avgdl)) AS contrib
          FROM hits h
          JOIN dl l ON h.doc_id = l.doc_id
          CROSS JOIN stats s
          JOIN dfreq d ON h.term = d.term
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matched,
               ROUND(CAST(CAST(SUM(CAST(ROUND(contrib, 9) AS DECIMAL(20,9))) AS STRING) AS DOUBLE),
                     6) AS bm25
        FROM scored GROUP BY doc_id ORDER BY doc_id
        """,
        "X4",
        "Okapi BM25 term-relevance ranking (tf/idf/doc-length "
        "normalization) for corpus curation; broadcast corpus scalars, "
        "decimal-exact cross-term sum for oracle stability",
    ),
)


def _quantize_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar quantization of the embedding column via
    operators/similarity.py quantize_embeddings (expression-only);
    the oracle recomputes scale and quantized values in SQL."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.similarity import quantize_embeddings

    register_views(spark, sf_dir)
    emb = spark.table("embeddings").filter(F.col("vec_id") < 200)
    q = quantize_embeddings(emb)
    # serialize the int array for the driver's value hash (scalar columns)
    return q.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.array_join(
            F.transform("qvec", lambda x: x.cast("string")), ","
        ).alias("qvec_csv"),
    ).orderBy("vec_id")


_q(
    "x3_quantize_embeddings",
    Query(
        _quantize_spark,
        """
        WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] AS v
          FROM embeddings WHERE vec_id < 200
        ),
        s AS (
          SELECT vec_id, v,
                 greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) AS scale
          FROM e
        )
        SELECT vec_id, ROUND(scale, 6) AS scale,
               array_to_string(
                 list_transform(v, x -> CAST(round(x / scale * 127) AS INT)),
                 ',') AS qvec_csv
        FROM s
        ORDER BY vec_id
        """,
        "X3",
        "symmetric per-vector int8 scalar quantization (4x embedding "
        "memory/shuffle reduction, the first rung before PQ); pure "
        "expression transform, oracle recomputes values in SQL",
    ),
)


def _dup_components_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters to a fixpoint: deterministic MinHash candidate
    pairs (the x2_minhash_bands construction) closed into connected
    components by operators/dedup.py connected_components (iterative
    min-label propagation); the oracle computes the same transitive
    closure with a recursive CTE."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.dedup import connected_components

    register_views(spark, sf_dir)
    pairs = spark.sql(f"SELECT doc_a, doc_b FROM ({_MINHASH_SPARK}) p")
    comp = connected_components(pairs)
    return comp.select(
        F.col("node").alias("doc_id"), "component_id"
    ).orderBy("doc_id")


_q(
    "x2_duplicate_components",
    Query(
        _dup_components_spark,
        f"""
        WITH RECURSIVE pairs AS (
          SELECT doc_a, doc_b FROM ({_MINHASH_DUCK}) p
        ),
        edges AS (
          SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION
          SELECT doc_b, doc_a FROM pairs
        ),
        nodes AS (SELECT DISTINCT a AS node FROM edges),
        reach(src, node) AS (
          SELECT node, node FROM nodes
          UNION
          SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a
        )
        SELECT src AS doc_id, CAST(MIN(node) AS BIGINT) AS component_id
        FROM reach GROUP BY src ORDER BY doc_id
        """,
        "X2",
        "transitive duplicate clustering: iterative min-label propagation "
        "to the connected-component fixpoint (lineage-checkpointed, one "
        "shuffle per round); oracle = recursive-CTE transitive closure",
    ),
)


# Seeded-corpus MinHash pairs for quality-aware dedup: each doc_id<30
# document gets a LONGER near-dup twin (id+1000, ' near dup tail'
# appended), so the highest-quality member of a duplicate cluster is
# NOT the min-id member — the argmax-representative semantics are
# observable (min-id dedup would keep the opposite doc).
_MINHASH_SEEDED_SPARK = "WITH " + _GRAMS_SEEDED_SPARK + _MINHASH_BODY_SPARK
_MINHASH_SEEDED_DUCK = "WITH " + _GRAMS_SEEDED_DUCK + _MINHASH_BODY_DUCK


def _quality_dedup_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dedup (operators/dedup.py quality_dedup):
    verified MinHash pairs close into clusters and each cluster keeps
    its HIGHEST-quality member (here: token count — the keep-the-
    longest production heuristic), ties toward min id. The seeded
    corpus plants a longer twin for every doc_id<30 document, so the
    kept representative differs from what min-id dedup would keep —
    the oracle replays closure, argmax and anti-join exactly."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.dedup import quality_dedup

    register_views(spark, sf_dir)
    docs = spark.sql(
        """
        SELECT doc_id, text FROM documents WHERE doc_id < 30
        UNION ALL
        SELECT doc_id + 1000 AS doc_id, CONCAT(text, ' near dup tail') AS text
        FROM documents WHERE doc_id < 30
        """
    ).select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias(
            "n_tokens"
        ),
    )
    pairs = spark.sql(f"SELECT doc_a, doc_b FROM ({_MINHASH_SEEDED_SPARK}) p")
    out = quality_dedup(docs, pairs, quality_col="n_tokens")
    return out.select("doc_id", "n_tokens").orderBy("doc_id")


_q(
    "curation_quality_dedup",
    Query(
        _quality_dedup_spark,
        f"""
        WITH RECURSIVE pairs AS (
          SELECT doc_a, doc_b FROM ({_MINHASH_SEEDED_DUCK}) p
        ),
        docs2 AS (
          SELECT doc_id, text FROM documents WHERE doc_id < 30
          UNION ALL
          SELECT doc_id + 1000 AS doc_id, text || ' near dup tail' AS text
          FROM documents WHERE doc_id < 30
        ),
        q AS (
          SELECT doc_id,
                 CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                   AS n_tokens
          FROM docs2
        ),
        edges AS (
          SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION
          SELECT doc_b, doc_a FROM pairs
        ),
        nodes AS (SELECT DISTINCT a AS node FROM edges),
        reach(src, node) AS (
          SELECT node, node FROM nodes
          UNION
          SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a
        ),
        comp AS (
          SELECT src AS node, MIN(node) AS component_id
          FROM reach GROUP BY src
        ),
        best AS (
          SELECT component_id, keep_id FROM (
            SELECT c.component_id, c.node AS keep_id,
                   ROW_NUMBER() OVER (PARTITION BY c.component_id
                                      ORDER BY q.n_tokens DESC, c.node) AS rn
            FROM comp c JOIN q ON q.doc_id = c.node) t
          WHERE rn = 1
        ),
        losers AS (
          SELECT c.node AS doc_id
          FROM comp c JOIN best b ON c.component_id = b.component_id
          WHERE c.node != b.keep_id
        )
        SELECT q.doc_id, q.n_tokens FROM q
        WHERE q.doc_id NOT IN (SELECT doc_id FROM losers)
        ORDER BY q.doc_id
        """,
        "X2,X-curation",
        "quality-aware near-dedup: duplicate clusters (MinHash pairs "
        "closed to the component fixpoint) each keep their HIGHEST-"
        "quality member (token count, tie min id) instead of the "
        "arbitrary min-id one — the keep-the-best production semantics; "
        "cluster work touches only the pair graph, survivors via one "
        "anti-join; oracle replays closure + argmax + anti-join",
    ),
)


def _prototype_prune_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prototype-based pruning (operators/similarity.py prototype_prune
    — the SSL-prototypes step of D4, Tirumala et al. 2023): per
    embedding cluster, the floor(25%) most-prototypical points (highest
    rounded cosine to their centroid, id tie-break) are dropped, keeping
    the diverse tail. Deterministic first-32 centroids make the
    selection oracle-replayable; with semantic_dedup this is the
    published D4 pipeline."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.similarity import (
        default_centroids,
        prototype_prune,
    )

    register_views(spark, sf_dir)
    emb = spark.table("embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cents = default_centroids(emb, n_centroids=32, vec_col="v")
    out = prototype_prune(emb, cents, drop_frac=0.25, vec_col="v")
    return out.select("vec_id").orderBy("vec_id")


_q(
    "x3_prototype_prune",
    Query(
        _prototype_prune_spark,
        """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        c AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 32),
        assign AS (
          SELECT vec_id, cid, sim FROM (
            SELECT e.vec_id, c.cid,
                   ROUND(list_cosine_similarity(e.v, c.cv), 6) AS sim,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                     ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6)
                       DESC, c.cid) AS rn
            FROM e CROSS JOIN c) t WHERE rn = 1
        ),
        ranked AS (
          SELECT vec_id,
                 ROW_NUMBER() OVER (PARTITION BY cid
                                    ORDER BY sim DESC, vec_id) AS rk,
                 COUNT(*) OVER (PARTITION BY cid) AS nc
          FROM assign
        )
        SELECT e.vec_id FROM e
        WHERE e.vec_id NOT IN
              (SELECT vec_id FROM ranked WHERE rk <= FLOOR(0.25 * nc))
        ORDER BY e.vec_id
        """,
        "X3+,X-curation",
        "D4/SSL-prototypes data pruning: per cluster, drop the "
        "floor(25%) points most similar to their centroid (most "
        "prototypical = most redundant), keep the diverse tail — one "
        "Arrow-batched matmul assignment pass, one per-cluster rank "
        "window; oracle replays assignment, ranking and the floor drop",
    ),
)


# Shared stopword list for the threshold-sweep score (literal in both
# dialects so the two engines cannot drift).
_SWEEP_STOPWORDS = "('the','a','of','and','to','in','is','that','it','for')"

_q(
    "curation_filter_threshold_sweep",
    _dialect(
        f"""
        WITH scored AS (
          SELECT doc_id,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
                 ROUND(
                   CAST(size(filter(split(lower(text), '[^a-z]+'),
                        w -> w IN {_SWEEP_STOPWORDS})) AS DOUBLE)
                   / GREATEST(size(filter(split(lower(text), '[^a-z]+'),
                        w -> length(w) > 0)), 1),
                 6) AS score
          FROM documents
        ),
        grid AS (SELECT explode(sequence(0, 9)) AS i),
        stats AS (
          SELECT ROUND(CAST(g.i AS DOUBLE) / CAST(20 AS DOUBLE), 6)
                   AS threshold,
                 CAST(SUM(CASE WHEN s.score >=
                       CAST(g.i AS DOUBLE) / CAST(20 AS DOUBLE)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                 CAST(SUM(CASE WHEN s.score >=
                       CAST(g.i AS DOUBLE) / CAST(20 AS DOUBLE)
                       AND s.is_en = 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
                 CAST(SUM(s.is_en) AS BIGINT) AS n_pos
          FROM scored s CROSS JOIN grid g
          GROUP BY g.i
        ),
        pr AS (
          SELECT threshold, n_kept, n_tp,
                 CASE WHEN n_kept > 0
                      THEN ROUND(CAST(n_tp AS DOUBLE) / n_kept, 6) END
                   AS prec,
                 CASE WHEN n_pos > 0
                      THEN ROUND(CAST(n_tp AS DOUBLE) / n_pos, 6) END
                   AS recall
          FROM stats
        )
        SELECT threshold, n_kept, n_tp, prec, recall,
               CASE WHEN prec IS NOT NULL AND recall IS NOT NULL
                         AND prec + recall > 0
                    THEN ROUND(2 * prec * recall / (prec + recall), 6)
               END AS f1
        FROM pr ORDER BY threshold
        """,
        f"""
        WITH scored AS (
          SELECT doc_id,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
                 ROUND(
                   CAST(len(list_filter(
                        string_split_regex(lower(text), '[^a-z]+'),
                        w -> w IN {_SWEEP_STOPWORDS})) AS DOUBLE)
                   / GREATEST(len(list_filter(
                        string_split_regex(lower(text), '[^a-z]+'),
                        w -> len(w) > 0)), 1),
                 6) AS score
          FROM documents
        ),
        grid AS (SELECT UNNEST(range(0, 10)) AS i),
        stats AS (
          SELECT ROUND(CAST(g.i AS DOUBLE) / CAST(20 AS DOUBLE), 6)
                   AS threshold,
                 CAST(SUM(CASE WHEN s.score >=
                       CAST(g.i AS DOUBLE) / CAST(20 AS DOUBLE)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                 CAST(SUM(CASE WHEN s.score >=
                       CAST(g.i AS DOUBLE) / CAST(20 AS DOUBLE)
                       AND s.is_en = 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
                 CAST(SUM(s.is_en) AS BIGINT) AS n_pos
          FROM scored s CROSS JOIN grid g
          GROUP BY g.i
        ),
        pr AS (
          SELECT threshold, n_kept, n_tp,
                 CASE WHEN n_kept > 0
                      THEN ROUND(CAST(n_tp AS DOUBLE) / n_kept, 6) END
                   AS prec,
                 CASE WHEN n_pos > 0
                      THEN ROUND(CAST(n_tp AS DOUBLE) / n_pos, 6) END
                   AS recall
          FROM stats
        )
        SELECT threshold, n_kept, n_tp, prec, recall,
               CASE WHEN prec IS NOT NULL AND recall IS NOT NULL
                         AND prec + recall > 0
                    THEN ROUND(2 * prec * recall / (prec + recall), 6)
               END AS f1
        FROM pr ORDER BY threshold
        """,
        "X-curation,X4+",
        "filter-threshold calibration sweep: a cheap quality score "
        "(stopword fraction) evaluated against a weak label (lang='en') "
        "across a 10-point threshold grid — kept count, precision, "
        "recall, F1 per threshold, the choose-the-cutoff table every "
        "filtering pipeline needs before committing a gate; one corpus "
        "scan, grid is a 10-row literal cross join, exact integer "
        "counts + guarded rounded ratios (0-division -> NULL in both "
        "engines)",
    ),
)


def _segment_dedup_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style corpus-level exact segment ("line") dedup as
    a TRANSFORM (operators/dedup.py dedup_exact_segments): every 10-token
    segment occurring more than once across the corpus is removed except
    its first occurrence, documents reassembled from survivors. A fixed
    10-token boilerplate header is prepended to every 7th document so
    the removal is non-vacuous (the classic repeated-header shape): ~43
    boilerplate segments collapse to one surviving copy. The oracle
    replays segmentation, first-occurrence ranking and reassembly in
    SQL and digests the rebuilt text."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.dedup import (
        dedup_exact_segments,
    )

    register_views(spark, sf_dir)
    boiler = "spark common boiler plate header line repeated across many documents"
    docs = (
        spark.table("documents")
        .filter(F.col("doc_id") < 300)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.lit(boiler + " "), F.col("text")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    out = dedup_exact_segments(docs, seg_tokens=10)
    return out.select(
        "doc_id",
        F.col("n_segs").cast("long").alias("n_segs"),
        F.col("n_kept").cast("long").alias("n_kept"),
        F.md5(F.col("clean_text").cast("binary")).alias("clean_digest"),
    ).orderBy("doc_id")


_q(
    "curation_segment_dedup",
    Query(
        _segment_dedup_spark,
        """
        WITH d0 AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0
                      THEN 'spark common boiler plate header line repeated across many documents ' || text
                      ELSE text END AS text
          FROM documents WHERE doc_id < 300
        ),
        d AS (
          SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
          FROM d0
        ),
        segs AS (
          SELECT doc_id, CAST(i AS INT) AS seg_idx,
                 array_to_string(
                   list_slice(toks, CAST(i*10+1 AS INT), CAST(i*10+10 AS INT)),
                   ' ') AS seg
          FROM d, UNNEST(range(0, GREATEST(
                 CAST(ceil(len(toks)/10.0) AS BIGINT), 1))) t(i)
        ),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY seg
                                       ORDER BY doc_id, seg_idx) AS rn
          FROM segs
        ),
        totals AS (SELECT doc_id, COUNT(*) AS n_segs FROM segs GROUP BY doc_id),
        kept AS (
          SELECT doc_id, COUNT(*) AS n_kept,
                 md5(string_agg(seg, ' ' ORDER BY seg_idx)) AS clean_digest
          FROM ranked WHERE rn = 1 GROUP BY doc_id
        )
        SELECT t.doc_id, CAST(t.n_segs AS BIGINT) AS n_segs,
               CAST(k.n_kept AS BIGINT) AS n_kept, k.clean_digest
        FROM totals t JOIN kept k USING (doc_id)
        ORDER BY doc_id
        """,
        "X2,X4+",
        "C4/RefinedWeb-style corpus-level exact segment dedup as a "
        "transform: 10-token segments, first occurrence (lowest doc/idx) "
        "kept, documents reassembled from survivors and digested; "
        "injected boilerplate headers make the removal non-vacuous; "
        "occurrence ranking shuffles on xxhash64(segment), never "
        "segment strings",
    ),
)


def _near_dedup_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.dedup import near_dedup_minhash

    register_views(spark, sf_dir)
    docs = spark.table("documents").filter(F.col("doc_id") < 80)
    out = near_dedup_minhash(docs, n=2, num_hashes=8, bands=4, threshold=0.6)
    return out.select("doc_id").orderBy("doc_id")


_q(
    "x2_lsh_near_dedup_survivors",
    Query(
        _near_dedup_spark,
        """
        WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 80),
        grams AS (
          SELECT DISTINCT doc_id,
                 array_to_string(list_slice(toks, CAST(i AS INT) + 1, CAST(i AS INT) + 2), ' ') AS gram
          FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM docs),
               UNNEST(range(0, greatest(len(toks) - 2, 0) + 1)) AS t(i)
        ),
        g AS (SELECT * FROM grams WHERE length(gram) > 0),
        hashes AS (
          SELECT g.doc_id, s.seed,
                 MIN(CAST(('0x' || SUBSTR(MD5(CAST(s.seed AS VARCHAR) || ':' || g.gram), 1, 12)) AS BIGINT)) AS minhash
          FROM g CROSS JOIN (SELECT UNNEST(range(0, 8)) AS seed) s
          GROUP BY g.doc_id, s.seed
        ),
        banded AS (
          SELECT doc_id, seed % 4 AS band,
                 array_to_string(list_sort(list(CAST(minhash AS VARCHAR))), ',') AS sig
          FROM hashes GROUP BY doc_id, seed % 4
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        ),
        inter AS (
          SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
          FROM pairs p
          JOIN g ga ON ga.doc_id = p.doc_a
          JOIN g gb ON gb.doc_id = p.doc_b AND gb.gram = ga.gram
          GROUP BY p.doc_a, p.doc_b
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
        dups AS (
          SELECT DISTINCT i.doc_b AS doc_id
          FROM inter i
          JOIN sizes sa ON sa.doc_id = i.doc_a
          JOIN sizes sb ON sb.doc_id = i.doc_b
          WHERE CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) >= 0.6
        )
        SELECT d.doc_id FROM docs d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM dups)
        ORDER BY d.doc_id
        """,
        "X2",
        "end-to-end MinHash-LSH near-dedup via the operator API "
        "(shingle -> seeded minhash -> band bucket-join -> exact Jaccard "
        "verify -> anti-join survivors); oracle reproduces every stage in SQL",
    ),
)


def _lsh_topk_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.similarity import lsh_topk

    register_views(spark, sf_dir)
    emb = spark.table("embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < 5)
    # dim is known for the test corpus; passing it skips the probe job.
    out = lsh_topk(emb, q, k=5, bits=6, tables=3, dim=64)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank"
    ).orderBy("query_id", "rank")


def _lsh_oracle_sql(*, bits: int = 6, tables: int = 3, dim: int = 64, k: int = 5) -> str:
    """DuckDB oracle for the full LSH ANN pipeline.

    The hyperplanes are data-independent and deterministic, so the SAME
    literal planes the Spark sketch bakes into its expressions are
    embedded here as a VALUES list — the oracle then reproduces sketch →
    bucket join → cosine re-rank → top-k entirely in SQL."""
    from mission_data_pipeline_spark.operators.similarity import _hyperplane

    rows = []
    for t in range(tables):
        for b in range(bits):
            plane = ", ".join(repr(x) for x in _hyperplane(t, b, dim))
            rows.append(f"({t}, {b}, [{plane}])")
    hp_values = ",\n          ".join(rows)
    return f"""
        WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        hp(tbl, bit, plane) AS (VALUES
          {hp_values}
        ),
        cb AS (
          SELECT e.vec_id AS id, hp.tbl,
                 SUM(CASE WHEN list_dot_product(e.v, hp.plane) > 0
                          THEN CAST(POW(2, hp.bit) AS BIGINT)
                          ELSE 0 END) AS bucket
          FROM e CROSS JOIN hp
          GROUP BY e.vec_id, hp.tbl
        ),
        cand AS (
          SELECT DISTINCT qb.id AS query_id, cb.id AS neighbor_id
          FROM cb JOIN (SELECT * FROM cb WHERE id < 5) qb
            ON cb.tbl = qb.tbl AND cb.bucket = qb.bucket
          WHERE cb.id != qb.id
        ),
        scored AS (
          SELECT c.query_id, c.neighbor_id,
                 list_cosine_similarity(eq.v, en.v) AS cos_raw
          FROM cand c
          JOIN e eq ON eq.vec_id = c.query_id
          JOIN e en ON en.vec_id = c.neighbor_id
        )
        SELECT query_id, neighbor_id, ROUND(cos_raw, 6) AS cosine, rank
        FROM (
          SELECT query_id, neighbor_id, cos_raw,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos_raw DESC, neighbor_id) AS rank
          FROM scored
        ) t WHERE rank <= {k}
        ORDER BY query_id, rank
        """


_q(
    "x3_lsh_topk_ann",
    Query(
        _lsh_topk_spark,
        _lsh_oracle_sql(),
        "X3",
        "approximate top-k similarity via random-hyperplane LSH buckets + "
        "exact cosine re-rank of candidates (the 100 TB scale path); the "
        "deterministic literal hyperplanes are embedded in the oracle, "
        "which replays sketch -> bucket join -> re-rank in SQL",
    ),
)


def _multimodal_features_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL bytes→features: expression-built PNG/JPEG payloads (same
    construction as x5_image_meta_decode) run through
    extract_features(decoder='real'); at dim=4 the real image feature is
    exactly [width, height, aspect, size], so the oracle recomputes every
    feature value arithmetically — the driver checks real decode math,
    not just batch plumbing."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.functions.multimodal import extract_features

    register_views(spark, sf_dir)
    doc = spark.table("documents").filter(F.col("doc_id") < 200)
    w = (F.octet_length("text") % 624 + 16).cast("bigint")
    h = (F.col("doc_id") % 464 + 16).cast("bigint")
    b32 = lambda c: F.unhex(F.lpad(F.hex(c), 8, "0"))  # noqa: E731
    b16 = lambda c: F.unhex(F.lpad(F.hex(c), 4, "0"))  # noqa: E731
    png = F.concat(
        F.lit(bytes.fromhex("89504E470D0A1A0A0000000D49484452")),
        b32(w),
        b32(h),
        F.lit(bytes.fromhex("08060000001F15C489")),
    )
    jpeg = F.concat(
        F.lit(bytes.fromhex("FFD8FFC0001108")),
        b16(h),
        b16(w),
        F.lit(bytes.fromhex("03011100021101031101FFD9")),
    )
    media = doc.select(
        F.col("doc_id").alias("item_id"),
        F.when(F.col("doc_id") % 2 == 0, png).otherwise(jpeg).alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.when(F.col("doc_id") % 2 == 0, "png").otherwise("jpeg").alias("format"),
            w.cast("int").alias("width"),
            h.cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("double").alias("duration_s"),
        ).alias("meta"),
    )
    out = extract_features(media, dim=4, decoder="real")
    f = F.col("feature")
    return out.select(
        "item_id",
        "media_type",
        "n_bytes",
        # feature elements are float32; cast to double before rounding and
        # round aspect to 3 digits (inside float32's ~7 significant digits)
        # so the exact-arithmetic oracle lands on the same value
        F.round(f[0].cast("double"), 6).alias("feat_width"),
        F.round(f[1].cast("double"), 6).alias("feat_height"),
        F.round(f[2].cast("double"), 3).alias("feat_aspect"),
        F.round(f[3].cast("double"), 6).alias("feat_size"),
    ).orderBy("item_id")


_q(
    "x5_multimodal_features",
    Query(
        _multimodal_features_spark,
        """
        WITH d AS (
          SELECT doc_id,
                 CAST(octet_length(text::BLOB) % 624 + 16 AS DOUBLE) AS w,
                 CAST(doc_id % 464 + 16 AS DOUBLE) AS h,
                 CAST(CASE WHEN doc_id % 2 = 0 THEN 33 ELSE 23 END AS BIGINT)
                   AS n_bytes
          FROM documents WHERE doc_id < 200
        )
        SELECT doc_id AS item_id, 'image' AS media_type, n_bytes,
               ROUND(w, 6) AS feat_width,
               ROUND(h, 6) AS feat_height,
               ROUND(w / h, 3) AS feat_aspect,
               ROUND(CAST(n_bytes AS DOUBLE), 6) AS feat_size
        FROM d
        ORDER BY item_id
        """,
        "X5",
        "REAL bytes→features over Arrow batches: decoder='real' parses the "
        "expression-built PNG/JPEG payloads (probe_image_meta) and emits "
        "[width, height, aspect, size]; the oracle recomputes every "
        "feature value arithmetically from the generator",
    ),
)


def _image_pixel_stats_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG pixel decode (zlib IDAT inflate + NumPy unfilter —
    functions/multimodal.py decode_png_pixels): 60 fixture PNGs with
    pixel(id,x,y,c) = (id + 7x + 13y + 31c) mod 256, varied sizes and
    color types, and per-row scanline filters cycling through ALL five
    PNG filter types — so the decoder must invert Sub/Up/Average/Paeth,
    not just pass raw rows through. Every fifth image is corrupted
    (truncated) and must come back as a null-stats sentinel row.
    The oracle recomputes the pixel statistics arithmetically from the
    generator formula, never touching PNG bytes."""
    import numpy as np

    from mission_data_pipeline_spark.functions.multimodal import (
        encode_png,
        image_pixel_stats,
    )

    rows = []
    for i in range(60):
        w, h = i % 13 + 4, i % 11 + 3
        c = (1, 3, 2, 4)[i % 4]
        xs = np.arange(w)[None, :, None]
        ys = np.arange(h)[:, None, None]
        cs = np.arange(c)[None, None, :]
        px = ((i + 7 * xs + 13 * ys + 31 * cs) % 256).astype(np.uint8)
        payload = encode_png(px, filters=[(i + y) % 5 for y in range(h)])
        if i % 5 == 4:
            payload = payload[: len(payload) // 2]  # corrupt: truncated
        rows.append((i, bytearray(payload)))
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    return image_pixel_stats(media).orderBy("item_id")


_q(
    "x5_image_pixel_stats",
    Query(
        _image_pixel_stats_spark,
        """
        WITH imgs AS (
          SELECT i AS item_id, i % 13 + 4 AS w, i % 11 + 3 AS h,
                 CASE i % 4 WHEN 0 THEN 1 WHEN 1 THEN 3
                            WHEN 2 THEN 2 ELSE 4 END AS ch,
                 i % 5 = 4 AS corrupt
          FROM range(0, 60) t(i)
        ),
        px AS (
          SELECT item_id, w, h, ch,
                 (item_id + 7*x + 13*y + 31*c) % 256 AS v
          FROM imgs, range(0, 16) xs(x), range(0, 13) ys(y), range(0, 4) cs(c)
          WHERE x < w AND y < h AND c < ch AND NOT corrupt
        ),
        stats AS (
          SELECT item_id,
                 CAST(SUM(v) AS BIGINT) AS px_sum,
                 CAST(MIN(v) AS INT) AS px_min,
                 CAST(MAX(v) AS INT) AS px_max,
                 ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS px_mean
          FROM px GROUP BY item_id
        )
        SELECT i.item_id,
               CASE WHEN corrupt THEN NULL ELSE CAST(w AS INT) END AS width,
               CASE WHEN corrupt THEN NULL ELSE CAST(h AS INT) END AS height,
               CASE WHEN corrupt THEN NULL ELSE CAST(ch AS INT) END AS channels,
               s.px_sum, s.px_min, s.px_max, s.px_mean
        FROM imgs i LEFT JOIN stats s USING (item_id)
        ORDER BY i.item_id
        """,
        "X5",
        "REAL PNG pixel decode: stdlib-zlib IDAT inflate + NumPy scanline "
        "unfilter (all five filter types exercised via the fixture's "
        "per-row filter cycle); truncated payloads yield null sentinels; "
        "oracle recomputes pixel sums/extrema from the generator formula",
    ),
)


def _jpeg_pixel_stats_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG entropy decode (functions/jpeg.py — Huffman
    decode, dequantize, matmul-IDCT, chroma upsample, YCbCr→RGB, all
    pure stdlib + NumPy): 60 fixture JPEGs — grayscale and RGB flat
    colors across qualities {50, 75, 90}, 4:4:4 / 4:2:2 / 4:2:0 chroma
    subsampling, restart intervals 0-3 and non-multiple-of-8 sizes, so
    the decoder exercises every baseline structure. FLAT colors because
    the uniform-block quantization round-trip is exact scalar
    arithmetic: the oracle recomputes every decoded sample value from
    the spec formulas (quality-scaled Annex K q[0,0], half-up rounding,
    the 1e-3 determinism snap, BT.601 both directions) — it never
    touches JPEG bytes. Every fifth payload is truncated and must come
    back as a null-stats sentinel. Gradient/tolerance coverage lives in
    tests/test_jpeg.py; this query pins the exact arithmetic contract."""
    import numpy as np

    from mission_data_pipeline_spark.functions.jpeg import encode_jpeg
    from mission_data_pipeline_spark.functions.multimodal import (
        image_pixel_stats,
    )

    rows = []
    for i in range(60):
        w, h = i % 13 + 3, i % 11 + 2
        quality = (50, 75, 90)[i % 3]
        if i % 2 == 0:
            px = np.full((h, w), (i * 37 + 11) % 256, dtype=np.uint8)
            payload = encode_jpeg(px, quality=quality)
        else:
            rgb = ((i * 53) % 256, (i * 101 + 3) % 256, (i * 29 + 180) % 256)
            px = np.full((h, w, 3), rgb, dtype=np.uint8)
            payload = encode_jpeg(
                px,
                quality=quality,
                subsample=((1, 1), (2, 1), (2, 2))[i % 3],
                restart_interval=i % 4,
            )
        if i % 5 == 4:
            payload = payload[: len(payload) // 2]  # corrupt: truncated
        rows.append((i, bytearray(payload)))
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    return image_pixel_stats(media).orderBy("item_id")


_q(
    "x5_jpeg_pixel_stats",
    Query(
        _jpeg_pixel_stats_spark,
        """
        WITH imgs AS (
          SELECT i AS item_id, i % 13 + 3 AS w, i % 11 + 2 AS h,
                 CASE i % 3 WHEN 0 THEN 50 WHEN 1 THEN 75 ELSE 90 END AS q,
                 i % 2 = 0 AS gray,
                 i % 5 = 4 AS corrupt,
                 CAST((i*37 + 11) % 256 AS DOUBLE) AS v,
                 CAST((i*53) % 256 AS DOUBLE) AS r,
                 CAST((i*101 + 3) % 256 AS DOUBLE) AS g,
                 CAST((i*29 + 180) % 256 AS DOUBLE) AS b
          FROM range(0, 60) t(i)
        ),
        qq AS (
          SELECT *,
                 LEAST(255, GREATEST(1, (16*scale + 50) // 100)) AS q0l,
                 LEAST(255, GREATEST(1, (17*scale + 50) // 100)) AS q0c
          FROM (SELECT *, CASE WHEN q < 50 THEN 5000 // q
                               ELSE 200 - 2*q END AS scale FROM imgs)
        ),
        ycc AS (
          SELECT *,
                 0.299*r + 0.587*g + 0.114*b AS yy,
                 -0.168736*r - 0.331264*g + 0.5*b + 128.0 AS cb,
                 0.5*r - 0.418688*g - 0.081312*b + 128.0 AS cr
          FROM qq
        ),
        -- decode one FLAT component: encoder coef snap -> quantize ->
        -- dequantize -> decoder snap -> +128 level shift, half-up, clamp
        dec AS (
          SELECT *,
            LEAST(255.0, GREATEST(0.0, FLOOR(FLOOR((FLOOR(FLOOR(8.0*(v - 128.0)*1000 + 0.5)/1000.0/q0l + 0.5)*q0l/8.0)*1000 + 0.5)/1000.0 + 128.0 + 0.5))) AS sv,
            LEAST(255.0, GREATEST(0.0, FLOOR(FLOOR((FLOOR(FLOOR(8.0*(yy - 128.0)*1000 + 0.5)/1000.0/q0l + 0.5)*q0l/8.0)*1000 + 0.5)/1000.0 + 128.0 + 0.5))) AS syv,
            LEAST(255.0, GREATEST(0.0, FLOOR(FLOOR((FLOOR(FLOOR(8.0*(cb - 128.0)*1000 + 0.5)/1000.0/q0c + 0.5)*q0c/8.0)*1000 + 0.5)/1000.0 + 128.0 + 0.5))) AS scb,
            LEAST(255.0, GREATEST(0.0, FLOOR(FLOOR((FLOOR(FLOOR(8.0*(cr - 128.0)*1000 + 0.5)/1000.0/q0c + 0.5)*q0c/8.0)*1000 + 0.5)/1000.0 + 128.0 + 0.5))) AS scr
          FROM ycc
        ),
        rgb AS (
          SELECT *,
            LEAST(255.0, GREATEST(0.0, FLOOR(syv + 1.402*(scr - 128.0) + 0.5))) AS dr,
            LEAST(255.0, GREATEST(0.0, FLOOR(syv - 0.344136*(scb - 128.0) - 0.714136*(scr - 128.0) + 0.5))) AS dg,
            LEAST(255.0, GREATEST(0.0, FLOOR(syv + 1.772*(scb - 128.0) + 0.5))) AS db
          FROM dec
        )
        SELECT item_id,
          CASE WHEN corrupt THEN NULL ELSE CAST(w AS INT) END AS width,
          CASE WHEN corrupt THEN NULL ELSE CAST(h AS INT) END AS height,
          CASE WHEN corrupt THEN NULL
               ELSE CAST(CASE WHEN gray THEN 1 ELSE 3 END AS INT) END AS channels,
          CASE WHEN corrupt THEN NULL
               ELSE CAST(w*h*CASE WHEN gray THEN sv ELSE dr + dg + db END AS BIGINT)
               END AS px_sum,
          CASE WHEN corrupt THEN NULL
               ELSE CAST(CASE WHEN gray THEN sv
                              ELSE LEAST(dr, dg, db) END AS INT) END AS px_min,
          CASE WHEN corrupt THEN NULL
               ELSE CAST(CASE WHEN gray THEN sv
                              ELSE GREATEST(dr, dg, db) END AS INT) END AS px_max,
          CASE WHEN corrupt THEN NULL
               ELSE ROUND(CASE WHEN gray THEN sv
                               ELSE (dr + dg + db)/3.0 END, 6) END AS px_mean
        FROM rgb
        ORDER BY item_id
        """,
        "X5",
        "REAL baseline-JPEG entropy decode (pure stdlib+NumPy Huffman/"
        "IDCT, functions/jpeg.py): flat-color fixtures across qualities, "
        "chroma subsampling modes, restart markers and odd sizes; the "
        "oracle recomputes every decoded sample from the spec arithmetic "
        "(quality-scaled Annex K tables, half-up rounding, BT.601) and "
        "truncated payloads must yield null sentinels",
    ),
)


def _image_resize_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize (functions/multimodal.py resize_images):
    40 fixture PNGs with pixel(id,x,y,c) = (id + 3x + 5y + 7c) mod 256
    across mixed sizes (both up- and down-scales) and all four color
    types, nearest-neighbor resampled to 8x6 and re-encoded as PNG.
    The floor mapping src = (dst * src_size) // dst_size is pure
    integer arithmetic, so the oracle recomputes every RESIZED pixel
    value from the generator formula — exact stats, no tolerance.
    Every sixth payload is corrupted and must come back null."""
    import numpy as np

    from mission_data_pipeline_spark.functions.multimodal import (
        encode_png,
        resize_images,
    )

    rows = []
    for i in range(40):
        sw, sh = i % 11 + 4, i % 9 + 3
        c = (1, 3, 2, 4)[i % 4]
        xs = np.arange(sw)[None, :, None]
        ys = np.arange(sh)[:, None, None]
        cs = np.arange(c)[None, None, :]
        px = ((i + 3 * xs + 5 * ys + 7 * cs) % 256).astype(np.uint8)
        payload = encode_png(px)
        if i % 6 == 5:
            payload = payload[: len(payload) // 2]
        rows.append((i, bytearray(payload)))
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    out = resize_images(media, width=8, height=6)
    return out.select(
        "item_id", "width", "height", "channels",
        "px_sum", "px_min", "px_max",
    ).orderBy("item_id")


_q(
    "x5_image_resize",
    Query(
        _image_resize_spark,
        """
        WITH imgs AS (
          SELECT i AS item_id, i % 11 + 4 AS sw, i % 9 + 3 AS sh,
                 CASE i % 4 WHEN 0 THEN 1 WHEN 1 THEN 3
                            WHEN 2 THEN 2 ELSE 4 END AS ch,
                 i % 6 = 5 AS corrupt
          FROM range(0, 40) t(i)
        ),
        px AS (
          SELECT item_id, ch,
                 (item_id + 3*((x*sw)//8) + 5*((y*sh)//6) + 7*c) % 256 AS v
          FROM imgs, range(0, 8) xs(x), range(0, 6) ys(y), range(0, 4) cs(c)
          WHERE c < ch AND NOT corrupt
        ),
        stats AS (
          SELECT item_id,
                 CAST(SUM(v) AS BIGINT) AS px_sum,
                 CAST(MIN(v) AS INT) AS px_min,
                 CAST(MAX(v) AS INT) AS px_max
          FROM px GROUP BY item_id
        )
        SELECT i.item_id,
               CASE WHEN corrupt THEN NULL ELSE CAST(8 AS INT) END AS width,
               CASE WHEN corrupt THEN NULL ELSE CAST(6 AS INT) END AS height,
               CASE WHEN corrupt THEN NULL ELSE CAST(ch AS INT) END AS channels,
               s.px_sum, s.px_min, s.px_max
        FROM imgs i LEFT JOIN stats s USING (item_id)
        ORDER BY i.item_id
        """,
        "X5",
        "REAL nearest-neighbor image resize (decode → integer-floor "
        "resample → lossless PNG re-encode, Arrow-batched): the floor "
        "mapping is pure integer arithmetic, so the oracle recomputes "
        "every resized pixel from the generator formula; corrupt "
        "payloads yield null sentinels",
    ),
)


def _audio_sample_stats_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PCM WAV sample decode (functions/multimodal.py
    decode_wav_samples — RIFF chunk walk + NumPy sample view, stdlib
    only): 50 fixture WAVs with sample(k,i,c) = ((k*7 + i*37 + c*101)
    mod 4001) - 2000, varied frame counts / channel counts / rates;
    every sixth payload is corrupted (truncated) and must come back as
    a null-stats sentinel. Oracle recomputes the exact integer sample
    statistics from the generator formula — it never touches WAV bytes."""
    import numpy as np

    from mission_data_pipeline_spark.functions.multimodal import (
        audio_sample_stats,
        encode_wav,
    )

    rows = []
    for k in range(50):
        frames, ch = k % 40 + 10, k % 2 + 1
        rate = 8000 + 100 * k
        i = np.arange(frames)[:, None]
        c = np.arange(ch)[None, :]
        s = (((k * 7 + i * 37 + c * 101) % 4001) - 2000).astype("<i2")
        payload = encode_wav(s, rate=rate)
        if k % 6 == 5:
            payload = payload[: len(payload) // 2]
        rows.append((k, bytearray(payload)))
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    return audio_sample_stats(media).orderBy("item_id")


_q(
    "x5_audio_sample_stats",
    Query(
        _audio_sample_stats_spark,
        """
        WITH wavs AS (
          SELECT k AS item_id, k % 40 + 10 AS frames, k % 2 + 1 AS ch,
                 8000 + 100 * k AS rate, k % 6 = 5 AS corrupt
          FROM range(0, 50) t(k)
        ),
        smp AS (
          SELECT item_id,
                 ((item_id * 7 + i * 37 + c * 101) % 4001) - 2000 AS v
          FROM wavs, range(0, 50) fi(i), range(0, 2) ci(c)
          WHERE i < frames AND c < ch AND NOT corrupt
        ),
        stats AS (
          SELECT item_id,
                 CAST(SUM(v) AS BIGINT) AS s_sum,
                 CAST(MIN(v) AS INT) AS s_min,
                 CAST(MAX(v) AS INT) AS s_max,
                 CAST(SUM(v * v) AS BIGINT) AS s_sumsq
          FROM smp GROUP BY item_id
        )
        SELECT w.item_id,
               CASE WHEN corrupt THEN NULL ELSE CAST(frames AS BIGINT) END
                 AS n_frames,
               CASE WHEN corrupt THEN NULL ELSE CAST(ch AS INT) END
                 AS n_channels,
               CASE WHEN corrupt THEN NULL ELSE CAST(rate AS INT) END
                 AS sample_rate,
               s.s_sum, s.s_min, s.s_max, s.s_sumsq
        FROM wavs w LEFT JOIN stats s USING (item_id)
        ORDER BY w.item_id
        """,
        "X5",
        "REAL PCM WAV sample decode: RIFF walk + NumPy sample view, "
        "exact integer statistics; truncated payloads yield null "
        "sentinels; oracle recomputes every value from the generator "
        "formula",
    ),
)


def _g711_sample_stats_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-audio decode #1: G.711 mu-law and A-law WAVs
    (format tags 7/6, functions/audio_codecs.py). 48 fixtures whose
    coded byte j is (k*31 + j*17) mod 256, mixed mono/stereo, every
    seventh truncated mid-data-chunk (null sentinel). G.711 decode is
    a stateless integer formula per byte (CCITT reference arithmetic),
    so the ORACLE DECODES THE CODEC ITSELF in SQL — it recomputes
    every linear sample from the coded byte value, not from a staged
    table."""
    from mission_data_pipeline_spark.functions.audio_codecs import (
        encode_wav_g711,
    )
    from mission_data_pipeline_spark.functions.multimodal import (
        audio_sample_stats,
    )

    rows = []
    for k in range(48):
        frames = k % 30 + 8
        ch = 2 if k % 3 == 0 else 1
        coded = bytes((k * 31 + j * 17) % 256 for j in range(frames * ch))
        payload = encode_wav_g711(
            coded, rate=8000, channels=ch, alaw=(k % 2 == 1)
        )
        if k % 7 == 6:
            payload = payload[: len(payload) // 2]
        rows.append((k, bytearray(payload)))
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    return audio_sample_stats(media).orderBy("item_id")


_q(
    "x5_g711_sample_stats",
    Query(
        _g711_sample_stats_spark,
        """
        WITH wavs AS (
          SELECT k AS item_id, k % 30 + 8 AS frames,
                 CASE WHEN k % 3 = 0 THEN 2 ELSE 1 END AS ch,
                 k % 2 = 1 AS alaw, k % 7 = 6 AS corrupt
          FROM range(0, 48) t(k)
        ),
        coded AS (
          SELECT item_id, alaw, (item_id*31 + j*17) % 256 AS b
          FROM wavs, range(0, 80) bj(j)
          WHERE j < frames * ch AND NOT corrupt
        ),
        -- G.711 decode in SQL: mu-law via the CCITT biased-shift
        -- formula on the complemented byte; A-law via the 0x55-inverted
        -- segment formula with the seg 0/1 special cases
        dec AS (
          SELECT item_id,
            CASE WHEN NOT alaw THEN
              CASE WHEN (255 - b) >= 128
                   THEN 132 - ((((255-b) % 16) * 8 + 132)
                               * (1 << (((255-b)//16) % 8)))
                   ELSE (((255-b) % 16) * 8 + 132)
                        * (1 << (((255-b)//16) % 8)) - 132 END
            ELSE
              CASE WHEN xor(b, 85) >= 128 THEN 1 ELSE -1 END *
              CASE (xor(b, 85)//16) % 8
                WHEN 0 THEN (xor(b, 85) % 16) * 16 + 8
                WHEN 1 THEN (xor(b, 85) % 16) * 16 + 264
                ELSE ((xor(b, 85) % 16) * 16 + 264)
                     * (1 << ((xor(b, 85)//16) % 8 - 1))
              END
            END AS v
          FROM coded
        ),
        stats AS (
          SELECT item_id,
                 CAST(SUM(v) AS BIGINT) AS s_sum,
                 CAST(MIN(v) AS INT) AS s_min,
                 CAST(MAX(v) AS INT) AS s_max,
                 CAST(SUM(v * v) AS BIGINT) AS s_sumsq
          FROM dec GROUP BY item_id
        )
        SELECT w.item_id,
               CASE WHEN corrupt THEN NULL ELSE CAST(frames AS BIGINT) END
                 AS n_frames,
               CASE WHEN corrupt THEN NULL ELSE CAST(ch AS INT) END
                 AS n_channels,
               CASE WHEN corrupt THEN NULL ELSE CAST(8000 AS INT) END
                 AS sample_rate,
               s.s_sum, s.s_min, s.s_max, s.s_sumsq
        FROM wavs w LEFT JOIN stats s USING (item_id)
        ORDER BY w.item_id
        """,
        "X5",
        "REAL G.711 mu-law/A-law decode (ITU-T tables as pure integer "
        "arithmetic): the oracle re-derives every decoded sample from "
        "the coded byte in SQL — the codec itself is cross-checked, "
        "not just the statistics",
    ),
)


def _adpcm_sample_stats_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-audio decode #2: IMA/DVI ADPCM (WAV tag 0x11,
    4 bits/sample, functions/audio_codecs.py). 24 mono fixtures with
    formula-generated block headers (predictor, step index) and nibble
    bytes, varied block sizes; every fifth trims via the fact chunk and
    every seventh is truncated (null sentinel). ADPCM decode is a
    per-block integer recursion over the 89-entry step table — the
    oracle replays the SAME state machine as a recursive CTE, so every
    decoded sample is re-derived in SQL from the coded nibbles."""
    import struct as _s

    from mission_data_pipeline_spark.functions.audio_codecs import (
        encode_wav_ima_adpcm,
        ima_samples_per_block,
    )
    from mission_data_pipeline_spark.functions.multimodal import (
        audio_sample_stats,
    )

    rows = []
    for k in range(24):
        groups = k % 3 + 1
        block_align = 4 + 4 * groups
        spb = ima_samples_per_block(block_align, 1)
        n_blocks = k % 4 + 2
        blocks = b""
        for blk in range(n_blocks):
            pred0 = ((k * 911 + blk * 257) % 65536) - 32768
            idx0 = (k * 7 + blk * 11) % 89
            body = bytes(
                (k * 13 + blk * 29 + j * 23) % 256
                for j in range(block_align - 4)
            )
            blocks += _s.pack("<hBB", pred0, idx0, 0) + body
        n_frames = n_blocks * spb - (3 if k % 5 == 4 else 0)
        payload = encode_wav_ima_adpcm(
            blocks, rate=11025, channels=1,
            block_align=block_align, n_frames=n_frames,
        )
        if k % 7 == 6:
            payload = payload[: len(payload) // 2]
        rows.append((k, bytearray(payload)))
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    return audio_sample_stats(media).orderBy("item_id")


_q(
    "x5_adpcm_sample_stats",
    Query(
        _adpcm_sample_stats_spark,
        """
        WITH RECURSIVE steptab AS (
          SELECT list_value(
            7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
            34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
            143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
            449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
            1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
            3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
            9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
            22385, 24623, 27086, 29794, 32767) AS steps
        ),
        wavs AS (
          SELECT k AS item_id, k % 3 + 1 AS groups,
                 (k % 3 + 1) * 8 + 1 AS spb, k % 4 + 2 AS n_blocks,
                 k % 7 = 6 AS corrupt, k % 5 = 4 AS trimmed
          FROM range(0, 24) t(k)
        ),
        blocks AS (
          SELECT item_id, spb, blk,
                 ((item_id*911 + blk*257) % 65536) - 32768 AS pred0,
                 (item_id*7 + blk*11) % 89 AS idx0
          FROM wavs, range(0, 5) bb(blk)
          WHERE blk < n_blocks AND NOT corrupt
        ),
        -- replay the IMA state machine: nibble s (0-based) comes from
        -- body byte s//2 (low nibble first); body byte j of block blk is
        -- (item*13 + blk*29 + j*23) mod 256
        dec AS (
          SELECT item_id, spb, blk, 0 AS s,
                 CAST(pred0 AS INT) AS pred, CAST(idx0 AS INT) AS idx
          FROM blocks
          UNION ALL
          SELECT item_id, spb, blk, s + 1,
                 GREATEST(-32768, LEAST(32767,
                   pred + CASE WHEN nib >= 8 THEN -d ELSE d END)),
                 GREATEST(0, LEAST(88, idx +
                   CASE WHEN nib % 8 < 4 THEN -1
                        ELSE (nib % 8 - 3) * 2 END))
          FROM (
            SELECT q.*,
                   (step//8) + CASE WHEN nib % 2 = 1 THEN step//4 ELSE 0 END
                             + CASE WHEN (nib//2) % 2 = 1 THEN step//2 ELSE 0 END
                             + CASE WHEN (nib//4) % 2 = 1 THEN step ELSE 0 END AS d
            FROM (
              SELECT dec.*,
                     CASE WHEN s % 2 = 0
                          THEN ((item_id*13 + blk*29 + (s//2)*23) % 256) % 16
                          ELSE ((item_id*13 + blk*29 + (s//2)*23) % 256) // 16
                     END AS nib,
                     steptab.steps[idx + 1] AS step
              FROM dec, steptab
            ) q
          ) WHERE s < spb - 1
        ),
        kept AS (
          SELECT d.item_id, d.pred AS v
          FROM dec d JOIN wavs w ON d.item_id = w.item_id
          WHERE d.blk * d.spb + d.s
                < w.n_blocks * w.spb - CASE WHEN w.trimmed THEN 3 ELSE 0 END
        ),
        stats AS (
          SELECT item_id,
                 CAST(SUM(v) AS BIGINT) AS s_sum,
                 CAST(MIN(v) AS INT) AS s_min,
                 CAST(MAX(v) AS INT) AS s_max,
                 CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS s_sumsq
          FROM kept GROUP BY item_id
        )
        SELECT w.item_id,
               CASE WHEN corrupt THEN NULL
                    ELSE CAST(n_blocks * spb
                              - CASE WHEN trimmed THEN 3 ELSE 0 END
                              AS BIGINT) END AS n_frames,
               CASE WHEN corrupt THEN NULL ELSE CAST(1 AS INT) END
                 AS n_channels,
               CASE WHEN corrupt THEN NULL ELSE CAST(11025 AS INT) END
                 AS sample_rate,
               s.s_sum, s.s_min, s.s_max, s.s_sumsq
        FROM wavs w LEFT JOIN stats s USING (item_id)
        ORDER BY w.item_id
        """,
        "X5",
        "REAL IMA/DVI ADPCM decode (89-entry step table, per-nibble "
        "predictor recursion): the oracle replays the codec's state "
        "machine as a recursive CTE over the formula-generated nibble "
        "stream — fact-chunk trimming and truncation sentinels included",
    ),
)


def _video_frame_stats_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video sample decode: MJPEG-in-AVI containers
    (functions/avi.py) whose frames are flat-color baseline JPEGs from
    the repo's own codec (functions/jpeg.py). 36 fixture videos across
    sizes, frame counts, gray/color and qualities {50,75,90}; every
    sixth payload is corrupted (null sentinel row). The operator
    parses the container, decodes EVERY sampled frame's pixels and
    emits exact integer stats per frame (1 row in → n_frames rows
    out). Flat-color frames make the JPEG quantization round-trip
    exact scalar arithmetic (same trick as x5_jpeg_pixel_stats), so
    the oracle recomputes every decoded frame from the spec formulas."""
    import numpy as np

    from mission_data_pipeline_spark.functions.avi import encode_avi_mjpeg
    from mission_data_pipeline_spark.functions.jpeg import encode_jpeg
    from mission_data_pipeline_spark.functions.multimodal import (
        video_frame_stats,
    )

    rows = []
    for k in range(36):
        w, h = k % 10 + 3, k % 7 + 2
        nf = k % 5 + 2
        q = (50, 75, 90)[k % 3]
        frames = []
        for f in range(nf):
            if k % 2 == 0:
                px = np.full(
                    (h, w), (k * 37 + f * 41 + 11) % 256, dtype=np.uint8
                )
            else:
                px = np.full(
                    (h, w, 3),
                    [
                        (k * 53 + f * 19) % 256,
                        (k * 101 + f * 43 + 3) % 256,
                        (k * 29 + f * 7 + 180) % 256,
                    ],
                    dtype=np.uint8,
                )
            frames.append(encode_jpeg(px, quality=q))
        payload = encode_avi_mjpeg(frames, width=w, height=h)
        if k % 6 == 5:
            payload = payload[:10]
        rows.append((k, bytearray(payload)))
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    return video_frame_stats(media, every_n=1, max_frames=32).orderBy(
        "item_id", "frame_idx"
    )


_q(
    "x5_video_frame_stats",
    Query(
        _video_frame_stats_spark,
        """
        WITH vids AS (
          SELECT k AS item_id, k % 10 + 3 AS w, k % 7 + 2 AS h,
                 k % 5 + 2 AS nf,
                 CASE k % 3 WHEN 0 THEN 50 WHEN 1 THEN 75 ELSE 90 END AS q,
                 k % 2 = 0 AS gray, k % 6 = 5 AS corrupt
          FROM range(0, 36) t(k)
        ),
        frames AS (
          SELECT item_id, w, h, q, gray, f,
                 CAST((item_id*37 + f*41 + 11) % 256 AS DOUBLE) AS v,
                 CAST((item_id*53 + f*19) % 256 AS DOUBLE) AS r,
                 CAST((item_id*101 + f*43 + 3) % 256 AS DOUBLE) AS g,
                 CAST((item_id*29 + f*7 + 180) % 256 AS DOUBLE) AS b
          FROM vids, range(0, 6) ff(f)
          WHERE f < nf AND NOT corrupt
        ),
        qq AS (
          SELECT *,
                 LEAST(255, GREATEST(1, (16*scale + 50) // 100)) AS q0l,
                 LEAST(255, GREATEST(1, (17*scale + 50) // 100)) AS q0c
          FROM (SELECT *, CASE WHEN q < 50 THEN 5000 // q
                               ELSE 200 - 2*q END AS scale FROM frames)
        ),
        ycc AS (
          SELECT *,
                 0.299*r + 0.587*g + 0.114*b AS yy,
                 -0.168736*r - 0.331264*g + 0.5*b + 128.0 AS cb,
                 0.5*r - 0.418688*g - 0.081312*b + 128.0 AS cr
          FROM qq
        ),
        dec AS (
          SELECT *,
            LEAST(255.0, GREATEST(0.0, FLOOR(FLOOR((FLOOR(FLOOR(8.0*(v - 128.0)*1000 + 0.5)/1000.0/q0l + 0.5)*q0l/8.0)*1000 + 0.5)/1000.0 + 128.0 + 0.5))) AS sv,
            LEAST(255.0, GREATEST(0.0, FLOOR(FLOOR((FLOOR(FLOOR(8.0*(yy - 128.0)*1000 + 0.5)/1000.0/q0l + 0.5)*q0l/8.0)*1000 + 0.5)/1000.0 + 128.0 + 0.5))) AS syv,
            LEAST(255.0, GREATEST(0.0, FLOOR(FLOOR((FLOOR(FLOOR(8.0*(cb - 128.0)*1000 + 0.5)/1000.0/q0c + 0.5)*q0c/8.0)*1000 + 0.5)/1000.0 + 128.0 + 0.5))) AS scb,
            LEAST(255.0, GREATEST(0.0, FLOOR(FLOOR((FLOOR(FLOOR(8.0*(cr - 128.0)*1000 + 0.5)/1000.0/q0c + 0.5)*q0c/8.0)*1000 + 0.5)/1000.0 + 128.0 + 0.5))) AS scr
          FROM ycc
        ),
        rgb AS (
          SELECT *,
            LEAST(255.0, GREATEST(0.0, FLOOR(syv + 1.402*(scr - 128.0) + 0.5))) AS dr,
            LEAST(255.0, GREATEST(0.0, FLOOR(syv - 0.344136*(scb - 128.0) - 0.714136*(scr - 128.0) + 0.5))) AS dg,
            LEAST(255.0, GREATEST(0.0, FLOOR(syv + 1.772*(scb - 128.0) + 0.5))) AS db
          FROM dec
        ),
        ok AS (
          SELECT item_id, CAST(f AS INT) AS frame_idx,
                 CAST(w AS INT) AS width, CAST(h AS INT) AS height,
                 CAST(CASE WHEN gray THEN 1 ELSE 3 END AS INT) AS channels,
                 CAST(w*h*CASE WHEN gray THEN sv ELSE dr + dg + db END
                      AS BIGINT) AS px_sum,
                 CAST(CASE WHEN gray THEN sv ELSE LEAST(dr, dg, db) END
                      AS INT) AS px_min,
                 CAST(CASE WHEN gray THEN sv ELSE GREATEST(dr, dg, db) END
                      AS INT) AS px_max
          FROM rgb
        ),
        bad AS (
          SELECT item_id, CAST(NULL AS INT) AS frame_idx,
                 CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height,
                 CAST(NULL AS INT) AS channels,
                 CAST(NULL AS BIGINT) AS px_sum,
                 CAST(NULL AS INT) AS px_min, CAST(NULL AS INT) AS px_max
          FROM vids WHERE corrupt
        )
        SELECT * FROM ok UNION ALL SELECT * FROM bad
        ORDER BY item_id, frame_idx
        """,
        "X5",
        "REAL MJPEG-in-AVI video sample decode: container chunk walk + "
        "per-frame baseline-JPEG pixel decode, 1-to-many frame fan-out; "
        "the oracle recomputes every decoded frame from the JPEG spec "
        "arithmetic and corrupt containers must yield null sentinels",
    ),
)


def _decode_matrix_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2-T6 golden matrix: 256 deterministic byte payloads decoded by the
    expression-only decoders (functions/decode.py); the oracle recomputes
    every expected value arithmetically from the row index, so the driver
    (not just pytest) guards the signed/uint64/float bit-twiddling."""
    import struct as _s

    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.functions.decode import (
        decode_bool,
        decode_float,
        decode_hex,
        decode_int,
        decode_string,
        decode_uint,
    )

    rows = []
    for i in range(256):
        u32 = (i * 0x01020304 + 0x80000000) % (1 << 32)
        u64 = (i * 0x0102030405060708 + (1 << 63)) % (1 << 64)
        label = (chr(65 + i % 26) * (1 + i % 3)).ljust(4, "\x00")
        payload = (
            _s.pack(">BH", i, i * 257)
            + _s.pack("<H", i * 259 % 65536)
            + _s.pack(">I", u32)
            + _s.pack(">Q", u64)
            + _s.pack(">f", i - 100.5)
            + _s.pack("<d", i * 0.001 - 1.0)
            + bytes([i % 3])
            + label.encode("ascii")
        )
        rows.append((i, payload))
    df = spark.createDataFrame(rows, "i long, payload binary")
    p = F.col("payload")
    return df.select(
        "i",
        decode_uint(p, 0, 1).alias("u8"),
        decode_uint(p, 1, 2).alias("u16_be"),
        decode_uint(p, 3, 2, little_endian=True).alias("u16_le"),
        decode_int(p, 0, 1).alias("i8"),
        decode_int(p, 3, 2, little_endian=True).alias("i16_le"),
        decode_uint(p, 5, 4).alias("u32_be"),
        decode_int(p, 5, 4).alias("i32_be"),
        # u64 rendered as STRING in both dialects: DECIMAL(20,0) is exact on
        # both engines but their decimal value representations hash
        # differently in the driver compare (VERDICT r2 §What's-wrong #3).
        decode_uint(p, 9, 8).cast("string").alias("u64_be"),
        decode_int(p, 9, 8).alias("i64_be"),
        decode_float(p, 17, 4).alias("f32_be"),
        decode_float(p, 21, 8, little_endian=True).alias("f64_le"),
        decode_bool(p, 29).alias("flag"),
        decode_string(p, 30, 4).alias("label"),
        decode_hex(p, 0, 3).alias("raw_hex"),
    ).orderBy("i")


_q(
    "decode_golden_matrix",
    Query(
        _decode_matrix_spark,
        """
        WITH t AS (
          SELECT i,
                 (i * 16909060 + 2147483648) % 4294967296 AS u32,
                 (CAST(i AS HUGEINT) * 72623859790382856
                    + CAST(9223372036854775808 AS HUGEINT))
                   % CAST(18446744073709551616 AS HUGEINT) AS u64
          FROM range(0, 256) r(i)
        )
        SELECT CAST(i AS BIGINT) AS i,
               CAST(i AS BIGINT) AS u8,
               CAST(i * 257 AS BIGINT) AS u16_be,
               CAST(i * 259 % 65536 AS BIGINT) AS u16_le,
               CAST(CASE WHEN i >= 128 THEN i - 256 ELSE i END AS BIGINT) AS i8,
               CAST(CASE WHEN i * 259 % 65536 >= 32768
                         THEN i * 259 % 65536 - 65536
                         ELSE i * 259 % 65536 END AS BIGINT) AS i16_le,
               CAST(u32 AS BIGINT) AS u32_be,
               CAST(CASE WHEN u32 >= 2147483648 THEN u32 - 4294967296
                         ELSE u32 END AS BIGINT) AS i32_be,
               CAST(CAST(u64 AS DECIMAL(20,0)) AS VARCHAR) AS u64_be,
               CAST(u64 - CASE WHEN u64 >= 9223372036854775808
                               THEN 18446744073709551616 ELSE 0 END
                    AS BIGINT) AS i64_be,
               CAST(i - 100.5 AS DOUBLE) AS f32_be,
               CAST(i AS DOUBLE) * CAST(0.001 AS DOUBLE)
                 - CAST(1.0 AS DOUBLE) AS f64_le,
               i % 3 != 0 AS flag,
               repeat(chr(CAST(65 + i % 26 AS INT)), CAST(1 + i % 3 AS INT)) AS label,
               upper(lpad(to_hex(i), 2, '0') || lpad(to_hex(i * 257), 4, '0')) AS raw_hex
        FROM t
        ORDER BY i
        """,
        "T2,T3,T4,T5,T6",
        "decode matrix: uint/int 8/16/32/64 BE+LE, float32/64, boolean, "
        "NUL-stripped ASCII, hex passthrough — oracle recomputes every "
        "value arithmetically from the row index",
    ),
)


def _audio_meta_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WAV metadata decode round-trip: Spark expressions synthesize
    canonical 44-byte RIFF/WAVE headers per document (rates/sizes derived
    from the row), functions/multimodal.py probe_audio_meta walks the
    chunks back, and the oracle recomputes the expected fields in SQL."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.functions.multimodal import extract_audio_meta

    register_views(spark, sf_dir)
    doc = spark.table("documents").filter(F.col("doc_id") < 150)
    channels = (F.col("doc_id") % 2 + 1).cast("bigint")
    rate = (F.lit(8000) + (F.col("doc_id") % 5) * 4000).cast("bigint")
    data_size = (F.octet_length("text") * 64).cast("bigint")
    byte_rate = rate * channels * 2
    block_align = channels * 2

    def le(c, width):  # little-endian bytes of an integer column
        h = F.lpad(F.hex(c), width * 2, "0")
        pairs = [F.substring(h, 2 * i + 1, 2) for i in reversed(range(width))]
        return F.unhex(F.concat(*pairs))

    payload = F.concat(
        F.lit(b"RIFF"), le(data_size + 36, 4), F.lit(b"WAVEfmt "),
        le(F.lit(16).cast("bigint"), 4), le(F.lit(1).cast("bigint"), 2),
        le(channels, 2), le(rate, 4), le(byte_rate, 4), le(block_align, 2),
        le(F.lit(16).cast("bigint"), 2), F.lit(b"data"), le(data_size, 4),
    )
    media = doc.select(F.col("doc_id").alias("item_id"), payload.alias("payload"))
    return extract_audio_meta(media).withColumn(
        "duration_s", F.round("duration_s", 6)
    ).orderBy("item_id")


_q(
    "x5_audio_meta_decode",
    Query(
        _audio_meta_spark,
        """
        WITH p AS (
          SELECT doc_id,
                 doc_id % 2 + 1 AS channels,
                 8000 + (doc_id % 5) * 4000 AS rate,
                 octet_length(text::BLOB) * 64 AS data_size
          FROM documents WHERE doc_id < 150
        )
        SELECT doc_id AS item_id, 'wav' AS format,
               CAST(channels AS INT) AS n_channels,
               CAST(rate AS INT) AS sample_rate,
               CAST(16 AS INT) AS bits_per_sample,
               ROUND(CAST(data_size AS DOUBLE) / (rate * channels * 2), 6)
                 AS duration_s,
               CAST(44 AS BIGINT) AS n_bytes
        FROM p ORDER BY item_id
        """,
        "X5",
        "REAL audio metadata decoding: RIFF/WAVE chunk walk "
        "(probe_audio_meta) over Arrow batches; WAV headers synthesized "
        "in-plan with expression-built little-endian fields, oracle "
        "recomputes channels/rate/duration independently",
    ),
)


def _video_meta_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP4 metadata decode round-trip: Spark expressions synthesize
    an ISO-BMFF box tree (ftyp + moov/mvhd + moov/trak/tkhd) per
    document, functions/multimodal.py probe_video_meta walks it back,
    and the oracle recomputes the expected fields in SQL."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.functions.multimodal import extract_video_meta

    register_views(spark, sf_dir)
    doc = spark.table("documents").filter(F.col("doc_id") < 150)
    w = (F.octet_length("text") % 1280 + 16).cast("bigint")
    h = (F.col("doc_id") % 720 + 16).cast("bigint")
    ts = (F.lit(600) + (F.col("doc_id") % 4) * 200).cast("bigint")
    dur = (F.octet_length("text") * 40).cast("bigint")
    b32 = lambda c: F.unhex(F.lpad(F.hex(c), 8, "0"))  # noqa: E731
    tkhd = F.concat(
        b32(F.lit(92).cast("bigint")), F.lit(b"tkhd"), F.lit(bytes(76)),
        b32(w * 65536), b32(h * 65536),
    )
    mvhd = F.concat(
        b32(F.lit(108).cast("bigint")), F.lit(b"mvhd"), F.lit(bytes(12)),
        b32(ts), b32(dur), F.lit(bytes(80)),
    )
    payload = F.concat(
        F.lit(bytes.fromhex("00000010")), F.lit(b"ftypisom"),
        F.lit(bytes.fromhex("00000200")),
        b32(F.lit(216).cast("bigint")), F.lit(b"moov"),
        mvhd,
        b32(F.lit(100).cast("bigint")), F.lit(b"trak"),
        tkhd,
    )
    media = doc.select(F.col("doc_id").alias("item_id"), payload.alias("payload"))
    return extract_video_meta(media).withColumn(
        "duration_s", F.round("duration_s", 6)
    ).orderBy("item_id")


_q(
    "x5_video_meta_decode",
    Query(
        _video_meta_spark,
        """
        WITH p AS (
          SELECT doc_id,
                 octet_length(text::BLOB) % 1280 + 16 AS w,
                 doc_id % 720 + 16 AS h,
                 600 + (doc_id % 4) * 200 AS ts,
                 octet_length(text::BLOB) * 40 AS dur
          FROM documents WHERE doc_id < 150
        )
        SELECT doc_id AS item_id, 'mp4' AS format,
               CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               ROUND(CAST(dur AS DOUBLE) / ts, 6) AS duration_s,
               CAST(232 AS BIGINT) AS n_bytes
        FROM p ORDER BY item_id
        """,
        "X5",
        "REAL video metadata decoding: ISO-BMFF box-tree walk "
        "(probe_video_meta: mvhd timescale/duration, tkhd 16.16 "
        "dimensions) over Arrow batches; boxes synthesized in-plan, "
        "oracle recomputes the fields independently",
    ),
)


def _avi_meta_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL AVI metadata decode round-trip: Spark expressions
    synthesize canonical RIFF/AVI headers (LIST hdrl → avih) per
    document, functions/avi.py probe_avi_meta (via the
    probe_video_meta container dispatch) walks the chunks back, and
    the oracle recomputes every field in SQL. Complements
    x5_video_frame_stats, which exercises the movi frame path."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.functions.multimodal import extract_video_meta

    register_views(spark, sf_dir)
    doc = spark.table("documents").filter(F.col("doc_id") < 150)
    uspf = (F.lit(10000) + (F.col("doc_id") % 20) * 1000).cast("bigint")
    frames = (F.col("doc_id") % 150 + 1).cast("bigint")
    w = (F.lit(160) + (F.col("doc_id") % 8) * 40).cast("bigint")
    h = (F.lit(120) + (F.col("doc_id") % 6) * 30).cast("bigint")

    def le(c, width):  # little-endian bytes of an integer column
        hx = F.lpad(F.hex(c), width * 2, "0")
        pairs = [F.substring(hx, 2 * i + 1, 2) for i in reversed(range(width))]
        return F.unhex(F.concat(*pairs))

    b = F.lit
    avih = F.concat(
        le(uspf, 4), b(bytes(8)), le(F.lit(16).cast("bigint"), 4),
        le(frames, 4), b(bytes(4)), le(F.lit(1).cast("bigint"), 4),
        b(bytes(4)), le(w, 4), le(h, 4), b(bytes(16)),
    )
    payload = F.concat(
        b(b"RIFF"), le(F.lit(80).cast("bigint"), 4), b(b"AVI "),
        b(b"LIST"), le(F.lit(68).cast("bigint"), 4), b(b"hdrl"),
        b(b"avih"), le(F.lit(56).cast("bigint"), 4), avih,
    )
    media = doc.select(F.col("doc_id").alias("item_id"), payload.alias("payload"))
    return extract_video_meta(media).withColumn(
        "duration_s", F.round("duration_s", 6)
    ).orderBy("item_id")


_q(
    "x5_avi_meta_decode",
    Query(
        _avi_meta_spark,
        """
        WITH p AS (
          SELECT doc_id,
                 10000 + (doc_id % 20) * 1000 AS uspf,
                 doc_id % 150 + 1 AS frames,
                 160 + (doc_id % 8) * 40 AS w,
                 120 + (doc_id % 6) * 30 AS h
          FROM documents WHERE doc_id < 150
        )
        SELECT doc_id AS item_id, 'avi' AS format,
               CAST(w AS INT) AS width, CAST(h AS INT) AS height,
               ROUND(CAST(uspf * frames AS DOUBLE) / 1000000.0, 6)
                 AS duration_s,
               CAST(88 AS BIGINT) AS n_bytes
        FROM p ORDER BY item_id
        """,
        "X5",
        "REAL AVI metadata decoding: RIFF chunk walk (avih "
        "us-per-frame/frames/dimensions) over Arrow batches; headers "
        "synthesized in-plan, oracle recomputes the fields "
        "independently",
    ),
)


def _avi_audio_stats_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL AVI audio-track decode (functions/avi.py decode_avi_audio):
    42 MJPEG+audio AVIs whose interleaved 01wb chunks carry G.711
    mu-law (even k) or A-law (odd k) coded bytes, reassembled across
    chunks and decoded to linear samples through the repo's own ITU-T
    tables; every seventh container is video-only (null sentinel).
    Like x5_g711_sample_stats, the ORACLE DECODES THE CODEC ITSELF in
    SQL from the fixture formula — the container walk + chunk
    reassembly + codec all cross-check."""
    import numpy as np

    from mission_data_pipeline_spark.functions.avi import encode_avi_mjpeg
    from mission_data_pipeline_spark.functions.jpeg import encode_jpeg
    from mission_data_pipeline_spark.functions.multimodal import (
        avi_audio_sample_stats,
    )

    frame = encode_jpeg(np.full((8, 8, 3), 128, dtype=np.uint8))
    rows = []
    for k in range(42):
        nbytes = k % 50 + 10
        ch = 2 if k % 3 == 0 else 1
        coded = bytes((k * 31 + j * 17) % 256 for j in range(nbytes))
        payload = encode_avi_mjpeg(
            [frame, frame],
            width=8,
            height=8,
            audio=None if k % 7 == 6 else coded,
            audio_format=6 if k % 2 == 1 else 7,
            audio_rate=8000,
            audio_channels=ch,
        )
        rows.append((k, bytearray(payload)))
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    return avi_audio_sample_stats(media).orderBy("item_id")


_q(
    "x5_avi_audio_stats",
    Query(
        _avi_audio_stats_spark,
        """
        WITH avis AS (
          SELECT k AS item_id, k % 50 + 10 AS nbytes,
                 CASE WHEN k % 3 = 0 THEN 2 ELSE 1 END AS ch,
                 k % 2 = 1 AS alaw, k % 7 = 6 AS no_audio
          FROM range(0, 42) t(k)
        ),
        coded AS (
          -- stereo with odd byte counts drops the trailing partial frame
          SELECT item_id, alaw, (item_id*31 + j*17) % 256 AS b
          FROM avis, range(0, 60) bj(j)
          WHERE j < (nbytes // ch) * ch AND NOT no_audio
        ),
        dec AS (
          SELECT item_id,
            CASE WHEN NOT alaw THEN
              CASE WHEN (255 - b) >= 128
                   THEN 132 - ((((255-b) % 16) * 8 + 132)
                               * (1 << (((255-b)//16) % 8)))
                   ELSE (((255-b) % 16) * 8 + 132)
                        * (1 << (((255-b)//16) % 8)) - 132 END
            ELSE
              CASE WHEN xor(b, 85) >= 128 THEN 1 ELSE -1 END *
              CASE (xor(b, 85)//16) % 8
                WHEN 0 THEN (xor(b, 85) % 16) * 16 + 8
                WHEN 1 THEN (xor(b, 85) % 16) * 16 + 264
                ELSE ((xor(b, 85) % 16) * 16 + 264)
                     * (1 << ((xor(b, 85)//16) % 8 - 1))
              END
            END AS v
          FROM coded
        ),
        stats AS (
          SELECT item_id,
                 CAST(SUM(v) AS BIGINT) AS s_sum,
                 CAST(MIN(v) AS INT) AS s_min,
                 CAST(MAX(v) AS INT) AS s_max,
                 CAST(SUM(v * v) AS BIGINT) AS s_sumsq
          FROM dec GROUP BY item_id
        )
        SELECT a.item_id,
               CASE WHEN no_audio THEN NULL
                    ELSE CAST(nbytes // ch AS BIGINT) END AS n_frames,
               CASE WHEN no_audio THEN NULL ELSE CAST(ch AS INT) END
                 AS n_channels,
               CASE WHEN no_audio THEN NULL ELSE CAST(8000 AS INT) END
                 AS sample_rate,
               s.s_sum, s.s_min, s.s_max, s.s_sumsq
        FROM avis a LEFT JOIN stats s USING (item_id)
        ORDER BY a.item_id
        """,
        "X5",
        "REAL audio-in-video-container decode: AVI auds stream "
        "resolution, interleaved 01wb chunk reassembly, G.711 "
        "mu-law/A-law decode to linear samples — the oracle re-derives "
        "every sample from the coded byte in SQL",
    ),
)


def _flac_sample_stats_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL FLAC decode (functions/flac.py): 44 streams of
    formula-generated 16-bit samples, mixed mono/stereo, Rice-coded
    FIXED-order-1 subframes across multiple 64-sample frames; every
    seventh payload has its magic chopped (null sentinel). FLAC is
    LOSSLESS, so the oracle recomputes the exact statistics from the
    generator formula — any bit error anywhere in the bit reader, Rice
    decode, or predictor reconstruction breaks the match."""
    import numpy as np

    from mission_data_pipeline_spark.functions.flac import encode_flac
    from mission_data_pipeline_spark.functions.multimodal import (
        flac_sample_stats,
    )

    rows = []
    for k in range(44):
        frames = k % 150 + 30
        ch = 2 if k % 3 == 0 else 1
        i = np.arange(frames)[:, None]
        c = np.arange(ch)[None, :]
        s = (((k * 7 + i * 37 + c * 101) % 4001) - 2000).astype(np.int64)
        payload = encode_flac(s, rate=8000, bits=16, block_size=64, order=1)
        if k % 7 == 6:
            payload = payload[2:]  # chop the magic: undecodable
        rows.append((k, bytearray(payload)))
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    return flac_sample_stats(media).orderBy("item_id")


_q(
    "x5_flac_sample_stats",
    Query(
        _flac_sample_stats_spark,
        """
        WITH flacs AS (
          SELECT k AS item_id, k % 150 + 30 AS frames,
                 CASE WHEN k % 3 = 0 THEN 2 ELSE 1 END AS ch,
                 k % 7 = 6 AS corrupt
          FROM range(0, 44) t(k)
        ),
        smp AS (
          SELECT item_id,
                 ((item_id * 7 + i * 37 + c * 101) % 4001) - 2000 AS v
          FROM flacs, range(0, 180) fi(i), range(0, 2) ci(c)
          WHERE i < frames AND c < ch AND NOT corrupt
        ),
        stats AS (
          SELECT item_id,
                 CAST(SUM(v) AS BIGINT) AS s_sum,
                 CAST(MIN(v) AS INT) AS s_min,
                 CAST(MAX(v) AS INT) AS s_max,
                 CAST(SUM(v * v) AS BIGINT) AS s_sumsq
          FROM smp GROUP BY item_id
        )
        SELECT f.item_id,
               CASE WHEN corrupt THEN NULL ELSE CAST(frames AS BIGINT) END
                 AS n_frames,
               CASE WHEN corrupt THEN NULL ELSE CAST(ch AS INT) END
                 AS n_channels,
               CASE WHEN corrupt THEN NULL ELSE CAST(8000 AS INT) END
                 AS sample_rate,
               s.s_sum, s.s_min, s.s_max, s.s_sumsq
        FROM flacs f LEFT JOIN stats s USING (item_id)
        ORDER BY f.item_id
        """,
        "X5",
        "REAL FLAC decode (Rice-coded fixed-predictor subframes, pure "
        "stdlib+NumPy): lossless, so the oracle recomputes exact "
        "statistics from the generator formula — the whole bit reader/"
        "Rice/predictor chain is value-checked",
    ),
)


def _image_dhash_near_dup_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE near-dup via 64-bit dHash + 8-band bucket join
    (functions/multimodal.py image_dhash, operators/dedup.py
    dhash_near_pairs): 24 formula-pixel 18x12 PNGs plus a perturbed
    twin for every third (one pixel region changed → Hamming <= 2),
    REAL PNG decode, integer luma, floor-resample to the 9x8 grid,
    difference bits, banded pairing. Every step is integer arithmetic,
    so the oracle recomputes the hashes AND the band-join pair set
    bit-for-bit from the pixel formula."""
    import numpy as np

    from mission_data_pipeline_spark.functions.multimodal import (
        encode_png,
        image_dhash,
    )
    from mission_data_pipeline_spark.operators.dedup import dhash_near_pairs

    def pixels(k: int, twin: bool) -> np.ndarray:
        # multiplicative formula: base hashes are mutually FAR (0 pairs
        # within Hamming 4) while each twin stays within Hamming 2 —
        # the pair set is exactly the planted twins
        x = np.arange(18)[None, :, None]
        y = np.arange(12)[:, None, None]
        c = np.arange(3)[None, None, :]
        v = ((k + 7) * (x + 3) * (y + 5) + c * 5) % 256
        if twin:
            v = v.copy()
            v[0, 4, :] = (v[0, 4, :] + 40) % 256
        return v.astype(np.uint8)

    rows = [(k, bytearray(encode_png(pixels(k, False)))) for k in range(24)]
    rows += [
        (100 + k, bytearray(encode_png(pixels(k, True))))
        for k in range(0, 24, 3)
    ]
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    pairs = dhash_near_pairs(image_dhash(media), max_hamming=4)
    return pairs.orderBy("item_a", "item_b")


_q(
    "x5_image_dhash_near_dup",
    Query(
        _image_dhash_near_dup_spark,
        """
        WITH items AS (
          SELECT k AS item_id, k AS k, FALSE AS twin FROM range(0, 24) t(k)
          UNION ALL
          SELECT 100 + k, k, TRUE FROM range(0, 24) t(k) WHERE k % 3 = 0
        ),
        gray AS (
          SELECT i.item_id, xx.x, yy.y,
            (299 * (CASE WHEN twin AND xx.x = 4 AND yy.y = 0
                    THEN (((k+7)*(xx.x+3)*(yy.y+5)) % 256 + 40) % 256
                    ELSE ((k+7)*(xx.x+3)*(yy.y+5)) % 256 END)
           + 587 * (CASE WHEN twin AND xx.x = 4 AND yy.y = 0
                    THEN (((k+7)*(xx.x+3)*(yy.y+5) + 5) % 256 + 40) % 256
                    ELSE ((k+7)*(xx.x+3)*(yy.y+5) + 5) % 256 END)
           + 114 * (CASE WHEN twin AND xx.x = 4 AND yy.y = 0
                    THEN (((k+7)*(xx.x+3)*(yy.y+5) + 10) % 256 + 40) % 256
                    ELSE ((k+7)*(xx.x+3)*(yy.y+5) + 10) % 256 END)
            ) // 1000 AS g
          FROM items i, range(0, 18) xx(x), range(0, 12) yy(y)
        ),
        grid AS (
          SELECT g.item_id, tx.tx, ty.ty, g.g
          FROM range(0, 9) tx(tx)
          CROSS JOIN range(0, 8) ty(ty)
          JOIN gray g ON g.x = (tx.tx * 18) // 9
                     AND g.y = (ty.ty * 12) // 8
        ),
        bits AS (
          SELECT a.item_id, a.ty, a.tx,
                 CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
          FROM grid a JOIN grid b
            ON b.item_id = a.item_id AND b.ty = a.ty AND b.tx = a.tx + 1
          WHERE a.tx < 8
        ),
        hashes AS (
          SELECT item_id,
                 CAST(SUM(CASE WHEN bit = 1 AND ty*8 + tx < 63
                               THEN (1::BIGINT << (ty*8 + tx))
                               ELSE 0 END) AS BIGINT)
                 + CASE WHEN MAX(CASE WHEN ty = 7 AND tx = 7 THEN bit
                                 ELSE 0 END) = 1
                        THEN (-9223372036854775807 - 1) ELSE 0 END AS dhash
          FROM bits GROUP BY item_id
        )
        SELECT DISTINCT a.item_id AS item_a, b.item_id AS item_b,
               CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
        FROM hashes a
        JOIN hashes b ON a.item_id < b.item_id
        JOIN range(0, 8) bb(band)
          ON ((a.dhash >> (8*band)) & 255) = ((b.dhash >> (8*band)) & 255)
        WHERE bit_count(xor(a.dhash, b.dhash)) <= 4
        ORDER BY item_a, item_b
        """,
        "X2,X5",
        "image near-duplicate detection: REAL PNG decode → integer-luma "
        "dHash (9x8 difference grid, signed 64-bit) → 8-band bucket "
        "join (exact recall to Hamming 7, never images x images); the "
        "oracle recomputes hashes and the pair set from the pixel "
        "formula",
    ),
)


def _frames_to_packets_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TM frame → packet reassembly round-trip: 200 deterministic packets
    (varying sizes, ASCII payloads) segmented into 64-byte TM frames with
    spanning packets and continuation frames, reassembled by
    operators/frames.py frames_to_packets; the oracle recomputes each
    packet's size and content md5 from the generating formula."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.models.ccsds import (
        build_packet,
        frame_packet_stream,
    )
    from mission_data_pipeline_spark.operators.frames import frames_to_packets

    stream = b"".join(
        build_packet(0x123, i, chr(65 + i % 26).encode() * (20 + (i * 7) % 50))
        for i in range(200)
    )
    frames = frame_packet_stream(stream, frame_data_len=64)
    df = spark.createDataFrame(
        [(i, f) for i, f in enumerate(frames)], "recv_order long, frame binary"
    )
    pk = frames_to_packets(df, order_col="recv_order")
    return pk.select(
        "seq_count",
        "apid",
        "data_length",
        F.md5("user_data").alias("content_md5"),
    ).orderBy("seq_count")


_q(
    "frames_to_packets_roundtrip",
    Query(
        _frames_to_packets_spark,
        """
        SELECT CAST(i AS INT) AS seq_count,
               CAST(291 AS INT) AS apid,
               CAST(20 + (i * 7) % 50 - 1 AS INT) AS data_length,
               md5(repeat(chr(CAST(65 + i % 26 AS INT)),
                          CAST(20 + (i * 7) % 50 AS INT))) AS content_md5
        FROM range(0, 200) t(i)
        ORDER BY seq_count
        """,
        "§1.1",
        "TM transfer frame first-header-pointer walk (CCSDS 132.0-B-3): "
        "packets spanning frame boundaries reassembled per virtual channel; "
        "oracle recomputes sizes + content digests from the generator",
    ),
)


def _rs_frames_decom_e2e_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE ground-segment channel path in one plan: the same
    200-packet stream as frames_to_packets_roundtrip is segmented into
    64-byte TM frames, each frame RS-ENCODED (shortened RS(96,64)) and
    CORRUPTED with i % 17 formula symbol errors — every frame within
    the correction radius — then Spark runs
    correct_rs_frames → frames_to_packets: FEC first, reassembly on the
    RECOVERED bytes. The output (and oracle) are identical to the
    clean-channel round-trip, which is the whole point: a noisy channel
    with bounded errors is indistinguishable after FEC. A loud guard
    fails if any frame was uncorrectable (the fixture never exceeds 16
    errors, so a decode bug cannot hide as 'dropped frame')."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.functions.reed_solomon import rs_encode
    from mission_data_pipeline_spark.models.ccsds import (
        build_packet,
        frame_packet_stream,
    )
    from mission_data_pipeline_spark.operators.frames import (
        correct_rs_frames,
        frames_to_packets,
    )

    stream = b"".join(
        build_packet(0x123, i, chr(65 + i % 26).encode() * (20 + (i * 7) % 50))
        for i in range(200)
    )
    frames = frame_packet_stream(stream, frame_data_len=64)
    rows = []
    for i, f in enumerate(frames):
        cw = bytearray(rs_encode(f))  # len(f)+32 = shortened codeword
        for j in range(i % 17):
            cw[(i + j * 13) % len(cw)] ^= (i * 5 + j * 29) % 255 + 1
        rows.append((i, bytearray(cw)))
    df = spark.createDataFrame(rows, "frame_id long, codeword binary")
    corrected = correct_rs_frames(df)
    n_bad = corrected.filter(~F.col("ok")).count()
    if n_bad:
        raise RuntimeError(
            f"{n_bad} frames uncorrectable though every injection is "
            "within the 16-symbol radius — RS decode regression"
        )
    pk = frames_to_packets(
        corrected.select(
            F.col("frame_id").alias("recv_order"),
            F.col("data").alias("frame"),
        ),
        order_col="recv_order",
    )
    return pk.select(
        "seq_count",
        "apid",
        "data_length",
        F.md5("user_data").alias("content_md5"),
    ).orderBy("seq_count")


_q(
    "s_rs_frames_decom_e2e",
    Query(
        _rs_frames_decom_e2e_spark,
        """
        SELECT CAST(i AS INT) AS seq_count,
               CAST(291 AS INT) AS apid,
               CAST(20 + (i * 7) % 50 - 1 AS INT) AS data_length,
               md5(repeat(chr(CAST(65 + i % 26 AS INT)),
                          CAST(20 + (i * 7) % 50 AS INT))) AS content_md5
        FROM range(0, 200) t(i)
        ORDER BY seq_count
        """,
        "S+,§1.1",
        "complete channel path: corrupted RS(96,64) codewords → FEC "
        "correction → TM frame first-header-pointer reassembly — the "
        "noisy channel must be indistinguishable from the clean one "
        "after correction (same oracle as the clean round-trip); loud "
        "guard on any uncorrectable frame",
    ),
)


def _image_meta_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image metadata decode round-trip: Spark expressions synthesize
    structurally-valid PNG IHDR / JPEG SOF0 header bytes per document
    (dimensions derived from the row), functions/multimodal.py
    probe_image_meta parses them back inside mapInPandas, and the oracle
    recomputes the expected dimensions independently in SQL."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.functions.multimodal import extract_image_meta

    register_views(spark, sf_dir)
    doc = spark.table("documents").filter(F.col("doc_id") < 150)
    w = (F.octet_length("text") % 624 + 16).cast("bigint")
    h = (F.col("doc_id") % 464 + 16).cast("bigint")
    # big-endian uint32/uint16 bytes from an integer, expression-only
    b32 = lambda c: F.unhex(F.lpad(F.hex(c), 8, "0"))  # noqa: E731
    b16 = lambda c: F.unhex(F.lpad(F.hex(c), 4, "0"))  # noqa: E731
    png = F.concat(
        F.lit(bytes.fromhex("89504E470D0A1A0A0000000D49484452")),  # sig+len+IHDR
        b32(w),
        b32(h),
        F.lit(bytes.fromhex("08060000001F15C489")),  # depth..interlace+CRC
    )
    jpeg = F.concat(
        F.lit(bytes.fromhex("FFD8FFC0001108")),  # SOI + SOF0 + len 17 + precision
        b16(h),
        b16(w),
        F.lit(bytes.fromhex("03011100021101031101FFD9")),  # 3 components + EOI
    )
    media = doc.select(
        F.col("doc_id").alias("item_id"),
        F.when(F.col("doc_id") % 2 == 0, png).otherwise(jpeg).alias("payload"),
    )
    return extract_image_meta(media).orderBy("item_id")


_q(
    "x5_image_meta_decode",
    Query(
        _image_meta_spark,
        """
        SELECT doc_id AS item_id,
               CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
               CAST(octet_length(text::BLOB) % 624 + 16 AS INT) AS width,
               CAST(doc_id % 464 + 16 AS INT) AS height,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 33 ELSE 23 END AS BIGINT) AS n_bytes
        FROM documents WHERE doc_id < 150
        ORDER BY doc_id
        """,
        "X5",
        "REAL image metadata decoding: PNG IHDR + JPEG SOF0 header parse "
        "(probe_image_meta) over Arrow batches; payloads are synthesized "
        "in-plan with expression-built real format bytes, oracle computes "
        "the expected dimensions independently",
    ),
)


def _last_wins_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.dataset import dedup_samples

    register_views(spark, sf_dir)
    ev = spark.sql(
        "SELECT event_type AS name, CAST(ts_ns DIV 1000 AS DOUBLE) AS time_tai, "
        "       event_id AS seq_count, value AS eng_value "
        "FROM events WHERE user_id <= 40"
    )
    out = dedup_samples(ev)
    return out.select(
        "name",
        F.col("time_tai").cast("long").alias("t_us"),
        "seq_count",
        F.round("eng_value", 6).alias("eng_value"),
    ).orderBy("name", "t_us")


_q(
    "w4_last_wins_dedup",
    Query(
        _last_wins_spark,
        """
        SELECT name, CAST(time_tai AS BIGINT) AS t_us, seq_count,
               ROUND(eng_value, 6) AS eng_value
        FROM (
          SELECT event_type AS name, CAST(epoch_us(ts) AS DOUBLE) AS time_tai,
                 event_id AS seq_count, value AS eng_value,
                 ROW_NUMBER() OVER (PARTITION BY event_type, epoch_us(ts)
                                    ORDER BY event_id DESC) AS rn
          FROM events WHERE user_id <= 40
        ) t WHERE rn = 1
        ORDER BY name, t_us
        """,
        "W4,D3",
        "deterministic last-wins duplicate-sample resolution (the batch "
        "analog of streaming late-data dedup; wide-pivot D3 semantics)",
    ),
)


