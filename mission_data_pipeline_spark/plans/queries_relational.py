"""Relational core: aggregations, filters, joins, optimizer features, set ops, pivot.

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


# ---------------------------------------------------------------------------
# Aggregations / scans (A*, S3, D5, D6)
# ---------------------------------------------------------------------------

_q(
    "q1_pricing_summary",
    _same(
        f"""
        SELECT l_returnflag, l_linestatus,
               {_dsum('l_quantity')} AS sum_qty,
               {_dsum('l_extendedprice')} AS sum_base_price,
               {_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
               {_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
               ROUND({_dsum('l_quantity')} / COUNT(*), 6) AS avg_qty,
               ROUND({_dsum('l_extendedprice')} / COUNT(*), 6) AS avg_price,
               ROUND({_dsum('l_discount')} / COUNT(*), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """,
        "A1-A4,D5",
        "TPC-H Q1-style pricing summary: scan + filter + grouped exact aggregation",
    ),
)

_q(
    "agg_global_stats",
    _same(
        f"""
        SELECT COUNT(*) AS n_rows,
               COUNT(DISTINCT l_orderkey) AS n_orders,
               {_dsum('l_extendedprice')} AS total_price,
               CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
               CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
               ROUND({_dsum('l_quantity')} / COUNT(*), 6) AS avg_qty
        FROM lineitem
        """,
        "A1,A3,A4,D5",
        "global aggregate incl. distinct count and exact average",
    ),
)

_q(
    "agg_variance_manual",
    _same(
        """
        SELECT l_returnflag,
               COUNT(*) AS n,
               ROUND(CAST(
                 (SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,8)))
                   - SUM(CAST(l_quantity AS DECIMAL(20,6)))
                     * SUM(CAST(l_quantity AS DECIMAL(20,6))) / COUNT(*)
                 ) / (COUNT(*) - 1) AS DOUBLE), 6) AS var_qty
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """,
        "A3",
        "sample variance from exact decimal moments (order-independent)",
    ),
)

_q(
    "agg_distinct_by_group",
    _same(
        """
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """,
        "A2",
        "distinct aggregates per group",
    ),
)

_q(
    "agg_having",
    _same(
        f"""
        SELECT l_partkey, COUNT(*) AS n_lines, {_dsum('l_quantity')} AS sum_qty
        FROM lineitem
        GROUP BY l_partkey
        HAVING COUNT(*) >= 35
        ORDER BY l_partkey
        """,
        "A2",
        "groupBy + HAVING post-aggregate filter",
    ),
)

_q(
    "rollup_flag_status",
    _same(
        f"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {_dsum('l_extendedprice')} AS sum_price
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """,
        "A2+",
        "hierarchical ROLLUP totals",
    ),
)

_q(
    "cube_priority_status",
    _same(
        f"""
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n, {_dsum('o_totalprice')} AS sum_price
        FROM orders
        GROUP BY CUBE(o_orderpriority, o_orderstatus)
        ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
        """,
        "A2+",
        "CUBE over two dimensions",
    ),
)

_q(
    "grouping_sets_mixed",
    _same(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """,
        "A2+",
        "explicit GROUPING SETS",
    ),
)

# ---------------------------------------------------------------------------
# Filters / projections / scalar functions (S3, T5, T7-T11, D1, D8)
# ---------------------------------------------------------------------------

_q(
    "s3_filter_pushdown_in",
    _same(
        f"""
        SELECT l_returnflag, COUNT(*) AS n, {_dsum('l_extendedprice')} AS sum_price
        FROM lineitem
        WHERE l_returnflag IN ('A', 'R')
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """,
        "S3,T8,D1",
        "IN-list predicate pushed to the parquet scan (APID-filter analog)",
    ),
)

_q(
    "t8_filter_exclude",
    _same(
        f"""
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders
        WHERE o_orderstatus NOT IN ('F')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        "T8",
        "blacklist filter (NOT IN on a non-null column)",
    ),
)

_q(
    "filter_between_range",
    _same(
        f"""
        SELECT CAST(CAST(l_shipdate AS DATE) AS STRING) AS ship_date, COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1996-03-31 00:00:00'
        GROUP BY CAST(CAST(l_shipdate AS DATE) AS STRING)
        ORDER BY ship_date
        """,
        "S3",
        "time-range predicate (partition-prunable at scale)",
    ),
)

_q(
    "t7_coalesce_fallback",
    _same(
        """
        SELECT c.c_custkey,
               COALESCE(CAST(o.n_orders AS DOUBLE), CAST(c.c_custkey % 7 AS DOUBLE)) AS activity
        FROM customer c
        LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
          ON c.c_custkey = o.o_custkey
        WHERE c.c_custkey <= 300
        ORDER BY c.c_custkey
        """,
        "T7",
        "COALESCE fallback chain (TAI-time fallback analog)",
    ),
)

_q(
    "t9_polynomial_calibration",
    _same(
        """
        SELECT l_orderkey, l_linenumber,
               ROUND(-55.0 + 0.04394531 * l_quantity
                     + 0.0001 * l_quantity * l_quantity, 6) AS eng_value
        FROM lineitem
        WHERE l_orderkey <= 200
        ORDER BY l_orderkey, l_linenumber
        """,
        "T9",
        "polynomial calibration as a constant-folded projection",
    ),
)

_q(
    "t10_piecewise_clamp",
    _same(
        """
        SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS raw,
               ROUND(CASE
                 WHEN l_quantity <= 10 THEN -1.0
                 WHEN l_quantity <= 25 THEN -1.0 + (l_quantity - 10) / 15.0 * 2.0
                 WHEN l_quantity <= 40 THEN 1.0 + (l_quantity - 25) / 15.0 * 3.0
                 ELSE 4.0
               END, 6) AS eng_value
        FROM lineitem
        WHERE l_orderkey <= 100
        ORDER BY l_orderkey, l_linenumber
        """,
        "T10,T11",
        "piecewise-linear table calibration with end clamping",
    ),
)

_q(
    "t5_string_functions",
    _same(
        """
        SELECT c_custkey,
               UPPER(c_name) AS name_upper,
               SUBSTR(c_name, 1, 8) AS name_prefix,
               LENGTH(c_name) AS name_len,
               TRIM(CONCAT('  ', c_name, '  ')) AS name_trim,
               REPLACE(c_mktsegment, 'AUTO', 'auto') AS seg_replaced
        FROM customer
        WHERE c_custkey <= 200
        ORDER BY c_custkey
        """,
        "T5",
        "string projection surface (decode-and-strip analog)",
    ),
)

_q(
    "case_bucketing",
    _same(
        f"""
        SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 150000 THEN 'medium'
                    ELSE 'large' END AS bucket,
               COUNT(*) AS n, {_dsum('o_totalprice')} AS sum_price
        FROM orders
        GROUP BY 1
        ORDER BY bucket
        """,
        "T9-T11",
        "CASE bucketing + aggregate",
    ),
)

_q(
    "d8_top_n_preview",
    _same(
        """
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 25
        """,
        "D8,D9",
        "deterministic top-N (ORDER BY with unique tiebreak + LIMIT)",
    ),
)

_q(
    "date_extract_parts",
    _same(
        """
        SELECT CAST(YEAR(o_orderdate) AS INT) AS yr,
               CAST(MONTH(o_orderdate) AS INT) AS mo,
               COUNT(*) AS n
        FROM orders
        GROUP BY YEAR(o_orderdate), MONTH(o_orderdate)
        ORDER BY yr, mo
        """,
        "W3+",
        "calendar part extraction + aggregate",
    ),
)

# ---------------------------------------------------------------------------
# Joins (J1-J3 + full surface)
# ---------------------------------------------------------------------------

_q(
    "j1_broadcast_dim_join",
    _same(
        f"""
        SELECT p.p_brand, COUNT(*) AS n_lines, {_dsum('l.l_extendedprice')} AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
        ORDER BY p.p_brand
        """,
        "J1",
        "fact ⋈ broadcast dimension (decom defs lookup analog)",
    ),
)

_q(
    "j2_left_join_config",
    _same(
        """
        SELECT c.c_custkey, c.c_name, COALESCE(o.n_orders, 0) AS n_orders
        FROM customer c
        LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
          ON c.c_custkey = o.o_custkey
        WHERE c.c_custkey <= 500
        ORDER BY c.c_custkey
        """,
        "J2",
        "left join against derived table (calibration lookup analog)",
    ),
)

_q(
    "join_right",
    _same(
        """
        SELECT n.n_name, COUNT(c.c_custkey) AS n_customers
        FROM customer c RIGHT JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY n.n_name
        """,
        "J*",
        "right outer join keeps empty nations",
    ),
)

_q(
    "join_full_outer",
    _same(
        """
        SELECT COALESCE(c.nk, s.nk) AS nationkey,
               COALESCE(c.n_cust, 0) AS n_cust,
               COALESCE(s.n_supp, 0) AS n_supp
        FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
        FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
          ON c.nk = s.nk
        ORDER BY nationkey
        """,
        "J*",
        "full outer join of two aggregates",
    ),
)

_q(
    "join_semi_exists",
    _same(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
        ORDER BY c_custkey
        """,
        "J*",
        "left semi join via EXISTS subquery",
    ),
)

_q(
    "join_anti",
    _same(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
        ORDER BY c_custkey
        """,
        "J*",
        "anti join: customers with no 1998-or-later orders (every testdata "
        "customer has at least one order, so the unfiltered variant was a "
        "vacuous 0-row check; this window keeps the result non-empty)",
    ),
)

_q(
    "join_cross_small",
    _same(
        """
        SELECT r.r_name, n.n_name
        FROM region r CROSS JOIN nation n
        ORDER BY r.r_name, n.n_name
        """,
        "J*",
        "cross join of two small dimensions",
    ),
)

def _salted_join_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-robust salted join (operators/bucketing.py salted_join):
    l_returnflag has only 3 values, so every key is a hot key — the
    worst case for a plain shuffle join. The salted plan spreads each
    key over 8 reducers; the oracle is the PLAIN join, proving salting
    is semantically transparent (no duplicated or lost rows)."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.bucketing import salted_join

    register_views(spark, sf_dir)
    big = spark.table("lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    small = spark.createDataFrame(
        [("A", 0.5), ("N", 1.0), ("R", 0.25)], "l_returnflag string, w double"
    )
    j = salted_join(big, small, "l_returnflag", n_salts=8)
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("l_quantity") * F.col("w")).cast("decimal(20,6)"))
            .cast("double")
            .alias("wsum"),
        )
        .orderBy("l_returnflag")
    )


_q(
    "j_salted_skew_join",
    Query(
        _salted_join_spark,
        """
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(l_quantity * w AS DECIMAL(20,6))) AS STRING) AS DOUBLE)
                 AS wsum
        FROM lineitem
        JOIN (VALUES ('A', 0.5), ('N', 1.0), ('R', 0.25)) AS s(l_returnflag, w)
          USING (l_returnflag)
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """,
        "J*+",
        "salted skew join: small side replicated 8x, big side scattered "
        "by deterministic row-hash salt so hot keys spread across "
        "reducers; oracle is the plain join (salting must be "
        "semantically transparent)",
    ),
)


# ---------------------------------------------------------------------------
# Catalyst/AQE optimizer features, plan-asserted (J*+/S3+): the engine's
# at-scale join strategies are not just configured, they are PROVEN to
# engage — each query inspects its own plan and fails loudly if the
# optimization did not fire, and each oracle is the plain semantic query
# (every optimization must be transparent).
# ---------------------------------------------------------------------------


def _dpp_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning, asserted in-plan: orders staged
    PARTITIONED BY o_orderpriority (the layout a 100 TB fact table would
    have), then joined to a dimension filtered to 2 of 5 priorities.
    Catalyst injects a `dynamicpruning` subquery into the fact scan's
    PartitionFilters — at scale the scan reads 2/5 of the partitions
    instead of all of them, driven by the dim filter AT RUNTIME (no
    literal priority list ever touches the fact query). Loud failure if
    the pruning expression is missing."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    tmp = _scratch_dir("dpp_orders")
    (
        spark.table("orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.partitionBy("o_orderpriority")
        .mode("overwrite")
        .parquet(tmp)
    )
    po = spark.read.parquet(tmp)
    dim = spark.createDataFrame(
        [
            ("1-URGENT", 1),
            ("2-HIGH", 0),
            ("3-MEDIUM", 1),
            ("4-NOT SPECIFIED", 0),
            ("5-LOW", 0),
        ],
        "prio string, keep int",
    )
    out = (
        po.join(
            dim.filter(F.col("keep") == 1),
            po["o_orderpriority"] == F.col("prio"),
        )
        .groupBy("prio")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(20,6)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("prio")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    if "dynamicpruning" not in plan.lower():
        raise RuntimeError(
            "dynamic partition pruning did not engage on the partitioned "
            "fact scan:\n" + plan[:3000]
        )
    return out


_q(
    "j_dynamic_partition_pruning",
    Query(
        _dpp_spark,
        """
        SELECT o_orderpriority AS prio, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS STRING) AS DOUBLE) AS total
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '3-MEDIUM')
        GROUP BY o_orderpriority
        ORDER BY prio
        """,
        "J*+,S3+",
        "dynamic partition pruning, asserted in-plan: fact staged "
        "partitioned-by-priority, dim filter drives a runtime "
        "dynamicpruning subquery into the fact scan's PartitionFilters "
        "(2/5 partitions read); oracle is the plain filtered aggregate",
    ),
)


def _aqe_skew_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE runtime skew-join splitting, asserted on the EXECUTED plan:
    a synthetic 90%-one-key fact (the hot-APID / hot-document shape)
    sort-merge-joins a 100-row dim; with mapper-granular shuffle stats
    AQE splits the skewed partition across reducers —
    ``SortMergeJoin(skew=true)`` + an ``AQEShuffleRead ... skewed``
    reader in the final adaptive plan. The probe run executes a bounded
    copy under tightened skew thresholds (restored immediately) and
    fails loudly if the split did not engage; the returned result is
    the plain join (runtime splitting must be semantically
    transparent). Complements j_salted_skew_join: salting is the
    deterministic pre-planned answer, AQE the runtime one.

    NOTE the repartition(16): a single-row-group parquet input gives
    the join shuffle ONE mapper, and AQE splits skewed partitions by
    MAPPER RANGES — with one mapper there is nothing to split (the
    round-5 file-layout lesson resurfacing at the shuffle layer).
    """
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)

    def build() -> DataFrame:
        li = (
            spark.table("lineitem")
            .repartition(16)
            .select(
                F.when(F.col("l_orderkey") % 10 != 0, F.lit(0))
                .otherwise(F.col("l_orderkey") % 97)
                .alias("k"),
                "l_quantity",
            )
        )
        dim = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        return (
            li.hint("merge")
            .join(dim.hint("merge"), "k")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum(
                    (F.col("l_quantity") * F.col("w")).cast("decimal(20,6)")
                )
                .cast("double")
                .alias("wsum"),
            )
        )

    knobs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    prev = {k: spark.conf.get(k, None) for k in knobs}
    try:
        for k, v in knobs.items():
            spark.conf.set(k, v)
        probe = build()
        probe.collect()  # bounded single-row result; forces the final plan
        fplan = probe._jdf.queryExecution().executedPlan().toString()
        if "skew=true" not in fplan:
            raise RuntimeError(
                "AQE skew-join splitting did not engage on the skewed "
                "merge join:\n" + fplan[:3000]
            )
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return build()


_q(
    "j_aqe_skew_split",
    Query(
        _aqe_skew_spark,
        """
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CAST(SUM(CAST(l_quantity * w AS DECIMAL(20,6))) AS STRING) AS DOUBLE) AS wsum
        FROM (
          SELECT CASE WHEN l_orderkey % 10 != 0 THEN 0
                      ELSE l_orderkey % 97 END AS k,
                 l_quantity
          FROM lineitem
        ) f
        JOIN (SELECT i AS k, i * 2 AS w FROM range(0, 100) t(i)) d
          USING (k)
        """,
        "J*+",
        "AQE runtime skew-join splitting, asserted on the executed "
        "adaptive plan (SortMergeJoin(skew=true) + skewed shuffle "
        "reader) under a 90%-one-key fact; oracle is the plain join — "
        "runtime splitting is semantically transparent. The runtime "
        "complement to the deterministic salted join",
    ),
)


def _bloom_filter_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning, asserted in-plan: a selective
    dim filter (1/5 of orders) sort-merge-joins the fact; Catalyst's
    InjectRuntimeFilter builds a bloom filter from the dim side and
    pushes a ``might_contain`` probe BELOW the fact's shuffle — ~80% of
    fact rows drop before they are ever shuffled, the semi-join
    reduction that matters when the fact is 100 TB. Broadcast is
    disabled for the probe (a broadcast join would subsume the filter;
    at real scale the dim side exceeds broadcast thresholds and bloom
    pruning is exactly what remains). Thresholds are tightened for
    PLANNING ONLY and restored (QueryExecution caches the plan). Loud
    failure if no bloom probe was injected."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)

    li = spark.table("lineitem").select("l_orderkey", "l_quantity")
    sel = (
        spark.table("orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    out = li.join(sel, li["l_orderkey"] == sel["o_orderkey"]).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(20,6)"))
        .cast("double")
        .alias("qty"),
    )
    knobs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "1KB",
    }
    prev = {k: spark.conf.get(k, None) for k in knobs}
    try:
        for k, v in knobs.items():
            spark.conf.set(k, v)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        # The assert pins the DEFAULT plan shape. Under the perturb
        # sweep's adversarial input .repartition() the non-injection is
        # Catalyst behaving correctly — InjectRuntimeFilter only fires
        # when the probe side is a plain scan-shaped subtree, and a
        # user-specified Repartition is not one — so only the VALUES
        # are checked in that mode (the sweep's job).
        if "might_contain" not in plan.lower():
            # read the knob off query_core (module attribute, not an
            # import-time snapshot — the perturb sweep mutates it)
            from mission_data_pipeline_spark.plans import query_core

            if query_core._INPUT_REPARTITION is None:
                raise RuntimeError(
                    "runtime bloom filter was not injected below the fact "
                    "shuffle:\n" + plan[:3000]
                )
            # Visible, not silent: a perturb-only run must not read as
            # coverage of the injection property (ADVICE r08).
            import sys as _sys

            print(
                "NOTE: j_runtime_bloom_filter plan assert SKIPPED "
                "(perturbed layout — InjectRuntimeFilter correctly "
                "declines below a user Repartition); values still "
                "compared, injection property NOT covered by this run",
                file=_sys.stderr,
            )
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return out


_q(
    "j_runtime_bloom_filter",
    Query(
        _bloom_filter_spark,
        """
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS STRING) AS DOUBLE) AS qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        """,
        "J*+,S3+",
        "runtime bloom-filter join pruning, asserted in-plan: Catalyst "
        "injects a might_contain probe from the selective dim side "
        "below the fact's shuffle (semi-join reduction before any fact "
        "movement); oracle is the plain join",
    ),
)


# ONE Q3 text: q3_shipping_priority runs/oracles it directly, and
# q3_bucketed_colocated oracles against it — "bucketing is semantically
# transparent" only means something if both compare to the same query.
#
# Build-side fix (r15, guide §3.1): the flat 3-way join text planned the
# fact-side BroadcastHashJoin with BuildRight = the FILTERED LINEITEM
# (~300k rows at sf0.1 — Catalyst's post-filter size estimate undershot
# the 10 MB threshold), streaming the ~30k-row customer⋈orders side: a
# 10x-too-large hash build and broadcast. The CTE + BROADCAST(co) hint
# pins the build to the reduced customer⋈orders side and streams the
# fact — the shape that survives any scale (the fact is never collected).
# DuckDB parses the hint as a plain comment, so the oracle text stays
# shared. Measured interleaved at sf0.1: med 0.91 -> 0.56 s (1.6x),
# results identical.
_Q3_SQL = f"""
        WITH co AS (
          SELECT o.o_orderkey, o.o_orderdate
          FROM customer c
          JOIN orders o ON c.c_custkey = o.o_custkey
          WHERE c.c_mktsegment = 'BUILDING'
            AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        )
        SELECT /*+ BROADCAST(co) */ l.l_orderkey,
               {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
               CAST(CAST(co.o_orderdate AS DATE) AS STRING) AS orderdate
        FROM co
        JOIN lineitem l ON l.l_orderkey = co.o_orderkey
        WHERE l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l.l_orderkey, co.o_orderdate
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
        """


def _q3_bucketed_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 over pre-bucketed fact tables (operators/bucketing.py
    write_bucketed): lineitem and orders staged bucketed-by-orderkey in
    a temp dir, so the fact-fact join plans with NO shuffle Exchange on
    either side — the amortized co-location shape for joins that repeat
    every pipeline run. The function asserts the Exchange-free property
    on the executed plan and fails loudly if a shuffle sneaks in; the
    oracle is plain Q3 (bucketing must be semantically transparent)."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.bucketing import write_bucketed

    register_views(spark, sf_dir)
    # Fixed table names + a wiped scratch dir: repeated bench/oracle
    # runs overwrite one metastore entry instead of accumulating
    # q3b_*_N tables and mkdtemp directories forever.
    tmp = _scratch_dir("bucketed_q3")
    lt, ot = "q3b_lineitem", "q3b_orders"
    for name in (lt, ot):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    from mission_data_pipeline_spark.sinks.compact import dataset_bytes

    # size-proportional bucket count (see _q5_bucketed_spark: one task
    # per bucket, so a fixed count caps join parallelism at scale)
    n_buckets = max(
        8,
        min(
            256,
            dataset_bytes(f"{sf_dir}/lineitem.parquet")
            // (128 * 1024 * 1024)
            + 1,
        ),
    )
    write_bucketed(
        spark.table("lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"
        ),
        lt,
        keys=["l_orderkey"],
        n_buckets=n_buckets,
        sort_by=["l_orderkey"],
        path=f"{tmp}/lineitem",
    )
    write_bucketed(
        spark.table("orders").select("o_orderkey", "o_custkey", "o_orderdate"),
        ot,
        keys=["o_orderkey"],
        n_buckets=n_buckets,
        sort_by=["o_orderkey"],
        path=f"{tmp}/orders",
    )
    cust = spark.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = (
        spark.table(ot)
        .filter(F.col("o_orderdate") < "1998-03-15")
        .join(
            F.broadcast(cust.select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    l = spark.table(lt).filter(F.col("l_shipdate") > "1995-03-15")
    out = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(20,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    if "Exchange hashpartitioning" in final:
        raise RuntimeError(
            "bucketed Q3 planned a shuffle Exchange — co-location lost:\n"
            + final[:4000]
        )
    return out


_q(
    "q3_shipping_priority",
    _same(
        _Q3_SQL,
        "J*,A2,D8",
        "TPC-H Q3-style three-way join + top-N",
    ),
)

_q(
    "q3_bucketed_colocated",
    Query(
        _q3_bucketed_spark,
        _Q3_SQL,
        "J*+,co-location",
        "Q3 over pre-bucketed fact tables: both fact sides staged "
        "bucketed-by-orderkey, the fact-fact join and the downstream "
        "groupBy plan with zero shuffle Exchange (asserted in-plan, "
        "loud failure) — the amortized co-location shape for repeated "
        "joins; oracle is plain Q3, bucketing semantically transparent",
    ),
)

#: session -> sf_dir whose bucketed q5 fact copies are already staged
#: (weak keys: dead sessions must not pin the memo).
_Q5_STAGED: "weakref.WeakKeyDictionary[SparkSession, str]" = (
    weakref.WeakKeyDictionary()
)

# ONE Q5 text: q5_nation_revenue runs/oracles it directly, and
# q5_bucketed_broadcast_dims oracles against it — the at-scale plan must
# be semantically transparent.
_Q5_SQL = f"""
        SELECT n.n_name, {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
        ORDER BY n.n_name
        """

_q(
    "q5_nation_revenue",
    _same(
        _Q5_SQL,
        "J*",
        "TPC-H Q5-style six-way join",
    ),
)


def _q5_broadcast_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 in the at-scale shape: every dim broadcast, facts co-located.

    The plain ``q5_nation_revenue`` plans a six-way SMJ cascade that
    shuffles the full fact table on three different keys — the worst
    measured scale cliff in BASELINE.md (27x wall at 100x data, sf10
    probe). The 100 TB plan instead:

    - region('ASIA') ⋈ nation collapses to a 5-row broadcast;
    - supplier and customer prune to ASIA nations and broadcast onto
      the facts (map-side, no fact movement);
    - lineitem and orders are staged bucketed-by-orderkey
      (`operators/bucketing.py write_bucketed`), so the one remaining
      fact-fact join needs NO Exchange on either side — the
      ``c_nationkey = s_nationkey`` coupling becomes a post-join filter
      so the join keys stay exactly the bucket key;
    - the only shuffles left move ≤ (5 groups x n_partitions) rows:
      the post-partial-agg exchange and the 5-row sort.

    Asserted loudly on the planned query: every hash/range Exchange
    partitions on ``n_name`` — none on orderkey/custkey/suppkey. On a
    cluster where customer outgrows the broadcast threshold, the same
    query degrades to ONE fact shuffle (orders on o_custkey) instead of
    three. Oracle = plain Q5 (the plan rewrite is semantically
    transparent).
    """
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.bucketing import write_bucketed

    register_views(spark, sf_dir)
    lt, ot = "q5b_lineitem", "q5b_orders"
    # Staging is a ONE-TIME deployment cost (a cluster buckets its fact
    # tables once, not per query), so memoize it per (session, sf_dir):
    # the first invocation in a process pays the write, every subsequent
    # one times the query alone. bench.py's best-of-2 min therefore
    # records the query-only number; the first-run sample (staging
    # included) is recorded separately (BASELINE.md r07).
    if _Q5_STAGED.get(spark) != sf_dir:
        from mission_data_pipeline_spark.sinks.compact import dataset_bytes

        # Bucket count is a PHYSICAL layout knob that must scale with
        # the data: a bucketed-table scan runs one task per bucket, so
        # a fixed 8 caps the co-located join's parallelism at 8 no
        # matter the cluster (measured at sfx100: 600M lineitem rows on
        # 32 cores ran the join 4x slower than linear scaling predicts
        # — BASELINE.md §round 10). ~128 MiB of source parquet per
        # bucket, floor 8 (small-SF layout unchanged), cap 256.
        n_buckets = max(
            8,
            min(
                256,
                dataset_bytes(f"{sf_dir}/lineitem.parquet")
                // (128 * 1024 * 1024)
                + 1,
            ),
        )
        tmp = _scratch_dir("bucketed_q5")
        for name in (lt, ot):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        write_bucketed(
            spark.table("lineitem").select(
                "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
            ),
            lt,
            keys=["l_orderkey"],
            n_buckets=n_buckets,
            sort_by=["l_orderkey"],
            path=f"{tmp}/lineitem",
        )
        write_bucketed(
            spark.table("orders").select("o_orderkey", "o_custkey"),
            ot,
            keys=["o_orderkey"],
            n_buckets=n_buckets,
            sort_by=["o_orderkey"],
            path=f"{tmp}/orders",
        )
        _Q5_STAGED[spark] = sf_dir
    asia_nations = (
        spark.table("nation")
        .join(
            F.broadcast(
                spark.table("region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    sup = (
        spark.table("supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(asia_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    cust = (
        spark.table("customer")
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(asia_nations.select("n_nationkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_nationkey")
    )
    o = spark.table(ot).join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    l = spark.table(lt).join(
        F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
    )
    out = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(20,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy("n_name")
    )
    # Catalyst pushes the nationkey filter back into the join as a second
    # equi-key, and requireAllClusterKeysForCoPartition (default true)
    # then refuses to accept bucketing-on-orderkey as co-partitioning for
    # the (nationkey, orderkey) key set — even though a subset key fully
    # co-locates the join. Relax the knob for PLANNING ONLY (QueryExecution
    # caches executedPlan, so the later action reuses this plan), restore
    # it immediately.
    knob = "spark.sql.requireAllClusterKeysForCoPartition"
    prev = spark.conf.get(knob, "true")
    spark.conf.set(knob, "false")
    try:
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(knob, prev)
    final = plan.split("== Initial Plan ==")[0]
    bad = [
        line
        for line in final.splitlines()
        if ("Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line)
        and "n_name" not in line
    ]
    if bad:
        raise RuntimeError(
            "broadcast-dim Q5 planned a fact shuffle — at-scale shape lost:\n"
            + "\n".join(bad)
            + "\n\n"
            + final[:4000]
        )
    return out


_q(
    "q5_bucketed_broadcast_dims",
    Query(
        _q5_broadcast_spark,
        _Q5_SQL,
        "J*+,co-location",
        "Q5 in the at-scale shape: region⋈nation collapsed to a 5-row "
        "broadcast, supplier/customer pruned to ASIA and broadcast onto "
        "the facts, lineitem⋈orders co-located via bucketing-by-orderkey "
        "— zero fact shuffles (every Exchange partitions on n_name, "
        "asserted in-plan with loud failure); oracle is plain Q5",
    ),
)

_q(
    "correlated_scalar_subquery",
    _same(
        """
        SELECT p.p_brand, COUNT(*) AS n_above
        FROM part p
        WHERE p.p_retailprice > (SELECT AVG(p2.p_retailprice) FROM part p2
                                 WHERE p2.p_brand = p.p_brand)
        GROUP BY p.p_brand
        ORDER BY p.p_brand
        """,
        "J*+",
        "correlated scalar subquery (decorrelated by Catalyst)",
    ),
)

# ---------------------------------------------------------------------------
# Set operations / union / distinct (D4, X1)
# ---------------------------------------------------------------------------

_q(
    "d4_union_all",
    _same(
        """
        SELECT k, COUNT(*) AS n FROM (
          SELECT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'R'
          UNION ALL
          SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
        ) u
        GROUP BY k
        HAVING COUNT(*) > 4
        ORDER BY k
        """,
        "D4",
        "UNION ALL then aggregate (immutable dataset merge)",
    ),
)

_q(
    "set_union_distinct",
    _same(
        """
        SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
        UNION
        SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 1000
        ORDER BY nk
        """,
        "D4",
        "UNION with duplicate elimination",
    ),
)

_q(
    "set_intersect",
    _same(
        """
        SELECT l_partkey AS pk FROM lineitem WHERE l_returnflag = 'R'
        INTERSECT
        SELECT l_partkey AS pk FROM lineitem WHERE l_returnflag = 'A'
        ORDER BY pk
        """,
        "D4+",
        "INTERSECT of two key sets",
    ),
)

_q(
    "set_except",
    _same(
        """
        SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
        ORDER BY k
        """,
        "D4+",
        "EXCEPT (anti set difference): BUILDING-segment customers minus "
        "those with an urgent order (the unfiltered customer-minus-orders "
        "variant was a vacuous 0-row check — every customer has orders)",
    ),
)

_q(
    "x1_distinct_dedup",
    _same(
        """
        SELECT DISTINCT l_returnflag, l_linestatus
        FROM lineitem
        ORDER BY l_returnflag, l_linestatus
        """,
        "X1",
        "exact duplicate elimination",
    ),
)

# Bag semantics: EXCEPT ALL / INTERSECT ALL subtract/keep per-OCCURRENCE
# (multiplicity-aware), unlike their set twins above — the multiset
# variant matters whenever row counts carry meaning (inventory deltas,
# event multiplicity reconciliation).
_q(
    "set_bag_semantics_all",
    _same(
        """
        SELECT 'except_all' AS op, nk, COUNT(*) AS n FROM (
          SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 5000
          EXCEPT ALL
          SELECT s_nationkey AS nk FROM supplier
        ) GROUP BY nk
        UNION ALL
        SELECT 'intersect_all', nk, COUNT(*) FROM (
          SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 5000
          INTERSECT ALL
          SELECT s_nationkey AS nk FROM supplier
        ) GROUP BY nk
        ORDER BY op, nk
        """,
        "D4+",
        "EXCEPT ALL / INTERSECT ALL bag semantics: per-occurrence "
        "subtraction/retention (multiplicity-aware), vs the set "
        "variants' per-value behavior",
    ),
)

_q(
    "join_null_safe_eq",
    _dialect(
        """
        WITH a AS (
          SELECT CASE WHEN l_linenumber > 5 THEN NULL
                      ELSE l_linenumber END AS k,
                 COUNT(*) AS na
          FROM lineitem GROUP BY 1
        ), b AS (
          SELECT CASE WHEN l_linenumber % 2 = 0 THEN NULL
                      ELSE l_linenumber END AS k,
                 COUNT(*) AS nb
          FROM lineitem GROUP BY 1
        )
        SELECT a.k, a.na, b.nb
        FROM a JOIN b ON a.k <=> b.k
        ORDER BY a.k NULLS FIRST
        """,
        """
        WITH a AS (
          SELECT CASE WHEN l_linenumber > 5 THEN NULL
                      ELSE l_linenumber END AS k,
                 COUNT(*) AS na
          FROM lineitem GROUP BY 1
        ), b AS (
          SELECT CASE WHEN l_linenumber % 2 = 0 THEN NULL
                      ELSE l_linenumber END AS k,
                 COUNT(*) AS nb
          FROM lineitem GROUP BY 1
        )
        SELECT a.k, a.na, b.nb
        FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
        ORDER BY a.k NULLS FIRST
        """,
        "J*+",
        "null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL "
        "keys match each other — the semantic plain equi-joins silently "
        "drop; required for joining on nullable dimension keys",
    ),
)

# ---------------------------------------------------------------------------
# Pivot / unpivot (D3, S2)
# ---------------------------------------------------------------------------


def _pivot_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    orders = spark.table("orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("o_orderpriority")
    )


_q(
    "d3_pivot_wide",
    Query(
        _pivot_spark,
        """
        SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
               COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        "D3",
        "wide pivot (long→wide, one column per category)",
    ),
)


def _unpivot_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    li = spark.table("lineitem").filter(F.col("l_orderkey") <= 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(2, 'quantity', l_quantity, 'extendedprice', l_extendedprice)"
            " as (measure, value)"
        ),
    ).orderBy("l_orderkey", "l_linenumber", "measure")


_q(
    "s2_unpivot_melt",
    Query(
        _unpivot_spark,
        """
        SELECT l_orderkey, l_linenumber, measure, value FROM (
          SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value
          FROM lineitem WHERE l_orderkey <= 100
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
          FROM lineitem WHERE l_orderkey <= 100
        ) u
        ORDER BY l_orderkey, l_linenumber, measure
        """,
        "S2",
        "wide→long melt (CSV telemetry extractor shape)",
    ),
)

