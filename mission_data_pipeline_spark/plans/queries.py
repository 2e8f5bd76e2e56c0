"""The declared query/operator library with DuckDB oracles.

Every operator in SURVEY.md §2 (plus the required large-scale
training-data extensions X1–X6) is declared here as a named query over
the driver's test tables, paired with an ANSI-SQL oracle that DuckDB
executes on the same parquet files. The driver hash-compares the two at
sf0.01 — so every query follows strict cross-engine determinism rules:

- **Money/double aggregation**: ``SUM(CAST(x AS DECIMAL(20,6)))`` then
  ``CAST(CAST(... AS STRING) AS DOUBLE)``. Per-value decimal rounding
  is deterministic and identical in both engines; decimal summation is
  exact and order-independent, so parallel (Spark) and sequential
  (DuckDB) execution produce identical decimals. Plain ``SUM(double)``
  is order-dependent and would hash-mismatch. The final conversion
  goes THROUGH A STRING because DuckDB's direct wide-DECIMAL→DOUBLE
  cast is not correctly rounded (int128·10^-scale in float:
  ``341419040384.500000`` → ``…384.49994``), which diverged from
  Spark's exact BigDecimal conversion once sums crossed ~2^53/10^scale
  (caught by the sf1 cross-scale sweep); decimal→string→double is
  correctly rounded in both engines at any magnitude.
- **Ordering**: every ORDER BY carries a unique tie-break key.
- **Timestamps**: the ``events`` table is TIMESTAMP(NANOS) parquet;
  Spark reads it as ns-longs (``ts_ns``), DuckDB truncates to µs — both
  sides therefore work in **microseconds** (``ts_ns DIV 1000`` ≡
  ``epoch_us(ts)``) or coarser buckets, and date columns are CAST AS
  DATE on both sides.
- **Floats in final output**: rounded AFTER exact arithmetic, never
  before; window running sums follow the frame's total order, which a
  unique tie-break makes engine-independent.

Queries tagged ``oracle=None`` are genuinely non-SQL-expressible (or
would require an unreasonable oracle); the driver records a rows-only
check for those, per the contract.
"""

from __future__ import annotations

import itertools
import os
import shutil
import tempfile
import weakref
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from mission_data_pipeline_spark.sources.tables import (
    TABLES,
    load_table,
    parquet_row_count,
)


#: process-private scratch root, created lazily and reaped at exit.
_SCRATCH_ROOT: Optional[str] = None


def _scratch_dir(name: str) -> str:
    """Per-query scratch directory under a PROCESS-PRIVATE root, wiped
    and recreated on every invocation. Query functions return DataFrames
    the caller collects LAZILY, so a scratch dir must outlive the
    function — per-call ``mkdtemp`` therefore accumulates one directory
    per bench/oracle run and never frees it. A fixed path *per query
    name* bounds the residue to a single leftover, reclaimed by the next
    invocation (query runs are sequential by the driver's contract).

    The root is ``mkdtemp``-scoped to this process (not a fixed
    world-shared ``/tmp/mdps_scratch``): two concurrent runs on one host
    (bench + driver, parallel CI) would otherwise wipe each other's live
    query inputs mid-read, and a foreign-owned dir under a sticky-bit
    /tmp would make the recreate raise. ``atexit`` reaps the whole root.
    """
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        import atexit

        _SCRATCH_ROOT = tempfile.mkdtemp(prefix=f"mdps_scratch_{os.getpid()}_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    d = os.path.join(_SCRATCH_ROOT, name)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    return d


@dataclass(frozen=True)
class Query:
    """One declared operator: a Spark plan and its DuckDB oracle."""

    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    survey_id: str  # SURVEY.md §2 operator id(s) this demonstrates
    description: str = ""


#: session -> (sf_dir, input_repartition) its views currently expose.
#: Weak keys: a dead session's entry must not linger, because id()-style
#: keys can be recycled onto a new session with no temp views yet.
_REGISTERED: "weakref.WeakKeyDictionary[SparkSession, tuple]" = (
    weakref.WeakKeyDictionary()
)

#: Adversarial-layout knob for the partitioning-invariance sweep
#: (scripts/check_correctness.py --perturb): when set, every registered
#: view is re-keyed through .repartition(n) so no query can silently
#: depend on the parquet files' physical row order or split layout. A
#: correct engine — commutative-exact accumulators (quantized BIGINT /
#: DECIMAL sums), order-pinned windows, tie-broken ranks — produces
#: bit-identical results under any layout; a raw-double cross-partition
#: sum does not, which is exactly the defect class this exposes.
_INPUT_REPARTITION: int | None = None

#: Sampled-oracle knob (scripts/check_correctness.py --oracle-sample N):
#: when set, the ``documents`` view keeps only rows whose seeded md5
#: bucket is 0 mod N — a deterministic, content-keyed 1/N subset both
#: engines compute identically (the DuckDB views get the same
#: predicate). This keeps the heaviest document-table oracles (exact
#: n-gram decontamination, substring dedup) verifiable at probe scales
#: where the full DuckDB replay exceeds the box (the sfx100 bloom twin
#: overran the 63 GB disk, NOTES r10). Documents-only by design: the
#: box-bound twins all read ``documents``; sampling other tables would
#: break join consistency (orders↔lineitem) for no verification gain.
_INPUT_SAMPLE_MOD: int | None = None

#: seed for the sampling hash — fixed, so a sampled run is reproducible
#: across engines and sessions by construction.
_INPUT_SAMPLE_SEED = 11


def set_input_repartition(n: "int | None") -> None:
    """Set (or clear with None) the adversarial input repartitioning."""
    global _INPUT_REPARTITION
    _INPUT_REPARTITION = n


def set_input_sample(mod: "int | None") -> None:
    """Set (or clear with None) deterministic 1/mod documents sampling."""
    global _INPUT_SAMPLE_MOD
    if mod is not None and mod < 1:
        raise ValueError(f"sample modulus must be >= 1, got {mod}")
    _INPUT_SAMPLE_MOD = mod


def input_sample_predicate_duckdb() -> "str | None":
    """The DuckDB WHERE predicate matching the current sampling knob
    (None when sampling is off) — check_correctness applies it to its
    ``documents`` view so both engines see the identical subset."""
    if _INPUT_SAMPLE_MOD is None:
        return None
    return (
        f"CAST(('0x' || substr(md5('{_INPUT_SAMPLE_SEED}|' || "
        f"CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) "
        f"% {_INPUT_SAMPLE_MOD} = 0"
    )


def register_views(spark: SparkSession, sf_dir: str, *, force: bool = False) -> None:
    """Register the test tables as temp views (events gains ts_ns/ts).

    Memoized on the session's *current* (sf_dir, repartition) pair:
    every declared query calls this, so without the memo a bench/
    correctness sweep re-reads ten parquet footers and re-registers ten
    views per query — pure fixed overhead that drowns real per-query
    deltas. Switching sf_dir or the perturbation knob re-registers (the
    views always expose exactly one layout); the tables are static
    driver-provided parquet, so a same-key re-use can never change
    results. Pass ``force=True`` after externally replacing the files
    in place.
    """
    key = (sf_dir, _INPUT_REPARTITION, _INPUT_SAMPLE_MOD)
    if not force and _REGISTERED.get(spark) == key:
        return
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        if name == "documents" and _INPUT_SAMPLE_MOD is not None:
            from pyspark.sql import functions as F

            df = df.filter(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "|",
                                F.lit(str(_INPUT_SAMPLE_SEED)),
                                F.col("doc_id").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % _INPUT_SAMPLE_MOD
                == 0
            )
        if _INPUT_REPARTITION is not None:
            df = df.repartition(_INPUT_REPARTITION)
        df.createOrReplaceTempView(name)
    _REGISTERED[spark] = key


def _sql(spark_sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(spark_sql)

    return run


def _same(sql: str, survey_id: str, description: str = "") -> Query:
    """Query whose Spark SQL and DuckDB SQL are the same text."""
    return Query(_sql(sql), sql, survey_id, description)


def _dialect(spark_sql: str, duck_sql: str, survey_id: str, description: str = "") -> Query:
    return Query(_sql(spark_sql), duck_sql, survey_id, description)


# Exact-decimal money sum, cast back to double (see module docstring).
def _dsum(col: str) -> str:
    return f"CAST(CAST(SUM(CAST({col} AS DECIMAL(20,6))) AS STRING) AS DOUBLE)"


QUERIES: dict[str, Query] = {}


def _q(name: str, q: Query) -> None:
    QUERIES[name] = q


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
            if _INPUT_REPARTITION is None:
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
_Q3_SQL = f"""
        SELECT l.l_orderkey,
               {_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
               CAST(CAST(o.o_orderdate AS DATE) AS STRING) AS orderdate
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
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

# ---------------------------------------------------------------------------
# Window / time-series (W*, plus extension windows over events)
# ---------------------------------------------------------------------------

_EV_SPARK = "WITH ev AS (SELECT *, ts_ns DIV 1000 AS ts_us FROM events)"
_EV_DUCK = "WITH ev AS (SELECT *, epoch_us(ts) AS ts_us FROM events)"


def _ev(spark_body: str, duck_body: str | None = None) -> tuple[str, str]:
    body = spark_body
    return _EV_SPARK + body, _EV_DUCK + (duck_body if duck_body is not None else body)


_sql_w_rn, _duck_w_rn = _ev(
    """
    SELECT user_id, ts_us, event_type, value FROM (
      SELECT user_id, ts_us, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS rn
      FROM ev
    ) t WHERE rn <= 3
    ORDER BY user_id, ts_us, event_type
    """
)
_q(
    "w_row_number_first_events",
    _dialect(_sql_w_rn, _duck_w_rn, "W3+", "first 3 events per user via ROW_NUMBER"),
)

_sql_w_lag, _duck_w_lag = _ev(
    """
    SELECT user_id, ts_us,
           ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts_us, event_id), 6) AS delta,
           CAST(ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS gap_us
    FROM ev WHERE user_id <= 20
    ORDER BY user_id, ts_us
    """
)
_q(
    "w_lag_delta_gap",
    _dialect(_sql_w_lag, _duck_w_lag, "W3,W4", "per-user deltas + arrival gaps via LAG (seq-gap detection analog)"),
)

_sql_w_run, _duck_w_run = _ev(
    """
    SELECT user_id, ts_us,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_value
    FROM ev WHERE user_id <= 10
    ORDER BY user_id, ts_us
    """
)
_q(
    "w_running_sum",
    _dialect(_sql_w_run, _duck_w_run, "W*+", "running sum in deterministic frame order"),
)

_sql_w_avg, _duck_w_avg = _ev(
    """
    SELECT user_id, ts_us,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS moving_avg
    FROM ev WHERE user_id <= 10
    ORDER BY user_id, ts_us
    """
)
_q(
    "w_moving_average",
    _dialect(_sql_w_avg, _duck_w_avg, "W*+", "4-row moving average"),
)

_q(
    "w_rank_orders_by_priority",
    _same(
        """
        SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 RANK() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM orders
        ) t WHERE rnk <= 5
        ORDER BY o_orderpriority, rnk, o_orderkey
        """,
        "W*+",
        "per-group top-k via RANK",
    ),
)

_sql_w_tumb, _duck_w_tumb = _ev(
    f"""
    SELECT CAST(ts_us DIV 3600000000 AS BIGINT) AS hour_bucket,
           event_type, COUNT(*) AS n, {_dsum('value')} AS sum_value
    FROM ev
    GROUP BY 1, 2
    ORDER BY hour_bucket, event_type
    """,
    f"""
    SELECT CAST(ts_us // 3600000000 AS BIGINT) AS hour_bucket,
           event_type, COUNT(*) AS n, {_dsum('value')} AS sum_value
    FROM ev
    GROUP BY 1, 2
    ORDER BY hour_bucket, event_type
    """,
)
_q(
    "w1_tumbling_window",
    _dialect(_sql_w_tumb, _duck_w_tumb, "W1", "tumbling 1-hour window aggregate (micro-batch analog)"),
)


_STREAM_SINK_SEQ = itertools.count()


def _streaming_tumbling_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE Structured Streaming execution, driver-checked: events
    replayed through readStream (availableNow trigger), watermarked
    tumbling 1-hour counts into a memory sink, run to completion. In
    complete output mode the final table equals the batch aggregate, so
    the same SQL oracles the streaming engine's stateful path
    (streaming/windows.py windowed_stats shape)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # streaming file source needs a directory; glob-filter to the one table
    raw = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_field = batch_schema["ts"].dataType
    if isinstance(ts_field, T.LongType):
        # TIMESTAMP(NANOS) flavor read as epoch-ns longs (tables.py note)
        ev = raw.withColumn("event_time", F.timestamp_micros(F.expr("ts DIV 1000")))
    else:
        ev = raw.withColumn("event_time", F.col("ts").cast("timestamp"))
    agg = (
        ev.withWatermark("event_time", "1 hour")
        .groupBy(F.window("event_time", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").cast("long").alias("hour_start"),
            "event_type",
            "n",
        )
    )
    sink = f"w1_stream_sink_{next(_STREAM_SINK_SEQ)}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        q.stop()
    return spark.table(sink).orderBy("hour_start", "event_type")


_q(
    "w1_streaming_tumbling",
    Query(
        _streaming_tumbling_spark,
        _EV_DUCK
        + """
        SELECT ts_us // 1000000 // 3600 * 3600 AS hour_start,
               event_type, COUNT(*) AS n
        FROM ev
        GROUP BY 1, 2
        ORDER BY hour_start, event_type
        """,
        "W1,W4",
        "REAL Structured Streaming run (readStream -> watermarked tumbling "
        "window -> memory sink, availableNow to completion) — the final "
        "state of the stateful streaming aggregate must equal the batch "
        "SQL oracle",
    ),
)


def _streaming_dedup_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming bounded-state dedup, driver-checked: the events table is
    streamed TWICE (two file sources unioned — every row a duplicate)
    through dropDuplicatesWithinWatermark on event_id; the surviving
    stream must be exactly the distinct batch table
    (streaming/windows.py dedup_stream_content shape)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def src() -> DataFrame:
        return (
            spark.readStream.schema(batch_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )

    ev = src().unionByName(src())
    if isinstance(batch_schema["ts"].dataType, T.LongType):
        ev = ev.withColumn("event_time", F.timestamp_micros(F.expr("ts DIV 1000")))
    else:
        ev = ev.withColumn("event_time", F.col("ts").cast("timestamp"))
    dd = (
        ev.withWatermark("event_time", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros("event_time").alias("ts_us"),
        )
    )
    sink = f"w4_stream_dedup_sink_{next(_STREAM_SINK_SEQ)}"
    q = (
        dd.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        q.stop()
    return spark.table(sink).orderBy("event_id")


_q(
    "w4_streaming_dedup",
    Query(
        _streaming_dedup_spark,
        _EV_DUCK
        + """
        SELECT event_id, user_id, event_type, ts_us
        FROM ev
        ORDER BY event_id
        """,
        "W4,X1",
        "REAL streaming bounded-state dedup: the table streamed twice "
        "(100% duplicates) through dropDuplicatesWithinWatermark must "
        "emit exactly the distinct batch table",
    ),
)


def _streaming_ewma_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL streaming EWMA run (streaming/stateful.py ewma_stream): the
    events slice is re-laid as four TIME-CONTIGUOUS files (global
    (t_us, event_id) order ntile'd into slices, explicit ascending
    mtimes) and streamed with maxFilesPerTrigger=1, so every series'
    smoothing state genuinely crosses micro-batch boundaries in time
    order. Each row is emitted exactly once with its smoothed value;
    the full emission set must equal the batch recurrence — the same
    recursive-CTE oracle shape as w_ewma_smoothing, computed by a LIVE
    stateful stream instead. Aborts loudly if the source collapsed into
    fewer than three data-bearing micro-batches."""
    import glob as _glob

    from pyspark.sql import Window, functions as F

    from mission_data_pipeline_spark.streaming.stateful import ewma_stream

    register_views(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="mdps_ewma_stream_")
    try:
        stream_dir = os.path.join(tmp, "in")
        os.makedirs(stream_dir)
        ev = spark.sql(
            "SELECT user_id AS key, event_id, ts_ns DIV 1000 AS t_us, "
            "value FROM events WHERE user_id < 10"
        ).withColumn(
            "__slice", F.ntile(4).over(Window.orderBy("t_us", "event_id"))
        )
        for i in range(1, 5):
            d = os.path.join(tmp, f"slice{i}")
            (
                ev.filter(F.col("__slice") == i)
                .drop("__slice")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(d)
            )
            src = _glob.glob(os.path.join(d, "part-*.parquet"))[0]
            dst = os.path.join(stream_dir, f"{i:02d}.parquet")
            shutil.copy(src, dst)
            os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
        stream = (
            spark.readStream.schema(
                "key long, event_id long, t_us long, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        sink = f"w_ewma_stream_sink_{next(_STREAM_SINK_SEQ)}"
        q = (
            ewma_stream(stream, alpha=0.25)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(300)
            n_batches = sum(
                1 for p in q.recentProgress if p["numInputRows"] > 0
            )
        finally:
            q.stop()
        if n_batches < 3:
            raise RuntimeError(
                f"streaming ewma ran as {n_batches} data micro-batches — "
                "cross-batch smoothing state was not exercised"
            )
        return spark.table(sink).select(
            "key", "t_us", "event_id", "value", "ewma"
        ).orderBy("key", "t_us", "event_id")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_q(
    "w3_streaming_ewma",
    Query(
        _streaming_ewma_spark,
        """
        WITH RECURSIVE s AS (
          SELECT user_id AS key, event_id, epoch_us(ts) AS t, value,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ) AS n
          FROM events WHERE user_id < 10
        ),
        rec AS (
          SELECT key, event_id, t, value, n,
                 value AS st, value AS ewma
          FROM s WHERE n = 1
          UNION ALL
          SELECT s.key, s.event_id, s.t, s.value, s.n,
                 CASE WHEN s.value IS NULL THEN rec.st
                      WHEN rec.st IS NULL THEN s.value
                      ELSE 0.25 * s.value + 0.75 * rec.st END,
                 CASE WHEN s.value IS NULL THEN NULL
                      WHEN rec.st IS NULL THEN s.value
                      ELSE 0.25 * s.value + 0.75 * rec.st END
          FROM rec JOIN s ON s.key = rec.key AND s.n = rec.n + 1
        )
        SELECT key, t AS t_us, event_id, value, ewma
        FROM rec
        ORDER BY key, t_us, event_id
        """,
        "W3,W1+",
        "REAL streaming EWMA (applyInPandasWithState): per-channel "
        "smoothing state carried across four time-ordered micro-batches "
        "of a live file stream; the emission set equals the batch "
        "recurrence bit-exactly (recursive-CTE oracle)",
    ),
)


def _streaming_stateful_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM stateful streaming operator, driver-checked
    (streaming/stateful.py cumulative_group_stats): events re-laid-out
    as four files and streamed with maxFilesPerTrigger=1, so per-user
    state genuinely crosses micro-batch boundaries; every batch emits
    the user's cumulative stats, and the final emission per user must
    equal the batch GROUP BY. The run aborts loudly if the source
    collapsed into a single micro-batch (emissions == users), so the
    cross-batch state carry is actually exercised, not assumed."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.streaming.stateful import (
        cumulative_group_stats,
    )

    register_views(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="mdps_stateful_stream_")
    try:
        (
            spark.table("events")
            .filter(F.col("user_id") <= 100)
            .select(
                F.col("user_id").alias("key"),
                F.col("event_id").alias("id"),
                F.expr("ts_ns DIV 1000").alias("ts_us"),
            )
            .repartition(4)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        stream = (
            spark.readStream.schema("key long, id long, ts_us long")
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        sink = f"w3_stateful_sink_{next(_STREAM_SINK_SEQ)}"
        q = (
            cumulative_group_stats(stream)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(300)
        finally:
            q.stop()
        emitted = spark.table(sink)
        n_emissions, n_keys = emitted.agg(
            F.count("*"), F.count_distinct("key")
        ).first()
        if n_emissions <= n_keys:
            raise RuntimeError(
                f"stateful stream ran as a single micro-batch "
                f"({n_emissions} emissions for {n_keys} keys) — "
                "cross-batch state carry was not exercised"
            )
        return (
            emitted.groupBy(F.col("key").alias("user_id"))
            .agg(
                F.max(
                    F.struct("n_events", "id_sum", "ts_min_us", "ts_max_us")
                ).alias("f")
            )
            .select(
                "user_id",
                F.col("f.n_events").alias("n_events"),
                F.col("f.id_sum").alias("id_sum"),
                F.col("f.ts_min_us").alias("ts_min_us"),
                F.col("f.ts_max_us").alias("ts_max_us"),
            )
            .orderBy("user_id")
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_q(
    "w3_streaming_stateful_cumulative",
    Query(
        _streaming_stateful_spark,
        """
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(event_id) AS BIGINT) AS id_sum,
               MIN(epoch_us(ts)) AS ts_min_us,
               MAX(epoch_us(ts)) AS ts_max_us
        FROM events WHERE user_id <= 100
        GROUP BY user_id ORDER BY user_id
        """,
        "W3,W1+",
        "REAL custom stateful streaming run (applyInPandasWithState, "
        "append mode): per-user cumulative stats carried in the state "
        "store across four forced micro-batches; integer accumulators "
        "make the final emission order-independent and equal to the "
        "batch GROUP BY oracle",
    ),
)


def _stream_static_enrich_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-static join run: the events stream enriched against
    the static customer dimension (the reference-data pattern — the
    static side is re-read per micro-batch, so dimension updates are
    picked up without restarting the stream). Complete-mode counts per
    (segment, event_type) must equal the batch join."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    register_views(spark, sf_dir)
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    static = spark.table("customer").select("c_custkey", "c_mktsegment")
    agg = (
        raw.join(static, raw["user_id"] == static["c_custkey"])
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count("*").alias("n"))
    )
    sink = f"w_stream_static_sink_{next(_STREAM_SINK_SEQ)}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        q.stop()
    return spark.table(sink).orderBy("c_mktsegment", "event_type")


_q(
    "w_streaming_static_enrich",
    Query(
        _stream_static_enrich_spark,
        """
        SELECT c.c_mktsegment, e.event_type, COUNT(*) AS n
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c.c_mktsegment, e.event_type
        ORDER BY c.c_mktsegment, e.event_type
        """,
        "W1+,J*",
        "REAL stream-static join run: streaming events enriched against "
        "the static customer dimension (re-read per micro-batch — the "
        "slowly-changing reference-data pattern); complete-mode final "
        "state equals the batch join",
    ),
)


def _foreachbatch_upsert_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ingest from an at-least-once stream, composed from
    two primitives the engine already proves separately: foreachBatch
    micro-batch delivery (streaming/pipeline.py shape) + the idempotent
    last-wins MERGE sink (sinks/merge.py). Events are re-laid-out as
    four files and streamed one file per micro-batch; every batch
    merge-upserts into the same parquet base keyed on event_id. After
    the stream completes, the FIRST batch is re-delivered (version 0 —
    a restart replay) and must change nothing. Final state must equal
    the plain batch table."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.sinks.merge import merge_upsert

    register_views(spark, sf_dir)
    src = _scratch_dir("febu_src")
    ckpt = _scratch_dir("febu_ckpt")
    base = _scratch_dir("febu_base") + "/ds"
    try:
        (
            spark.table("events")
            .filter(F.col("user_id") <= 60)
            .select(
                "event_id",
                "user_id",
                "event_type",
                F.expr("ts_ns DIV 1000").alias("ts_us"),
            )
            .repartition(4)
            .write.mode("overwrite")
            .parquet(src)
        )

        def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
            merge_upsert(
                spark,
                base,
                batch_df.withColumn("version", F.lit(epoch_id + 1)),
                key_cols=["event_id"],
                version_col="version",
            )

        stream = (
            spark.readStream.schema(
                "event_id long, user_id long, event_type string, ts_us long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(apply_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.awaitTermination(300)
        finally:
            q.stop()
        # Restart replay: re-deliver one source file as a STALE batch
        # (version 0 < every applied version) — idempotence means the
        # final state is untouched.
        first_file = sorted(
            f for f in __import__("os").listdir(src) if f.endswith(".parquet")
        )[0]
        merge_upsert(
            spark,
            base,
            spark.read.parquet(f"{src}/{first_file}").withColumn(
                "version", F.lit(0)
            ),
            key_cols=["event_id"],
            version_col="version",
        )
        return (
            spark.read.parquet(base)
            .select("event_id", "user_id", "event_type", "ts_us")
            .orderBy("event_id")
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


_q(
    "w_streaming_foreachbatch_upsert",
    Query(
        _foreachbatch_upsert_spark,
        """
        SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
        FROM events WHERE user_id <= 60
        ORDER BY event_id
        """,
        "W1,L+,P2",
        "REAL foreachBatch run composed with the idempotent MERGE sink: "
        "four micro-batches upsert into one parquet base, then a stale "
        "restart replay of batch one must change nothing — exactly-once "
        "ingest from at-least-once delivery, final state equals the "
        "batch table",
    ),
)


def _udaf_median_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDAF (functions/udx.py grouped_median): the
    user-defined-aggregate extension point, Arrow-batched per group;
    median chosen because sort-based statistics are order-independent
    (an accumulating float UDAF would not be layout-deterministic)."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.functions.udx import grouped_median

    register_views(spark, sf_dir)
    return (
        spark.table("events")
        .groupBy("event_type")
        # note: Spark disallows mixing a GROUPED_AGG pandas UDF with
        # JVM aggregates in one agg() — the UDAF aggregates alone
        .agg(F.round(grouped_median("value"), 6).alias("median_value"))
        .orderBy("event_type")
    )


_q(
    "udaf_grouped_median",
    Query(
        _udaf_median_spark,
        """
        SELECT event_type,
               ROUND(QUANTILE_CONT(value, 0.5), 6) AS median_value
        FROM events GROUP BY event_type ORDER BY event_type
        """,
        "§2.10 UDAF",
        "user-defined aggregate via GROUPED_AGG pandas UDF (Arrow "
        "batch per group, per-group not per-row Python); interpolated "
        "median matches QUANTILE_CONT exactly because sort-based "
        "statistics are addition-order independent",
    ),
)


def _udtf_spans_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (functions/udx.py TokenSpans) used LATERAL-ly in
    SQL: one row per token with position and length, aggregated so the
    output stays small. The hot-path equivalent is posexplode — the
    query proves the user-defined table-function extension point."""
    from mission_data_pipeline_spark.functions.udx import register_udx

    register_views(spark, sf_dir)
    register_udx(spark)
    return spark.sql(
        """
        SELECT t.pos,
               COUNT(*) AS n_tokens,
               SUM(t.tok_len) AS total_len,
               MIN(t.tok) AS first_tok
        FROM (SELECT text FROM documents WHERE doc_id < 100) d,
             LATERAL token_spans(d.text) t
        GROUP BY t.pos
        HAVING t.pos < 10
        ORDER BY t.pos
        """
    )


_q(
    "udtf_token_spans",
    Query(
        _udtf_spans_spark,
        """
        WITH spans AS (
          SELECT unnest(list_transform(
                   string_split(text, ' '),
                   (x, i) -> struct_pack(tok := x, pos := CAST(i - 1 AS INT),
                                         tok_len := CAST(len(x) AS INT))),
                 recursive := true)
          FROM documents WHERE doc_id < 100
        )
        SELECT pos, COUNT(*) AS n_tokens,
               CAST(SUM(tok_len) AS BIGINT) AS total_len,
               MIN(tok) AS first_tok
        FROM spans WHERE len(tok) > 0
        GROUP BY pos HAVING pos < 10
        ORDER BY pos
        """,
        "§2.10 UDTF",
        "user-defined table function (Python UDTF, LATERAL in SQL): "
        "per-token fan-out with position/length — the UDTF extension "
        "point, with posexplode documented as the hot-path equivalent",
    ),
)


def _profile_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiling (operators/quality.py
    profile_columns) over the documents table."""
    from mission_data_pipeline_spark.operators.quality import profile_columns

    register_views(spark, sf_dir)
    return profile_columns(
        spark.table("documents"), ["doc_id", "lang", "source", "n_chars"]
    ).orderBy("col_name")


_q(
    "x6_table_profile",
    Query(
        _profile_spark,
        """
        WITH n AS (SELECT COUNT(*) AS n_rows FROM documents)
        SELECT * FROM (
          SELECT 'doc_id' AS col_name, n.n_rows,
                 n.n_rows - COUNT(doc_id) AS n_null,
                 COUNT(DISTINCT doc_id) AS n_distinct,
                 CAST(MIN(doc_id) AS VARCHAR) AS min_value,
                 CAST(MAX(doc_id) AS VARCHAR) AS max_value
          FROM documents, n GROUP BY n.n_rows
          UNION ALL
          SELECT 'lang', n.n_rows, n.n_rows - COUNT(lang),
                 COUNT(DISTINCT lang),
                 CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR)
          FROM documents, n GROUP BY n.n_rows
          UNION ALL
          SELECT 'source', n.n_rows, n.n_rows - COUNT(source),
                 COUNT(DISTINCT source),
                 CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR)
          FROM documents, n GROUP BY n.n_rows
          UNION ALL
          SELECT 'n_chars', n.n_rows, n.n_rows - COUNT(n_chars),
                 COUNT(DISTINCT n_chars),
                 CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
          FROM documents, n GROUP BY n.n_rows
        ) t ORDER BY col_name
        """,
        "X6,A*+",
        "Deequ/TFDV-style column profiling (count / nulls / distinct / "
        "min / max per column) in ONE aggregation pass — the data-"
        "quality report gating a corpus before training",
    ),
)


def _constraints_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint validation (operators/quality.py
    validate_constraints): uniqueness, completeness, range and
    accepted-set checks evaluated in one pass; the report carries the
    measured metric, so the oracle recomputes each check directly."""
    from mission_data_pipeline_spark.operators.quality import (
        Constraint,
        validate_constraints,
    )

    register_views(spark, sf_dir)
    checks = [
        Constraint("unique", "event_id"),
        Constraint("complete", "ts"),
        Constraint("between", "value", lo=-10000.0, hi=10000.0),
        Constraint(
            "accepted_values",
            "event_type",
            values=("view", "click", "purchase", "signup", "error"),
        ),
        Constraint("min_fraction_complete", "props", min_fraction=0.5),
    ]
    return validate_constraints(spark.table("events"), checks).orderBy(
        "check", "column"
    )


_q(
    "x6_constraint_report",
    Query(
        _constraints_spark,
        """
        WITH m AS (
          SELECT COUNT(*) AS n,
                 CAST(COUNT(event_id) - COUNT(DISTINCT event_id) AS DOUBLE)
                   AS uniq_viol,
                 CAST(COUNT(*) - COUNT(ts) AS DOUBLE) / COUNT(*)
                   AS ts_null_frac,
                 CAST(COUNT_IF(value < -10000.0 OR value > 10000.0) AS DOUBLE)
                   AS range_viol,
                 CAST(COUNT_IF(event_type IS NOT NULL AND event_type NOT IN
                      ('view','click','purchase','signup','error')) AS DOUBLE)
                   AS set_viol,
                 CAST(COUNT(*) - COUNT(props) AS DOUBLE) / COUNT(*)
                   AS props_null_frac
          FROM events
        )
        SELECT * FROM (
          SELECT 'accepted_values' AS check, 'event_type' AS column,
                 ROUND(set_viol, 9) AS metric, 0.0 AS threshold,
                 set_viol <= 0.0 AS passed FROM m
          UNION ALL
          SELECT 'between', 'value', ROUND(range_viol, 9), 0.0,
                 range_viol <= 0.0 FROM m
          UNION ALL
          SELECT 'complete', 'ts', ROUND(ts_null_frac, 9), 0.0,
                 ts_null_frac <= 0.0 FROM m
          UNION ALL
          SELECT 'min_fraction_complete', 'props',
                 ROUND(props_null_frac, 9), 0.5,
                 props_null_frac <= 0.5 FROM m
          UNION ALL
          SELECT 'unique', 'event_id', ROUND(uniq_viol, 9), 0.0,
                 uniq_viol <= 0.0 FROM m
        ) t ORDER BY t.check, t.column
        """,
        "X6,P2+",
        "declarative data-quality gate (uniqueness / completeness / "
        "range / accepted-set / completeness-fraction) evaluated in ONE "
        "table scan; the report carries the measured metric alongside "
        "the verdict so a failing gate explains itself",
    ),
)


def _jsonl_quarantine_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-line quarantine path (sources/jsonl.py): a JSONL shard is
    built from documents 0-49 with every doc_id%5==0 line deliberately
    truncated mid-object; jsonl_corrupt_stats must count exactly those,
    and the DROPMALFORMED clean read must keep exactly the others —
    both totals derived by the oracle from the source table, so a
    quarantine that drops too much or too little hash-mismatches."""
    import json as _json

    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.sources.jsonl import (
        jsonl_corrupt_stats,
        read_jsonl,
    )

    register_views(spark, sf_dir)
    fixture = (
        spark.table("documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text")
        .collect()
    )  # fixture construction: 50 rows driver-side, the WARC-query pattern
    lines = []
    for r in sorted(fixture, key=lambda r: r["doc_id"]):
        if r["doc_id"] % 5 == 0:
            lines.append('{"doc_id": ' + str(r["doc_id"]))  # truncated
        else:
            lines.append(_json.dumps({"doc_id": r["doc_id"], "text": r["text"]}))
    d = _scratch_dir("jsonl_quar")
    with open(f"{d}/shard.jsonl", "w") as f:
        f.write("\n".join(lines) + "\n")
    schema = "doc_id long, text string"
    stats = jsonl_corrupt_stats(spark, f"{d}/shard.jsonl", schema=schema)
    clean = read_jsonl(spark, f"{d}/shard.jsonl", schema=schema).agg(
        F.count("*").alias("n_clean"),
        F.sum("doc_id").cast("long").alias("clean_docid_sum"),
    )
    return stats.select(
        "n_rows", "n_corrupt", F.round("corrupt_frac", 6).alias("corrupt_frac")
    ).crossJoin(clean)


_q(
    "s_jsonl_corrupt_quarantine",
    Query(
        _jsonl_quarantine_spark,
        """
        SELECT
          (SELECT COUNT(*) FROM documents WHERE doc_id < 50) AS n_rows,
          (SELECT COUNT(*) FROM documents
           WHERE doc_id < 50 AND doc_id % 5 = 0) AS n_corrupt,
          ROUND((SELECT COUNT(*) FROM documents
                 WHERE doc_id < 50 AND doc_id % 5 = 0)
                / CAST((SELECT COUNT(*) FROM documents WHERE doc_id < 50)
                       AS DOUBLE), 6) AS corrupt_frac,
          (SELECT COUNT(*) FROM documents
           WHERE doc_id < 50 AND doc_id % 5 <> 0) AS n_clean,
          (SELECT CAST(SUM(doc_id) AS BIGINT) FROM documents
           WHERE doc_id < 50 AND doc_id % 5 <> 0) AS clean_docid_sum
        """,
        "S+,P2+",
        "JSONL corrupt-line quarantine: truncated lines land in "
        "_corrupt_record and are counted (measure before dropping), the "
        "DROPMALFORMED clean path keeps exactly the rest — both totals "
        "derived from the source table by the oracle",
    ),
)


def _hinted_join_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit physical join-strategy control: the same orders ⋈
    lineitem aggregate forced through SHUFFLE_HASH (hash-build instead
    of the default sort-merge — skips both sort passes when the build
    side's partitions fit in memory). The plan is asserted in-query
    (loud failure if the hint is ignored); the oracle is the plain
    join, because a physical strategy must never change results."""
    register_views(spark, sf_dir)
    out = spark.sql(
        """
        SELECT /*+ SHUFFLE_HASH(o) */
               o.o_orderpriority,
               COUNT(*) AS n_items,
               CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(20,6))) AS STRING) AS DOUBLE)
                 AS total_qty
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
        """
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    if "ShuffledHashJoin" not in final:
        raise RuntimeError(
            "SHUFFLE_HASH hint was not honored — plan:\n" + final[:3000]
        )
    return out


_q(
    "j_hinted_shuffle_hash",
    Query(
        _hinted_join_spark,
        """
        SELECT o.o_orderpriority,
               COUNT(*) AS n_items,
               CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(20,6))) AS STRING) AS DOUBLE)
                 AS total_qty
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
        """,
        "J*+",
        "join-strategy hint surface: SHUFFLE_HASH forces a hash-build "
        "join over the default sort-merge (asserted in-plan, loud "
        "failure if ignored); results must equal the unhinted join — "
        "physical strategy is semantics-free",
    ),
)


# Record-linkage: blocked fuzzy match. The block-key equi-join (3-char
# prefix) is what makes this scale — candidate pairs are per-block, not
# |queries| x |names|; the integer edit distance and (distance, name)
# tie-break keep the best-match selection deterministic cross-engine.
_q(
    "j_fuzzy_match_join",
    _same(
        """
        WITH names AS (SELECT DISTINCT p_name FROM part),
        qs AS (
          SELECT p_name AS orig,
                 CONCAT(SUBSTR(p_name, 1, 4), SUBSTR(p_name, 6)) AS q
          FROM names WHERE LENGTH(p_name) >= 7
        ),
        cand AS (
          SELECT qs.orig, qs.q, n.p_name AS matched,
                 LEVENSHTEIN(qs.q, n.p_name) AS dist
          FROM qs JOIN names n
            ON SUBSTR(qs.q, 1, 3) = SUBSTR(n.p_name, 1, 3)
          WHERE LEVENSHTEIN(qs.q, n.p_name) <= 2
        )
        SELECT orig, q, matched, dist FROM (
          SELECT orig, q, matched, dist,
                 ROW_NUMBER() OVER (PARTITION BY orig
                                    ORDER BY dist, matched) AS rn
          FROM cand
        ) t WHERE rn = 1
        ORDER BY orig
        """,
        "J*+,X-curation",
        "blocked fuzzy-match join (record linkage): typo'd queries "
        "(one char dropped) matched back to the name catalog via a "
        "3-char-prefix block join + Levenshtein <= 2 + best-match "
        "rank — candidate pairs are per-block, never a cross join",
    ),
)

_q(
    "w_scd2_intervals",
    _dialect(
        """
        WITH ev AS (
          SELECT user_id, event_type, ts_ns DIV 1000 AS ts_us, event_id
          FROM events WHERE user_id <= 30
        ), ordered AS (
          SELECT user_id, event_type, ts_us, event_id,
                 LAG(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts_us, event_id) AS prev_type
          FROM ev
        ), changes AS (
          SELECT user_id, event_type, ts_us, event_id FROM ordered
          WHERE prev_type IS NULL OR prev_type <> event_type
        )
        SELECT user_id, event_type AS state, ts_us AS valid_from,
               LEAD(ts_us) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id) AS valid_to,
               CASE WHEN LEAD(ts_us) OVER (PARTITION BY user_id
                                           ORDER BY ts_us, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_current
        FROM changes
        ORDER BY user_id, valid_from, event_id
        """,
        """
        WITH ev AS (
          SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
          FROM events WHERE user_id <= 30
        ), ordered AS (
          SELECT user_id, event_type, ts_us, event_id,
                 LAG(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts_us, event_id) AS prev_type
          FROM ev
        ), changes AS (
          SELECT user_id, event_type, ts_us, event_id FROM ordered
          WHERE prev_type IS NULL OR prev_type <> event_type
        )
        SELECT user_id, event_type AS state, ts_us AS valid_from,
               LEAD(ts_us) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id) AS valid_to,
               CASE WHEN LEAD(ts_us) OVER (PARTITION BY user_id
                                           ORDER BY ts_us, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_current
        FROM changes
        ORDER BY user_id, valid_from, event_id
        """,
        "W+,J2+",
        "SCD type-2 interval construction: collapse each user's event "
        "stream into state-validity intervals (change rows + LEAD "
        "closes each interval, open tail flagged current) — the "
        "dimension-history build behind as-of joins, one window pass",
    ),
)

_q(
    "w_top_user_journeys",
    _dialect(
        """
        WITH ev AS (
          SELECT user_id, event_type, ts_ns DIV 1000 AS ts_us, event_id
          FROM events
        ), j AS (
          SELECT user_id,
                 ARRAY_JOIN(TRANSFORM(
                   SLICE(ARRAY_SORT(COLLECT_LIST(
                     STRUCT(ts_us, event_id, event_type))), 1, 5),
                   s -> s.event_type), '>') AS path
          FROM ev GROUP BY user_id
        )
        SELECT path, COUNT(*) AS n_users
        FROM j GROUP BY path
        ORDER BY n_users DESC, path
        LIMIT 10
        """,
        """
        WITH ev AS (
          SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
          FROM events
        ), j AS (
          SELECT user_id,
                 array_to_string(
                   (list(event_type ORDER BY ts_us, event_id))[1:5],
                   '>') AS path
          FROM ev GROUP BY user_id
        )
        SELECT path, COUNT(*) AS n_users
        FROM j GROUP BY path
        ORDER BY n_users DESC, path
        LIMIT 10
        """,
        "W+,A*+",
        "top early-journey paths: each user's first five events as an "
        "ordered path string (struct-sort inside the group — "
        "deterministic under ts+id tie-break), counted and ranked — "
        "the behavioral-sequence mining complement to the funnel",
    ),
)


def _funnel_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase (operators/analytics.py
    funnel_depths): each stage only counts strictly after the user's
    earliest qualifying previous stage. Output is the depth histogram."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.analytics import funnel_depths

    register_views(spark, sf_dir)
    # First-two-days window: over the full month every user converts
    # (depth-3 only — a vacuous histogram); the narrow window spreads
    # users across all four depths so the ordering semantics are pinned.
    ev = (
        spark.table("events")
        .select("user_id", "event_type", F.expr("ts_ns DIV 1000").alias("ts_us"))
        .filter(F.col("ts_us") < F.lit(1704240000000000))  # < 2024-01-03 UTC
    )
    return (
        funnel_depths(ev, ["view", "click", "purchase"])
        .groupBy("funnel_depth")
        .agg(F.count("*").alias("n_users"))
        .orderBy("funnel_depth")
    )


_q(
    "w_funnel_depth_histogram",
    Query(
        _funnel_spark,
        """
        WITH ev AS (
          SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
          WHERE epoch_us(ts) < 1704240000000000
        ), s1 AS (
          SELECT user_id, MIN(ts_us) AS t FROM ev
          WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
          SELECT e.user_id, MIN(e.ts_us) AS t
          FROM ev e JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = 'click' AND e.ts_us > s1.t
          GROUP BY e.user_id
        ), s3 AS (
          SELECT e.user_id, MIN(e.ts_us) AS t
          FROM ev e JOIN s2 ON e.user_id = s2.user_id
          WHERE e.event_type = 'purchase' AND e.ts_us > s2.t
          GROUP BY e.user_id
        ), depths AS (
          SELECT u.user_id,
                 CASE WHEN s3.user_id IS NOT NULL THEN 3
                      WHEN s2.user_id IS NOT NULL THEN 2
                      WHEN s1.user_id IS NOT NULL THEN 1
                      ELSE 0 END AS funnel_depth
          FROM (SELECT DISTINCT user_id FROM ev) u
          LEFT JOIN s1 ON u.user_id = s1.user_id
          LEFT JOIN s2 ON u.user_id = s2.user_id
          LEFT JOIN s3 ON u.user_id = s3.user_id
        )
        SELECT funnel_depth, COUNT(*) AS n_users
        FROM depths GROUP BY funnel_depth ORDER BY funnel_depth
        """,
        "A*+,W+",
        "ordered funnel analysis (view -> click -> purchase, strict "
        "temporal order): per-user progression depth via chained "
        "filtered min-ts stages, all user-keyed equi-joins — no "
        "sequence explode, no window over the full event stream",
    ),
)


def _retention_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-grain retention triangle (operators/analytics.py
    retention_cohorts): cohort by first active day, count distinct
    active users per (cohort, offset) cell."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.analytics import (
        retention_cohorts,
    )

    register_views(spark, sf_dir)
    ev = spark.table("events").select(
        "user_id", F.expr("ts_ns DIV 1000").alias("ts_us")
    )
    return retention_cohorts(ev).orderBy("cohort_day", "day_offset")


_q(
    "w_retention_cohorts",
    Query(
        _retention_spark,
        """
        WITH ev AS (
          SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
        ), first AS (
          SELECT user_id, MIN(day) AS cohort FROM ev GROUP BY user_id
        )
        SELECT f.cohort AS cohort_day,
               e.day - f.cohort AS day_offset,
               COUNT(DISTINCT e.user_id) AS n_active
        FROM ev e JOIN first f ON e.user_id = f.user_id
        GROUP BY 1, 2
        ORDER BY cohort_day, day_offset
        """,
        "A*+,W+",
        "retention cohort triangle: users cohorted by first-seen day, "
        "per-(cohort, offset) distinct-active counts — one min-groupBy, "
        "one user-keyed join back, one cohort-sized aggregation",
    ),
)


def _dup_span_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring duplication fraction (operators/dedup.py
    duplicate_span_fraction, the Lee et al. 2022 memorization-risk
    signal). The raw corpus shares no verbatim 12-token spans, so the
    check seeds 40 in-plan partial copies (each reuses its source's
    first 20 tokens then diverges) — sources and copies must score
    dup_fraction > 0, untouched docs 0."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.dedup import (
        duplicate_span_fraction,
    )

    register_views(spark, sf_dir)
    base = spark.table("documents").filter(F.col("doc_id") < 200)
    toks = F.split(F.lower(F.col("text")), r"\s+")
    copies = base.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(
            F.array_join(F.slice(toks, 1, 20), " "),
            F.lit(" uniq"),
            F.col("doc_id").cast("string"),
            F.lit(" tail marker tokens"),
        ).alias("text"),
    )
    corpus = base.select("doc_id", "text").unionByName(copies)
    return duplicate_span_fraction(corpus, n=12).orderBy("doc_id")


_q(
    "x2_duplicate_span_fraction",
    Query(
        _dup_span_spark,
        """
        WITH corpus AS (
          SELECT doc_id, text FROM documents WHERE doc_id < 200
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id,
                 array_to_string(
                   string_split_regex(trim(lower(text)), '\\s+')[1:20], ' ')
                 || ' uniq' || CAST(doc_id AS VARCHAR)
                 || ' tail marker tokens' AS text
          FROM documents WHERE doc_id < 40
        ), tok AS (
          SELECT doc_id,
                 string_split_regex(trim(lower(text)), '\\s+') AS toks
          FROM corpus
        ), grams AS (
          SELECT doc_id, unnest(
            CASE WHEN len(toks) >= 12
                 THEN list_transform(generate_series(1, len(toks) - 11),
                                     i -> array_to_string(toks[i:i+11], ' '))
                 ELSE []::VARCHAR[] END) AS gram
          FROM tok
        ), per_doc AS (
          SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id
        ), cross_doc AS (
          SELECT gram FROM grams GROUP BY gram
          HAVING COUNT(DISTINCT doc_id) >= 2
        ), dup AS (
          SELECT g.doc_id, COUNT(*) AS n_dup
          FROM grams g JOIN cross_doc c ON g.gram = c.gram
          GROUP BY g.doc_id
        )
        SELECT p.doc_id, p.n_grams,
               COALESCE(d.n_dup, 0) AS n_dup_occurrences,
               ROUND(COALESCE(d.n_dup, 0) / CAST(p.n_grams AS DOUBLE), 6)
                 AS dup_fraction
        FROM per_doc p LEFT JOIN dup d ON p.doc_id = d.doc_id
        ORDER BY p.doc_id
        """,
        "X2,X1",
        "exact substring duplication fraction (Lee et al. 2022): share "
        "of a doc's 12-token spans occurring verbatim in another doc — "
        "explode to position grams, gram-keyed cross-doc counts, join "
        "back; token-table-proportional shuffles, no pairwise scan",
    ),
)


def _streaming_stream_join_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL watermarked stream-stream interval join: click events joined
    to same-user purchase events within 30 minutes. Both sides carry a
    watermark and the join condition bounds event-time distance, so
    Spark can expire join state — the shape that keeps a 100 TB/day
    dual-stream correlation bounded in memory. availableNow over the
    bounded file source drains both sides; the emitted matches must
    equal the batch interval join the oracle runs."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def src(event_type: str, prefix: str) -> DataFrame:
        ev = (
            spark.readStream.schema(batch_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .filter(F.col("event_type") == event_type)
        )
        if isinstance(batch_schema["ts"].dataType, T.LongType):
            ev = ev.withColumn(
                "event_time", F.timestamp_micros(F.expr("ts DIV 1000"))
            )
        else:
            ev = ev.withColumn("event_time", F.col("ts").cast("timestamp"))
        return ev.select(
            F.col("event_id").alias(f"{prefix}_event_id"),
            F.col("user_id").alias(f"{prefix}_user_id"),
            F.col("event_time").alias(f"{prefix}_time"),
        ).withWatermark(f"{prefix}_time", "1 hour")

    clicks = src("click", "click")
    purchases = src("purchase", "purchase")
    joined = clicks.join(
        purchases,
        F.expr(
            """
            click_user_id = purchase_user_id AND
            purchase_time >= click_time AND
            purchase_time <= click_time + INTERVAL 30 MINUTES
            """
        ),
    ).select(
        "click_event_id",
        "purchase_event_id",
        F.col("click_user_id").alias("user_id"),
        F.unix_micros("click_time").alias("click_ts_us"),
        F.unix_micros("purchase_time").alias("purchase_ts_us"),
    )
    sink = f"w_stream_join_sink_{next(_STREAM_SINK_SEQ)}"
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        q.stop()
    return spark.table(sink).orderBy("click_event_id", "purchase_event_id")


_STREAM_JOIN_ORACLE = (
    _EV_DUCK
    + """
        SELECT c.event_id AS click_event_id,
               p.event_id AS purchase_event_id,
               c.user_id,
               c.ts_us AS click_ts_us,
               p.ts_us AS purchase_ts_us
        FROM ev c JOIN ev p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.ts_us >= c.ts_us AND p.ts_us <= c.ts_us + 1800000000
        ORDER BY click_event_id, purchase_event_id
        """
)

_q(
    "w_streaming_stream_join",
    Query(
        _streaming_stream_join_spark,
        _STREAM_JOIN_ORACLE,
        "W+,J2+",
        "REAL watermarked stream-stream interval join (clicks x same-user "
        "purchases within 30 min): state-bounded dual-stream correlation, "
        "emitted matches must equal the batch interval join",
    ),
)


def _stream_join_restart_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-RESTART replay proof for the stream-stream interval
    join: the click side is staged as four event-time-quartile files;
    run 1 (availableNow, maxFilesPerTrigger=1, durable parquet sink +
    checkpoint) sees only the first two, is stopped, the last two
    appear, and run 2 restarts FROM THE SAME CHECKPOINT. The file
    source's seen-files log must skip the already-processed quartiles,
    the sink's metadata log must commit the new matches exactly once,
    and the final sink state must hash-equal the batch interval join.

    The quartile split is BY EVENT TIME with ascending file mtimes —
    after run 1 the global watermark sits at (end-of-quartile-2 − 1h),
    so no quartile-3/4 click is late and every purchase still matchable
    by a future click is younger than the state-eviction bound; an
    arrival-order split would let watermark eviction silently drop
    matches the batch oracle keeps. Aborts loudly if run 1 processed
    everything (restart not exercised) or the sink did not grow."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(batch_schema["ts"].dataType, T.LongType):
        ts_us = F.expr("ts DIV 1000")
    else:
        ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    clicks_b = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "event_type", ts_us.cast("long").alias("ts_us")
    )
    lo, hi = clicks_b.agg(F.min("ts_us"), F.max("ts_us")).first()
    click_dir = _scratch_dir("ssj_restart_clicks")
    ckpt = _scratch_dir("ssj_restart_ckpt")
    out = _scratch_dir("ssj_restart_out")
    stage = _scratch_dir("ssj_restart_stage")

    def stage_quartile(k: int) -> None:
        q_lo = lo + (hi - lo + 1) * k // 4
        q_hi = lo + (hi - lo + 1) * (k + 1) // 4
        part = (
            clicks_b.filter((F.col("ts_us") >= q_lo) & (F.col("ts_us") < q_hi))
            if k < 3
            else clicks_b.filter(F.col("ts_us") >= q_lo)
        )
        tmp = f"{stage}/q{k}"
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src_file = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        dst = f"{click_dir}/q{k}.parquet"
        os.replace(f"{tmp}/{src_file}", dst)
        os.utime(dst, (1_600_000_000 + k, 1_600_000_000 + k))  # mtime order

    def run_once() -> None:
        clicks = (
            spark.readStream.schema(
                "event_id long, user_id long, event_type string, ts_us long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(click_dir)
            .select(
                F.col("event_id").alias("click_event_id"),
                F.col("user_id").alias("click_user_id"),
                F.timestamp_micros("ts_us").alias("click_time"),
            )
            .withWatermark("click_time", "1 hour")
        )
        purchases = (
            spark.readStream.schema(batch_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .filter(F.col("event_type") == "purchase")
        )
        if isinstance(batch_schema["ts"].dataType, T.LongType):
            purchases = purchases.withColumn(
                "purchase_time", F.timestamp_micros(F.expr("ts DIV 1000"))
            )
        else:
            purchases = purchases.withColumn(
                "purchase_time", F.col("ts").cast("timestamp")
            )
        purchases = purchases.select(
            F.col("event_id").alias("purchase_event_id"),
            F.col("user_id").alias("purchase_user_id"),
            "purchase_time",
        ).withWatermark("purchase_time", "1 hour")
        joined = clicks.join(
            purchases,
            F.expr(
                """
                click_user_id = purchase_user_id AND
                purchase_time >= click_time AND
                purchase_time <= click_time + INTERVAL 30 MINUTES
                """
            ),
        ).select(
            "click_event_id",
            "purchase_event_id",
            F.col("click_user_id").alias("user_id"),
            F.unix_micros("click_time").alias("click_ts_us"),
            F.unix_micros("purchase_time").alias("purchase_ts_us"),
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(300)
        finally:
            q.stop()

    stage_quartile(0)
    stage_quartile(1)
    run_once()
    n_run1 = spark.read.parquet(out).count()
    stage_quartile(2)
    stage_quartile(3)
    run_once()  # RESTART from the same checkpoint
    final = spark.read.parquet(out)
    n_final = final.count()
    if not (0 < n_run1 < n_final):
        raise RuntimeError(
            "restart not exercised: run1 emitted "
            f"{n_run1} of {n_final} matches — quartile split degenerated"
        )
    return final.orderBy("click_event_id", "purchase_event_id")


_q(
    "w_streaming_stream_join_restart",
    Query(
        _stream_join_restart_spark,
        _STREAM_JOIN_ORACLE,
        "W+,P2+",
        "stream-stream join restart-from-checkpoint replay: half the "
        "click quartiles processed, query stopped, rest appear, restart "
        "resumes from the seen-files/offset log — final durable sink "
        "state must hash-equal the batch interval join (exactly-once "
        "across restarts)",
    ),
)

_sql_sess, _duck_sess = _ev(
    """
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
           CAST(MIN(ts_us) AS BIGINT) AS session_start_us,
           CAST(MAX(ts_us) AS BIGINT) AS session_end_us
    FROM (
      SELECT user_id, ts_us,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM (
        SELECT user_id, event_id, ts_us,
               CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                         > 3600000000 OR
                         LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM ev
      ) g
    ) s
    GROUP BY user_id, session_id
    ORDER BY n_events DESC, user_id, session_id
    LIMIT 100
    """
)
_q(
    "w4_sessionization",
    _dialect(
        _sql_sess,
        _duck_sess,
        "W4+",
        "gap-based sessionization (1h inactivity) via LAG + running sum; "
        "declared output bounded to the top-100 sessions by event count "
        "(TakeOrderedAndProject — the full per-user window computation "
        "still runs over every session, but the materialized result stays "
        "constant-size as the corpus grows; unbounded per-session output "
        "measured 70x wall at 100x data before the bound)",
    ),
)


def _native_unpivot_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE DataFrame.unpivot (melt) API vs the stack()-based
    SQL formulation the CSV source uses — wide→long restatements must
    agree exactly."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    wide = spark.sql(
        "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, "
        "       l_discount, l_tax "
        "FROM lineitem WHERE l_orderkey < 200"
    )
    long = wide.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )
    return long.select(
        "l_orderkey",
        "l_linenumber",
        "measure",
        F.round("value", 6).alias("value"),
    ).orderBy("l_orderkey", "l_linenumber", "measure")


_q(
    "s2_native_unpivot",
    Query(
        _native_unpivot_spark,
        """
        SELECT l_orderkey, l_linenumber, measure, ROUND(value, 6) AS value
        FROM (
          SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
                 l_quantity AS value FROM lineitem WHERE l_orderkey < 200
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
          FROM lineitem WHERE l_orderkey < 200
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
          FROM lineitem WHERE l_orderkey < 200
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
          FROM lineitem WHERE l_orderkey < 200
        ) t
        ORDER BY l_orderkey, l_linenumber, measure
        """,
        "S2,D2",
        "Spark's native DataFrame.unpivot (melt) API vs a UNION ALL "
        "derivation — the wide-to-long restatement the telemetry melt "
        "relies on, via the first-class API",
    ),
)


def _native_tumbling_window_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE window() tumbling operator (what the streaming
    aggregates run on) vs pure epoch arithmetic in the oracle."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    ev = spark.sql(
        "SELECT event_type, value, timestamp_micros(ts_ns DIV 1000) AS event_time "
        "FROM events"
    )
    agg = ev.groupBy(
        F.window("event_time", "1 hour").alias("w"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.round("value", 6).cast("decimal(20,6)")).cast("double"), 6
        ).alias("sum_value"),
    )
    return agg.select(
        F.unix_micros("w.start").alias("start_us"),
        "event_type",
        "n",
        "sum_value",
    ).orderBy("start_us", "event_type")


_q(
    "w1_native_tumbling_window",
    Query(
        _native_tumbling_window_spark,
        _EV_DUCK
        + """
        SELECT CAST(ts_us // 3600000000 * 3600000000 AS BIGINT) AS start_us,
               event_type, COUNT(*) AS n,
               ROUND(CAST(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(20,6))) AS STRING) AS DOUBLE), 6) AS sum_value
        FROM ev
        GROUP BY 1, 2
        ORDER BY start_us, event_type
        """,
        "W1",
        "Spark's native window() tumbling operator vs pure epoch "
        "arithmetic — bucket boundaries and per-bucket aggregates must "
        "agree exactly",
    ),
)


def _native_session_window_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window operator (the streaming-capable
    merging-window primitive) checked against a first-principles gap
    oracle: window.start = first event, window.end = last event + gap."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    ev = spark.sql(
        "SELECT user_id, timestamp_micros(ts_ns DIV 1000) AS event_time "
        "FROM events WHERE user_id <= 50"
    )
    agg = ev.groupBy(
        "user_id", F.session_window("event_time", "1 hour").alias("w")
    ).agg(F.count("*").alias("n_events"))
    return agg.select(
        "user_id",
        F.unix_micros("w.start").alias("start_us"),
        F.unix_micros("w.end").alias("end_us"),
        "n_events",
    ).orderBy("user_id", "start_us")


_q(
    "w4_native_session_window",
    Query(
        _native_session_window_spark,
        _EV_DUCK
        + """
        , g AS (
          SELECT user_id, ts_us,
                 CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id
                          ORDER BY ts_us) > 3600000000
                       OR LAG(ts_us) OVER (PARTITION BY user_id
                          ORDER BY ts_us) IS NULL
                      THEN 1 ELSE 0 END AS is_new
          FROM ev WHERE user_id <= 50
        ),
        s AS (
          SELECT user_id, ts_us,
                 SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
                     ROWS UNBOUNDED PRECEDING) AS session_id
          FROM g
        )
        SELECT user_id,
               CAST(MIN(ts_us) AS BIGINT) AS start_us,
               CAST(MAX(ts_us) + 3600000000 AS BIGINT) AS end_us,
               COUNT(*) AS n_events
        FROM s
        GROUP BY user_id, session_id
        ORDER BY user_id, start_us
        """,
        "W4+,W1",
        "Spark's native session_window merging-window operator vs a "
        "first-principles LAG-gap oracle (start = first event, end = "
        "last event + gap) — the two sessionization formulations must "
        "agree exactly",
    ),
)

# ---------------------------------------------------------------------------
# JSON (X6)
# ---------------------------------------------------------------------------

_sql_json, _duck_json = (
    _EV_SPARK
    + """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM ev
    GROUP BY event_type
    ORDER BY event_type
    """,
    _EV_DUCK
    + """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM ev
    GROUP BY event_type
    ORDER BY event_type
    """,
)
_q(
    "x6_json_extract_agg",
    _dialect(_sql_json, _duck_json, "X6", "JSON field extraction + typed aggregation over events.props"),
)

# Spark 4 native VARIANT: PARSE_JSON parses each document ONCE into the
# binary variant encoding; every VARIANT_GET then navigates the decoded
# tree directly — the engine-native replacement for string-JSON
# get_json_object, which re-tokenizes the whole string per extraction
# (k extractions = k parses). At 100 TB of semi-structured rows the
# parse-once/extract-many shape (plus columnar variant shredding in
# parquet writers that support it) is the difference between one scan
# and k scans' worth of CPU. The nested fixture JSON is built with the
# same CONCAT in both engines; DuckDB extracts with its JSON functions.
_q(
    "x6_variant_json_shred",
    _dialect(
        """
        WITH j AS (
          SELECT doc_id,
                 CONCAT('{"id": ', CAST(doc_id AS STRING),
                        ', "meta": {"lang": "', lang,
                        '", "n": ', CAST(LENGTH(text) AS STRING),
                        '}, "tags": [', CAST(doc_id % 5 AS STRING),
                        ', ', CAST(doc_id % 7 AS STRING), ']}') AS js
          FROM documents WHERE doc_id < 400
        ),
        v AS (SELECT doc_id, PARSE_JSON(js) AS pv FROM j)
        SELECT CAST(VARIANT_GET(pv, '$.meta.lang', 'string') AS STRING) AS lang,
               COUNT(*) AS n_docs,
               CAST(SUM(VARIANT_GET(pv, '$.meta.n', 'long')) AS BIGINT) AS sum_n,
               CAST(SUM(VARIANT_GET(pv, '$.tags[1]', 'long')) AS BIGINT) AS sum_tag1,
               CAST(MAX(VARIANT_GET(pv, '$.id', 'long')) AS BIGINT) AS max_id,
               CAST(COUNT(CASE WHEN TRY_VARIANT_GET(pv, '$.missing', 'long')
                                    IS NULL THEN 1 END) AS BIGINT) AS n_no_field
        FROM v GROUP BY 1 ORDER BY lang
        """,
        """
        WITH j AS (
          SELECT doc_id,
                 CONCAT('{"id": ', CAST(doc_id AS VARCHAR),
                        ', "meta": {"lang": "', lang,
                        '", "n": ', CAST(LENGTH(text) AS VARCHAR),
                        '}, "tags": [', CAST(doc_id % 5 AS VARCHAR),
                        ', ', CAST(doc_id % 7 AS VARCHAR), ']}') AS js
          FROM documents WHERE doc_id < 400
        )
        SELECT json_extract_string(js, '$.meta.lang') AS lang,
               COUNT(*) AS n_docs,
               CAST(SUM(CAST(json_extract(js, '$.meta.n') AS BIGINT)) AS BIGINT) AS sum_n,
               CAST(SUM(CAST(json_extract(js, '$.tags[1]') AS BIGINT)) AS BIGINT) AS sum_tag1,
               CAST(MAX(CAST(json_extract(js, '$.id') AS BIGINT)) AS BIGINT) AS max_id,
               CAST(COUNT(CASE WHEN json_extract(js, '$.missing')
                                    IS NULL THEN 1 END) AS BIGINT) AS n_no_field
        FROM j GROUP BY 1 ORDER BY lang
        """,
        "X6",
        "Spark 4 native VARIANT semi-structured path: PARSE_JSON once "
        "per row into the binary variant encoding, then typed "
        "VARIANT_GET navigation for every field (string/long, nested "
        "object, array index) plus TRY_VARIANT_GET missing-path NULL "
        "semantics — the parse-once/extract-many replacement for "
        "per-extraction string re-parsing; oracle uses DuckDB's JSON "
        "functions over the identically-built documents",
    ),
)

# ---------------------------------------------------------------------------
# Text analysis (X4) — replace-chain token math keeps one SQL dialect
# ---------------------------------------------------------------------------

_TOKENS = "(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)"


def _occurrences(word: str) -> str:
    # number of occurrences of ' word ' patterns; pad text with spaces so
    # boundary words count. Identical semantics in both engines.
    padded = "CONCAT(' ', text, ' ')"
    needle = f"' {word} '"
    # non-overlapping count; tokens are single-space separated in this corpus
    return (
        f"CAST((LENGTH({padded}) - LENGTH(REPLACE({padded}, {needle}, ' ')))"
        f" / (LENGTH({needle}) - 1) AS BIGINT)"
    )


_q(
    "x4_token_stats",
    _same(
        f"""
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM({_TOKENS}) AS BIGINT) AS total_tokens,
               CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
               ROUND(CAST(SUM({_TOKENS}) AS DOUBLE) / COUNT(*), 6) AS avg_tokens
        FROM documents
        GROUP BY lang
        ORDER BY lang
        """,
        "X4",
        "whitespace token counting + per-language aggregates",
    ),
)

_q(
    "x4_quality_score",
    _same(
        f"""
        SELECT doc_id,
               {_TOKENS} AS n_tokens,
               ROUND(CAST(LENGTH(text) AS DOUBLE) / {_TOKENS}, 6) AS avg_token_len,
               ROUND(CAST({_occurrences('the')} + {_occurrences('a')} AS DOUBLE)
                     / {_TOKENS}, 6) AS stopword_ratio,
               CASE WHEN {_TOKENS} >= 10
                         AND LENGTH(text) >= 50
                    THEN 1 ELSE 0 END AS keep_flag
        FROM documents
        WHERE doc_id < 200
        ORDER BY doc_id
        """,
        "X4",
        "document quality scoring: length, token shape, stopword ratio",
    ),
)

_q(
    "x4_lang_signal",
    _same(
        f"""
        SELECT lang,
               ROUND(CAST(SUM({_occurrences('the')}) AS DOUBLE)
                     / SUM({_TOKENS}), 6) AS the_rate,
               ROUND(CAST(SUM({_occurrences('value')}) AS DOUBLE)
                     / SUM({_TOKENS}), 6) AS value_rate,
               COUNT(*) AS n_docs
        FROM documents
        GROUP BY lang
        ORDER BY lang
        """,
        "X4",
        "n-gram-frequency language signal (language-ID heuristic features)",
    ),
)

_q(
    "x4_fingerprint",
    _same(
        """
        SELECT source,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT MD5(LOWER(text))) AS n_unique_fingerprints
        FROM documents
        GROUP BY source
        ORDER BY source
        """,
        "X4,X1",
        "document fingerprinting via content hash",
    ),
)


def _winnow_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints (operators/text.py
    winnow_fingerprints, MOSS k-gram window-min scheme) + the locality
    property check: a copy of each document with five tokens appended
    must keep most fingerprints (shared runs >= k+window-1 tokens are
    guaranteed a shared fingerprint — the sub-document dedup primitive
    whole-record hashing lacks)."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.text import winnow_fingerprints

    register_views(spark, sf_dir)
    docs = (
        spark.table("documents")
        .filter(F.col("doc_id") < 150)
        .withColumn("text_edit", F.concat(F.col("text"), F.lit(" zz9 qq8 vv7 xx6 ww5")))
    )
    out = winnow_fingerprints(docs, k=4, window=5, seed=11, out_col="fps_a")
    out = winnow_fingerprints(
        out, k=4, window=5, seed=11, text_col="text_edit", out_col="fps_b"
    )
    inter = F.size(F.array_intersect("fps_a", "fps_b"))
    union = F.size(F.array_union("fps_a", "fps_b"))
    return out.select(
        "doc_id",
        F.size("fps_a").alias("n_fps"),
        F.size("fps_b").alias("n_fps_edit"),
        inter.alias("n_shared"),
        # Empty-set guard on BOTH sides: a doc with < k tokens has no
        # fingerprints, and 0/0 would be NaN here but NULL in DuckDB.
        F.when(
            union > 0, F.round(inter.cast("double") / union, 6)
        ).otherwise(F.lit(0.0)).alias("jaccard"),
        F.aggregate(
            "fps_a", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("fp_sum"),
    ).orderBy("doc_id")


_q(
    "x4_winnow_fingerprint",
    Query(
        _winnow_spark,
        """
        WITH base AS (
          SELECT doc_id, lower(text) AS t,
                 lower(text) || ' zz9 qq8 vv7 xx6 ww5' AS te
          FROM documents WHERE doc_id < 150
        ), tok AS (
          SELECT doc_id,
                 list_filter(string_split_regex(t, '\\s+'), x -> len(x) > 0) AS ta,
                 list_filter(string_split_regex(te, '\\s+'), x -> len(x) > 0) AS tb
          FROM base
        ), gr AS (
          SELECT doc_id,
                 CASE WHEN len(ta) >= 4 THEN list_transform(
                      generate_series(1, len(ta) - 3),
                      i -> array_to_string(ta[i:i+3], ' '))
                      ELSE []::VARCHAR[] END AS ga,
                 CASE WHEN len(tb) >= 4 THEN list_transform(
                      generate_series(1, len(tb) - 3),
                      i -> array_to_string(tb[i:i+3], ' '))
                      ELSE []::VARCHAR[] END AS gb
          FROM tok
        ), hs AS (
          SELECT doc_id,
                 list_transform(ga, g -> CAST(('0x' || substr(md5('11|' || g), 1, 8)) AS BIGINT)) AS ha,
                 list_transform(gb, g -> CAST(('0x' || substr(md5('11|' || g), 1, 8)) AS BIGINT)) AS hb
          FROM gr
        ), fp AS (
          SELECT doc_id,
                 list_sort(list_distinct(
                   CASE WHEN len(ha) >= 5 THEN list_transform(
                          generate_series(1, len(ha) - 4), i -> list_min(ha[i:i+4]))
                        WHEN len(ha) > 0 THEN [list_min(ha)]
                        ELSE []::BIGINT[] END)) AS fa,
                 list_sort(list_distinct(
                   CASE WHEN len(hb) >= 5 THEN list_transform(
                          generate_series(1, len(hb) - 4), i -> list_min(hb[i:i+4]))
                        WHEN len(hb) > 0 THEN [list_min(hb)]
                        ELSE []::BIGINT[] END)) AS fb
          FROM hs
        )
        SELECT doc_id,
               len(fa) AS n_fps,
               len(fb) AS n_fps_edit,
               len(list_intersect(fa, fb)) AS n_shared,
               CASE WHEN len(list_distinct(list_concat(fa, fb))) > 0
                    THEN ROUND(CAST(len(list_intersect(fa, fb)) AS DOUBLE)
                               / len(list_distinct(list_concat(fa, fb))), 6)
                    ELSE 0.0 END AS jaccard,
               COALESCE(CAST(list_sum(fa) AS BIGINT), 0) AS fp_sum
        FROM fp
        ORDER BY doc_id
        """,
        "X4,X2",
        "winnowing (MOSS) rolling-hash fingerprints: seeded k-gram "
        "hashes, sliding window-min selection, dedup — zero-shuffle HOF "
        "pipeline; the appended-tokens copy keeps most fingerprints "
        "(locality), demonstrating sub-document overlap detection",
    ),
)


def _lang_id_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive-Bayes language-ID (operators/text.py lang_id_naive_bayes):
    train on doc_id%5!=0, classify the held-out fifth, return the
    confusion matrix. The synthetic corpus shares one vocabulary across
    langs, so accuracy is near-chance — the check pins the exact
    argmax decisions (integer nano-log scores), not model quality."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.text import lang_id_naive_bayes

    register_views(spark, sf_dir)
    pred = lang_id_naive_bayes(spark.table("documents"), train_modulus=5)
    return (
        pred.groupBy("true_lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


_q(
    "x4_lang_id_confusion",
    Query(
        _lang_id_spark,
        """
        WITH tok AS (
          SELECT doc_id, lang, doc_id % 5 <> 0 AS is_train,
                 unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                    x -> len(x) > 0)) AS term
          FROM documents
        ), counts AS (
          SELECT lang, term, COUNT(*) AS c
          FROM tok WHERE is_train GROUP BY lang, term
        ), lang_tot AS (
          SELECT lang, SUM(c) AS n_lang FROM counts GROUP BY lang
        ), vocab AS (
          SELECT CAST(COUNT(DISTINCT term) AS DOUBLE) AS v FROM counts
        ), ndocs AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs
          FROM documents WHERE doc_id % 5 <> 0
        ), priors AS (
          SELECT lang,
                 CAST(ROUND(LN(COUNT(*) / ANY_VALUE(n.n_docs)) * 1e9) AS BIGINT)
                   AS log_prior
          FROM documents, ndocs n WHERE doc_id % 5 <> 0 GROUP BY lang
        ), langs AS (
          SELECT lang, n_lang, v,
                 CAST(ROUND(-LN(n_lang + v) * 1e9) AS BIGINT) AS logp_unseen
          FROM lang_tot, vocab
        ), model AS (
          SELECT lang, term,
                 CAST(ROUND(LN((c + 1) / (n_lang + v)) * 1e9) AS BIGINT) AS logp
          FROM counts JOIN langs USING (lang)
        ), tf AS (
          SELECT doc_id, lang AS true_lang, term, COUNT(*) AS tf
          FROM tok WHERE NOT is_train GROUP BY doc_id, lang, term
        ), scored AS (
          SELECT t.doc_id, t.true_lang, l.lang,
                 SUM(t.tf * COALESCE(m.logp, l.logp_unseen)) AS like_score
          FROM tf t
          CROSS JOIN (SELECT lang, logp_unseen FROM langs) l
          LEFT JOIN model m ON m.lang = l.lang AND m.term = t.term
          GROUP BY t.doc_id, t.true_lang, l.lang
        ), pred AS (
          SELECT doc_id, true_lang, lang AS pred_lang
          FROM (SELECT s.*, s.like_score + p.log_prior AS score
                FROM scored s JOIN priors p USING (lang))
          QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, lang DESC) = 1
        )
        SELECT true_lang, pred_lang, COUNT(*) AS n_docs
        FROM pred GROUP BY true_lang, pred_lang
        ORDER BY true_lang, pred_lang
        """,
        "X4",
        "multinomial naive-Bayes language-ID trained in-engine "
        "(add-one smoothing, broadcast vocabulary-sized model, integer "
        "nano-log scores — exact cross-engine argmax); confusion matrix "
        "over the held-out split",
    ),
)

# ---------------------------------------------------------------------------
# Dedup (X1, X2)
# ---------------------------------------------------------------------------

_q(
    "x1_dedup_exact_hash",
    _same(
        """
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id, text
          FROM documents WHERE doc_id < 50
        )
        SELECT MD5(text) AS fingerprint,
               COUNT(*) AS n_copies,
               CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
        FROM corpus
        GROUP BY MD5(text)
        HAVING COUNT(*) > 1
        ORDER BY fingerprint
        """,
        "X1",
        "exact near-zero-cost dedup: hash-group, keep lowest id — over an "
        "in-plan-seeded corpus (the raw testdata has no byte-identical "
        "texts, so the unseeded variant was a vacuous 0-row check; 50 "
        "re-ingested copies make the keeper selection observable)",
    ),
)

_GRAMS_SPARK = """
  grams AS (
    SELECT doc_id, gram FROM (
      SELECT doc_id,
             EXPLODE(ARRAY_DISTINCT(TRANSFORM(
               SEQUENCE(1, GREATEST(LENGTH(text) - 4, 1)),
               i -> SUBSTR(text, i, 5)))) AS gram
      FROM documents WHERE doc_id < 60
    ) g
  )
"""
_GRAMS_DUCK = """
  grams AS (
    SELECT DISTINCT doc_id, substr(text, CAST(g AS INT), 5) AS gram
    FROM documents, UNNEST(range(1, greatest(length(text) - 3, 2))) AS t(g)
    WHERE doc_id < 60
  )
"""
_JACCARD_BODY = """
, sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id)
, pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
    FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT p.doc_a, p.doc_b,
       ROUND(CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter), 6) AS jaccard
FROM pairs p
JOIN sizes sa ON p.doc_a = sa.doc_id
JOIN sizes sb ON p.doc_b = sb.doc_id
WHERE CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter) >= 0.4
ORDER BY p.doc_a, p.doc_b
"""
# Seeded variants for the Jaccard pair check: the raw corpus has no
# near-duplicate pairs above the 0.4 threshold (the unseeded check was
# vacuous — 0 rows would pass with a broken operator), so each doc_id<30
# document gets an in-plan mutated twin (id+1000, short suffix appended)
# whose 5-gram set overlaps its original almost completely.
_GRAMS_SEEDED_SPARK = """
  grams AS (
    SELECT doc_id, gram FROM (
      SELECT doc_id,
             EXPLODE(ARRAY_DISTINCT(TRANSFORM(
               SEQUENCE(1, GREATEST(LENGTH(text) - 4, 1)),
               i -> SUBSTR(text, i, 5)))) AS gram
      FROM (
        SELECT doc_id, text FROM documents WHERE doc_id < 30
        UNION ALL
        SELECT doc_id + 1000 AS doc_id,
               CONCAT(text, ' near dup tail') AS text
        FROM documents WHERE doc_id < 30
      )
    ) g
  )
"""
_GRAMS_SEEDED_DUCK = """
  grams AS (
    SELECT DISTINCT doc_id, substr(d.text, CAST(g AS INT), 5) AS gram
    FROM (
      SELECT doc_id, text FROM documents WHERE doc_id < 30
      UNION ALL
      SELECT doc_id + 1000 AS doc_id,
             text || ' near dup tail' AS text
      FROM documents WHERE doc_id < 30
    ) AS d, UNNEST(range(1, greatest(length(d.text) - 3, 2))) AS t(g)
  )
"""
_q(
    "x2_ngram_jaccard_pairs",
    _dialect(
        "WITH " + _GRAMS_SEEDED_SPARK + _JACCARD_BODY,
        "WITH " + _GRAMS_SEEDED_DUCK + _JACCARD_BODY,
        "X2",
        "character-5-gram exact Jaccard near-dup pairs over an in-plan-"
        "seeded corpus (each doc_id<30 doc gets a suffix-mutated twin, so "
        "the >=0.4 pairs are non-empty and the score math is observable; "
        "the unbounded scale path is MinHash-LSH, see x2_minhash_bands)",
    ),
)

# Deterministic MinHash: h_s(gram) = first 12 hex digits of md5(seed||gram)
# as int; signature = min per seed; band agreement >= 3 of 6 seeds.
# Bodies are shared by the plain construction (x2_minhash_bands,
# x2_duplicate_components) and the seeded-corpus quality-dedup variant.
_MINHASH_BODY_SPARK = """
, hashes AS (
    SELECT g.doc_id, s.seed,
           MIN(CAST(CONV(SUBSTR(MD5(CONCAT(CAST(s.seed AS STRING), ':', g.gram)), 1, 12), 16, 10) AS BIGINT)) AS minhash
    FROM grams g
    CROSS JOIN (SELECT EXPLODE(SEQUENCE(0, 5)) AS seed) s
    GROUP BY g.doc_id, s.seed
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_agree
FROM hashes a
JOIN hashes b ON a.seed = b.seed AND a.minhash = b.minhash AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= 3
ORDER BY doc_a, doc_b
"""
_MINHASH_BODY_DUCK = """
, hashes AS (
    SELECT g.doc_id, s.seed,
           MIN(CAST(('0x' || SUBSTR(MD5(CONCAT(CAST(s.seed AS VARCHAR), ':', g.gram)), 1, 12)) AS BIGINT)) AS minhash
    FROM grams g
    CROSS JOIN (SELECT UNNEST(range(0, 6)) AS seed) s
    GROUP BY g.doc_id, s.seed
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_agree
FROM hashes a
JOIN hashes b ON a.seed = b.seed AND a.minhash = b.minhash AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= 3
ORDER BY doc_a, doc_b
"""
_MINHASH_SPARK = "WITH " + _GRAMS_SPARK + _MINHASH_BODY_SPARK
_MINHASH_DUCK = "WITH " + _GRAMS_DUCK + _MINHASH_BODY_DUCK
_q(
    "x2_minhash_bands",
    _dialect(
        _MINHASH_SPARK,
        _MINHASH_DUCK,
        "X2",
        "deterministic MinHash banding: 6 seeded hash functions, pairs "
        "agreeing on >= 3 minima (LSH candidate generation, fully seeded "
        "so both engines compute identical signatures)",
    ),
)

# SimHash: 16-bit fingerprint; bit j set iff sum over grams of
# (+1 if bit j of gram-hash else -1) > 0. Gram hash = first 12 hex of md5.
_SIMHASH_BODY = """
, bits AS (
    SELECT doc_id, b.bit,
           CASE WHEN SUM(CASE WHEN (gh.h & CAST(POW(2, b.bit) AS BIGINT)) != 0
                              THEN 1 ELSE -1 END) > 0
                THEN CAST(POW(2, b.bit) AS BIGINT) ELSE 0 END AS bitval
    FROM gh CROSS JOIN bitsrc b
    GROUP BY doc_id, b.bit
)
SELECT doc_id, CAST(SUM(bitval) AS BIGINT) AS simhash16
FROM bits
GROUP BY doc_id
ORDER BY doc_id
"""
_q(
    "x2_simhash_fingerprint",
    _dialect(
        "WITH "
        + _GRAMS_SPARK
        + """
, gh AS (SELECT doc_id, CAST(CONV(SUBSTR(MD5(gram), 1, 12), 16, 10) AS BIGINT) AS h FROM grams)
, bitsrc AS (SELECT EXPLODE(SEQUENCE(0, 15)) AS bit)
"""
        + _SIMHASH_BODY,
        "WITH "
        + _GRAMS_DUCK
        + """
, gh AS (SELECT doc_id, CAST(('0x' || SUBSTR(MD5(gram), 1, 12)) AS BIGINT) AS h FROM grams)
, bitsrc AS (SELECT UNNEST(range(0, 16)) AS bit)
"""
        + _SIMHASH_BODY,
        "X2",
        "16-bit SimHash fingerprints from seeded gram hashes",
    ),
)

# SimHash near-dup PAIRS: Hamming distance over the fingerprints — the
# selection step after fingerprinting (at scale, band the fingerprint
# prefixes to avoid the all-pairs join; the bounded subset here checks
# the distance math itself).
_HAMMING_BODY = """
, fp AS (
    SELECT doc_id, CAST(SUM(bitval) AS BIGINT) AS fp
    FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count({xor}) AS INT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count({xor}) <= 2
ORDER BY doc_a, doc_b
"""
_q(
    "x2_simhash_near_pairs",
    _dialect(
        "WITH "
        + _GRAMS_SPARK
        + """
, gh AS (SELECT doc_id, CAST(CONV(SUBSTR(MD5(gram), 1, 12), 16, 10) AS BIGINT) AS h FROM grams)
, bitsrc AS (SELECT EXPLODE(SEQUENCE(0, 15)) AS bit)
, bits AS (
    SELECT doc_id, b.bit,
           CASE WHEN SUM(CASE WHEN (gh.h & CAST(POW(2, b.bit) AS BIGINT)) != 0
                              THEN 1 ELSE -1 END) > 0
                THEN CAST(POW(2, b.bit) AS BIGINT) ELSE 0 END AS bitval
    FROM gh CROSS JOIN bitsrc b
    GROUP BY doc_id, b.bit
)
"""
        + _HAMMING_BODY.format(xor="a.fp ^ b.fp"),
        "WITH "
        + _GRAMS_DUCK
        + """
, gh AS (SELECT doc_id, CAST(('0x' || SUBSTR(MD5(gram), 1, 12)) AS BIGINT) AS h FROM grams)
, bitsrc AS (SELECT UNNEST(range(0, 16)) AS bit)
, bits AS (
    SELECT doc_id, b.bit,
           CASE WHEN SUM(CASE WHEN (gh.h & CAST(POW(2, b.bit) AS BIGINT)) != 0
                              THEN 1 ELSE -1 END) > 0
                THEN CAST(POW(2, b.bit) AS BIGINT) ELSE 0 END AS bitval
    FROM gh CROSS JOIN bitsrc b
    GROUP BY doc_id, b.bit
)
"""
        + _HAMMING_BODY.format(xor="xor(a.fp, b.fp)"),
        "X2",
        "SimHash near-dup pairs by Hamming distance (<= 2 of 16 bits) — "
        "the distance-threshold selection after fingerprinting",
    ),
)

# ---------------------------------------------------------------------------
# Similarity search (X3)
# ---------------------------------------------------------------------------


def _cosine_topk_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from mission_data_pipeline_spark.functions.vectors import cosine_similarity

    register_views(spark, sf_dir)
    emb = spark.table("embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = emb.crossJoin(broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        F.round(cosine_similarity(F.col("qv"), F.col("v")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("query_id", "vec_id", "cosine", "rnk")
        .orderBy("query_id", "rnk")
    )


_q(
    "x3_cosine_topk_bruteforce",
    Query(
        _cosine_topk_spark,
        """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
        scored AS (
          SELECT q.query_id, e.vec_id,
                 ROUND(list_cosine_similarity(q.qv, e.v), 6) AS cosine
          FROM e CROSS JOIN q
          WHERE e.vec_id != q.query_id
        ),
        ranked AS (
          SELECT query_id, vec_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, vec_id) AS rnk
          FROM scored
        )
        SELECT query_id, vec_id, cosine, rnk FROM ranked
        WHERE rnk <= 10
        ORDER BY query_id, rnk
        """,
        "X3",
        "brute-force cosine top-k (broadcast queries, JVM-side dot products)",
    ),
)


def _knn_label_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from mission_data_pipeline_spark.functions.vectors import cosine_similarity

    register_views(spark, sf_dir)
    emb = spark.table("embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = emb.crossJoin(broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        "label",
        F.round(cosine_similarity(F.col("qv"), F.col("v")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    top5 = scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 5)
    return (
        top5.groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("votes").desc(), F.col("label")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("label").alias("predicted_label"), "votes")
        .orderBy("query_id")
    )


_q(
    "x3_knn_label_vote",
    Query(
        _knn_label_spark,
        """
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
        scored AS (
          SELECT q.query_id, e.vec_id, e.label,
                 ROUND(list_cosine_similarity(q.qv, e.v), 6) AS cosine
          FROM e CROSS JOIN q WHERE e.vec_id != q.query_id
        ),
        top5 AS (
          SELECT * FROM (
            SELECT query_id, vec_id, label, cosine,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, vec_id) AS rnk
            FROM scored) t
          WHERE rnk <= 5
        ),
        votes AS (
          SELECT query_id, label, COUNT(*) AS votes FROM top5 GROUP BY query_id, label
        )
        SELECT query_id, label AS predicted_label, votes FROM (
          SELECT query_id, label, votes,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY votes DESC, label) AS rn
          FROM votes) v
        WHERE rn = 1
        ORDER BY query_id
        """,
        "X3",
        "k-NN majority-label vote over cosine top-5",
    ),
)

# Embedding-space near-dup (X2 variant on vectors). Threshold calibrated
# to the synthetic corpus: the max off-diagonal cosine among these
# vectors is ~0.44, so the production-style 0.8+ cutoff returned 0 rows
# — a vacuous driver check. 0.35 yields a few dozen pairs at sf0.01, so
# the driver actually exercises the pair filter and the cosine math.
_q(
    "x2_embedding_near_dup",
    Query(
        _sql(
            """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   ROUND(
                     AGGREGATE(ZIP_WITH(a.v, b.v, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, p) -> acc + p)
                     / (SQRT(AGGREGATE(a.v, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))
                        * SQRT(AGGREGATE(b.v, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))), 6) AS cosine
            FROM (SELECT vec_id, TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
                  FROM embeddings WHERE vec_id < 150) a
            JOIN (SELECT vec_id, TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
                  FROM embeddings WHERE vec_id < 150) b
              ON a.vec_id < b.vec_id
            WHERE AGGREGATE(ZIP_WITH(a.v, b.v, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, p) -> acc + p)
                  / (SQRT(AGGREGATE(a.v, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))
                     * SQRT(AGGREGATE(b.v, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))) > 0.35
            ORDER BY vec_a, vec_b
            """
        ),
        """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 150)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               ROUND(list_cosine_similarity(a.v, b.v), 6) AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) > 0.35
        ORDER BY vec_a, vec_b
        """,
        "X2,X3",
        "embedding-cosine near-duplicate pairs above a corpus-calibrated "
        "threshold (non-empty at sf0.01 so the driver exercises the "
        "pair filter, not just an empty result)",
    ),
)


def _semantic_dedup_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style cluster-scoped semantic dedup (operators/
    similarity.py semantic_dedup): deterministic coarse centroids →
    map-side argmax assignment → WITHIN-cluster cosine pairs only
    (never corpus x corpus) → connected-component semantic groups →
    min-id canonical survivor per group. Deterministic centroids keep
    the whole pipeline SQL-replayable, so unlike the kmeans/PQ recall
    bounds this is an EXACT survivor-set match."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.similarity import (
        default_centroids,
        semantic_dedup,
    )

    register_views(spark, sf_dir)
    emb = spark.table("embeddings").filter(F.col("vec_id") < 300)
    cents = default_centroids(emb, n_centroids=16)
    out = semantic_dedup(emb, cents, threshold=0.35)
    return out.select("vec_id").orderBy("vec_id")


_q(
    "x2_semantic_dedup",
    Query(
        _semantic_dedup_spark,
        """
        WITH RECURSIVE e AS (
          SELECT vec_id, embedding::DOUBLE[] AS v
          FROM embeddings WHERE vec_id < 300
        ),
        cents AS (
          SELECT vec_id AS centroid_id, v AS cv FROM e
          ORDER BY vec_id LIMIT 16
        ),
        assigned AS (
          SELECT vec_id, v, centroid_id FROM (
            SELECT e.vec_id, e.v, c.centroid_id,
                   ROW_NUMBER() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6)
                              DESC, c.centroid_id) AS rn
            FROM e CROSS JOIN cents c) t
          WHERE rn = 1
        ),
        pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM assigned a JOIN assigned b
            ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
          WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) > 0.35
        ),
        edges AS (
          SELECT id_a AS ea, id_b AS eb FROM pairs
          UNION
          SELECT id_b, id_a FROM pairs
        ),
        nodes AS (SELECT DISTINCT ea AS n FROM edges),
        reach(src, n) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT r.src, g.eb FROM reach r JOIN edges g ON r.n = g.ea
        ),
        comp AS (SELECT src AS member, MIN(n) AS component_id
                 FROM reach GROUP BY src)
        SELECT vec_id FROM e
        WHERE vec_id NOT IN
              (SELECT member FROM comp WHERE member != component_id)
        ORDER BY vec_id
        """,
        "X2,X3",
        "SemDeDup-style semantic dedup (cluster-scoped: centroid argmax "
        "assignment, within-cluster cosine pairs only, component "
        "closure, min-id canonical survivor); deterministic centroids "
        "make the survivor set an exact cross-engine match, and the "
        "pair step never self-joins the whole corpus",
    ),
)

# ---------------------------------------------------------------------------
# Multimodal columns (X5): opaque binary payload + typed metadata
# ---------------------------------------------------------------------------


def _multimodal_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    doc = spark.table("documents")
    # Binary payload column + metadata extraction — the packet pattern:
    # payload stays opaque bytes; metadata is typed columns beside it.
    payload = F.encode("text", "UTF-8")
    return doc.select(
        "doc_id",
        F.octet_length(payload).alias("payload_bytes"),
        F.hex(F.substring(payload, 1, 4)).alias("magic_hex"),
        F.md5(F.col("text")).alias("content_hash"),
        "source",
    ).orderBy("doc_id")


_q(
    "x5_multimodal_payload_meta",
    Query(
        _multimodal_spark,
        """
        SELECT doc_id,
               octet_length(text::BLOB) AS payload_bytes,
               upper(hex(substr(text, 1, 4))) AS magic_hex,
               md5(text) AS content_hash,
               source
        FROM documents
        ORDER BY doc_id
        """,
        "X5",
        "opaque binary payload column + typed metadata (packet pattern)",
    ),
)


def _frame_sample_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling fan-out (functions/multimodal.py sample_frames):
    one payload row → every-Nth-frame rows through Arrow-batched
    mapInPandas; the deterministic fake decoder slices the payload, so
    the oracle recomputes every frame's digest arithmetically."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.functions.multimodal import sample_frames

    register_views(spark, sf_dir)
    doc = spark.table("documents").filter(F.col("doc_id") < 120)
    media = doc.select(
        F.col("doc_id").alias("item_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("fake").alias("format"),
            (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("double").alias("duration_s"),
        ).alias("meta"),
    )
    out = sample_frames(media, every_n=32, max_frames=4)
    return out.select(
        "item_id",
        "frame_idx",
        "width",
        "height",
        F.md5("pixels").alias("pixels_md5"),
        F.octet_length("pixels").alias("n_pixel_bytes"),
    ).orderBy("item_id", "frame_idx")


_q(
    "x5_frame_sample",
    Query(
        _frame_sample_spark,
        """
        WITH d AS (
          SELECT doc_id, text, octet_length(text::BLOB) AS len
          FROM documents WHERE doc_id < 120
        ),
        fr AS (
          SELECT doc_id, text, len, CAST(i AS INT) AS fi
          FROM d, UNNEST(range(0, LEAST(4, GREATEST(1, len // 32)))) AS u(i)
        )
        SELECT doc_id AS item_id,
               fi * 32 AS frame_idx,
               CAST(doc_id % 640 + 16 AS INT) AS width,
               CAST(doc_id % 480 + 16 AS INT) AS height,
               md5(substring(text, (fi * 32) % GREATEST(len, 1) + 1, 64))
                 AS pixels_md5,
               CAST(length(substring(text, (fi * 32) % GREATEST(len, 1) + 1, 64))
                    AS BIGINT) AS n_pixel_bytes
        FROM fr
        ORDER BY item_id, frame_idx
        """,
        "X5",
        "every-Nth-frame sampling: 1 payload row fans out to frame rows "
        "through Arrow-batched mapInPandas (deterministic fake decoder — "
        "no video codec in env); oracle recomputes each frame's byte "
        "slice digest from the generator",
    ),
)


def _media_stats_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality corpus accounting (functions/multimodal.py
    media_stats): pure-expression aggregation over the typed-metadata
    struct — no decode, rides the scan."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.functions.multimodal import media_stats

    register_views(spark, sf_dir)
    doc = spark.table("documents")
    media = doc.select(
        F.col("doc_id").alias("item_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.when(F.col("doc_id") % 3 == 0, "image")
            .when(F.col("doc_id") % 3 == 1, "audio")
            .otherwise("text")
            .alias("media_type"),
            F.lit("synthetic").alias("format"),
            (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("double").alias("duration_s"),
        ).alias("meta"),
    )
    out = media_stats(media)
    return out.select(
        "media_type",
        F.col("n_items").cast("long").alias("n_items"),
        F.col("total_bytes").cast("long").alias("total_bytes"),
        F.round("avg_bytes", 6).alias("avg_bytes"),
        F.round("avg_width", 6).alias("avg_width"),
        F.round("avg_height", 6).alias("avg_height"),
    ).orderBy("media_type")


_q(
    "x5_media_stats",
    Query(
        _media_stats_spark,
        """
        WITH m AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0 THEN 'image'
                      WHEN doc_id % 3 = 1 THEN 'audio'
                      ELSE 'text' END AS media_type,
                 octet_length(text::BLOB) AS nb,
                 doc_id % 640 + 16 AS w,
                 doc_id % 480 + 16 AS h
          FROM documents
        )
        SELECT media_type,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(nb) AS BIGINT) AS total_bytes,
               ROUND(AVG(nb), 6) AS avg_bytes,
               ROUND(AVG(w), 6) AS avg_width,
               ROUND(AVG(h), 6) AS avg_height
        FROM m
        GROUP BY media_type
        ORDER BY media_type
        """,
        "X5",
        "per-modality corpus accounting over the typed-metadata struct "
        "(counts, byte totals, dimension averages) — zero-decode "
        "expression aggregation",
    ),
)


def _kmeans_ivf_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with learned (Spark ML KMeans) centroids — the quality path.

    KMeans centers aren't reproducible in DuckDB, so the neighbor lists
    themselves can't be oracle-checked — but their *quality* can: the
    query emits one row (n_queries, n_exact, recall_ok) where recall_ok
    asserts aggregate recall@5 against exact rounded-cosine ground truth
    is >= 0.6. The ground-truth counts ARE SQL-reproducible, and a
    broken assignment/probe path craters recall, so a hash match is a
    real correctness bound (measured: 0.72-1.0 across seeds/SFs at
    n_probe=8 of 16 centroids — >=0.6 leaves margin for KMeans float
    jitter without ever passing a broken operator). Exact parity of the
    IVF mechanics is separately covered by x3_ivf_topk_ann's
    deterministic-centroid oracle."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.similarity import (
        ann_recall,
        cosine_topk,
        ivf_topk,
        kmeans_centroids,
    )

    register_views(spark, sf_dir)
    emb = spark.table("embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    q = emb.filter(F.col("vec_id") < 5)

    exact = cosine_topk(emb, q, k=5, vec_col="v", round_digits=6)

    cents = kmeans_centroids(emb, n_centroids=16, vec_col="v", seed=7, max_iter=10)
    approx = ivf_topk(emb, q, k=5, n_probe=8, centroids=cents, vec_col="v")
    return ann_recall(approx, exact, k=5).agg(
        F.count("*").cast("long").alias("n_queries"),
        F.sum("n_exact").cast("long").alias("n_exact"),
        (
            F.sum("n_hit").cast("double") / F.sum("n_exact") >= 0.6
        ).alias("recall_ok"),
    )


_q(
    "x3_kmeans_ivf_topk",
    Query(
        _kmeans_ivf_spark,
        """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
             exact AS (
               SELECT query_id, neighbor_id FROM (
                 SELECT q.query_id, e.vec_id AS neighbor_id,
                        ROW_NUMBER() OVER (PARTITION BY q.query_id
                          ORDER BY ROUND(list_cosine_similarity(q.qv, e.v), 6) DESC,
                                   e.vec_id) AS rank
                 FROM e CROSS JOIN q WHERE e.vec_id != q.query_id
               ) t WHERE rank <= 5
             )
        SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
               CAST(COUNT(*) AS BIGINT) AS n_exact,
               TRUE AS recall_ok
        FROM exact
        """,
        "X3",
        "IVF top-k with Spark ML KMeans coarse centroids, graded as a "
        "recall bound: aggregate recall@5 vs exact rounded-cosine ground "
        "truth must clear 0.6 (the SQL-reproducible part — ground-truth "
        "counts — is hash-matched; the learned centers themselves are "
        "not SQL-expressible)",
    ),
)

def _pq_rerank_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization ANN (operators/similarity.py): train
    deterministic per-subspace codebooks (8 subspaces x 16 codes —
    64x vector compression), ADC-shortlist 50 candidates per query over
    the codes, exact re-rank on the original vectors of the shortlist
    only (pq_topk_rerank). Like x3_kmeans_ivf_topk, the learned
    codebooks are not SQL-expressible, so the query is graded as a
    recall bound: aggregate recall@10 vs exact rounded-cosine ground
    truth must clear 0.6 (bare ADC without re-rank measures 0.42 on
    these near-random vectors — the bound separates the working
    pipeline from a broken one). The shortlist scales with the corpus
    (max(50, n/10)): near-random vectors concentrate distances, so a
    FIXED shortlist's recall decays with corpus growth (measured
    0.74 → 0.48 from 500 to 2000 vectors at 50); proportional sizing
    measures 0.74 / 0.80 / 1.0 at 500 / 2k / 20k vectors. Real
    clustered embeddings need far smaller shortlists. Vectors are
    L2-normalized first so PQ's L2 ordering equals cosine ordering."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.similarity import (
        ann_recall,
        cosine_topk,
        pq_encode,
        pq_topk_rerank,
        pq_train_codebooks,
    )

    register_views(spark, sf_dir)
    emb = spark.table("embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, b: a + b
        )
    )
    nemb = emb.select(
        "vec_id", F.transform("v", lambda x: x / norm).alias("v")
    )
    books = pq_train_codebooks(
        nemb, m=8, k=16, vec_col="v", sample_n=1024, n_iter=8
    )
    enc = pq_encode(nemb, books, vec_col="v")
    q = nemb.filter(F.col("vec_id") < 5)
    # corpus size from the parquet footer, not emb.count(): an eager
    # count inside the plan constructor would run a full scan per
    # invocation (flagged VERDICT r10 item 8)
    n_corpus = parquet_row_count(f"{sf_dir}/embeddings.parquet")
    approx = pq_topk_rerank(
        enc, nemb, q, books, k=10,
        shortlist=max(50, n_corpus // 10), vec_col="v",
    )
    exact = cosine_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10, vec_col="v", round_digits=6
    )
    return ann_recall(approx, exact, k=10).agg(
        F.count("*").cast("long").alias("n_queries"),
        F.sum("n_exact").cast("long").alias("n_exact"),
        (F.sum("n_hit").cast("double") / F.sum("n_exact") >= 0.6).alias(
            "recall_ok"
        ),
    )


_q(
    "x3_pq_rerank_topk",
    Query(
        _pq_rerank_spark,
        """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
             exact AS (
               SELECT query_id, neighbor_id FROM (
                 SELECT q.query_id, e.vec_id AS neighbor_id,
                        ROW_NUMBER() OVER (PARTITION BY q.query_id
                          ORDER BY ROUND(list_cosine_similarity(q.qv, e.v), 6) DESC,
                                   e.vec_id) AS rank
                 FROM e CROSS JOIN q WHERE e.vec_id != q.query_id
               ) t WHERE rank <= 10
             )
        SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
               CAST(COUNT(*) AS BIGINT) AS n_exact,
               TRUE AS recall_ok
        FROM exact
        """,
        "X3",
        "product-quantization ANN (64x compressed codes, ADC shortlist "
        "+ exact re-rank of candidates only), graded as a recall bound "
        "vs exact rounded-cosine ground truth (>= 0.6; measured 0.74)",
    ),
)


# ---------------------------------------------------------------------------
# Telemetry-shaped relational parity queries (D2, D6)
# ---------------------------------------------------------------------------

_sql_d6, _duck_d6 = _ev(
    """
    SELECT event_type AS name, COUNT(*) AS n_samples,
           CAST(MIN(ts_us) AS BIGINT) AS time_min_us,
           CAST(MAX(ts_us) AS BIGINT) AS time_max_us
    FROM ev
    GROUP BY event_type
    ORDER BY name
    """
)
_q(
    "d6_per_name_time_range",
    _dialect(_sql_d6, _duck_d6, "D6", "per-parameter count + time range (ParameterRecord stats)"),
)

_sql_d2, _duck_d2 = _ev(
    """
    SELECT ts_us, user_id, value, props
    FROM ev
    WHERE event_type = 'click' AND user_id <= 30
    ORDER BY ts_us, event_id
    """
)
_q(
    "d2_tidy_projection_sorted",
    _dialect(_sql_d2, _duck_d2, "D2", "tidy per-parameter projection, time-ordered"),
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

_q(
    "x4_zipf_slope",
    _dialect(
        r"""
        WITH freq AS (
          SELECT term, COUNT(*) AS cf FROM (
            SELECT EXPLODE(SPLIT(LOWER(text), '\\s+')) AS term FROM documents
          ) t WHERE LENGTH(term) > 0 GROUP BY term
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
        "degeneration; the rank window runs over the vocabulary-sized "
        "aggregate (never the token table), and the regression sums are "
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


# ---------------------------------------------------------------------------
# Temporal joins (as-of, banded range) — operators Spark lacks natively
# ---------------------------------------------------------------------------

def _asof_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as-of-joined to each user's latest prior purchase
    (operators/joins.py asof_join: union + ordered-window, one shuffle)."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.joins import asof_join

    register_views(spark, sf_dir)
    ev = spark.sql(
        "SELECT event_id, user_id, ts_ns DIV 1000 AS ts_us, event_type, value FROM events"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts_us")
        .agg(F.max("value").alias("value"))
    )
    j = asof_join(
        ev.select("event_id", "user_id", "ts_us"),
        purchases,
        on="ts_us",
        by=["user_id"],
        right_prefix="purchase_",
    )
    return j.select(
        "event_id",
        "user_id",
        "ts_us",
        "purchase_ts_us",
        F.round("purchase_value", 6).alias("purchase_value"),
    ).orderBy("event_id")


_q(
    "asof_join_latest_purchase",
    Query(
        _asof_spark,
        """
        WITH ev AS (SELECT *, epoch_us(ts) AS ts_us FROM events),
        p AS (SELECT user_id, ts_us, MAX(value) AS value
              FROM ev WHERE event_type = 'purchase' GROUP BY user_id, ts_us)
        SELECT e.event_id, e.user_id, e.ts_us,
               p.ts_us AS purchase_ts_us, ROUND(p.value, 6) AS purchase_value
        FROM ev e ASOF LEFT JOIN p
          ON e.user_id = p.user_id AND e.ts_us >= p.ts_us
        ORDER BY e.event_id
        """,
        "J2+,W3",
        "as-of join (latest right row at-or-before each left row) vs DuckDB "
        "native ASOF JOIN — union+window implementation, no range explosion",
    ),
)


def _range_join_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-type event pairs within 10 minutes (banded equi-join).

    The probe (left) side is a fixed event-id slice: an unbounded
    pair-emitting self-join's OUTPUT grows with corpus density squared
    (50M rows at sf1 — the declared result must stay collectable at
    any scale), while a fixed probe set keeps output linear in window
    density and the operator's join mechanics fully exercised against
    the FULL right side."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.joins import range_join

    register_views(spark, sf_dir)
    ev = spark.sql(
        "SELECT event_id, event_type, ts_ns DIV 1000 AS ts_us FROM events"
    )
    j = range_join(
        ev.filter(F.col("event_id") < 2000),
        ev,
        on="ts_us",
        by=["event_type"],
        lower=1,  # strictly after, integer microseconds
        upper=600_000_000,
    )
    return j.select(
        F.col("event_id").alias("left_id"),
        F.col("right_event_id").alias("right_id"),
        "event_type",
        (F.col("right_ts_us") - F.col("ts_us")).alias("dt_us"),
    ).orderBy("left_id", "right_id")


_q(
    "range_join_event_pairs",
    Query(
        _range_join_spark,
        """
        WITH ev AS (SELECT *, epoch_us(ts) AS ts_us FROM events)
        SELECT a.event_id AS left_id, b.event_id AS right_id,
               a.event_type, b.ts_us - a.ts_us AS dt_us
        FROM ev a JOIN ev b
          ON a.event_type = b.event_type
         AND b.ts_us > a.ts_us AND b.ts_us <= a.ts_us + 600000000
        WHERE a.event_id < 2000
        ORDER BY left_id, right_id
        """,
        "J*+,W3",
        "interval self-join via band-bucketing (equi-join + 2x fan-out "
        "instead of an inequality cross product)",
    ),
)


# ---------------------------------------------------------------------------
# Extended window-function surface (ranking, analytic, sliding, rollup)
# ---------------------------------------------------------------------------

_sql_w_rankfns, _duck_w_rankfns = _ev(
    """
    SELECT user_id, event_id,
           DENSE_RANK()  OVER w AS drank,
           NTILE(4)      OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS prank,
           ROUND(CUME_DIST()    OVER w, 6) AS cdist
    FROM ev WHERE user_id <= 20
    WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
    ORDER BY user_id, event_id
    """
)
_q(
    "w_ranking_functions",
    _dialect(
        _sql_w_rankfns,
        _duck_w_rankfns,
        "W*+",
        "dense_rank / ntile / percent_rank / cume_dist ranking surface",
    ),
)

_sql_w_analytic, _duck_w_analytic = _ev(
    """
    SELECT user_id, event_id, ts_us,
           LEAD(event_type) OVER w AS next_type,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type) OVER
             (PARTITION BY user_id ORDER BY ts_us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type,
           ROUND(AVG(value) OVER
             (PARTITION BY user_id ORDER BY ts_us
              RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 6) AS avg_1h
    FROM ev WHERE user_id <= 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ORDER BY user_id, ts_us, event_id
    """
)
_q(
    "w_analytic_functions",
    _dialect(
        _sql_w_analytic,
        _duck_w_analytic,
        "W*+",
        "lead / first_value / last_value / time-range frame average",
    ),
)

# Hopping (sliding) window: size 1h, slide 30m — every event belongs to
# exactly two windows; expressed as window-index arithmetic so the same
# declarative shape runs on both engines (and as a Structured Streaming
# groupBy(window(...)) in streaming/windows.py).
_SLIDE_US = 1_800_000_000
_SIZE_US = 3_600_000_000
_sql_w_slide = f"""
    WITH ev AS (SELECT *, ts_ns DIV 1000 AS ts_us FROM events),
    expanded AS (
      SELECT event_type, value,
             (CAST(ts_us / {_SLIDE_US} AS BIGINT) - i) * {_SLIDE_US} AS window_start_us,
             ts_us
      FROM ev LATERAL VIEW EXPLODE(ARRAY(0, 1)) t AS i
    )
    SELECT window_start_us, event_type, COUNT(*) AS n,
           {_dsum('value')} AS sum_value
    FROM expanded
    WHERE ts_us >= window_start_us AND ts_us < window_start_us + {_SIZE_US}
      AND window_start_us >= 0
    GROUP BY window_start_us, event_type
    ORDER BY window_start_us, event_type
"""
_duck_w_slide = f"""
    WITH ev AS (SELECT *, epoch_us(ts) AS ts_us FROM events),
    expanded AS (
      SELECT event_type, value,
             (CAST(FLOOR(ts_us / {_SLIDE_US}) AS BIGINT) - i) * {_SLIDE_US} AS window_start_us,
             ts_us
      FROM ev CROSS JOIN (SELECT UNNEST([0, 1]) AS i) t
    )
    SELECT window_start_us, event_type, COUNT(*) AS n,
           {_dsum('value')} AS sum_value
    FROM expanded
    WHERE ts_us >= window_start_us AND ts_us < window_start_us + {_SIZE_US}
      AND window_start_us >= 0
    GROUP BY window_start_us, event_type
    ORDER BY window_start_us, event_type
"""
_q(
    "w2_sliding_window",
    _dialect(
        _sql_w_slide,
        _duck_w_slide,
        "W1+",
        "hopping window agg (1h size, 30m slide) via window-index fan-out",
    ),
)

# Multi-granularity time rollup (hypertable-style): one pass, GROUPING
# SETS over minute/hour/day buckets.
_sql_rollup_tb, _duck_rollup_tb = _ev(
    """
    SELECT CASE WHEN GROUPING(b_minute) = 0 THEN 'minute'
                WHEN GROUPING(b_hour) = 0 THEN 'hour'
                ELSE 'day' END AS granularity,
           COALESCE(b_minute, b_hour, b_day) AS bucket_us,
           COUNT(*) AS n, """
    + _dsum("value")
    + """ AS sum_value
    FROM (
      SELECT value,
             ts_us - ts_us % 60000000 AS b_minute,
             ts_us - ts_us % 3600000000 AS b_hour,
             ts_us - ts_us % 86400000000 AS b_day
      FROM ev
    ) b
    GROUP BY GROUPING SETS ((b_minute), (b_hour), (b_day))
    ORDER BY granularity, bucket_us
    """
)
_q(
    "time_bucket_rollup",
    _dialect(
        _sql_rollup_tb,
        _duck_rollup_tb,
        "W1+,A*",
        "hypertable-style multi-granularity rollup in one GROUPING SETS pass",
    ),
)


# ---------------------------------------------------------------------------
# Statistical aggregates
# ---------------------------------------------------------------------------

_q(
    "agg_percentiles",
    _dialect(
        """
        SELECT l_returnflag,
               ROUND(ps[0], 6) AS p25, ROUND(ps[1], 6) AS p50,
               ROUND(ps[2], 6) AS p75, ROUND(ps[3], 6) AS p99
        FROM (
          SELECT l_returnflag,
                 PERCENTILE(l_extendedprice,
                            ARRAY(0.25D, 0.5D, 0.75D, 0.99D)) AS ps
          FROM lineitem GROUP BY l_returnflag
        ) t ORDER BY l_returnflag
        """,
        """
        SELECT l_returnflag,
               ROUND(ps[1], 6) AS p25, ROUND(ps[2], 6) AS p50,
               ROUND(ps[3], 6) AS p75, ROUND(ps[4], 6) AS p99
        FROM (
          SELECT l_returnflag,
                 QUANTILE_CONT(l_extendedprice,
                               [0.25, 0.5, 0.75, 0.99]) AS ps
          FROM lineitem GROUP BY l_returnflag
        ) t ORDER BY l_returnflag
        """,
        "A*+",
        "exact interpolated percentiles (order statistics — deterministic "
        "across engines, unlike float summation); ARRAY-form quantiles: "
        "one value buffer and one sort serve all four cut points — four "
        "scalar PERCENTILE calls each built and sorted their own buffer "
        "(4.7 s -> ~1.2 s at sf0.1, exposed by the noop bench series)",
    ),
)

# Sketch aggregates: the oracle pattern is the same self-validating
# shape as x3_ann_recall — the exact side is SQL-reproducible (hashes
# must match), and an in-query bound asserts the sketch's accuracy
# against it (a broken sketch flips the boolean and fails the row).
# Both sketches are deterministic for a fixed dataset + parameter, so
# the bound is a stable property, not a flaky sample.
_q(
    "agg_hll_distinct_bound",
    _dialect(
        """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS exact_users,
               ABS(APPROX_COUNT_DISTINCT(user_id, 0.02)
                   - COUNT(DISTINCT user_id))
                 <= CAST(0.05 * COUNT(DISTINCT user_id) AS BIGINT)
                 AS hll_within_5pct
        FROM events GROUP BY event_type ORDER BY event_type
        """,
        """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS hll_within_5pct
        FROM events GROUP BY event_type ORDER BY event_type
        """,
        "A*+",
        "HyperLogLog++ distinct-count sketch (rsd=0.02) asserted within "
        "5% of exact — partial-agg mergeable, the 100 TB shape for "
        "distinct counts (no two-phase exact-distinct shuffle)",
    ),
)

_q(
    "agg_approx_percentile_bound",
    _dialect(
        """
        SELECT l_returnflag,
               ROUND(PERCENTILE(l_extendedprice, 0.5), 6) AS exact_p50,
               ABS(APPROX_PERCENTILE(l_extendedprice, 0.5, 10000)
                   - PERCENTILE(l_extendedprice, 0.5))
                 <= 0.01 * PERCENTILE(l_extendedprice, 0.5)
                 AS approx_within_1pct
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        """
        SELECT l_returnflag,
               ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 6) AS exact_p50,
               TRUE AS approx_within_1pct
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "A*+",
        "Greenwald-Khanna approximate-percentile sketch (accuracy=1e4) "
        "asserted within 1% of the exact order statistic — mergeable "
        "partial aggregation instead of a full sort per group",
    ),
)

_q(
    "agg_kll_quantile_bound",
    _dialect(
        """
        SELECT l_returnflag,
               ROUND(PERCENTILE(l_extendedprice, 0.5), 6) AS exact_p50,
               KLL_SKETCH_GET_N_DOUBLE(
                   KLL_SKETCH_AGG_DOUBLE(l_extendedprice, 800)) AS kll_n,
               ABS(KLL_SKETCH_GET_QUANTILE_DOUBLE(
                       KLL_SKETCH_AGG_DOUBLE(l_extendedprice, 800), 0.5)
                   - PERCENTILE(l_extendedprice, 0.5))
                 <= 0.015 * PERCENTILE(l_extendedprice, 0.5)
                 AS kll_within_1_5pct
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        """
        SELECT l_returnflag,
               ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 6) AS exact_p50,
               COUNT(l_extendedprice) AS kll_n,
               TRUE AS kll_within_1_5pct
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "A*+",
        "Apache DataSketches KLL quantile sketch (k=800): the sketch's "
        "item count is hash-checked against the oracle's COUNT exactly, "
        "and its p50 is asserted within 1.5% of the exact order "
        "statistic (measured merge-order jitter <=0.25% at sf0.01). "
        "Mergeable partial agg — at 100 TB the sketch replaces a full "
        "per-group sort and, unlike Greenwald-Khanna, unions across "
        "pre-computed per-partition summaries",
    ),
)

_q(
    "agg_theta_distinct_bound",
    _dialect(
        """
        SELECT l_linestatus,
               COUNT(DISTINCT l_orderkey) AS exact_orders,
               ABS(THETA_SKETCH_ESTIMATE(THETA_SKETCH_AGG(l_orderkey))
                   - COUNT(DISTINCT l_orderkey))
                 <= CAST(0.05 * COUNT(DISTINCT l_orderkey) AS BIGINT)
                 AS theta_within_5pct
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
        """,
        """
        SELECT l_linestatus,
               COUNT(DISTINCT l_orderkey) AS exact_orders,
               TRUE AS theta_within_5pct
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
        """,
        "A*+",
        "Apache DataSketches theta sketch distinct-count asserted within "
        "5% of exact (measured ~1.2% at sf0.01; the retained-hash-set "
        "construction is update-order independent, so the estimate is "
        "deterministic for a fixed dataset). Unlike HLL it supports set "
        "algebra (union/intersect/diff) across pre-aggregated segments "
        "— the 100 TB shape for cross-partition audience overlap",
    ),
)

# Fixed-bin histogram: bucket index is a single identical IEEE
# expression ((x-lo)/w, floor, clamp) on both sides — deterministic
# because every engine computes the same double before flooring.
_q(
    "agg_value_histogram",
    _same(
        """
        SELECT bucket,
               COUNT(*) AS n,
               ROUND(MIN(value), 6) AS lo_val,
               ROUND(MAX(value), 6) AS hi_val
        FROM (
          SELECT value,
                 LEAST(GREATEST(CAST(FLOOR((value - (-500.0)) / 100.0)
                                     AS INT), 0), 9) AS bucket
          FROM events
        ) t
        GROUP BY bucket ORDER BY bucket
        """,
        "A*+",
        "fixed-bin value histogram (10 clamped buckets over [-500, 500)): "
        "distribution profiling as one map-side bucket expression + "
        "partial-agg groupBy — the cardinality-bounded shape, vs "
        "histogram_numeric whose merge order is nondeterministic",
    ),
)

_q(
    "agg_stats_corr",
    _same(
        """
        SELECT l_returnflag,
               ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covar,
               ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
               ROUND(VAR_SAMP(l_discount), 6) AS var_disc
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "A*+",
        "second-moment statistics (corr / covar / stddev / variance)",
    ),
)

_q(
    "agg_conditional_bool",
    _same(
        """
        SELECT l_linestatus,
               CAST(COUNT_IF(l_discount > 0.05) AS BIGINT) AS n_discounted,
               BOOL_AND(l_quantity > 0) AS all_positive,
               BOOL_OR(l_tax > 0.07) AS any_high_tax,
               CAST(CAST(MAX(l_shipdate) AS DATE) AS STRING) AS last_ship
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
        """,
        "A*+",
        "conditional / boolean aggregates",
    ),
)


def _two_phase_distinct_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe exact distinct count (operators/skew.py
    two_phase_distinct_count): dedup-then-count spreads a hot key's rows
    across the cluster in phase one; oracle is plain COUNT(DISTINCT)."""
    from mission_data_pipeline_spark.operators.skew import two_phase_distinct_count

    register_views(spark, sf_dir)
    return two_phase_distinct_count(
        spark.table("lineitem"), ["l_returnflag"], "l_partkey"
    ).orderBy("l_returnflag")


_q(
    "agg_two_phase_distinct",
    Query(
        _two_phase_distinct_spark,
        """
        SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_distinct
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "A*+,skew",
        "exact per-key distinct count via dedup-then-count (two shuffles, "
        "neither skewed) — the holistic-aggregate skew rewrite; oracle is "
        "the single-shuffle COUNT(DISTINCT)",
    ),
)


def _salted_agg_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit two-phase salted aggregation (operators/skew.py
    salted_agg): sums/counts merge exactly (integer-valued doubles), so
    the salted plan must equal the plain GROUP BY oracle."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.skew import salted_agg

    register_views(spark, sf_dir)
    out = salted_agg(
        spark.table("lineitem"),
        ["l_returnflag"],
        partial={
            "s": F.sum(F.col("l_quantity").cast("decimal(20,6)")),
            "c": F.count(F.lit(1)),
        },
        merge={"s": F.sum("s"), "c": F.sum("c")},
        n_salts=8,
        salt_on="l_orderkey",
    )
    return out.select(
        "l_returnflag",
        F.col("c").cast("long").alias("n"),
        F.round(F.col("s").cast("double") / F.col("c"), 6).alias("avg_qty"),
    ).orderBy("l_returnflag")


_q(
    "agg_salted_avg",
    Query(
        _salted_agg_spark,
        """
        SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS STRING) AS DOUBLE)
                     / COUNT(*), 6) AS avg_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "A*+,skew",
        "two-phase salted aggregation (hot key split across 8 reducers in "
        "phase one, exact DECIMAL partials merged in phase two) — must "
        "equal the plain GROUP BY, proving salting is transparent",
    ),
)


# ---------------------------------------------------------------------------
# Array higher-order functions over the embedding column
# ---------------------------------------------------------------------------

_q(
    "x3_vector_array_stats",
    _dialect(
        """
        SELECT vec_id, SIZE(embedding) AS dim,
               ROUND(SQRT(AGGREGATE(embedding, CAST(0 AS DOUBLE),
                     (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS l2_norm,
               ROUND(AGGREGATE(embedding, CAST(0 AS DOUBLE),
                     (a, x) -> a + CAST(x AS DOUBLE)) / SIZE(embedding), 6) AS mean_elem,
               ROUND(ARRAY_MAX(TRANSFORM(embedding, x -> CAST(x AS DOUBLE))), 6) AS max_elem
        FROM embeddings ORDER BY vec_id
        """,
        """
        SELECT vec_id, LEN(embedding) AS dim,
               ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
               ROUND(LIST_SUM(LIST_TRANSFORM(embedding,
                     x -> CAST(x AS DOUBLE))) / LEN(embedding), 6) AS mean_elem,
               ROUND(LIST_MAX(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))), 6) AS max_elem
        FROM embeddings ORDER BY vec_id
        """,
        "X3,X5",
        "higher-order array functions (fold / transform / max) — the "
        "JVM-side vector math primitive under the similarity operators",
    ),
)


# ---------------------------------------------------------------------------
# Wider TPC-H-shaped query surface (adapted to the driver's columns)
# ---------------------------------------------------------------------------

_q(
    "q6_forecast_revenue",
    _same(
        f"""
        SELECT {_dsum('l_extendedprice * l_discount')} AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """,
        "A*,S3",
        "TPC-H Q6: tight multi-predicate scan + single aggregate",
    ),
)

_q(
    "q4_order_priority",
    _same(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        "J*+",
        "TPC-H Q4 (adapted: shipdate for commitdate): EXISTS semi-join + agg",
    ),
)

_q(
    "q10_returned_items",
    _same(
        f"""
        SELECT c_custkey, c_name,
               {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
               CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
        """,
        "J*,A*,D8",
        "TPC-H Q10 (window shifted to 1996 Q1 — the classic 1994 window "
        "predates this testdata's 1995-2001 order dates and returned 0 "
        "rows, a vacuous check): 4-table join + agg + top-N by revenue",
    ),
)

_q(
    "q14_promo_effect",
    _same(
        f"""
        SELECT ROUND(100.0 * {_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
                     / {_dsum('l_extendedprice * (1 - l_discount)')}, 6) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
        """,
        "J1,A*",
        "TPC-H Q14 (adapted: p_type equality): conditional agg over broadcast join",
    ),
)

_q(
    "q18_large_volume",
    _same(
        f"""
        SELECT c_custkey, o_orderkey,
               CAST(CAST(o_orderdate AS DATE) AS STRING) AS o_orderdate,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               {_dsum('l_quantity')} AS total_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey HAVING SUM(l_quantity) > 180
        )
        GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        """,
        "J*,A*",
        "TPC-H Q18: IN-subquery on grouped HAVING + 3-table join",
    ),
)

_q(
    "q19_discounted_revenue",
    _same(
        f"""
        SELECT {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 20 AND 40)
        """,
        "J1,A*",
        "TPC-H Q19 (adapted): disjunctive multi-range predicates over a join",
    ),
)

_q(
    "q12_shipmode_priority",
    _same(
        """
        SELECT l_returnflag AS ship_group,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= o_orderdate
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """,
        "J*,A*",
        "TPC-H Q12 (adapted: returnflag for shipmode, shipdate>=orderdate for "
        "late-commit): join + priority-conditional counts",
    ),
)

_q(
    "q20_volume_suppliers",
    _same(
        """
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 30)
          GROUP BY l_suppkey
          HAVING SUM(l_quantity) > (
            SELECT 0.011 * SUM(l_quantity) FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 30))
        )
        ORDER BY s_suppkey
        """,
        "J*+",
        "TPC-H Q20 (adapted: no partsupp table; share-of-volume threshold): "
        "nested IN subqueries with scalar-aggregate HAVING",
    ),
)

_q(
    "q21_waiting_suppliers",
    _same(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL '60' DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL '90' DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        """,
        "J*+",
        "TPC-H Q21 (adapted: shipdate-vs-orderdate lateness for "
        "receiptdate-vs-commitdate): correlated EXISTS + NOT EXISTS multi-join",
    ),
)


def _ivf_topk_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-partitioned ANN (operators/similarity.py ivf_topk): deterministic
    coarse centroids keep the approximate result oracle-checkable."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.similarity import (
        default_centroids,
        ivf_topk,
    )

    register_views(spark, sf_dir)
    emb = spark.table("embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    # Explicit centroids: computed once here, reused by both the corpus
    # assignment and the query probe inside ivf_topk.
    cents = default_centroids(emb, n_centroids=32, vec_col="v")
    out = ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < 5),
        k=10,
        n_probe=4,
        centroids=cents,
        vec_col="v",
    )
    return out.orderBy("query_id", "rank")


# Shared by x3_ivf_topk_ann and the x3_ann_recall composition below.
_IVF_TOPK_DUCK = """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        c AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 32),
        assign AS (
          SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                     ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) DESC, c.cid) AS rn
            FROM e CROSS JOIN c) t WHERE rn = 1
        ),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
        probes AS (
          SELECT query_id, cid FROM (
            SELECT q.query_id, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                     ORDER BY ROUND(list_cosine_similarity(q.qv, c.cv), 6) DESC, c.cid) AS rn
            FROM q CROSS JOIN c) t WHERE rn <= 4
        ),
        scored AS (
          SELECT p.query_id, a.vec_id AS neighbor_id,
                 ROUND(list_cosine_similarity(q.qv, e.v), 6) AS cosine
          FROM probes p
          JOIN assign a ON p.cid = a.cid AND a.vec_id != p.query_id
          JOIN q ON q.query_id = p.query_id
          JOIN e ON e.vec_id = a.vec_id
        )
        SELECT query_id, neighbor_id, cosine, rank FROM (
          SELECT query_id, neighbor_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, neighbor_id) AS rank
          FROM scored) t
        WHERE rank <= 10
        ORDER BY query_id, rank
        """

_q(
    "x3_ivf_topk_ann",
    Query(
        _ivf_topk_spark,
        _IVF_TOPK_DUCK,
        "X3",
        "IVF-partitioned approximate top-k (partition-then-probe scale path; "
        "deterministic centroids make the approximation oracle-checkable)",
    ),
)


def _ivf_disk_index_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The at-rest IVF story made real (operators/similarity.py
    ivf_write_index / ivf_probe_index): assignment computed once and
    written partitionBy(centroid_id); probes filter the partition
    column with a static batch predicate, so every unprobed partition
    directory is pruned before a byte is read. Same parameters as
    x3_ivf_topk_ann — the on-disk path must reproduce the in-memory
    result exactly, so it shares that query's oracle verbatim."""

    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.similarity import (
        default_centroids,
        ivf_probe_index,
        ivf_write_index,
    )

    register_views(spark, sf_dir)
    emb = spark.table("embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    cents = default_centroids(emb, n_centroids=32, vec_col="v")
    d = _scratch_dir("ivf_idx_q")
    ivf_write_index(emb, d, cents, vec_col="v")
    out = ivf_probe_index(
        spark,
        d,
        emb.filter(F.col("vec_id") < 5),
        cents,
        k=10,
        n_probe=4,
        vec_col="v",
    )
    return out.orderBy("query_id", "rank")


_q(
    "x3_ivf_disk_index_topk",
    Query(
        _ivf_disk_index_spark,
        _IVF_TOPK_DUCK,
        "X3,L1+",
        "on-disk IVF index round-trip: write partitioned-by(centroid_id), "
        "probe with static partition pruning (only probed directories "
        "are scanned) — must equal the in-memory ivf_topk result, so it "
        "shares its DuckDB oracle verbatim",
    ),
)


def _ann_recall_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN *quality* as a driver-checked number: recall@5 of lsh_topk and
    ivf_topk (operators/similarity.py) against exact cosine ground truth
    on the same query set. Ground truth ranks by round(cosine, 6) so both
    engines order ties identically."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.similarity import (
        ann_recall,
        cosine_topk,
        default_centroids,
        ivf_topk,
        lsh_topk,
    )

    register_views(spark, sf_dir)
    emb = spark.table("embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < 5)

    exact = cosine_topk(emb, q, k=5, round_digits=6)

    # Recall-tuned sketch: fewer bits + more tables than the determinism
    # query (x3_lsh_topk_ann) — 8 buckets x 12 tables trades candidate
    # volume for collision probability, the knob ann_recall exists to tune
    # (recall@5 = 0.92 on this corpus vs 0.08 at bits=6/tables=3).
    lsh = lsh_topk(emb, q, k=5, bits=3, tables=12, dim=64)
    cents = default_centroids(emb, n_centroids=32, vec_col="embedding")
    ivf = ivf_topk(emb, q, k=5, n_probe=4, centroids=cents, vec_col="embedding")

    lr = ann_recall(lsh, exact, k=5).select(
        "query_id",
        "n_exact",
        F.col("n_hit").alias("lsh_hit"),
        F.round("recall", 6).alias("lsh_recall"),
    )
    ir = ann_recall(ivf, exact, k=5).select(
        "query_id",
        F.col("n_hit").alias("ivf_hit"),
        F.round("recall", 6).alias("ivf_recall"),
    )
    return lr.join(ir, "query_id").orderBy("query_id")


def _ann_recall_oracle_sql() -> str:
    """Composes the (already driver-green) LSH and IVF oracle pipelines
    with an exact rounded-cosine ground truth into per-query recall@5."""
    return f"""
        WITH exact AS (
          SELECT query_id, neighbor_id FROM (
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
                 q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5)
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                     ORDER BY ROUND(list_cosine_similarity(q.qv, e.v), 6) DESC,
                              e.vec_id) AS rank
            FROM e CROSS JOIN q WHERE e.vec_id != q.query_id
          ) t WHERE rank <= 5
        ),
        lsh AS (
          SELECT query_id, neighbor_id
          FROM ({_lsh_oracle_sql(bits=3, tables=12)}) t
        ),
        ivf AS (
          SELECT query_id, neighbor_id FROM ({_IVF_TOPK_DUCK}) t WHERE rank <= 5
        ),
        den AS (SELECT query_id, COUNT(*) AS n_exact FROM exact GROUP BY query_id),
        lh AS (
          SELECT e.query_id, COUNT(*) AS n
          FROM exact e JOIN lsh a USING (query_id, neighbor_id)
          GROUP BY e.query_id
        ),
        ih AS (
          SELECT e.query_id, COUNT(*) AS n
          FROM exact e JOIN ivf a USING (query_id, neighbor_id)
          GROUP BY e.query_id
        )
        SELECT d.query_id,
               CAST(d.n_exact AS BIGINT) AS n_exact,
               CAST(COALESCE(lh.n, 0) AS BIGINT) AS lsh_hit,
               ROUND(CAST(COALESCE(lh.n, 0) AS DOUBLE) / d.n_exact, 6) AS lsh_recall,
               CAST(COALESCE(ih.n, 0) AS BIGINT) AS ivf_hit,
               ROUND(CAST(COALESCE(ih.n, 0) AS DOUBLE) / d.n_exact, 6) AS ivf_recall
        FROM den d
        LEFT JOIN lh ON lh.query_id = d.query_id
        LEFT JOIN ih ON ih.query_id = d.query_id
        ORDER BY d.query_id
        """


_q(
    "x3_ann_recall",
    Query(
        _ann_recall_spark,
        _ann_recall_oracle_sql(),
        "X3",
        "recall@5 of the LSH and IVF approximate top-k paths against exact "
        "rounded-cosine ground truth — ANN quality (not just determinism) "
        "as a driver-visible number",
    ),
)


# ---------------------------------------------------------------------------
# TPC-H-derived complex join / subquery shapes (general query surface).
# The driver's tables omit partsupp, l_commitdate/receiptdate/shipmode and
# c_phone, so Q2/Q11/Q12/Q16/Q20/Q21/Q22 are adapted to the available
# columns with the same plan shape (correlated subqueries, left-join
# distributions, scalar-subquery thresholds, multi-reference anti/semi
# joins) via column substitutions.
# ---------------------------------------------------------------------------

_q(
    "q2_min_cost_supplier",
    _same(
        """
        SELECT DISTINCT s.s_acctbal, s.s_name, p.p_partkey, p.p_name
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE p.p_size = 5 AND p.p_type = 'ECONOMY'
          AND s.s_acctbal = (SELECT MIN(s2.s_acctbal)
                             FROM supplier s2
                             JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
                             WHERE l2.l_partkey = p.p_partkey)
        ORDER BY s.s_acctbal DESC, p.p_partkey, s.s_name
        """,
        "J*+",
        "TPC-H Q2 (adapted, no partsupp): per-part min-cost supplier via "
        "correlated aggregate subquery over a join",
    ),
)

_q(
    "q7_volume_shipping",
    _same(
        """
        SELECT supp_nation, cust_nation, l_year,
               CAST(CAST(SUM(volume_d) AS STRING) AS DOUBLE) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
                 CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(20,6)) AS volume_d
          FROM supplier s
          JOIN lineitem l ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
          WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
        """,
        "J*,A2",
        "TPC-H Q7: six-way join with disjunctive nation-pair predicate, "
        "grouped by shipment year",
    ),
)

_q(
    "q8_market_share",
    _same(
        """
        SELECT o_year,
               ROUND(CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume_d
                                   ELSE CAST(0 AS DECIMAL(20,6)) END) AS STRING) AS DOUBLE)
                     / CAST(CAST(SUM(volume_d) AS STRING) AS DOUBLE), 6) AS mkt_share
        FROM (
          SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
                 CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(20,6)) AS volume_d,
                 n2.n_name AS supp_nation
          FROM part p
          JOIN lineitem l ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
          JOIN region r ON n1.n_regionkey = r.r_regionkey
          JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
          WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        ) all_nations
        GROUP BY o_year
        ORDER BY o_year
        """,
        "J*,A2",
        "TPC-H Q8: eight-way join, conditional-sum market-share ratio by year",
    ),
)

_q(
    "q9_product_profit",
    _same(
        """
        SELECT nation, o_year, CAST(CAST(SUM(volume_d) AS STRING) AS DOUBLE) AS profit
        FROM (
          SELECT n.n_name AS nation,
                 CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
                 CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(20,6)) AS volume_d
          FROM lineitem l
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN part p ON p.p_partkey = l.l_partkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          WHERE p.p_name LIKE '%bolt%'
        ) profit_by
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
        """,
        "J*,A2",
        "TPC-H Q9 (adapted, no supplycost): profit by supplier nation and "
        "order year over a LIKE-filtered five-way join",
    ),
)

_q(
    "q11_important_stock",
    _same(
        """
        SELECT l_partkey, CAST(CAST(SUM(val_d) AS STRING) AS DOUBLE) AS part_value
        FROM (SELECT l_partkey,
                     CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6)) AS val_d
              FROM lineitem) t
        GROUP BY l_partkey
        HAVING CAST(CAST(SUM(val_d) AS STRING) AS DOUBLE) >
               (SELECT CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                     AS DECIMAL(20,6))) AS STRING) AS DOUBLE) * 0.0008
                FROM lineitem)
        ORDER BY part_value DESC, l_partkey
        """,
        "J*+,A2",
        "TPC-H Q11 (adapted, no partsupp): per-part value share above a "
        "global scalar-subquery threshold (HAVING over uncorrelated subquery)",
    ),
)

_q(
    "q13_customer_distribution",
    _same(
        """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
          SELECT c.c_custkey AS custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                            AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey
        ) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
        """,
        "J2,A2",
        "TPC-H Q13: left-outer join with join-time predicate, then "
        "count-of-counts distribution",
    ),
)

_q(
    "q15_top_supplier",
    _same(
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(20,6))) AS STRING) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s.s_suppkey
        """,
        "J*+,A2,A4",
        "TPC-H Q15: CTE revenue view, equality against scalar MAX subquery "
        "(exact-decimal sums make the double comparison engine-stable)",
    ),
)

_q(
    "q16_supplier_part_count",
    _same(
        """
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 2, 3, 4, 5)
          AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                  WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_type, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
        """,
        "J*+,A1",
        "TPC-H Q16 (adapted, lineitem as the part-supplier bridge): distinct "
        "suppliers per brand/type/size with NOT IN exclusion subquery",
    ),
)

_q(
    "q17_small_quantity_revenue",
    _same(
        """
        SELECT ROUND(CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(20,6))) AS STRING) AS DOUBLE) / 7.0, 6) AS avg_yearly
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#3'
          AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                              FROM lineitem l2
                              WHERE l2.l_partkey = l.l_partkey)
        """,
        "J*+,A3",
        "TPC-H Q17: correlated per-part average-quantity threshold "
        "(decorrelated by Catalyst into an aggregate + join)",
    ),
)

_q(
    "q22_global_sales_opportunity",
    _same(
        """
        SELECT c_nationkey,
               COUNT(*) AS numcust,
               CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(20,6))) AS STRING) AS DOUBLE) AS totacctbal
        FROM customer c
        WHERE c_acctbal > (SELECT SUM(CAST(c_acctbal AS DECIMAL(20,6))) / COUNT(*)
                           FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 300000)
        GROUP BY c_nationkey
        ORDER BY c_nationkey
        """,
        "J*+,A3",
        "TPC-H Q22 (adapted, nationkey as country code): positive-balance "
        "average threshold + anti-join, grouped totals (exact-decimal avg "
        "keeps the threshold comparison engine-stable)",
    ),
)


_q(
    "limit_check_alarm",
    _same(
        """
        WITH limits AS (
          SELECT * FROM (VALUES
            ('click', 200.0, 400.0),
            ('view',  150.0, 300.0),
            ('error',  50.0, 250.0)
          ) AS t(event_type, warn_high, crit_high)
        )
        SELECT e.event_type,
               CASE
                 WHEN l.crit_high IS NOT NULL AND e.value > l.crit_high THEN 3
                 WHEN l.warn_high IS NOT NULL AND e.value > l.warn_high THEN 1
                 WHEN l.warn_high IS NULL AND l.crit_high IS NULL THEN NULL
                 ELSE 0
               END AS alarm_level,
               COUNT(*) AS n
        FROM events e LEFT JOIN limits l ON e.event_type = l.event_type
        GROUP BY e.event_type,
               CASE
                 WHEN l.crit_high IS NOT NULL AND e.value > l.crit_high THEN 3
                 WHEN l.warn_high IS NOT NULL AND e.value > l.warn_high THEN 1
                 WHEN l.warn_high IS NULL AND l.crit_high IS NULL THEN NULL
                 ELSE 0
               END
        ORDER BY e.event_type, alarm_level NULLS FIRST
        """,
        "T8+,J2",
        "limit monitoring (operators/limits.py analog): per-key bands via "
        "broadcast left join, alarm-level classification + counts",
    ),
)


def _incremental_dedup_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup — the production shape: every new crawl
    batch is deduped AGAINST THE EXISTING CORPUS (content-hash anti
    join), not just within itself. The incoming batch is synthesized
    in-plan: 100 exact copies of corpus docs under new ids (must all
    drop) + 100 genuinely-new variants (must all survive)."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    corpus = spark.table("documents")
    copies = corpus.filter(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    fresh = corpus.filter(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" fresh")).alias("text"),
    )
    incoming = copies.unionByName(fresh)
    survivors = incoming.join(
        corpus.select(F.md5("text").alias("__h")).distinct(),
        F.md5(incoming["text"]) == F.col("__h"),
        "left_anti",
    )
    return survivors.select("doc_id", F.md5("text").alias("content_md5")).orderBy(
        "doc_id"
    )


_q(
    "x1_incremental_dedup",
    Query(
        _incremental_dedup_spark,
        """
        SELECT doc_id + 20000 AS doc_id, md5(text || ' fresh') AS content_md5
        FROM documents WHERE doc_id < 100
        ORDER BY doc_id
        """,
        "X1",
        "incremental ingest dedup: new batch anti-joined on content hash "
        "against the existing corpus — exact copies drop, new variants "
        "survive (one shuffle on a 128-bit key; at scale the corpus side "
        "is a pre-computed hash index)",
    ),
)


def _canonical_per_cluster_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster canonicalization — the step AFTER clustering:
    keep one representative per duplicate component (longest text, tie →
    lowest id), the standard keep-best policy. Composes the MinHash
    candidate pairs + connected_components operator with a per-component
    quality argmax; the oracle replays clustering via recursive CTE."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.dedup import connected_components

    register_views(spark, sf_dir)
    pairs = spark.sql(f"SELECT doc_a, doc_b FROM ({_MINHASH_SPARK}) p")
    comp = connected_components(pairs)
    docs = spark.table("documents").select("doc_id", "n_chars")
    scored = comp.join(docs, comp["node"] == docs["doc_id"]).select(
        "component_id", "doc_id", "n_chars"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("component_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "component_id",
            F.col("doc_id").alias("canonical_doc"),
            F.col("n_chars").cast("long").alias("canonical_chars"),
        )
        .orderBy("component_id")
    )


_q(
    "x2_canonical_per_cluster",
    Query(
        _canonical_per_cluster_spark,
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
        ),
        comp AS (
          SELECT src AS doc_id, CAST(MIN(node) AS BIGINT) AS component_id
          FROM reach GROUP BY src
        )
        SELECT component_id, canonical_doc, canonical_chars FROM (
          SELECT c.component_id, d.doc_id AS canonical_doc,
                 CAST(d.n_chars AS BIGINT) AS canonical_chars,
                 ROW_NUMBER() OVER (PARTITION BY c.component_id
                                    ORDER BY d.n_chars DESC, d.doc_id) AS rn
          FROM comp c JOIN documents d ON d.doc_id = c.doc_id
        ) t WHERE rn = 1
        ORDER BY component_id
        """,
        "X2",
        "keep-best canonicalization per duplicate cluster (longest text, "
        "tie -> lowest id) over MinHash components — the selection policy "
        "step after near-dup clustering",
    ),
)


def _normalize_text_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization (operators/text.py normalize_text) over
    in-plan-dirtied documents: every space doubled into tabs, leading
    blanks, CRLF + control-char tail appended — normalization must
    recover exactly `collapsed(text) + "\\nend"`, which the oracle
    derives analytically (no regex replay needed)."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.text import normalize_text

    register_views(spark, sf_dir)
    doc = spark.table("documents").filter(F.col("doc_id") < 200)
    dirty = doc.withColumn(
        "text",
        F.concat(
            F.lit("  "),
            F.regexp_replace(F.col("text"), " ", "\t\t"),
            F.lit("\r\nend\x07  "),
        ),
    )
    out = normalize_text(dirty)
    return out.select(
        "doc_id",
        F.md5("text").alias("norm_md5"),
        F.length("text").alias("n_chars_norm"),
    ).orderBy("doc_id")


_q(
    "curation_normalize_text",
    Query(
        _normalize_text_spark,
        """
        WITH n AS (
          SELECT doc_id,
                 trim(regexp_replace(text, '[ ]+', ' ', 'g'))
                   || chr(10) || 'end' AS norm
          FROM documents WHERE doc_id < 200
        )
        SELECT doc_id, md5(norm) AS norm_md5,
               CAST(length(norm) AS BIGINT) AS n_chars_norm
        FROM n
        ORDER BY doc_id
        """,
        "X-curation",
        "whitespace/control/line-ending normalization (the cleanup pass "
        "that makes dedup keys and token counts stable): zero-shuffle "
        "regexp chain over in-plan-dirtied text; oracle derives the "
        "expected normalized form analytically",
    ),
)


def _content_filter_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combined source-blocklist + badwords content gate (operators/
    text.py filter_badwords + a source NOT IN blocklist) — the C4-style
    pre-dedup filter chain; oracle replays both predicates in SQL."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.text import filter_badwords

    register_views(spark, sf_dir)
    docs = spark.table("documents").filter(
        ~F.col("source").isin("src0", "src13")
    )
    kept = filter_badwords(docs, ["slow", "vector"])
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
        )
        .orderBy("lang")
    )


_q(
    "curation_content_filter",
    Query(
        _content_filter_spark,
        r"""
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
               CAST(SUM(n_chars) AS BIGINT) AS kept_chars
        FROM documents
        WHERE source NOT IN ('src0', 'src13')
          AND NOT regexp_matches(lower(text), '\b(slow|vector)\b')
        GROUP BY lang
        ORDER BY lang
        """,
        "X-curation",
        "source blocklist + C4 badwords gate (whole-word alternation in "
        "the Java∩RE2 subset) — zero-shuffle map-side content filtering "
        "ahead of the expensive dedup/scoring stages",
    ),
)


def _csv_source_e2e_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 end-to-end: a wide telemetry CSV with arithmetic values and
    deterministic NaN holes written to a real file, read through
    read_csv_telemetry (native scan + stack melt + NaN-drop); the
    oracle regenerates the surviving cells from the row index."""
    import os

    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.sources import read_csv_telemetry

    lines = ["time,apid,seq_count,chan_a,chan_b"]
    for i in range(300):
        a = f"{i * 0.5 + 1.25:.2f}" if i % 7 != 3 else ""
        # float-formatted so schema inference types both channels DOUBLE
        # (an all-integer column would infer INT and break the melt stack)
        b = f"{1000 - i:.1f}" if i % 11 != 5 else ""
        lines.append(f"{float(i)},291,{i},{a},{b}")
    d = _scratch_dir("csv_src_q")
    path = os.path.join(d, "telemetry.csv")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    out = read_csv_telemetry(spark, path)
    return out.select(
        "name",
        F.col("seq_count").cast("long").alias("seq_count"),
        F.round("time_tai", 6).alias("time_tai"),
        F.round("raw_value", 6).alias("raw_value"),
        F.round("eng_value", 6).alias("eng_value"),
        "validity",
    ).orderBy("name", "seq_count")


_q(
    "s2_csv_source_e2e",
    Query(
        _csv_source_e2e_spark,
        """
        WITH idx AS (SELECT UNNEST(range(0, 300)) AS i)
        SELECT name, seq_count, time_tai, raw_value, eng_value, validity
        FROM (
          SELECT 'chan_a' AS name, CAST(i AS BIGINT) AS seq_count,
                 ROUND(CAST(i AS DOUBLE), 6) AS time_tai,
                 ROUND(i * 0.5 + 1.25, 6) AS raw_value,
                 ROUND(i * 0.5 + 1.25, 6) AS eng_value,
                 TRUE AS validity
          FROM idx WHERE i % 7 != 3
          UNION ALL
          SELECT 'chan_b', CAST(i AS BIGINT),
                 ROUND(CAST(i AS DOUBLE), 6),
                 ROUND(CAST(1000 - i AS DOUBLE), 6),
                 ROUND(CAST(1000 - i AS DOUBLE), 6),
                 TRUE
          FROM idx WHERE i % 11 != 5
        ) t
        ORDER BY name, seq_count
        """,
        "S2",
        "CSV telemetry source end-to-end: real file -> native scan -> "
        "stack melt -> NaN-drop; oracle regenerates surviving cells from "
        "the row index",
    ),
)


def _etl_e2e_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's core telemetry path driver-checked END-TO-END:
    arithmetic CCSDS packets written to a real binary file, read back
    through the split-range parallel scan (sources/binary.py), decommed
    (operators/decom.py) and calibrated (operators/calibration.py); the
    oracle recomputes every raw and engineering value from the packet
    index — S1+T1+T2+T9+T11 in one correctness row (previously only
    bench/pytest-covered as a pipeline)."""
    import os
    import struct

    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.models.ccsds import build_packet
    from mission_data_pipeline_spark.operators import (
        Calibration,
        ParameterDefinition,
        apply_calibrations,
        decommutate,
    )
    from mission_data_pipeline_spark.operators.decom import ParameterType
    from mission_data_pipeline_spark.sources import read_packets

    n = 500
    stream = b"".join(
        build_packet(
            0x123,
            i % 16384,
            struct.pack(">HI", (i * 257) % 65536, (i * 65537) % (1 << 32)),
        )
        for i in range(n)
    )
    d = _scratch_dir("etl_q")
    path = os.path.join(d, "stream.bin")
    with open(path, "wb") as f:
        f.write(stream)
    pk = read_packets(spark, path, split_size=4096)
    defs = [
        ParameterDefinition("p_u16", 0x123, 0, 16, ParameterType.UINT),
        ParameterDefinition("p_u32", 0x123, 2, 32, ParameterType.UINT),
    ]
    cals = [Calibration("p_u16", "polynomial", (1.5, 0.25), unit="V")]
    out = apply_calibrations(decommutate(pk, defs), cals)
    return out.select(
        "name",
        F.col("seq_count").cast("long").alias("seq_count"),
        F.col("raw_value").cast("long").alias("raw"),
        F.round("eng_value", 6).alias("eng"),
        "unit",
    ).orderBy("name", "seq_count")


_q(
    "etl_binary_decom_calibrate_e2e",
    Query(
        _etl_e2e_spark,
        """
        WITH idx AS (SELECT UNNEST(range(0, 500)) AS i)
        SELECT name, seq_count, raw, eng, unit FROM (
          SELECT 'p_u16' AS name, CAST(i AS BIGINT) AS seq_count,
                 CAST((i * 257) % 65536 AS BIGINT) AS raw,
                 ROUND(1.5 + 0.25 * ((i * 257) % 65536), 6) AS eng,
                 'V' AS unit
          FROM idx
          UNION ALL
          SELECT 'p_u32', CAST(i AS BIGINT),
                 CAST((i * 65537) % 4294967296 AS BIGINT),
                 ROUND(CAST((i * 65537) % 4294967296 AS DOUBLE), 6),
                 NULL
          FROM idx
        ) t
        ORDER BY name, seq_count
        """,
        "S1,T1,T2,T9,T11",
        "core telemetry ETL end-to-end: arithmetic packets -> real binary "
        "file -> split-range parallel scan -> decom -> polynomial + "
        "identity calibration; oracle recomputes every value from the "
        "packet index",
    ),
)


def _pagerank_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (operators/graph.py) over a
    deterministic 300-node multigraph built from range(): out-degree-2
    nodes plus every-fifth-node dangling (no out-edges) so the uniform
    dangling-mass redistribution is actually exercised. The oracle
    unrolls the SAME 8 join-agg iterations as chained CTEs — identical
    round-to-12-decimals + exact DECIMAL summation sequence, so ranks
    must match bit-for-bit."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.graph import pagerank

    base = spark.range(300).select(F.col("id").cast("long").alias("i")).filter(
        F.col("i") % 5 != 0
    )
    edges = base.select(
        F.col("i").alias("src"), ((F.col("i") * 7 + 3) % 300).alias("dst")
    ).unionByName(
        base.select(
            F.col("i").alias("src"),
            ((F.col("i") * 13 + 11) % 300).alias("dst"),
        )
    )
    out = pagerank(edges, n_iter=8, damping=0.85)
    return out.select("node", F.round("rank", 9).alias("rank")).orderBy("node")


def _pagerank_oracle(n_iter: int = 8) -> str:
    head = """
        WITH edges AS (
          SELECT i AS src, (i*7+3) % 300 AS dst
          FROM range(0, 300) t(i) WHERE i % 5 != 0
          UNION ALL
          SELECT i AS src, (i*13+11) % 300 AS dst
          FROM range(0, 300) t(i) WHERE i % 5 != 0
        ),
        nodes AS (
          SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges
            UNION ALL SELECT dst FROM edges) u
        ),
        deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
        base AS (
          SELECT node, deg FROM nodes LEFT JOIN deg ON node = deg.src
        ),
        nn AS (SELECT COUNT(*) AS n FROM base),
        r0 AS MATERIALIZED (
          SELECT node, deg, ROUND(CAST(1 AS DOUBLE) / n, 12) AS rank
          FROM base CROSS JOIN nn
        )"""
    its = []
    for k in range(1, n_iter + 1):
        p = k - 1
        its.append(f"""
        , c{k} AS (
          SELECT dst, SUM(CAST(ROUND(rank / deg, 12) AS DECIMAL(30,12)))
                 AS mass
          FROM r{p} JOIN edges ON node = edges.src GROUP BY dst
        ),
        d{k} AS (
          SELECT COALESCE(SUM(CAST(rank AS DECIMAL(30,12))),
                          CAST(0 AS DECIMAL(30,12))) AS dmass
          FROM r{p} WHERE deg IS NULL
        ),
        r{k} AS MATERIALIZED (
          SELECT node, deg,
                 ROUND(CAST(0.15 AS DOUBLE) / n
                       + CAST(0.85 AS DOUBLE)
                         * (COALESCE(CAST(mass AS DOUBLE), 0)
                            + CAST(dmass AS DOUBLE) / n), 12) AS rank
          FROM r{p} LEFT JOIN c{k} ON node = c{k}.dst
          CROSS JOIN d{k} CROSS JOIN nn
        )""")
    return (
        head
        + "".join(its)
        + f"""
        SELECT node, ROUND(rank, 9) AS rank FROM r{n_iter} ORDER BY node
        """
    )


_q(
    "g_pagerank",
    Query(
        _pagerank_spark,
        _pagerank_oracle(8),
        "X2+,§graph",
        "fixed-iteration PageRank with uniform dangling-mass "
        "redistribution: join-agg per iteration, DECIMAL-exact "
        "contribution sums, localCheckpoint-flattened lineage; oracle "
        "unrolls the identical iterations as chained CTEs",
    ),
)


def _compact_roundtrip_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file/layout compaction (sinks/compact.py compact_dataset —
    the lakehouse OPTIMIZE primitive): the documents table is rewritten
    to >= 8 splittable files (min_files floor — the scan-parallelism
    guarantee for per-row-expensive text data), re-read distributed,
    and aggregated per lang; the oracle runs the same aggregate on the
    ORIGINAL table, so the rewrite must be content-lossless. Fails
    loudly if the output file count is below the floor."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.sinks.compact import compact_dataset

    register_views(spark, sf_dir)
    dst = _scratch_dir("compact_q") + "/docs"
    n_files = compact_dataset(
        spark, f"{sf_dir}/documents.parquet", dst, min_files=8
    )
    if n_files < 8:
        raise RuntimeError(f"compaction wrote {n_files} files, floor is 8")
    back = spark.read.parquet(dst)
    sig = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.col("doc_id"), "text")), 1, 12),
        16,
        10,
    ).cast("long")
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(sig).alias("content_sig"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )


_q(
    "l_compact_roundtrip",
    Query(
        _compact_roundtrip_spark,
        """
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CAST(('0x' || substr(md5(doc_id || '|' || text), 1, 12))
                             AS BIGINT)) AS BIGINT) AS content_sig,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY lang ORDER BY lang
        """,
        "L+,§perf",
        "dataset compaction (OPTIMIZE): rewrite to a target file "
        "size/count so scans split across executors; content-lossless "
        "by per-lang accounting vs the original table",
    ),
)


def _schema_evolution_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse schema evolution: a dataset written in TWO generations
    — the old files lack a column the new files carry — read back as
    one logical table with ``mergeSchema`` (the schema-drift tolerance
    every long-lived 100 TB table needs; columns appear as NULL for
    pre-evolution files, nothing is rewritten). The split point is
    derived from the data itself so the oracle reproduces it exactly."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    d = _scratch_dir("schema_evo")
    docs = spark.table("documents").select("doc_id", "lang", "n_chars")
    # generation 1: no quality_tier column
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(
        f"{d}/gen=1"
    )
    # generation 2: schema evolved — adds quality_tier
    docs.filter(F.col("doc_id") % 2 == 1).withColumn(
        "quality_tier", (F.col("doc_id") % 4).cast("int")
    ).write.mode("overwrite").parquet(f"{d}/gen=2")
    back = spark.read.option("mergeSchema", "true").parquet(d)
    if "quality_tier" not in back.columns:
        raise RuntimeError("mergeSchema did not surface the evolved column")
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count("quality_tier").cast("long").alias("n_evolved"),
            F.coalesce(F.sum("quality_tier"), F.lit(0))
            .cast("long")
            .alias("tier_sum"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )


_q(
    "l_schema_evolution_merge",
    Query(
        _schema_evolution_spark,
        """
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_evolved,
               CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN doc_id % 4 ELSE 0 END)
                 AS BIGINT) AS tier_sum,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY lang ORDER BY lang
        """,
        "L+,S+",
        "schema evolution across file generations: mergeSchema unifies "
        "old files (missing column → NULL) with evolved files in one "
        "logical table, nothing rewritten; per-lang accounting of "
        "evolved rows and values must match the oracle's derivation",
    ),
)


def _corrupt_file_skip_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational resilience: a table directory containing a CORRUPT
    member file (truncated mid-stream — the half-written upload every
    large ingest eventually sees) is scanned with
    ``spark.sql.files.ignoreCorruptFiles``: the good files' rows all
    arrive, the bad file contributes nothing, the job does NOT die.
    The conf is scoped to this query and restored. The query also
    proves the default is a LOUD failure (fail-fast unless opted in)."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    d = _scratch_dir("corrupt_skip")
    docs = spark.table("documents").select("doc_id", "lang", "n_chars")
    docs.filter(F.col("doc_id") % 3 == 0).write.parquet(f"{d}/a")
    # the to-be-corrupted generation is ONE file, so exactly the
    # doc_id % 3 != 0 slice disappears — making the surviving set a
    # derivable expression instead of a partitioning accident
    docs.filter(F.col("doc_id") % 3 != 0).repartition(1).write.parquet(
        f"{d}/b"
    )
    import glob as _glob
    import os as _os

    # truncate the data file to half: corrupt footer + stream
    victim = sorted(_glob.glob(f"{d}/b/part-*.parquet"))[0]
    size = _os.path.getsize(victim)
    with open(victim, "r+b") as f:
        f.truncate(size // 2)
    paths = [f"{d}/a", f"{d}/b"]
    knob = "spark.sql.files.ignoreCorruptFiles"
    prev = spark.conf.get(knob, "false")
    try:
        spark.conf.set(knob, "false")
        failed_loudly = False
        try:
            # explicit schema: the failure under test is the SCAN, not
            # schema inference happening to pick the corrupt footer
            spark.read.schema(docs.schema).parquet(*paths).count()
        except Exception:
            failed_loudly = True
        if not failed_loudly:
            raise RuntimeError(
                "corrupt parquet member did NOT fail the default-mode scan"
            )
        spark.conf.set(knob, "true")
        back = spark.read.schema(docs.schema).parquet(*paths)
        out = (
            back.groupBy("lang")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("total_chars"),
            )
            .orderBy("lang")
        )
        # force materialization NOW while the conf is set (the plan is
        # cached on this QueryExecution, but execution must also run
        # under ignoreCorruptFiles) — stage to a driver-local result
        rows = out.collect()
    finally:
        spark.conf.set(knob, prev)
    return spark.createDataFrame(rows, out.schema)


_q(
    "s_corrupt_file_skip",
    Query(
        _corrupt_file_skip_spark,
        """
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        WHERE doc_id % 3 = 0
        GROUP BY lang ORDER BY lang
        """,
        "S+,P+",
        "corrupt-member resilience: a truncated parquet file fails the "
        "scan loudly by default (asserted) and is skipped cleanly under "
        "ignoreCorruptFiles — the surviving intact subset (the oracle's "
        "derivable slice) arrives in full",
    ),
)


def _ccsds_datasource_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.read.format('ccsds') end-to-end (sources/ccsds_datasource.py,
    SURVEY §4.2 option b): the same arithmetic packet stream as the ETL
    e2e query, but scanned through the registered Python Data Source —
    driver-side range planning into InputPartitions, per-range Arrow
    RecordBatch parse on executors, APID pushdown as a reader option
    (a second APID is interleaved and must be dropped inside the scan).
    Oracle recomputes header fields + payload digests from the index."""
    import os
    import struct

    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.models.ccsds import build_packet
    from mission_data_pipeline_spark.sources import register_ccsds_source

    n = 400
    # Per-APID CONTINUOUS seq counters (CCSDS 133.0-B-2 §4.1.3.4 — the
    # invariant the split-range resync heuristic confirms against; a
    # shared counter across APIDs is spec-violating telemetry and makes
    # boundaries unconfirmable): every 4th packet is APID 0x200, the
    # rest 0x123, each counting its own sequence.
    stream = b"".join(
        build_packet(
            0x123 if i % 4 else 0x200,
            (i - (i + 3) // 4) if i % 4 else i // 4,
            struct.pack(">HI", (i * 257) % 65536, (i * 65537) % (1 << 32)),
        )
        for i in range(n)
    )
    d = _scratch_dir("ccsds_ds_q")
    path = os.path.join(d, "stream.bin")
    with open(path, "wb") as f:
        f.write(stream)
    register_ccsds_source(spark)
    pk = (
        spark.read.format("ccsds")
        .option("split_size", 4096)
        .option("apid_filter", "291")  # 0x123
        .load(path)
    )
    return pk.select(
        F.col("seq_count").cast("long").alias("seq_count"),
        F.col("apid").cast("int").alias("apid"),
        F.col("data_length").cast("int").alias("data_length"),
        F.hex("user_data").alias("content_hex"),
    ).orderBy("seq_count")


_q(
    "s1_ccsds_datasource_scan",
    Query(
        _ccsds_datasource_spark,
        """
        WITH idx AS (SELECT UNNEST(range(0, 400)) AS i)
        SELECT CAST(i - (i + 3) // 4 AS BIGINT) AS seq_count,
               CAST(291 AS INT) AS apid,
               CAST(5 AS INT) AS data_length,
               upper(lpad(to_hex((i * 257) % 65536), 4, '0')
                     || lpad(to_hex((i * 65537) % 4294967296), 8, '0'))
                 AS content_hex
        FROM idx WHERE i % 4 != 0
        ORDER BY seq_count
        """,
        "S1,S3",
        "registered ccsds Data Source format: InputPartition range "
        "planning + Arrow-batch range parse + APID pushdown option; "
        "oracle recomputes headers and payload digests from the index",
    ),
)


def _ccsds_streaming_tail_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE telemetry tail — spark.readStream.format('ccsds')
    (sources/ccsds_datasource.py CcsdsStreamReader): a ground-station
    file grows BETWEEN two availableNow runs sharing one checkpoint;
    the byte offsets the source commits always sit on packet boundaries
    (a half-written packet at end-of-file stays unconsumed until its
    bytes arrive), so the final durable sink holds every packet exactly
    once — including the one that was partial when run 1 observed it.
    Oracle recomputes headers + payload digests from the index."""
    import os
    import struct

    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.models.ccsds import build_packet
    from mission_data_pipeline_spark.sources import register_ccsds_source

    register_ccsds_source(spark)
    src = _scratch_dir("ccsds_tail_src")
    ckpt = _scratch_dir("ccsds_tail_ckpt")
    out = _scratch_dir("ccsds_tail_out")

    def pkt(i: int) -> bytes:
        return build_packet(
            0x123,
            i % 16384,
            struct.pack(">HI", (i * 257) % 65536, (i * 65537) % (1 << 32)),
        )

    def run_once() -> None:
        q = (
            spark.readStream.format("ccsds")
            .option("path", src)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(300)
        finally:
            q.stop()

    boundary = pkt(150)
    with open(os.path.join(src, "f1.bin"), "wb") as f:
        f.write(b"".join(pkt(i) for i in range(150)) + boundary[:5])
    run_once()
    n1 = spark.read.parquet(out).count()
    # growth: complete the partial packet, extend f1, add f2
    with open(os.path.join(src, "f1.bin"), "ab") as f:
        f.write(boundary[5:] + b"".join(pkt(i) for i in range(151, 200)))
    with open(os.path.join(src, "f2.bin"), "wb") as f:
        f.write(b"".join(pkt(i) for i in range(200, 250)))
    run_once()
    final = spark.read.parquet(out)
    n2 = final.count()
    if not (n1 == 150 and n2 == 250):
        raise RuntimeError(
            f"tail source exactly-once violated: run1={n1} (want 150, "
            f"partial packet withheld), final={n2} (want 250)"
        )
    return final.select(
        F.col("seq_count").cast("long").alias("seq_count"),
        F.col("apid").cast("int").alias("apid"),
        F.hex("user_data").alias("content_hex"),
    ).orderBy("seq_count")


_q(
    "s1_ccsds_streaming_tail",
    Query(
        _ccsds_streaming_tail_spark,
        """
        WITH idx AS (SELECT UNNEST(range(0, 250)) AS i)
        SELECT CAST(i AS BIGINT) AS seq_count,
               CAST(291 AS INT) AS apid,
               upper(lpad(to_hex((i * 257) % 65536), 4, '0')
                     || lpad(to_hex((i * 65537) % 4294967296), 8, '0'))
                 AS content_hex
        FROM idx ORDER BY seq_count
        """,
        "S1,W+",
        "LIVE telemetry tail: streaming ccsds source over growing files, "
        "two availableNow runs from one checkpoint — packet-boundary "
        "offsets make the growth replay exactly-once (partial trailing "
        "packet withheld until complete); oracle from the index",
    ),
)


# ---------------------------------------------------------------------------
# Ingest/export round-trips: the sink and source paths driver-checked
# end-to-end (write → distributed re-read → aggregate vs an oracle over
# the original tables).
# ---------------------------------------------------------------------------


def _warc_ingest_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingest (sources/warc.py): documents serialized into a real
    WARC/1.0 archive driver-side (build_warc_record — the fixture
    generator mirror of the parser), re-read distributed via binaryFile
    + mapInPandas record fan-out; the oracle recomputes every record's
    header fields and payload digest from the source table."""
    import os

    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.sources.warc import (
        build_warc_record,
        read_warc,
    )

    register_views(spark, sf_dir)
    docs = (
        spark.table("documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )
    d = _scratch_dir("warc_q")
    buf = b"".join(
        build_warc_record(
            r["text"].encode("utf-8"),
            record_id=f"<urn:doc:{r['doc_id']}>",
            target_uri=f"http://corpus.test/{r['doc_id']}",
        )
        for r in docs
    )
    with open(os.path.join(d, "q.warc"), "wb") as f:
        f.write(buf)
    out = read_warc(spark, os.path.join(d, "q.warc"))
    return out.select(
        "record_idx",
        "record_id",
        "target_uri",
        "content_length",
        F.md5("payload").alias("payload_md5"),
        "n_parse_errors",
    ).orderBy("record_idx")


_q(
    "s_warc_ingest",
    Query(
        _warc_ingest_spark,
        """
        SELECT ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS record_idx,
               '<urn:doc:' || doc_id || '>' AS record_id,
               'http://corpus.test/' || doc_id AS target_uri,
               CAST(octet_length(text::BLOB) AS BIGINT) AS content_length,
               md5(text) AS payload_md5,
               CAST(0 AS BIGINT) AS n_parse_errors
        FROM documents WHERE doc_id < 100
        ORDER BY record_idx
        """,
        "S+,X-curation",
        "WARC (Common Crawl format) record ingest: archive built from the "
        "source table, parsed back distributed (binaryFile + Arrow record "
        "fan-out); oracle recomputes headers + payload digests",
    ),
)


def _jsonl_roundtrip_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL sink → source round-trip (sinks/jsonl.py, sources/jsonl.py):
    documents written as 4 JSONL shards and re-read with the explicit
    schema; per-language accounting must match the original table."""

    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.sinks.jsonl import write_jsonl
    from mission_data_pipeline_spark.sources.jsonl import read_jsonl

    register_views(spark, sf_dir)
    d = _scratch_dir("jsonl_q")
    write_jsonl(spark.table("documents"), d, n_shards=4)
    back = read_jsonl(spark, d)
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.count_distinct(F.md5("text")).alias("n_unique_texts"),
        )
        .orderBy("lang")
    )


_q(
    "l_jsonl_roundtrip",
    Query(
        _jsonl_roundtrip_spark,
        """
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts
        FROM documents GROUP BY lang ORDER BY lang
        """,
        "L+,X-curation",
        "JSONL shard export + schema-enforced re-read round-trip (the LLM "
        "corpus interchange format); per-language counts, byte totals and "
        "distinct content digests must survive the trip",
    ),
)


def _parquet_roundtrip_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1 parquet per-parameter sink → partitioned scan round-trip:
    events projected to the tidy params shape, written Hive-partitioned
    by name (sinks/parquet.py), re-read and aggregated; the oracle
    computes the same accounting from the original table."""

    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.sinks.parquet import (
        write_parquet_per_parameter,
    )

    register_views(spark, sf_dir)
    params = spark.sql(
        "SELECT event_type AS name, CAST(user_id AS INT) AS apid, "
        "       ts_ns DIV 1000 AS ts_us, value AS eng_value "
        "FROM events"
    )
    d = _scratch_dir("pq_q")
    write_parquet_per_parameter(params, d)
    back = spark.read.parquet(d)
    return (
        back.groupBy("name")
        .agg(
            F.count("*").alias("n"),
            F.min("ts_us").cast("long").alias("ts_min"),
            F.max("ts_us").cast("long").alias("ts_max"),
            F.round(
                F.sum(F.round("eng_value", 6).cast("decimal(20,6)")).cast(
                    "double"
                ),
                6,
            ).alias("sum_value"),
        )
        .orderBy("name")
    )


_q(
    "l_parquet_roundtrip",
    Query(
        _parquet_roundtrip_spark,
        _EV_DUCK
        + """
        SELECT event_type AS name, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(ts_us) AS BIGINT) AS ts_min,
               CAST(MAX(ts_us) AS BIGINT) AS ts_max,
               ROUND(CAST(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(20,6))) AS STRING) AS DOUBLE), 6) AS sum_value
        FROM ev GROUP BY event_type ORDER BY name
        """,
        "L1,L3",
        "parquet per-parameter sink round-trip: tidy samples written "
        "Hive-partitioned by name, re-read through the partitioned scan; "
        "per-name accounting must match the source table exactly",
    ),
)


def _orc_roundtrip_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink round-trip: documents written lang-partitioned through
    Spark's built-in ORC source (second columnar format beside parquet
    — same predicate-pushdown/column-pruning surface), re-read and
    aggregated; the oracle computes the same accounting from the
    original table. Hive partitioning drops the physical lang column
    into the directory key exactly as the parquet sinks do."""

    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    d = _scratch_dir("orc_q")
    spark.table("documents").write.mode("overwrite").partitionBy(
        "lang"
    ).orc(d)
    back = spark.read.orc(d)
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("lang")
    )


_q(
    "l_orc_roundtrip",
    Query(
        _orc_roundtrip_spark,
        """
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
        FROM documents GROUP BY lang ORDER BY lang
        """,
        "L+",
        "ORC columnar sink round-trip (lang-partitioned write, "
        "partitioned re-read): per-lang accounting must match the "
        "source table exactly",
    ),
)


def _merge_upsert_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO round-trip (sinks/merge.py merge_upsert): a base of
    docs 0-99 (version 1) receives an update batch — docs 50-149 at
    version 2 with edited text, plus a STALE version-0 re-delivery of
    doc 10 that must lose. The final on-disk state is re-read and
    digested; the oracle computes the expected post-merge state
    directly from the source table. The stale row losing is what
    separates last-wins MERGE from blind append/overwrite."""

    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.sinks.merge import merge_upsert

    register_views(spark, sf_dir)
    docs = spark.table("documents")
    base = docs.filter(F.col("doc_id") < 100).select(
        "doc_id", F.lit(1).alias("version"), "text"
    )
    d = _scratch_dir("merge_q") + "/ds"
    merge_upsert(spark, d, base, key_cols=["doc_id"], version_col="version")
    updates = (
        docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 150))
        .select(
            "doc_id",
            F.lit(2).alias("version"),
            F.concat(F.col("text"), F.lit(" v2")).alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") == 10).select(
                "doc_id",
                F.lit(0).alias("version"),
                F.lit("stale delivery").alias("text"),
            )
        )
    )
    merge_upsert(spark, d, updates, key_cols=["doc_id"], version_col="version")
    return (
        spark.read.parquet(d)
        .select("doc_id", "version", F.md5("text").alias("text_digest"))
        .orderBy("doc_id")
    )


_q(
    "l_merge_upsert_roundtrip",
    Query(
        _merge_upsert_spark,
        """
        SELECT doc_id,
               CASE WHEN doc_id >= 50 THEN 2 ELSE 1 END AS version,
               CASE WHEN doc_id >= 50 THEN md5(text || ' v2')
                    ELSE md5(text) END AS text_digest
        FROM documents WHERE doc_id < 150
        ORDER BY doc_id
        """,
        "L+",
        "lakehouse-style MERGE INTO over plain parquet (last-wins by "
        "version, staged rewrite + atomic rename): update/insert/"
        "stale-re-delivery batch applied; final state must equal the "
        "oracle's directly-computed expectation, proving idempotent "
        "at-least-once ingestion semantics",
    ),
)


def _csv_roundtrip_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 CSV per-parameter sink round-trip: doubles are text-formatted
    %.9f on write, so the re-read parses them as DECIMAL(20,9) and sums
    exactly; the oracle applies the same 9-digit rounding to the source."""

    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.sinks.csv import write_csv_per_parameter

    register_views(spark, sf_dir)
    params = spark.sql(
        "SELECT event_type AS name, CAST(ts_ns DIV 1000 AS LONG) AS ts_us, "
        "       value AS eng_value "
        "FROM events"
    )
    d = _scratch_dir("csv_q")
    write_csv_per_parameter(params, d)
    back = spark.read.schema(
        "ts_us long, eng_value decimal(20,9), name string"
    ).option("header", True).csv(d)
    return (
        back.groupBy("name")
        .agg(
            F.count("*").alias("n"),
            F.min("ts_us").cast("long").alias("ts_min"),
            F.round(F.sum("eng_value").cast("double"), 6).alias("sum_value"),
        )
        .orderBy("name")
    )


_q(
    "l_csv_roundtrip",
    Query(
        _csv_roundtrip_spark,
        _EV_DUCK
        + """
        SELECT event_type AS name, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(ts_us) AS BIGINT) AS ts_min,
               ROUND(CAST(CAST(SUM(CAST(ROUND(value, 9) AS DECIMAL(20,9))) AS STRING) AS DOUBLE), 6) AS sum_value
        FROM ev GROUP BY event_type ORDER BY name
        """,
        "L6",
        "CSV per-parameter sink round-trip: %.9f text formatting on "
        "write, exact DECIMAL re-parse on read; per-name accounting must "
        "match the source with 9-digit rounding applied",
    ),
)


def _bmp_gif_pixel_stats_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BMP + GIF pixel decode (functions/gif_bmp.py): even items
    are 24-bit BMPs (bottom-up BGR rows, 4-byte padding), odd items are
    GIFs with a REAL LZW-compressed index stream over a 16-color
    palette (every fourth interlaced — the 4-pass order must invert
    exactly); every ninth payload is garbage (null sentinel). Both
    formats are lossless, so the oracle recomputes the exact pixel
    statistics from the generator formulas — the row layout, LZW bit
    stream, palette lookup, and de-interlace all cross-check."""
    import numpy as np

    from mission_data_pipeline_spark.functions.gif_bmp import (
        encode_bmp,
        encode_gif,
    )
    from mission_data_pipeline_spark.functions.multimodal import (
        image_pixel_stats,
    )

    rows = []
    for k in range(36):
        if k % 9 == 8:
            rows.append((k, bytearray(b"not an image")))
            continue
        if k % 2 == 0:
            h, w = k % 9 + 4, k % 7 + 5
            x = np.arange(w)[None, :, None]
            y = np.arange(h)[:, None, None]
            c = np.arange(3)[None, None, :]
            px = ((k * 11 + x * 5 + y * 3 + c * 7) % 256).astype(np.uint8)
            rows.append((k, bytearray(encode_bmp(px))))
        else:
            h, w = k % 6 + 3, k % 8 + 4
            pal = np.array(
                [
                    [(k * 13 + ci * 17 + ch * 29) % 256 for ch in range(3)]
                    for ci in range(16)
                ],
                dtype=np.uint8,
            )
            x = np.arange(w)[None, :]
            y = np.arange(h)[:, None]
            idx = ((k + x * 3 + y * 5) % 16).astype(np.uint8)
            rows.append(
                (k, bytearray(encode_gif(idx, pal, interlace=(k % 4 == 3))))
            )
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    return image_pixel_stats(media).orderBy("item_id")


_q(
    "x5_bmp_gif_pixel_stats",
    Query(
        _bmp_gif_pixel_stats_spark,
        """
        WITH items AS (SELECT k AS item_id FROM range(0, 36) t(k)),
        bmp_px AS (
          SELECT item_id, (item_id*11 + xx.x*5 + yy.y*3 + cc.c*7) % 256 AS v
          FROM items, range(0, 12) xx(x), range(0, 13) yy(y),
               range(0, 3) cc(c)
          WHERE item_id % 2 = 0 AND item_id % 9 != 8
            AND xx.x < item_id % 7 + 5 AND yy.y < item_id % 9 + 4
        ),
        gif_px AS (
          SELECT item_id,
                 (item_id*13 + ((item_id + xx.x*3 + yy.y*5) % 16)*17
                  + cc.c*29) % 256 AS v
          FROM items, range(0, 12) xx(x), range(0, 9) yy(y),
               range(0, 3) cc(c)
          WHERE item_id % 2 = 1 AND item_id % 9 != 8
            AND xx.x < item_id % 8 + 4 AND yy.y < item_id % 6 + 3
        ),
        px AS (SELECT * FROM bmp_px UNION ALL SELECT * FROM gif_px),
        stats AS (
          SELECT item_id, CAST(SUM(v) AS BIGINT) AS px_sum,
                 CAST(MIN(v) AS INT) AS px_min,
                 CAST(MAX(v) AS INT) AS px_max,
                 COUNT(*) AS n
          FROM px GROUP BY item_id
        )
        SELECT i.item_id,
               CASE WHEN s.item_id IS NULL THEN NULL
                    WHEN i.item_id % 2 = 0 THEN CAST(i.item_id % 7 + 5 AS INT)
                    ELSE CAST(i.item_id % 8 + 4 AS INT) END AS width,
               CASE WHEN s.item_id IS NULL THEN NULL
                    WHEN i.item_id % 2 = 0 THEN CAST(i.item_id % 9 + 4 AS INT)
                    ELSE CAST(i.item_id % 6 + 3 AS INT) END AS height,
               CASE WHEN s.item_id IS NULL THEN NULL
                    ELSE CAST(3 AS INT) END AS channels,
               s.px_sum, s.px_min, s.px_max,
               CASE WHEN s.item_id IS NULL THEN NULL
                    ELSE ROUND(CAST(s.px_sum AS DOUBLE) / s.n, 6)
                    END AS px_mean
        FROM items i LEFT JOIN stats s USING (item_id)
        ORDER BY i.item_id
        """,
        "X5",
        "REAL BMP (bottom-up padded BGR rows) and GIF (LZW bit stream, "
        "palette, interlace inversion) pixel decode — lossless, so the "
        "oracle recomputes exact pixel statistics from the generator "
        "formulas; garbage payloads yield null sentinels",
    ),
)


def _rs_frame_correction_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Reed-Solomon frame FEC (functions/reed_solomon.py +
    operators/frames.py correct_rs_frames): 40 formula-data blocks
    (full RS(255,223) plus two shortened lengths) are encoded, k % 18
    symbol errors injected at formula positions/magnitudes (0..17 —
    crossing the 16-error correction radius), and decoded through the
    full syndome/Berlekamp-Massey/Chien/Forney chain on executors.
    Blocks with <= 16 errors must come back BYTE-EXACT (the oracle
    recomputes length/sum/first/last from the data formula); 17-error
    blocks must be flagged uncorrectable, never silently wrong."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.functions.reed_solomon import rs_encode
    from mission_data_pipeline_spark.operators.frames import (
        correct_rs_frames,
    )

    rows = []
    for k in range(40):
        dlen = (223, 100, 40)[k % 3]
        data = bytes((k * 37 + j * 91) % 256 for j in range(dlen))
        cw = bytearray(rs_encode(data))
        m = dlen + 32
        for j in range(k % 18):
            cw[(k + j * 13) % m] ^= (k * 5 + j * 29) % 255 + 1
        rows.append((k, bytearray(cw)))
    df = spark.createDataFrame(rows, "frame_id long, codeword binary")
    out = correct_rs_frames(df)
    # stage hex(data) as its own projection: a hex() captured inside the
    # HOF lambda would re-evaluate per element (the gram-operator trap)
    staged = out.withColumn("__hx", F.hex("data"))
    byte_at = lambda pos: F.expr(  # noqa: E731 - 1-based byte index
        f"CAST(conv(substring(__hx, 2*({pos})-1, 2), 16, 10) AS INT)"
    )
    byte_sum = F.expr(
        "aggregate(transform(sequence(1, length(data)), "
        "i -> CAST(conv(substring(__hx, 2*i-1, 2), 16, 10) AS BIGINT)), "
        "0L, (a, x) -> a + x)"
    )
    return staged.select(
        "frame_id",
        "ok",
        "n_corrected",
        F.length("data").cast("int").alias("data_len"),
        byte_sum.alias("data_sum"),
        byte_at("1").alias("data_first"),
        byte_at("length(data)").alias("data_last"),
    ).orderBy("frame_id")


_q(
    "s_rs_frame_correction",
    Query(
        _rs_frame_correction_spark,
        """
        WITH blocks AS (
          SELECT k AS frame_id,
                 CASE k % 3 WHEN 0 THEN 223 WHEN 1 THEN 100 ELSE 40 END
                   AS dlen,
                 k % 18 AS n_err
          FROM range(0, 40) t(k)
        ),
        bytes AS (
          SELECT frame_id, dlen, n_err, j.j,
                 (frame_id * 37 + j.j * 91) % 256 AS b
          FROM blocks, range(0, 223) j(j)
          WHERE j.j < dlen
        ),
        agg AS (
          SELECT frame_id, dlen, n_err,
                 CAST(SUM(b) AS BIGINT) AS s,
                 CAST(MIN(CASE WHEN j = 0 THEN b END) AS INT) AS fb,
                 CAST(MIN(CASE WHEN j = dlen - 1 THEN b END) AS INT) AS lb
          FROM bytes GROUP BY frame_id, dlen, n_err
        )
        SELECT frame_id, n_err <= 16 AS ok,
               CAST(CASE WHEN n_err <= 16 THEN n_err ELSE 0 END AS INT)
                 AS n_corrected,
               CASE WHEN n_err <= 16 THEN CAST(dlen AS INT) END AS data_len,
               CASE WHEN n_err <= 16 THEN s END AS data_sum,
               CASE WHEN n_err <= 16 THEN fb END AS data_first,
               CASE WHEN n_err <= 16 THEN lb END AS data_last
        FROM agg ORDER BY frame_id
        """,
        "S+,X5",
        "REAL Reed-Solomon (255,223) forward error correction: up to 16 "
        "injected symbol errors per codeword corrected byte-exactly "
        "through syndromes/Berlekamp-Massey/Chien/Forney; 17-error "
        "blocks flagged uncorrectable — the oracle recomputes every "
        "recovered block's accounting from the data formula",
    ),
)


def _zorder_roundtrip_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER sink round-trip (sinks/parquet.py
    write_zordered): events rewritten as 12 files Morton-clustered on
    (user_id, t_us), re-read, per-type accounting must equal the source
    (the layout is semantically transparent — that is the oracle). The
    LAYOUT property is asserted in-query with loud failure: per-file
    min/max spans must stay below 0.75 of the domain in BOTH z
    dimensions (a linear sort leaves the second dimension's spans at
    ~1.0 — zero data skipping), so a regression that quietly degrades
    multi-dimension clustering fails the driver check, not just a
    pytest."""
    import glob as _glob

    import pyarrow.parquet as _pq
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.sinks.parquet import write_zordered

    register_views(spark, sf_dir)
    ev = spark.sql(
        "SELECT user_id, ts_ns DIV 1000 AS t_us, event_id, event_type, "
        "value FROM events"
    )
    d = _scratch_dir("zorder_q")
    write_zordered(ev, d, zorder_cols=["user_id", "t_us"], n_files=12)

    def coverage(col: str) -> float:
        spans = []
        for f in _glob.glob(d + "/part-*.parquet"):
            md = _pq.read_metadata(f)
            ci = md.schema.names.index(col)
            st = [md.row_group(i).column(ci).statistics
                  for i in range(md.num_row_groups)]
            if st:
                spans.append((min(s.min for s in st), max(s.max for s in st)))
        lo = min(s[0] for s in spans)
        hi = max(s[1] for s in spans)
        return sum((b - a) / ((hi - lo) or 1) for a, b in spans) / len(spans)

    cov_u, cov_t = coverage("user_id"), coverage("t_us")
    if cov_u > 0.75 or cov_t > 0.75:
        raise RuntimeError(
            f"z-order clustering lost: per-file span coverage user_id="
            f"{cov_u:.2f} t_us={cov_t:.2f} (both must be < 0.75; a "
            "linear sort reads ~1.0 on its non-leading dimension)"
        )
    back = spark.read.parquet(d)
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("t_us").cast("long").alias("ts_min"),
            F.sum(F.round("value", 9).cast("decimal(20,9)"))
            .cast("double")
            .alias("sum_value"),
        )
        .withColumn("sum_value", F.round("sum_value", 6))
        .orderBy("event_type")
    )


_q(
    "l_zorder_roundtrip",
    Query(
        _zorder_roundtrip_spark,
        _EV_DUCK
        + """
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(ts_us) AS BIGINT) AS ts_min,
               ROUND(CAST(CAST(SUM(CAST(ROUND(value, 9) AS DECIMAL(20,9))) AS STRING) AS DOUBLE), 6) AS sum_value
        FROM ev GROUP BY event_type ORDER BY event_type
        """,
        "L+,co-location",
        "OPTIMIZE ZORDER sink: Morton-interleaved multi-dimension file "
        "clustering (JVM bit expressions, range-partitioned by z-value) "
        "— per-file zone-map spans asserted < 0.75 of the domain in "
        "BOTH dimensions with loud failure; content transparency "
        "oracle-checked",
    ),
)


def _hdf5_roundtrip_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 HDF5 sink round-trip, driver-checked: the events slice exports
    through write_hdf5 pinned to the PURE-PYTHON spec-subset writer
    (sinks/hdf5_pure.py — v0 superblock, symbol-table groups, gzip
    chunks), the file is re-read by the matching spec reader, and
    per-parameter accounting plus the unit attrs must match the source.
    f8 datasets store the doubles exactly, so the DECIMAL-sum comparison
    is exact. This is the sink-family oracle query the other loaders
    (parquet/CSV/JSONL/ORC) already have; it makes the HDF5 byte format
    itself driver-verified every round."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.sinks import hdf5_pure, write_hdf5

    register_views(spark, sf_dir)
    params = spark.sql(
        "SELECT event_type AS name, CONCAT('u_', event_type) AS unit, "
        "       CAST(ts_ns DIV 1000 AS DOUBLE) AS time_tai, "
        "       CAST(user_id AS INT) AS apid, "
        "       CAST(event_id % 16384 AS INT) AS seq_count, "
        "       TRUE AS validity, value AS eng_value "
        "FROM events WHERE user_id < 100"
    )
    d = _scratch_dir("hdf5_q")
    path = os.path.join(d, "t.h5")
    write_hdf5(params, path, mode="w", _h5=hdf5_pure)
    root = hdf5_pure.read_h5(path)
    tele = root.groups["telemetry"]
    rows = []
    for name in sorted(tele.groups):
        g = tele.groups[name]
        t = g.datasets["time_tai"].data
        v = g.datasets["eng_value"].data
        sq = g.datasets["seq_count"].data
        vd = g.datasets["validity"].data
        rows.append(
            (
                name,
                g.attrs.get("unit"),
                len(t),
                int(t.min()),
                [float(x) for x in v],
                int(sq.max()),
                int(vd.sum()),
            )
        )
    back = spark.createDataFrame(
        rows,
        "name string, unit string, n long, ts_min long, "
        "vals array<double>, seq_max int, n_valid long",
    )
    return back.select(
        "name",
        "unit",
        "n",
        "ts_min",
        "seq_max",
        "n_valid",
        F.round(
            F.aggregate(
                F.transform(
                    "vals",
                    lambda x: F.round(x, 9).cast("decimal(20,9)"),
                ),
                F.lit(0).cast("decimal(28,9)"),
                lambda acc, x: (acc + x).cast("decimal(28,9)"),
            ).cast("double"),
            6,
        ).alias("sum_value"),
    ).orderBy("name")


_q(
    "l_hdf5_roundtrip",
    Query(
        _hdf5_roundtrip_spark,
        _EV_DUCK
        + """
        SELECT event_type AS name, 'u_' || event_type AS unit,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(ts_us) AS BIGINT) AS ts_min,
               CAST(MAX(event_id % 16384) AS INT) AS seq_max,
               CAST(COUNT(*) AS BIGINT) AS n_valid,
               ROUND(CAST(CAST(SUM(CAST(ROUND(value, 9) AS DECIMAL(20,9))) AS STRING) AS DOUBLE), 6) AS sum_value
        FROM ev WHERE user_id < 100
        GROUP BY event_type ORDER BY name
        """,
        "L5",
        "HDF5 sink round-trip through the pure-Python spec-subset "
        "writer/reader: /telemetry/<param> layout, gzip-chunked f8/i4/i1 "
        "datasets, unit attrs — per-parameter accounting must match the "
        "source exactly (f8 storage is lossless)",
    ),
)


# ---------------------------------------------------------------------------
# Graph analytics beyond PageRank: co-occurrence edges, triangle
# counting, label-propagation communities (operators/graph.py).
# ---------------------------------------------------------------------------


_COOC_EDGES_DUCK = """
        pairs AS (
          SELECT DISTINCT user_id AS gu,
                 epoch_us(ts) // 86400000000 AS gd,
                 CAST(FLOOR(value) AS BIGINT) AS i
          FROM events WHERE value IS NOT NULL
        ),
        edges AS (
          SELECT a.i AS u, b.i AS v
          FROM pairs a JOIN pairs b ON a.gu = b.gu AND a.gd = b.gd
          WHERE a.i < b.i
          GROUP BY a.i, b.i
        )"""


def _triangle_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting (operators/graph.py triangle_count) over the
    item co-occurrence graph of events — items (integer value floor)
    are connected when one user touches both on the same day
    (cooccurrence_edges, the market-basket graph with the
    max-items-per-group quadratic-blowup cap). Degree-ordered
    orientation bounds the wedge join; each triangle enumerates once.
    Output: top-10 nodes by triangle participation plus a node=-1 total
    row. The oracle replays the same canonicalize/orient/wedge/close
    pipeline in SQL — pure integer plumbing, so exact."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.graph import (
        cooccurrence_edges,
        triangle_count,
    )

    register_views(spark, sf_dir)
    ev = spark.sql(
        "SELECT user_id, ts_ns DIV 1000 DIV 86400000000 AS day, "
        "       CAST(FLOOR(value) AS BIGINT) AS item "
        "FROM events WHERE value IS NOT NULL"
    )
    edges = cooccurrence_edges(
        ev,
        group_cols=["user_id", "day"],
        item_col="item",
        max_items_per_group=500,
    )
    tri = triangle_count(edges, src_col="u", dst_col="v")
    pernode = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
        .orderBy(F.desc("n_tri"), "node")
        .limit(10)
    )
    total = tri.agg(
        F.lit(-1).cast("long").alias("node"), F.count("*").alias("n_tri")
    )
    return pernode.unionByName(total).orderBy(F.desc("n_tri"), "node")


_q(
    "g_triangle_count",
    Query(
        _triangle_spark,
        f"""
        WITH {_COOC_EDGES_DUCK},
        deg AS (
          SELECT node, COUNT(*) AS deg FROM (
            SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
          ) x GROUP BY node
        ),
        wd AS (
          SELECT e.u, e.v, du.deg AS du, dv.deg AS dv
          FROM edges e JOIN deg du ON e.u = du.node
                       JOIN deg dv ON e.v = dv.node
        ),
        oriented AS (
          SELECT CASE WHEN (du < dv) OR (du = dv AND u < v)
                      THEN u ELSE v END AS lo,
                 CASE WHEN (du < dv) OR (du = dv AND u < v)
                      THEN v ELSE u END AS hi,
                 CASE WHEN (du < dv) OR (du = dv AND u < v)
                      THEN dv ELSE du END AS dhi
          FROM wd
        ),
        wedges AS (
          SELECT o1.lo AS a, o1.hi AS b, o2.hi AS c
          FROM oriented o1 JOIN oriented o2 ON o1.lo = o2.lo
          WHERE (o1.dhi < o2.dhi) OR (o1.dhi = o2.dhi AND o1.hi < o2.hi)
        ),
        tri AS (
          SELECT a, wedges.b, wedges.c
          FROM wedges JOIN oriented
            ON wedges.b = oriented.lo AND wedges.c = oriented.hi
        ),
        pernode AS (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
          ) x GROUP BY node ORDER BY n_tri DESC, node LIMIT 10
        )
        SELECT node, n_tri FROM (
          SELECT node, n_tri FROM pernode
          UNION ALL
          SELECT CAST(-1 AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM tri
        ) ORDER BY n_tri DESC, node
        """,
        "X2+,§graph",
        "exact triangle enumeration with degree-ordered orientation "
        "(out-degree bounded by O(sqrt(edges)), each triangle once) over "
        "a market-basket co-occurrence graph; two hash-shuffle joins, "
        "no node ever sees its full neighborhood squared",
    ),
)


def _lpa_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (operators/graph.py
    label_propagation): deterministic mode-of-neighbors with
    smallest-label ties, 4 rounds, over a 12-clique ring (8 nodes per
    clique, one bridge edge to the next clique) — the canonical
    community-structure fixture, so the expected output is 12
    communities anchored at each clique's minimum node. The oracle
    unrolls the same 4 synchronous rounds as chained CTEs (pure integer
    counts — exact)."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.graph import label_propagation

    base = spark.range(96).select(F.col("id").alias("u"))
    within = base.filter(F.col("u") % 8 != 7).select(
        "u",
        F.explode(
            F.sequence(F.col("u") + 1, (F.col("u") - F.col("u") % 8) + 7)
        ).alias("v"),
    )
    bridges = spark.range(12).select(
        (F.col("id") * 8).alias("u"), (((F.col("id") + 1) % 12) * 8).alias("v")
    )
    labels = label_propagation(
        within.unionByName(bridges), n_iter=4, src_col="u", dst_col="v"
    )
    return (
        labels.groupBy("label")
        .agg(
            F.count("*").alias("size"),
            F.min("node").alias("node_min"),
            F.max("node").alias("node_max"),
        )
        .orderBy("label")
    )


def _lpa_oracle(n_iter: int = 4) -> str:
    head = """
        WITH nodes AS (SELECT i AS u FROM range(0, 96) t(i)),
        within AS (
          SELECT u, v FROM nodes, UNNEST(range(u + 1, (u - u % 8) + 8)) AS t(v)
          WHERE u % 8 != 7
        ),
        bridges AS (
          SELECT i * 8 AS u, ((i + 1) % 12) * 8 AS v FROM range(0, 12) t(i)
        ),
        edges AS (
          SELECT u, v FROM within UNION ALL SELECT u, v FROM bridges
        ),
        und AS (
          SELECT u, v FROM edges WHERE u != v
          UNION
          SELECT v, u FROM edges WHERE u != v
        ),
        l0 AS (SELECT DISTINCT u AS node, u AS label FROM und)"""
    its = []
    for k in range(1, n_iter + 1):
        p = k - 1
        its.append(f"""
        , cnt{k} AS (
          SELECT und.u AS node, l{p}.label, COUNT(*) AS cnt
          FROM und JOIN l{p} ON und.v = l{p}.node
          GROUP BY und.u, l{p}.label
        ),
        l{k} AS (
          SELECT node, label FROM (
            SELECT node, label,
                   ROW_NUMBER() OVER (
                     PARTITION BY node ORDER BY cnt DESC, label
                   ) AS rn
            FROM cnt{k}
          ) WHERE rn = 1
        )""")
    return (
        head
        + "".join(its)
        + f"""
        SELECT label, CAST(COUNT(*) AS BIGINT) AS size,
               MIN(node) AS node_min, MAX(node) AS node_max
        FROM l{n_iter} GROUP BY label ORDER BY label
        """
    )


_q(
    "g_label_propagation",
    Query(
        _lpa_spark,
        _lpa_oracle(4),
        "X2+,§graph",
        "synchronous label-propagation community detection "
        "(deterministic smallest-label ties): labels join edges on the "
        "neighbor key then two partial-agg reductions per round — the "
        "per-node argmax is max(struct(count, -label)), map-reduce "
        "shaped, never a per-node window sort; O(edges) shuffle/round",
    ),
)


# ---------------------------------------------------------------------------
# Holt linear-trend smoothing (operators/timeseries.py holt_linear).
# ---------------------------------------------------------------------------


def _holt_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level + trend), alpha=0.25 /
    beta=0.5, per probe user. Same bit-exact contract as
    w_ewma_smoothing: both engines evaluate the literal IEEE-754
    two-equation recurrence one step per row in (t, event_id) order;
    nulls are skipped (NULL out, state carries)."""
    from mission_data_pipeline_spark.operators.timeseries import holt_linear

    register_views(spark, sf_dir)
    ev = spark.sql(
        "SELECT user_id, event_id, ts_ns DIV 1000 AS t_us, value "
        "FROM events WHERE user_id < 20"
    )
    out = holt_linear(
        ev,
        alpha=0.25,
        beta=0.5,
        time_col="t_us",
        value_col="value",
        series_cols=["user_id"],
        order_cols=["event_id"],
    )
    return out.select(
        "user_id", "event_id", "t_us", "value", "level", "trend"
    ).orderBy("user_id", "t_us", "event_id")


_q(
    "w_holt_trend",
    Query(
        _holt_spark,
        """
        WITH RECURSIVE s AS (
          SELECT user_id, event_id, epoch_us(ts) AS t, value,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ) AS n
          FROM events WHERE user_id < 20
        ),
        -- lst/bst carry the last non-null (level, trend) state so NULL
        -- inputs are SKIPPED exactly like the operator; the new level
        -- expression is repeated inside the trend equation (same IEEE
        -- ops -> same double, in both engines)
        rec AS (
          SELECT user_id, event_id, t, value, n,
                 value AS lst,
                 CASE WHEN value IS NULL THEN NULL
                      ELSE CAST(0.0 AS DOUBLE) END AS bst,
                 value AS level,
                 CASE WHEN value IS NULL THEN NULL
                      ELSE CAST(0.0 AS DOUBLE) END AS trend
          FROM s WHERE n = 1
          UNION ALL
          SELECT s.user_id, s.event_id, s.t, s.value, s.n,
                 CASE WHEN s.value IS NULL THEN rec.lst
                      WHEN rec.lst IS NULL THEN s.value
                      ELSE CAST(0.25 AS DOUBLE) * s.value
                           + CAST(0.75 AS DOUBLE) * (rec.lst + rec.bst)
                 END,
                 CASE WHEN s.value IS NULL THEN rec.bst
                      WHEN rec.lst IS NULL THEN CAST(0.0 AS DOUBLE)
                      ELSE CAST(0.5 AS DOUBLE)
                           * ((CAST(0.25 AS DOUBLE) * s.value
                               + CAST(0.75 AS DOUBLE) * (rec.lst + rec.bst))
                              - rec.lst)
                           + CAST(0.5 AS DOUBLE) * rec.bst
                 END,
                 CASE WHEN s.value IS NULL THEN NULL
                      WHEN rec.lst IS NULL THEN s.value
                      ELSE CAST(0.25 AS DOUBLE) * s.value
                           + CAST(0.75 AS DOUBLE) * (rec.lst + rec.bst)
                 END,
                 CASE WHEN s.value IS NULL THEN NULL
                      WHEN rec.lst IS NULL THEN CAST(0.0 AS DOUBLE)
                      ELSE CAST(0.5 AS DOUBLE)
                           * ((CAST(0.25 AS DOUBLE) * s.value
                               + CAST(0.75 AS DOUBLE) * (rec.lst + rec.bst))
                              - rec.lst)
                           + CAST(0.5 AS DOUBLE) * rec.bst
                 END
          FROM rec JOIN s
            ON s.user_id = rec.user_id AND s.n = rec.n + 1
        )
        SELECT user_id, event_id, t AS t_us, value, level, trend
        FROM rec
        ORDER BY user_id, t_us, event_id
        """,
        "W+",
        "Holt linear-trend double exponential smoothing per series "
        "(level + trend recurrence, the drift-aware telemetry smoother): "
        "parallel across series via applyInPandas, bit-exact "
        "recursive-CTE oracle replaying the same IEEE op sequence",
    ),
)


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters (A+ sketch family).
# ---------------------------------------------------------------------------


_q(
    "agg_cms_heavy_hitters",
    _dialect(
        r"""
        WITH toks AS (
          SELECT term FROM (
            SELECT explode(split(lower(text), '\\s+')) AS term
            FROM documents
          ) WHERE length(term) > 0
        ),
        total AS (SELECT COUNT(*) AS n FROM toks),
        exact AS (SELECT term, COUNT(*) AS exact_cnt FROM toks GROUP BY term),
        rows_ AS (
          SELECT i,
                 CAST(conv(substring(md5(concat(term, '#',
                       CAST(i AS STRING))), 1, 12), 16, 10) AS BIGINT)
                   % 512 AS b
          FROM toks LATERAL VIEW explode(array(0, 1, 2, 3)) t AS i
        ),
        buckets AS (SELECT i, b, COUNT(*) AS cnt FROM rows_ GROUP BY i, b),
        cand AS (
          SELECT term, exact_cnt, i,
                 CAST(conv(substring(md5(concat(term, '#',
                       CAST(i AS STRING))), 1, 12), 16, 10) AS BIGINT)
                   % 512 AS b
          FROM exact LATERAL VIEW explode(array(0, 1, 2, 3)) t AS i
        ),
        est AS (
          SELECT cand.term, MIN(cand.exact_cnt) AS exact_cnt,
                 MIN(buckets.cnt) AS est_cnt
          FROM cand JOIN buckets
            ON cand.i = buckets.i AND cand.b = buckets.b
          GROUP BY cand.term
        )
        SELECT term, exact_cnt, est_cnt,
               est_cnt >= exact_cnt
               AND est_cnt <= exact_cnt
                   + CAST(CEIL(2.0 * n / 512) AS BIGINT) AS within_bound
        FROM est CROSS JOIN total
        ORDER BY exact_cnt DESC, term LIMIT 15
        """,
        r"""
        WITH toks AS (
          SELECT t AS term
          FROM (SELECT string_split_regex(trim(lower(text)), '\s+') AS ts
                FROM documents),
               UNNEST(ts) AS u(t)
          WHERE length(t) > 0
        ),
        total AS (SELECT COUNT(*) AS n FROM toks),
        exact AS (SELECT term, COUNT(*) AS exact_cnt FROM toks GROUP BY term),
        rows_ AS (
          SELECT i,
                 CAST(('0x' || substr(md5(term || '#' || i), 1, 12))
                      AS BIGINT) % 512 AS b
          FROM toks, UNNEST([0, 1, 2, 3]) AS t(i)
        ),
        buckets AS (SELECT i, b, COUNT(*) AS cnt FROM rows_ GROUP BY i, b),
        cand AS (
          SELECT term, exact_cnt, i,
                 CAST(('0x' || substr(md5(term || '#' || i), 1, 12))
                      AS BIGINT) % 512 AS b
          FROM exact, UNNEST([0, 1, 2, 3]) AS t(i)
        ),
        est AS (
          SELECT cand.term, MIN(cand.exact_cnt) AS exact_cnt,
                 CAST(MIN(buckets.cnt) AS BIGINT) AS est_cnt
          FROM cand JOIN buckets
            ON cand.i = buckets.i AND cand.b = buckets.b
          GROUP BY cand.term
        )
        SELECT term, CAST(exact_cnt AS BIGINT) AS exact_cnt, est_cnt,
               est_cnt >= exact_cnt
               AND est_cnt <= exact_cnt
                   + CAST(CEIL(2.0 * n / 512) AS BIGINT) AS within_bound
        FROM est CROSS JOIN total
        ORDER BY exact_cnt DESC, term LIMIT 15
        """,
        "A+",
        "count-min sketch (d=4 x w=512, portable md5-derived row hashes) "
        "with the EMBEDDED exact-count verification the other sketch "
        "queries carry: per-token estimate = min over rows, asserted "
        ">= exact and within the 2N/w additive bound; sketch build is "
        "one map-side partial agg over (row, bucket)",
    ),
)


# ---------------------------------------------------------------------------
# Distributed Lloyd k-means (operators/clustering.py) — the full-corpus
# centroid training step behind IVF / SemDeDup / PQ.
# ---------------------------------------------------------------------------


def _kmeans_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus Lloyd k-means, k=8, 3 update rounds, over the
    embeddings table. Assignment is map-side (centroids broadcast as
    literal arrays; sequential-fold distances), the update is one
    partial-agg shuffle of quantized-integer component sums (the
    commutative-exact trick — float sums are partition-order-dependent,
    BIGINT sums are not). The oracle replays identical iterations as
    chained CTEs: same quantization, same fold order, same fixed
    division sequence — so assignments, centroids, and inertia are
    bit-reproducible at any partitioning."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.clustering import kmeans_lloyd

    register_views(spark, sf_dir)
    assigned, cents = kmeans_lloyd(
        spark.table("embeddings"), k=8, n_iter=3
    )
    first_comps = F.array(*[F.lit(cents[j][0]) for j in range(8)])
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").alias("n_members"),
            F.sum("id").alias("sum_vec_id"),
            F.sum(F.floor(F.col("dist") * F.lit(1000000.0)).cast("long"))
            .alias("inertia_q"),
        )
        .withColumn(
            "centroid_c1", F.element_at(first_comps, F.col("cluster") + 1)
        )
        .select(
            "cluster", "n_members", "sum_vec_id", "inertia_q", "centroid_c1"
        )
        .orderBy("cluster")
    )


def _kmeans_oracle(k: int = 8, n_iter: int = 3, dim: int = 64) -> str:
    qi = "CAST(FLOOR(CAST({v}[i] AS DOUBLE) * 1000000.0) AS BIGINT)"
    dist = (
        "list_reduce(list_transform(range(1, {d}), "
        "i -> (CAST(e.embedding[i] AS DOUBLE) - c.c[i]) "
        "* (CAST(e.embedding[i] AS DOUBLE) - c.c[i])), "
        "(acc, x) -> acc + x)"
    ).format(d=dim + 1)
    head = f"""
        WITH c0 AS (
          SELECT vec_id AS cluster,
                 list_transform(range(1, {dim + 1}),
                   i -> CAST({qi.format(v='embedding')} AS DOUBLE)
                        / 1000000.0) AS c
          FROM embeddings WHERE vec_id < {k}
        )"""
    its = []
    for t in range(1, n_iter + 1):
        p = t - 1
        its.append(f"""
        , d{t} AS (
          SELECT e.vec_id, e.embedding, c.cluster, {dist} AS dist
          FROM embeddings e CROSS JOIN c{p} c
        ),
        a{t} AS (
          SELECT vec_id, embedding AS v, cluster FROM (
            SELECT vec_id, embedding, cluster,
                   ROW_NUMBER() OVER (
                     PARTITION BY vec_id ORDER BY dist, cluster
                   ) AS rn
            FROM d{t}
          ) WHERE rn = 1
        ),
        m{t} AS (
          SELECT cluster, i AS dim, SUM({qi.format(v='v')}) AS s,
                 COUNT(*) AS n
          FROM a{t} CROSS JOIN range(1, {dim + 1}) t(i)
          GROUP BY cluster, i
        ),
        c{t} AS (
          SELECT p.cluster, COALESCE(m.c, p.c) AS c
          FROM c{p} p LEFT JOIN (
            SELECT cluster,
                   list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
                        ORDER BY dim) AS c
            FROM m{t} GROUP BY cluster
          ) m ON p.cluster = m.cluster
        )""")
    return (
        head
        + "".join(its)
        + f"""
        , dfin AS (
          SELECT e.vec_id, c.cluster, {dist} AS dist
          FROM embeddings e CROSS JOIN c{n_iter} c
        ),
        afin AS (
          SELECT vec_id, cluster, dist FROM (
            SELECT vec_id, cluster, dist,
                   ROW_NUMBER() OVER (
                     PARTITION BY vec_id ORDER BY dist, cluster
                   ) AS rn
            FROM dfin
          ) WHERE rn = 1
        )
        SELECT CAST(a.cluster AS INT) AS cluster,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(SUM(a.vec_id) AS BIGINT) AS sum_vec_id,
               CAST(SUM(CAST(FLOOR(a.dist * 1000000.0) AS BIGINT))
                    AS BIGINT) AS inertia_q,
               MIN(cc.c[1]) AS centroid_c1
        FROM afin a JOIN c{n_iter} cc ON a.cluster = cc.cluster
        GROUP BY a.cluster ORDER BY cluster
        """
    )


_q(
    "x3_kmeans_lloyd",
    Query(
        _kmeans_spark,
        _kmeans_oracle(8, 3, 64),
        "X3+",
        "distributed Lloyd k-means over the full embedding corpus (the "
        "coarse-quantizer training step of an IVF/PQ index build): "
        "map-side assignment against broadcast literal centroids, one "
        "quantized-BIGINT partial-agg shuffle per update — driver "
        "traffic is k x dim per round, independent of corpus size; "
        "bit-exact chained-CTE oracle",
    ),
)


# ---------------------------------------------------------------------------
# Baseline TIFF pixel decode (functions/tiff.py).
# ---------------------------------------------------------------------------


def _tiff_pixel_stats_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-TIFF decode (functions/tiff.py): even items are
    RGB, odd items grayscale; the fixtures sweep BOTH byte orders,
    multi-strip layouts (rows_per_strip=2), PackBits vs uncompressed,
    and WhiteIsZero (photometric 0 — stored INVERTED, so the decoder's
    re-inversion is what makes the stats match); every ninth payload is
    garbage (null sentinel). Lossless, so the oracle recomputes the
    exact pixel statistics from the generator formulas — the IFD walk,
    strip reassembly, PackBits stream, and inversion all cross-check."""
    import numpy as np

    from mission_data_pipeline_spark.functions.multimodal import (
        image_pixel_stats,
    )
    from mission_data_pipeline_spark.functions.tiff import encode_tiff

    rows = []
    for k in range(30):
        if k % 9 == 8:
            rows.append((k, bytearray(b"not a tiff")))
            continue
        comp = "packbits" if k % 4 < 2 else "none"
        be = k % 3 == 0
        if k % 2 == 0:
            h, w = k % 8 + 3, k % 6 + 4
            x = np.arange(w)[None, :, None]
            y = np.arange(h)[:, None, None]
            c = np.arange(3)[None, None, :]
            px = ((k * 7 + x * 3 + y * 11 + c * 5) % 256).astype(np.uint8)
            buf = encode_tiff(
                px, compression=comp, rows_per_strip=2, big_endian=be
            )
        else:
            h, w = k % 5 + 3, k % 7 + 4
            x = np.arange(w)[None, :]
            y = np.arange(h)[:, None]
            px = ((k * 9 + x * 2 + y * 13) % 256).astype(np.uint8)
            buf = encode_tiff(
                px,
                compression=comp,
                photometric=(0 if k % 3 == 0 else 1),
                rows_per_strip=2,
                big_endian=be,
            )
        rows.append((k, bytearray(buf)))
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    return image_pixel_stats(media).orderBy("item_id")


_q(
    "x5_tiff_pixel_stats",
    Query(
        _tiff_pixel_stats_spark,
        """
        WITH items AS (SELECT k AS item_id FROM range(0, 30) t(k)),
        rgb_px AS (
          SELECT item_id, (item_id*7 + xx.x*3 + yy.y*11 + cc.c*5) % 256 AS v
          FROM items, range(0, 10) xx(x), range(0, 11) yy(y),
               range(0, 3) cc(c)
          WHERE item_id % 2 = 0 AND item_id % 9 != 8
            AND xx.x < item_id % 6 + 4 AND yy.y < item_id % 8 + 3
        ),
        gray_px AS (
          SELECT item_id, (item_id*9 + xx.x*2 + yy.y*13) % 256 AS v
          FROM items, range(0, 11) xx(x), range(0, 8) yy(y)
          WHERE item_id % 2 = 1 AND item_id % 9 != 8
            AND xx.x < item_id % 7 + 4 AND yy.y < item_id % 5 + 3
        ),
        px AS (SELECT * FROM rgb_px UNION ALL SELECT * FROM gray_px),
        stats AS (
          SELECT item_id, CAST(SUM(v) AS BIGINT) AS px_sum,
                 CAST(MIN(v) AS INT) AS px_min,
                 CAST(MAX(v) AS INT) AS px_max,
                 COUNT(*) AS n
          FROM px GROUP BY item_id
        )
        SELECT i.item_id,
               CASE WHEN s.item_id IS NULL THEN NULL
                    WHEN i.item_id % 2 = 0 THEN CAST(i.item_id % 6 + 4 AS INT)
                    ELSE CAST(i.item_id % 7 + 4 AS INT) END AS width,
               CASE WHEN s.item_id IS NULL THEN NULL
                    WHEN i.item_id % 2 = 0 THEN CAST(i.item_id % 8 + 3 AS INT)
                    ELSE CAST(i.item_id % 5 + 3 AS INT) END AS height,
               CASE WHEN s.item_id IS NULL THEN NULL
                    WHEN i.item_id % 2 = 0 THEN CAST(3 AS INT)
                    ELSE CAST(1 AS INT) END AS channels,
               s.px_sum, s.px_min, s.px_max,
               CASE WHEN s.item_id IS NULL THEN NULL
                    ELSE ROUND(CAST(s.px_sum AS DOUBLE) / s.n, 6)
                    END AS px_mean
        FROM items i LEFT JOIN stats s USING (item_id)
        ORDER BY i.item_id
        """,
        "X5",
        "REAL baseline-TIFF pixel decode — II/MM byte orders, IFD walk, "
        "multi-strip reassembly, PackBits RLE, WhiteIsZero re-inversion "
        "— lossless, so the oracle recomputes exact pixel statistics "
        "from the generator formulas; garbage payloads yield null "
        "sentinels",
    ),
)


# ---------------------------------------------------------------------------
# Archive ingest: ZIP member fan-out and gzip-JSONL (unsplittable
# codec) round-trip (sources/archive.py, sinks/jsonl.py).
# ---------------------------------------------------------------------------


def _zip_ingest_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIP archive ingest (sources/archive.py read_zip): documents
    bundled driver-side into three archives (mixed STORED/DEFLATED
    members — fixture mirror of a corpus delivery), fanned back out
    distributed (binaryFile + Arrow member fan-out with per-member
    CRC32 verification); the oracle recomputes every member's name,
    size, codec, and payload digest from the source table."""
    import io
    import os
    import zipfile

    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.sources.archive import read_zip

    register_views(spark, sf_dir)
    docs = (
        spark.table("documents")
        .filter(F.col("doc_id") < 120)
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )
    d = _scratch_dir("zip_q")
    for a in range(3):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            for r in docs:
                if r["doc_id"] % 3 != a:
                    continue
                zf.writestr(
                    zipfile.ZipInfo(f"doc/{r['doc_id']}.txt"),
                    r["text"].encode("utf-8"),
                    compress_type=(
                        zipfile.ZIP_DEFLATED
                        if r["doc_id"] % 2
                        else zipfile.ZIP_STORED
                    ),
                )
        with open(os.path.join(d, f"bundle{a}.zip"), "wb") as f:
            f.write(buf.getvalue())
    out = read_zip(spark, d, path_glob="*.zip")
    return out.select(
        "member_name",
        "compress_type",
        "size",
        F.md5("payload").alias("payload_md5"),
        "crc_ok",
    ).orderBy("member_name")


_q(
    "s_zip_archive_ingest",
    Query(
        _zip_ingest_spark,
        """
        SELECT 'doc/' || doc_id || '.txt' AS member_name,
               CASE WHEN doc_id % 2 = 1 THEN 'deflated'
                    ELSE 'stored' END AS compress_type,
               CAST(octet_length(text::BLOB) AS BIGINT) AS size,
               md5(text) AS payload_md5,
               TRUE AS crc_ok
        FROM documents WHERE doc_id < 120
        ORDER BY member_name
        """,
        "S+,X-curation",
        "ZIP bundle ingest: whole archives distributed via binaryFile "
        "(the central directory pins members to their archive), member "
        "fan-out in Arrow-batched mapInPandas with CRC32 verification — "
        "corruption becomes crc_ok=false rows, never task failures",
    ),
)


def _gzip_jsonl_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gzip-JSONL ingest — the WET/dump delivery format. Documents are
    written as FOUR gzip JSONL shards (gzip is an UNSPLITTABLE codec:
    one file = one scan task, so shard count = read parallelism — the
    operational reason dumps ship as many medium files) and read back
    with an explicit schema through Spark's native codec path; per-lang
    accounting must match the source table exactly."""
    import glob

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    register_views(spark, sf_dir)
    d = _scratch_dir("gzjsonl_q") + "/docs"
    (
        spark.table("documents")
        .repartition(4)
        .write.mode("overwrite")
        .option("compression", "gzip")
        .json(d)
    )
    n_files = len(glob.glob(d + "/part-*.json.gz"))
    if n_files != 4:
        raise RuntimeError(f"expected 4 gzip shards, found {n_files}")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    back = spark.read.schema(schema).json(d)
    sig = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.col("doc_id"), "text")), 1, 12),
        16,
        10,
    ).cast("long")
    return (
        back.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(sig).alias("content_sig"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )


_q(
    "s_gzip_jsonl_ingest",
    Query(
        _gzip_jsonl_spark,
        """
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CAST(('0x' || substr(md5(doc_id || '|' || text), 1, 12))
                             AS BIGINT)) AS BIGINT) AS content_sig,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY lang ORDER BY lang
        """,
        "S+,L+",
        "gzip-JSONL round-trip through Spark's native codec path: "
        "unsplittable-codec delivery sharded for read parallelism "
        "(4 files = 4 scan tasks, asserted), content-lossless by "
        "per-lang digest accounting vs the original table",
    ),
)


# ---------------------------------------------------------------------------
# Holt-Winters additive seasonal smoothing (operators/timeseries.py).
# ---------------------------------------------------------------------------


def _hw_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive triple smoothing (level + trend +
    period-4 seasonal cycle), alpha=0.25 / beta=0.25 / gamma=0.5, per
    probe user. The oracle's recursive CTE carries the FULL state —
    level, trend, the 4-slot seasonal LIST (updated functionally via
    list_transform), and the non-null step counter — replaying the
    literal IEEE recurrence, so all three outputs match bit-exactly."""
    from mission_data_pipeline_spark.operators.timeseries import (
        holt_winters_additive,
    )

    register_views(spark, sf_dir)
    ev = spark.sql(
        "SELECT user_id, event_id, ts_ns DIV 1000 AS t_us, value "
        "FROM events WHERE user_id < 12"
    )
    out = holt_winters_additive(
        ev,
        alpha=0.25,
        beta=0.25,
        gamma=0.5,
        period=4,
        time_col="t_us",
        value_col="value",
        series_cols=["user_id"],
        order_cols=["event_id"],
    )
    return out.select(
        "user_id", "event_id", "t_us", "value", "level", "trend", "seasonal"
    ).orderBy("user_id", "t_us", "event_id")


def _hw_oracle(period: int = 4) -> str:
    zeros = "list_transform(range(1, %d), j -> CAST(0.0 AS DOUBLE))" % (
        period + 1
    )
    # phase slot (1-based) for the incoming row, from the carried step
    ph = f"(rec.stp % {period}) + 1"
    sp = f"rec.slist[{ph}]"
    lnew = (
        f"CAST(0.25 AS DOUBLE) * (s.value - {sp}) "
        "+ CAST(0.75 AS DOUBLE) * (rec.lst + rec.bst)"
    )
    bnew = (
        f"CAST(0.25 AS DOUBLE) * (({lnew}) - rec.lst) "
        "+ CAST(0.75 AS DOUBLE) * rec.bst"
    )
    snew = f"CAST(0.5 AS DOUBLE) * (s.value - ({lnew})) " \
           f"+ CAST(0.5 AS DOUBLE) * {sp}"
    return f"""
        WITH RECURSIVE s AS (
          SELECT user_id, event_id, epoch_us(ts) AS t, value,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ) AS n
          FROM events WHERE user_id < 12
        ),
        -- carried state: lst/bst (last non-null level/trend), slist
        -- (seasonal slots), stp (non-null step count). Anchor seasonal
        -- update is exactly 0.0 (gamma*(x-x) + (1-gamma)*0), so the
        -- anchor slist is the zero list regardless of value.
        rec AS (
          SELECT user_id, event_id, t, value, n,
                 value AS lst,
                 CASE WHEN value IS NULL THEN NULL
                      ELSE CAST(0.0 AS DOUBLE) END AS bst,
                 {zeros} AS slist,
                 CASE WHEN value IS NULL THEN 0 ELSE 1 END AS stp,
                 value AS level,
                 CASE WHEN value IS NULL THEN NULL
                      ELSE CAST(0.0 AS DOUBLE) END AS trend,
                 CASE WHEN value IS NULL THEN NULL
                      ELSE CAST(0.0 AS DOUBLE) END AS seasonal
          FROM s WHERE n = 1
          UNION ALL
          SELECT s.user_id, s.event_id, s.t, s.value, s.n,
                 CASE WHEN s.value IS NULL THEN rec.lst
                      WHEN rec.lst IS NULL THEN s.value
                      ELSE {lnew} END,
                 CASE WHEN s.value IS NULL THEN rec.bst
                      WHEN rec.lst IS NULL THEN CAST(0.0 AS DOUBLE)
                      ELSE {bnew} END,
                 CASE WHEN s.value IS NULL OR rec.lst IS NULL
                      THEN rec.slist
                      ELSE list_transform(range(1, {period + 1}),
                             j -> CASE WHEN j = {ph} THEN {snew}
                                       ELSE rec.slist[j] END)
                 END,
                 CASE WHEN s.value IS NULL THEN rec.stp
                      ELSE rec.stp + 1 END,
                 CASE WHEN s.value IS NULL THEN NULL
                      WHEN rec.lst IS NULL THEN s.value
                      ELSE {lnew} END,
                 CASE WHEN s.value IS NULL THEN NULL
                      WHEN rec.lst IS NULL THEN CAST(0.0 AS DOUBLE)
                      ELSE {bnew} END,
                 CASE WHEN s.value IS NULL THEN NULL
                      WHEN rec.lst IS NULL THEN CAST(0.0 AS DOUBLE)
                      ELSE {snew} END
          FROM rec JOIN s
            ON s.user_id = rec.user_id AND s.n = rec.n + 1
        )
        SELECT user_id, event_id, t AS t_us, value, level, trend, seasonal
        FROM rec
        ORDER BY user_id, t_us, event_id
        """


_q(
    "w_holt_winters_seasonal",
    Query(
        _hw_spark,
        _hw_oracle(4),
        "W+",
        "Holt-Winters additive triple exponential smoothing (level + "
        "trend + period-4 seasonal cycle — the diurnal/orbital "
        "telemetry smoother): parallel across series via applyInPandas; "
        "the recursive-CTE oracle carries the full (level, trend, "
        "seasonal-list, step) state and matches bit-exactly",
    ),
)


# ---------------------------------------------------------------------------
# URL canonicalization dedup (operators/text.py canonicalize_url) —
# the crawl-level normalization pass before URL dedup.
# ---------------------------------------------------------------------------


def _url_dedup_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl URL dedup: five deterministic messy variants per document
    (case-shuffled authority, default port, fragment, unsorted params,
    utm_*/gclid tracking junk, plus a genuinely distinct CDN host) are
    canonicalized map-side and grouped. The oracle derives the ground-
    truth canonical string directly from the variant formula — variants
    0/1/2/4 of a page MUST collapse to one URL and the CDN variant must
    stay distinct, so any canonicalization bug (missed port, unsorted
    params, case leak, dropped real param) diverges."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.text import url_canonical_dedup

    register_views(spark, sf_dir)
    urls = spark.sql(
        """
        SELECT doc_id,
          CASE CAST(doc_id % 5 AS INT)
            WHEN 0 THEN concat('http://Example.COM/p/',
                               CAST(doc_id % 211 AS STRING), '?b=2&a=1#sec')
            WHEN 1 THEN concat('http://example.com:80/p/',
                               CAST(doc_id % 211 AS STRING), '?a=1&b=2')
            WHEN 2 THEN concat('HTTP://EXAMPLE.com/p/',
                               CAST(doc_id % 211 AS STRING),
                               '?utm_source=feed&a=1&b=2')
            WHEN 3 THEN concat('https://cdn.example.com/p/',
                               CAST(doc_id % 211 AS STRING))
            ELSE concat('http://example.com/p/',
                        CAST(doc_id % 211 AS STRING), '?gclid=g',
                        CAST(doc_id AS STRING), '&b=2&a=1')
          END AS url
        FROM documents
        """
    )
    out = url_canonical_dedup(urls, url_col="url", id_col="doc_id")
    return out.orderBy(F.desc("n_urls"), "canonical_url").limit(15)


_q(
    "curation_url_canonical_dedup",
    Query(
        _url_dedup_spark,
        """
        WITH urls AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 5 = 3
                      THEN 'https://cdn.example.com/p/' || (doc_id % 211)
                      ELSE 'http://example.com/p/' || (doc_id % 211)
                           || '?a=1&b=2'
                 END AS canonical_url
          FROM documents
        )
        SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_urls,
               MIN(doc_id) AS keep_id
        FROM urls GROUP BY canonical_url
        ORDER BY n_urls DESC, canonical_url LIMIT 15
        """,
        "X-curation",
        "URL canonicalization for crawl dedup (lowercased authority, "
        "default-port strip, fragment drop, tracking-param removal, "
        "sorted query params, root-slash collapse) — zero-shuffle "
        "expression chain, one hash shuffle on the canonical string; "
        "oracle derives ground truth from the variant formula",
    ),
)


def _substring_dedup_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup (operators/dedup.py exact_substring_dedup —
    Lee et al. 2022 §4.1 remove-the-duplicate-substring variant): every
    12-token span occurring more than once in the corpus keeps its
    globally first occurrence and is excised everywhere else, merged
    removal intervals per doc, surviving tokens rejoined. The check
    seeds 40 in-plan partial copies (first 20 source tokens + unique
    tail) on top of the raw corpus (which also carries whole-doc exact
    dups): copies must lose their shared prefix (one merged span),
    first occurrences keep theirs, later whole-doc dups empty out."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.dedup import (
        exact_substring_dedup,
    )

    register_views(spark, sf_dir)
    base = spark.table("documents").select("doc_id", "text")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    copies = base.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(
            F.array_join(F.slice(toks, 1, 20), " "),
            F.lit(" uniq"),
            F.col("doc_id").cast("string"),
            F.lit(" tail marker extra pad tokens"),
        ).alias("text"),
    )
    corpus = base.unionByName(copies)
    return exact_substring_dedup(corpus, k=12).orderBy("doc_id")


_q(
    "x2_substring_dedup",
    Query(
        _substring_dedup_spark,
        r"""
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id,
                 array_to_string(
                   string_split_regex(trim(lower(text)), '\s+')[1:20], ' ')
                 || ' uniq' || CAST(doc_id AS VARCHAR)
                 || ' tail marker extra pad tokens' AS text
          FROM documents WHERE doc_id < 40
        ), tok AS (
          SELECT doc_id,
                 string_split_regex(trim(lower(text)), '\s+') AS toks
          FROM corpus
        ), eligible AS (
          SELECT doc_id, toks, len(toks) AS n FROM tok WHERE len(toks) >= 12
        ), grams AS (
          SELECT doc_id, u.i - 1 AS pos,
                 array_to_string(toks[u.i:u.i+11], ' ') AS gram
          FROM eligible, UNNEST(generate_series(1, n - 11)) AS u(i)
        ), ranked AS (
          SELECT doc_id, pos,
                 row_number() OVER (PARTITION BY gram
                                    ORDER BY doc_id, pos) AS rn,
                 count(*) OVER (PARTITION BY gram) AS cnt
          FROM grams
        ), removable AS (
          SELECT doc_id, pos FROM ranked WHERE cnt >= 2 AND rn > 1
        ), cov AS (
          SELECT DISTINCT doc_id, pos + u.off AS p
          FROM removable, UNNEST(generate_series(0, 11)) AS u(off)
        ), marked AS (
          SELECT doc_id, p,
                 CASE WHEN COALESCE(
                        p - lag(p) OVER (PARTITION BY doc_id ORDER BY p),
                        2) > 1
                      THEN 1 ELSE 0 END AS is_start
          FROM cov
        ), stats AS (
          SELECT doc_id, COUNT(*) AS n_removed, SUM(is_start) AS n_spans
          FROM marked GROUP BY doc_id
        ), positions AS (
          SELECT doc_id, u.i - 1 AS p, toks[u.i] AS tok
          FROM eligible, UNNEST(generate_series(1, n)) AS u(i)
        ), kept AS (
          SELECT po.doc_id,
                 array_to_string(list(po.tok ORDER BY po.p), ' ')
                   AS kept_text
          FROM positions po
          ANTI JOIN cov c ON po.doc_id = c.doc_id AND po.p = c.p
          GROUP BY po.doc_id
        )
        SELECT e.doc_id, e.n AS n_tokens,
               CAST(COALESCE(s.n_removed, 0) AS BIGINT) AS n_removed,
               CAST(COALESCE(s.n_spans, 0) AS BIGINT) AS n_spans,
               COALESCE(k.kept_text, '') AS kept_text
        FROM eligible e
        LEFT JOIN stats s ON e.doc_id = s.doc_id
        LEFT JOIN kept k ON e.doc_id = k.doc_id
        ORDER BY e.doc_id
        """,
        "X2,X1",
        "ExactSubstr dedup (Lee et al. 2022): duplicated 12-token spans "
        "keep their globally first occurrence, all other occurrences "
        "excised (merged per-doc intervals, text rebuilt) — gram-keyed "
        "groupBy for (count, first), join-back tag, coverage explode "
        "on the duplicated subset only; no suffix array, no n² scan",
    ),
)


def _substring_dedup_bpe_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup at BPE-TOKEN granularity (operators/dedup.py
    exact_substring_dedup_bpe) — the setting Lee et al. 2022 actually
    ran (§4.1 dedups ~50-token windows of the tokenizer id stream, not
    whitespace words). The corpus is tokenized by the repo's
    distributed BPE encoder (distinct vocabulary encoded once, order-
    preserving flatten) and every duplicated 30-token span keeps only
    its globally first occurrence. Same seeded-copy construction as
    x2_substring_dedup: 20 in-plan partial copies (first 20 source
    words + unique tail) must lose their shared prefix at TOKEN
    granularity; the oracle replays BPE (recursive CTE over the same
    literal merges), the ordered flatten, and the span surgery."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.dedup import (
        exact_substring_dedup_bpe,
    )

    register_views(spark, sf_dir)
    docs = spark.table("documents")
    base = docs.filter(F.col("doc_id") < 200).select("doc_id", "text")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    copies = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(
            F.array_join(F.slice(toks, 1, 20), " "),
            F.lit(" uniq"),
            F.col("doc_id").cast("string"),
            F.lit(" tail marker extra pad tokens"),
        ).alias("text"),
    )
    corpus = base.unionByName(copies)
    return exact_substring_dedup_bpe(corpus, k=30).orderBy("doc_id")


_q(
    "x2_substring_dedup_bpe",
    Query(
        _substring_dedup_bpe_spark,
        _BPE_ORACLE_PRELUDE.format(
            merges=_bpe_merges_sql_literal(),
            docs_src=r"""SELECT doc_id, text FROM documents WHERE doc_id < 200
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id,
                 array_to_string(
                   string_split_regex(trim(lower(text)), '\s+')[1:20], ' ')
                 || ' uniq' || CAST(doc_id AS VARCHAR)
                 || ' tail marker extra pad tokens' AS text
          FROM documents WHERE doc_id < 20""",
        )
        + r"""
        , wp AS (
          SELECT doc_id, u.i AS wpos, ws[u.i] AS w
          FROM (SELECT doc_id,
                       list_filter(
                         string_split_regex(lower(text), '[^a-z]+'),
                         x -> len(x) > 0) AS ws
                FROM docs) t,
               UNNEST(generate_series(1, len(ws))) AS u(i)
        ), tokseq AS (
          SELECT wp.doc_id, flatten(list(f.toks ORDER BY wp.wpos)) AS toks
          FROM wp JOIN fin f ON wp.w = f.w
          GROUP BY wp.doc_id
        ), eligible AS (
          SELECT doc_id, toks, len(toks) AS n FROM tokseq
          WHERE len(toks) >= 30
        ), grams AS (
          SELECT doc_id, u.i - 1 AS pos,
                 array_to_string(toks[u.i:u.i+29], ' ') AS gram
          FROM eligible, UNNEST(generate_series(1, n - 29)) AS u(i)
        ), ranked AS (
          SELECT doc_id, pos,
                 row_number() OVER (PARTITION BY gram
                                    ORDER BY doc_id, pos) AS rn,
                 count(*) OVER (PARTITION BY gram) AS cnt
          FROM grams
        ), removable AS (
          SELECT doc_id, pos FROM ranked WHERE cnt >= 2 AND rn > 1
        ), cov AS (
          SELECT DISTINCT doc_id, pos + u.off AS p
          FROM removable, UNNEST(generate_series(0, 29)) AS u(off)
        ), marked AS (
          SELECT doc_id, p,
                 CASE WHEN COALESCE(
                        p - lag(p) OVER (PARTITION BY doc_id ORDER BY p),
                        2) > 1
                      THEN 1 ELSE 0 END AS is_start
          FROM cov
        ), stats AS (
          SELECT doc_id, COUNT(*) AS n_removed, SUM(is_start) AS n_spans
          FROM marked GROUP BY doc_id
        ), positions AS (
          SELECT doc_id, u.i - 1 AS p, toks[u.i] AS tok
          FROM eligible, UNNEST(generate_series(1, n)) AS u(i)
        ), kept AS (
          SELECT po.doc_id,
                 array_to_string(list(po.tok ORDER BY po.p), ' ')
                   AS kept_text
          FROM positions po
          ANTI JOIN cov c ON po.doc_id = c.doc_id AND po.p = c.p
          GROUP BY po.doc_id
        )
        SELECT e.doc_id, e.n AS n_tokens,
               CAST(COALESCE(s.n_removed, 0) AS BIGINT) AS n_removed,
               CAST(COALESCE(s.n_spans, 0) AS BIGINT) AS n_spans,
               COALESCE(k.kept_text, '') AS kept_text
        FROM eligible e
        LEFT JOIN stats s ON e.doc_id = s.doc_id
        LEFT JOIN kept k ON e.doc_id = k.doc_id
        ORDER BY e.doc_id
        """,
        "X2,X4",
        "ExactSubstr dedup over BPE token ids (Lee et al.'s actual "
        "granularity): distributed BPE tokenization composed with the "
        "gram-keyed span surgery — duplicated 30-token runs keep only "
        "their first occurrence even when word boundaries differ; "
        "oracle replays BPE (recursive CTE), the ordered flatten, and "
        "every surgery stage",
    ),
)


def _dsir_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (operators/sampling.py dsir_select —
    Xie et al. 2023): select the 25 raw-corpus docs whose hashed
    unigram+bigram distribution is most target-like (target = the 'en'
    slice), Gumbel-noise resampled from the importance weights. md5
    bucket hash so the oracle replays the exact feature space; per-
    bucket log-ratios rounded to 9 then DECIMAL-summed (layout-
    invariant under the perturb sweep)."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.sampling import dsir_select

    register_views(spark, sf_dir)
    docs = spark.table("documents")
    return dsir_select(
        docs.select("doc_id", "text"),
        docs.filter(F.col("lang") == "en").select("doc_id", "text"),
        25,
        buckets=4096,
        seed=9,
    )


_q(
    "curation_dsir_select",
    Query(
        _dsir_spark,
        r"""
        WITH raw_toks AS (
          SELECT doc_id,
                 string_split_regex(trim(lower(text)), '\s+') AS t
          FROM documents
        ), tgt_toks AS (
          SELECT doc_id,
                 string_split_regex(trim(lower(text)), '\s+') AS t
          FROM documents WHERE lang = 'en'
        ), raw_b AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT)
                   % 4096 AS bucket
          FROM (SELECT doc_id, unnest(list_concat(
                  list_filter(t, x -> length(x) > 0),
                  CASE WHEN len(t) >= 2
                       THEN list_transform(generate_series(1, len(t) - 1),
                                           i -> t[i] || ' ' || t[i+1])
                       ELSE []::VARCHAR[] END)) AS gram
                FROM raw_toks)
        ), tgt_b AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT)
                   % 4096 AS bucket
          FROM (SELECT doc_id, unnest(list_concat(
                  list_filter(t, x -> length(x) > 0),
                  CASE WHEN len(t) >= 2
                       THEN list_transform(generate_series(1, len(t) - 1),
                                           i -> t[i] || ' ' || t[i+1])
                       ELSE []::VARCHAR[] END)) AS gram
                FROM tgt_toks)
        ), rc AS (
          SELECT bucket, COUNT(*) AS cr FROM raw_b GROUP BY bucket
        ), tc AS (
          SELECT bucket, COUNT(*) AS ct FROM tgt_b GROUP BY bucket
        ), counts AS (
          SELECT COALESCE(rc.bucket, tc.bucket) AS bucket,
                 COALESCE(cr, 0) AS cr, COALESCE(ct, 0) AS ct
          FROM rc FULL JOIN tc ON rc.bucket = tc.bucket
        ), tot AS (
          SELECT SUM(cr) AS totr, SUM(ct) AS tott FROM counts
        ), model AS (
          SELECT bucket,
                 ROUND(ln((ct + 1.0) / (tott + 1.0 * 4096))
                       - ln((cr + 1.0) / (totr + 1.0 * 4096)), 9) AS lr
          FROM counts CROSS JOIN tot
        ), scored AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
                 ROUND(CAST(CAST(SUM(CAST(lr AS DECIMAL(20,9)))
                       AS STRING) AS DOUBLE), 6) AS logw
          FROM raw_b JOIN model USING (bucket) GROUP BY doc_id
        )
        SELECT doc_id, n_grams, logw,
               ROUND(logw + ROUND(-ln(-ln(
                 (CAST(('0x' || substr(md5('9|' || CAST(doc_id AS VARCHAR)),
                        1, 8)) AS BIGINT) + 0.5) / 4294967296.0)), 9), 6)
                 AS sel_key
        FROM scored
        ORDER BY sel_key DESC, doc_id LIMIT 25
        """,
        "X-curation",
        "DSIR importance resampling (Xie et al. 2023): hashed-ngram bag "
        "distributions fitted on target and raw corpora (add-1 "
        "smoothing), per-doc log importance weight via broadcast "
        "log-ratio model join + one doc-keyed partial agg, Gumbel-top-n "
        "selection as TakeOrderedAndProject — corpus never shuffles "
        "beyond two gram-keyed partial aggs; model is O(buckets)",
    ),
)


def _curation_e2e_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation capstone: the canonical FineWeb/C4-style pipeline as ONE
    composed plan — language gate → quality gates (length, token count,
    stopword evidence) → exact dedup (first occurrence by content hash)
    → PII scrub (operators/text.py scrub_text) → per-source funnel
    stats. Every stage is an already-oracled operator; this query pins
    that they COMPOSE (the production shape: one job, one pass over the
    corpus, stages fused by Catalyst). Scale shape: the gates and the
    scrub are map-side expressions; the only shuffles are the dedup's
    content-hash window and the final source-keyed partial agg."""
    from pyspark.sql import Window, functions as F

    from mission_data_pipeline_spark.operators.text import scrub_text

    register_views(spark, sf_dir)
    docs = spark.table("documents")
    gated = (
        docs.filter(F.col("lang") == "en")
        .withColumn("n_tokens", F.expr(_TOKENS))
        .withColumn("n_chars", F.length("text"))
    )
    quality = gated.filter(
        (F.col("n_tokens") >= 10)
        & (F.col("n_chars") >= 50)
        & (F.expr(_occurrences("the")) + F.expr(_occurrences("a")) > 0)
    )
    w = Window.partitionBy(F.md5(F.lower(F.col("text")))).orderBy("doc_id")
    survivors = (
        quality.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    scrubbed = scrub_text(survivors)
    return (
        scrubbed.groupBy("source")
        .agg(
            F.count("*").alias("n_docs_out"),
            F.sum("n_tokens").cast("long").alias("tokens_out"),
            F.count_distinct(F.md5("text")).alias("n_unique_scrubbed"),
            F.sum(F.length("text")).cast("long").alias("chars_out"),
        )
        .orderBy("source")
    )


_q(
    "curation_e2e_pipeline",
    Query(
        _curation_e2e_spark,
        rf"""
        WITH gated AS (
          SELECT doc_id, source, text,
                 {_TOKENS} AS n_tokens, LENGTH(text) AS n_chars
          FROM documents
          WHERE lang = 'en'
        ), quality AS (
          SELECT * FROM gated
          WHERE n_tokens >= 10 AND n_chars >= 50
            AND ({_occurrences('the')} + {_occurrences('a')}) > 0
        ), ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY MD5(LOWER(text))
                                       ORDER BY doc_id) AS rn
          FROM quality
        ), scrubbed AS (
          SELECT doc_id, source, n_tokens,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(text,
                         '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{{2,}}',
                         '<EMAIL>', 'g'),
                       'https?://[^\s]+', '<URL>', 'g'),
                     '\b\d{{3}}[-.]\d{{3,4}}[-.]\d{{4}}\b', '<PHONE>', 'g'),
                   '\b\d{{13,19}}\b', '<LONGNUM>', 'g') AS text
          FROM ranked WHERE rn = 1
        )
        SELECT source,
               COUNT(*) AS n_docs_out,
               CAST(SUM(n_tokens) AS BIGINT) AS tokens_out,
               CAST(COUNT(DISTINCT MD5(text)) AS BIGINT)
                 AS n_unique_scrubbed,
               CAST(SUM(LENGTH(text)) AS BIGINT) AS chars_out
        FROM scrubbed
        GROUP BY source
        ORDER BY source
        """,
        "X-curation",
        "curation capstone: lang gate -> quality gates -> exact "
        "first-occurrence dedup -> PII scrub -> per-source funnel, "
        "composed as ONE Catalyst plan (map-side gates/scrub fused; "
        "shuffles only at the content-hash dedup window and the final "
        "source agg) — pins that the oracled stages compose",
    ),
)


def _incremental_near_dedup_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest NEAR-dedup (operators/dedup.py
    incremental_near_dedup) — the near-dup twin of x1_incremental_dedup:
    a new batch (20 appended-tail near-copies of corpus docs + 20
    genuinely new docs) is gated against the existing corpus via its
    LSH band index; only the batch featurizes, candidates verify with
    exact n-gram Jaccard, near-copies drop, new docs survive."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.dedup import (
        incremental_near_dedup,
    )

    register_views(spark, sf_dir)
    docs = spark.table("documents")
    corpus = docs.filter(F.col("doc_id") < 80).select("doc_id", "text")
    batch = (
        docs.filter(F.col("doc_id") < 20)
        .select(
            (F.col("doc_id") + 50000).alias("doc_id"),
            F.concat("text", F.lit(" extra tail tokens tacked on")).alias(
                "text"
            ),
        )
        .unionByName(
            docs.filter(
                (F.col("doc_id") >= 100) & (F.col("doc_id") < 120)
            ).select((F.col("doc_id") + 60000).alias("doc_id"), "text")
        )
    )
    out = incremental_near_dedup(
        batch, corpus, n=2, num_hashes=8, bands=4, threshold=0.6
    )
    return out.select("doc_id").orderBy("doc_id")


# Shared by x2_incremental_near_dedup and its stored-index twin: the
# materialized parquet index path must reproduce the recompute path
# exactly, so both compare against one oracle text.
_INC_NEAR_DEDUP_DUCK = r"""
        WITH corpus AS (
          SELECT doc_id, text FROM documents WHERE doc_id < 80
        ), batch AS (
          SELECT doc_id + 50000 AS doc_id,
                 text || ' extra tail tokens tacked on' AS text
          FROM documents WHERE doc_id < 20
          UNION ALL
          SELECT doc_id + 60000 AS doc_id, text
          FROM documents WHERE doc_id >= 100 AND doc_id < 120
        ), gc AS (
          SELECT * FROM (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(toks, CAST(i AS INT) + 1,
                                              CAST(i AS INT) + 2), ' ') AS gram
            FROM (SELECT doc_id,
                         string_split_regex(trim(lower(text)), '\s+') AS toks
                  FROM corpus),
                 UNNEST(range(0, greatest(len(toks) - 2, 0) + 1)) AS t(i))
          WHERE length(gram) > 0
        ), gb AS (
          SELECT * FROM (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(toks, CAST(i AS INT) + 1,
                                              CAST(i AS INT) + 2), ' ') AS gram
            FROM (SELECT doc_id,
                         string_split_regex(trim(lower(text)), '\s+') AS toks
                  FROM batch),
                 UNNEST(range(0, greatest(len(toks) - 2, 0) + 1)) AS t(i))
          WHERE length(gram) > 0
        ), hc AS (
          SELECT g.doc_id, s.seed,
                 MIN(CAST(('0x' || SUBSTR(MD5(CAST(s.seed AS VARCHAR)
                       || ':' || g.gram), 1, 12)) AS BIGINT)) AS minhash
          FROM gc g CROSS JOIN (SELECT UNNEST(range(0, 8)) AS seed) s
          GROUP BY g.doc_id, s.seed
        ), hb AS (
          SELECT g.doc_id, s.seed,
                 MIN(CAST(('0x' || SUBSTR(MD5(CAST(s.seed AS VARCHAR)
                       || ':' || g.gram), 1, 12)) AS BIGINT)) AS minhash
          FROM gb g CROSS JOIN (SELECT UNNEST(range(0, 8)) AS seed) s
          GROUP BY g.doc_id, s.seed
        ), bc AS (
          SELECT doc_id, seed % 4 AS band,
                 array_to_string(list_sort(list(CAST(minhash AS VARCHAR))),
                                 ',') AS sig
          FROM hc GROUP BY doc_id, seed % 4
        ), bb AS (
          SELECT doc_id, seed % 4 AS band,
                 array_to_string(list_sort(list(CAST(minhash AS VARCHAR))),
                                 ',') AS sig
          FROM hb GROUP BY doc_id, seed % 4
        ), cand AS (
          SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
          FROM bb b JOIN bc c ON b.band = c.band AND b.sig = c.sig
        ), inter AS (
          SELECT p.batch_id, p.corpus_id, COUNT(*) AS n_inter
          FROM cand p
          JOIN gb ON gb.doc_id = p.batch_id
          JOIN gc ON gc.doc_id = p.corpus_id AND gc.gram = gb.gram
          GROUP BY p.batch_id, p.corpus_id
        ), szb AS (SELECT doc_id, COUNT(*) AS n FROM gb GROUP BY doc_id),
        szc AS (SELECT doc_id, COUNT(*) AS n FROM gc GROUP BY doc_id),
        dups AS (
          SELECT DISTINCT i.batch_id AS doc_id
          FROM inter i
          JOIN szb ON szb.doc_id = i.batch_id
          JOIN szc ON szc.doc_id = i.corpus_id
          WHERE CAST(i.n_inter AS DOUBLE)
                / (szb.n + szc.n - i.n_inter) >= 0.6
        )
        SELECT b.doc_id FROM batch b
        WHERE b.doc_id NOT IN (SELECT doc_id FROM dups)
        ORDER BY b.doc_id
        """


_q(
    "x2_incremental_near_dedup",
    Query(
        _incremental_near_dedup_spark,
        _INC_NEAR_DEDUP_DUCK,
        "X2,X1",
        "incremental ingest near-dedup: new batch gated against the "
        "existing corpus's LSH band index (batch-only featurization, "
        "band-keyed join, exact Jaccard verify on candidates only) — "
        "near-copies drop, new docs survive; oracle replays every stage",
    ),
)


def _incremental_near_dedup_stored_spark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PRODUCTION shape of incremental near-dedup: the corpus's LSH
    band index + gram sets are MATERIALIZED to parquet
    (operators/dedup.py write_near_dedup_index — bands partitioned by
    band, params recorded) and the batch joins the STORED index
    (read_near_dedup_index → incremental_near_dedup(corpus_bands=...,
    corpus_grams=...)); the corpus text is never re-featurized at probe
    time. Same corpus/batch construction and parameters as
    x2_incremental_near_dedup — the stored path must reproduce the
    recompute path exactly, so it shares that query's oracle verbatim.
    """
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.dedup import (
        incremental_near_dedup,
        read_near_dedup_index,
        write_near_dedup_index,
    )

    register_views(spark, sf_dir)
    docs = spark.table("documents")
    corpus = docs.filter(F.col("doc_id") < 80).select("doc_id", "text")
    batch = (
        docs.filter(F.col("doc_id") < 20)
        .select(
            (F.col("doc_id") + 50000).alias("doc_id"),
            F.concat("text", F.lit(" extra tail tokens tacked on")).alias(
                "text"
            ),
        )
        .unionByName(
            docs.filter(
                (F.col("doc_id") >= 100) & (F.col("doc_id") < 120)
            ).select((F.col("doc_id") + 60000).alias("doc_id"), "text")
        )
    )
    d = _scratch_dir("near_dedup_idx_q")
    write_near_dedup_index(corpus, d, n=2, num_hashes=8, bands=4)
    idx_bands, idx_grams = read_near_dedup_index(
        spark, d, n=2, num_hashes=8, bands=4
    )
    out = incremental_near_dedup(
        batch,
        n=2,
        num_hashes=8,
        bands=4,
        threshold=0.6,
        corpus_bands=idx_bands,
        corpus_grams=idx_grams,
    )
    return out.select("doc_id").orderBy("doc_id")


_q(
    "x2_incremental_near_dedup_stored",
    Query(
        _incremental_near_dedup_stored_spark,
        _INC_NEAR_DEDUP_DUCK,
        "X2,X1,L1+",
        "stored-index incremental near-dedup round-trip: the corpus's "
        "LSH band index and gram sets are written to parquet "
        "(partitioned by band, params.json-validated) and the batch "
        "joins the ON-DISK index — the nightly 100 TB crawl-ingest "
        "shape where the corpus is never re-featurized; must equal the "
        "recompute path, so it shares its oracle verbatim",
    ),
)


def _hard_negative_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training (operators/
    similarity.py hard_negative_mining): per anchor, the 5 most-similar
    DIFFERENT-label vectors plus the anchor's hardest positive cosine.
    The query mines plain hard negatives (non-vacuous at every sf —
    the scaled corpora plant near-clone positives at cosine≈1.0, which
    would empty a FaceNet semi-hard band); the margin/band semantics
    are pinned by the unit test's hand-built fixture."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.similarity import (
        hard_negative_mining,
    )

    register_views(spark, sf_dir)
    emb = spark.table("embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    anchors = emb.filter(F.col("vec_id") < 12)
    return hard_negative_mining(emb, anchors, k=5).orderBy(
        "query_id", "rank"
    )


_q(
    "x3_hard_negative_mining",
    Query(
        _hard_negative_spark,
        """
        WITH e AS (
          SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        ), a AS (
          SELECT vec_id AS query_id, label AS query_label, v AS qv
          FROM e WHERE vec_id < 12
        ), scored AS (
          SELECT a.query_id, a.query_label,
                 e.vec_id AS neighbor_id, e.label AS neighbor_label,
                 ROUND(list_cosine_similarity(a.qv, e.v), 6) AS cosine
          FROM e CROSS JOIN a
          WHERE e.vec_id != a.query_id
        ), pos AS (
          SELECT query_id, cosine AS pos_cosine
          FROM (SELECT query_id, cosine,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY cosine DESC,
                                                   neighbor_id) AS rn
                FROM scored WHERE neighbor_label = query_label)
          WHERE rn = 1
        ), neg AS (
          SELECT s.query_id, s.neighbor_id, s.neighbor_label, s.cosine,
                 p.pos_cosine
          FROM scored s LEFT JOIN pos p ON s.query_id = p.query_id
          WHERE s.neighbor_label != s.query_label
        )
        SELECT query_id, neighbor_id, neighbor_label, cosine,
               CAST(rank AS INT) AS rank, pos_cosine
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                           ORDER BY cosine DESC,
                                                    neighbor_id) AS rank
              FROM neg)
        WHERE rank <= 5
        ORDER BY query_id, rank
        """,
        "X3+",
        "contrastive hard-negative mining: per anchor the 5 hardest "
        "different-label neighbors plus the hardest-positive cosine "
        "(operator also offers the FaceNet semi-hard band, unit-pinned) "
        "— bounded anchor broadcast, one corpus scan, all-JVM cosines, "
        "rank-after-filter windows; the triplet-batch miner for "
        "embedding fine-tuning on curated corpora",
    ),
)


def _gopher_rules_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText word-level quality rules (operators/text.py
    gopher_quality_signals, Rae et al. 2021 App. A): word-count and
    mean-word-length windows, #/ellipsis symbol ratio, alphabetic-word
    fraction, required-stopword count, composite pass. Thresholds
    loosened to the synthetic corpus's shape (min_words 10, stopwords
    via 'the'/'and'/'of' presence) so the verdict is non-degenerate."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.text import (
        gopher_quality_signals,
    )

    register_views(spark, sf_dir)
    docs = spark.table("documents").filter(F.col("doc_id") < 300)
    return gopher_quality_signals(
        docs, min_words=10, min_mean_word_len=3.0, max_mean_word_len=10.0,
        max_symbol_ratio=0.1, min_alpha_frac=0.8, min_stopwords=1,
    ).orderBy("doc_id")


_q(
    "curation_gopher_rules",
    Query(
        _gopher_rules_spark,
        r"""
        WITH t AS (
          SELECT doc_id, text,
                 list_filter(string_split_regex(trim(lower(text)), '\s+'),
                             x -> length(x) > 0) AS toks
          FROM documents WHERE doc_id < 300
        ), sig AS (
          SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_words,
                 ROUND(CAST(list_sum(list_transform(toks, x -> length(x)))
                            AS DOUBLE) / len(toks), 6) AS mean_word_len,
                 ROUND((CAST(length(text)
                        - length(replace(text, '#', '')) AS DOUBLE)
                        + (length(text)
                           - length(replace(text, '...', ''))) / 3.0)
                       / len(toks), 6) AS symbol_ratio,
                 ROUND(CAST(len(list_filter(toks,
                        x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
                       / len(toks), 6) AS alpha_frac,
                 CAST(len(list_intersect(toks,
                      ['the','be','to','of','and','that','have','with']))
                   AS BIGINT) AS n_stopwords
          FROM t WHERE len(toks) > 0
        )
        SELECT *,
               (n_words >= 10 AND n_words <= 100000
                AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                AND symbol_ratio <= 0.1
                AND alpha_frac >= 0.8
                AND n_stopwords >= 1) AS gopher_pass
        FROM sig ORDER BY doc_id
        """,
        "X4,X-curation",
        "Gopher/MassiveText word-level quality rules (Rae et al. 2021 "
        "App. A): word-count + mean-word-length windows, #/ellipsis "
        "symbol-to-word ratio, alphabetic-word fraction, required "
        "stopwords, composite verdict — all higher-order expressions "
        "over one token split, zero shuffles, rides the scan (the "
        "map-side gate in front of dedup/scoring at 100 TB)",
    ),
)


def _matryoshka_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation retrieval audit (operators/similarity.py
    matryoshka_recall): top-5 recall of 16-dim-prefix cosine retrieval
    vs full 64-dim ground truth for 15 anchors."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.similarity import (
        matryoshka_recall,
    )

    register_views(spark, sf_dir)
    emb = spark.table("embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    anchors = emb.filter(F.col("vec_id") < 15)
    return matryoshka_recall(emb, anchors, k=5, prefix_dim=16).orderBy(
        "query_id"
    )


_q(
    "x3_matryoshka_recall",
    Query(
        _matryoshka_spark,
        """
        WITH e AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ), a AS (
          SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 15
        ), scored AS (
          SELECT a.query_id, e.vec_id AS neighbor_id,
                 ROUND(list_cosine_similarity(a.qv, e.v), 6) AS cos_full,
                 ROUND(list_cosine_similarity(a.qv[1:16], e.v[1:16]), 6)
                   AS cos_prefix
          FROM e CROSS JOIN a WHERE e.vec_id != a.query_id
        ), ranked AS (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos_full DESC,
                                             neighbor_id) AS rf,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos_prefix DESC,
                                             neighbor_id) AS rp
          FROM scored
        ), hits AS (
          SELECT query_id, COUNT(*) AS n_hits
          FROM ranked WHERE rf <= 5 AND rp <= 5
          GROUP BY query_id
        )
        SELECT a.query_id,
               CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
               ROUND(COALESCE(h.n_hits, 0) / 5.0, 6) AS recall
        FROM a LEFT JOIN hits h ON a.query_id = h.query_id
        ORDER BY a.query_id
        """,
        "X3+",
        "Matryoshka-truncation retrieval audit (Kusupati et al. 2022): "
        "top-5 recall of 16-dim-prefix cosine retrieval vs full 64-dim "
        "ground truth — ONE corpus scan computes both cosines per "
        "(row, anchor) against the broadcast anchor batch; rounded-"
        "before-rank with id tie-breaks keeps both rankings (and the "
        "recall) cross-engine exact; the serve-from-a-prefix decision "
        "gauge for 4x index memory savings",
    ),
)


def _near_dedup_compacted_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The transactional index lifecycle end-to-end (round 10): base
    index from HALF the corpus (write_near_dedup_index — manifest-
    pointed v0), the other half lands as a streaming-style epoch DELTA
    (registered in the manifest, commit recorded in a checkpoint
    commits/ log), compact_near_dedup_index folds it into an immutable
    v1 published by an atomic manifest swap, and the batch probes the
    COMPACTED index. Gating against {base v0 + folded delta} must equal
    gating against the full corpus, so this shares
    x2_incremental_near_dedup's oracle verbatim — any torn fold, missed
    epoch, or manifest misresolution breaks the hash."""
    import os

    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.dedup import (
        band_signatures,
        incremental_near_dedup,
        minhash_signatures,
        read_index_manifest,
        read_near_dedup_index,
        shingles,
        write_index_manifest,
        write_near_dedup_index,
    )
    from mission_data_pipeline_spark.streaming.ingest import (
        compact_near_dedup_index,
    )

    register_views(spark, sf_dir)
    docs = spark.table("documents")
    corpus1 = docs.filter(F.col("doc_id") < 40).select("doc_id", "text")
    corpus2 = docs.filter(
        (F.col("doc_id") >= 40) & (F.col("doc_id") < 80)
    ).select("doc_id", "text")
    batch = (
        docs.filter(F.col("doc_id") < 20)
        .select(
            (F.col("doc_id") + 50000).alias("doc_id"),
            F.concat("text", F.lit(" extra tail tokens tacked on")).alias(
                "text"
            ),
        )
        .unionByName(
            docs.filter(
                (F.col("doc_id") >= 100) & (F.col("doc_id") < 120)
            ).select((F.col("doc_id") + 60000).alias("doc_id"), "text")
        )
    )
    d = _scratch_dir("near_dedup_idx_compacted_q")
    write_near_dedup_index(corpus1, d, n=2, num_hashes=8, bands=4)
    g2 = shingles(corpus2, n=2)
    ddir = os.path.join(d, "delta", "epoch=0")
    band_signatures(
        minhash_signatures(g2, num_hashes=8), bands=4
    ).write.mode("overwrite").parquet(os.path.join(ddir, "bands"))
    g2.write.mode("overwrite").parquet(os.path.join(ddir, "grams"))
    m = read_index_manifest(d)
    m["delta_epochs"] = [0]
    write_index_manifest(d, m)
    ck = _scratch_dir("near_dedup_idx_compacted_ck")
    os.makedirs(os.path.join(ck, "commits"), exist_ok=True)
    with open(os.path.join(ck, "commits", "0"), "w") as f:
        f.write("v1\n{}")
    res = compact_near_dedup_index(spark, d, checkpoint=ck)
    if res["version"] != 1 or res["epochs_folded"] != 1:
        raise RuntimeError(f"compaction did not fold the epoch: {res}")
    bands_df, grams_df = read_near_dedup_index(
        spark, d, n=2, num_hashes=8, bands=4
    )
    out = incremental_near_dedup(
        batch,
        n=2,
        num_hashes=8,
        bands=4,
        threshold=0.6,
        corpus_bands=bands_df,
        corpus_grams=grams_df,
    )
    return out.select("doc_id").orderBy("doc_id")


_q(
    "x2_near_dedup_compacted_index",
    Query(
        _near_dedup_compacted_spark,
        _INC_NEAR_DEDUP_DUCK,
        "X2,X1,L1+,W1+",
        "transactional index lifecycle: base index (manifest v0) + "
        "registered epoch delta + checkpoint-commit-gated compaction "
        "into an atomically published v1, probed by the batch — must "
        "equal gating against the full corpus (shares the recompute "
        "twin's oracle verbatim), pinning fold completeness and "
        "manifest resolution in the driver gate",
    ),
)


def _domain_cap_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (operators/sampling.py domain_cap — the
    RefinedWeb/FineWeb anti-monoculture rule): each source keeps its
    best 10 documents by n_chars (ties toward crawl order / min id).
    One shuffle on the domain column, per-domain rank window — no
    global sort; output is cap x n_domains rows at every sf."""
    from mission_data_pipeline_spark.operators.sampling import domain_cap

    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "source", "n_chars")
    out = domain_cap(docs, cap=10, quality_col="n_chars")
    return out.select(
        "doc_id", "source", "n_chars", "domain_rank"
    ).orderBy("source", "domain_rank")


_q(
    "curation_domain_cap",
    Query(
        _domain_cap_spark,
        """
        SELECT doc_id, source, n_chars, domain_rank FROM (
          SELECT doc_id, source, n_chars,
                 CAST(ROW_NUMBER() OVER (PARTITION BY source
                                         ORDER BY n_chars DESC, doc_id)
                   AS INT) AS domain_rank
          FROM documents) t
        WHERE domain_rank <= 10
        ORDER BY source, domain_rank
        """,
        "X-curation",
        "per-domain cap (RefinedWeb anti-monoculture): each source "
        "keeps its 10 best docs by length, ties toward crawl order — "
        "one domain-keyed shuffle + per-domain rank window, no global "
        "sort; the map-side gate against mega-domain dominance",
    ),
)


def _budget_select_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked token-budget selection (operators/sampling.py
    budget_select — FineWeb-Edu-style "take the best docs until the
    training budget is full"): docs ordered by (stopword count DESC,
    doc_id) are kept while the running word total stays within 1/5 of
    the corpus's words. The running sum is a DISTRIBUTED prefix sum
    (range partition + per-partition totals + broadcast offsets +
    partition-local windows) — never an unpartitioned window; the kept
    set is layout-invariant because the order is total."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.sampling import budget_select
    from mission_data_pipeline_spark.operators.text import GOPHER_STOPWORDS

    register_views(spark, sf_dir)
    toks = F.filter(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
        lambda x: F.length(x) > 0,
    )
    staged = (
        spark.table("documents")
        .select("doc_id", toks.alias("__t"))
        .filter(F.size("__t") > 0)
    )
    sig = staged.select(
        "doc_id",
        F.size(
            F.array_intersect(
                "__t", F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
            )
        ).cast("long").alias("n_stopwords"),
        F.size("__t").cast("long").alias("n_words"),
    )
    budget = sig.agg(F.sum("n_words")).first()[0] // 5
    out = budget_select(
        sig,
        budget=budget,
        weight_col="n_words",
        quality_col="n_stopwords",
        num_partitions=8,
    )
    return out.select(
        "doc_id", "n_stopwords", "n_words", "cum_weight"
    ).orderBy("doc_id")


_q(
    "curation_token_budget_select",
    Query(
        _budget_select_spark,
        r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(lower(text)), '\s+'),
                             x -> length(x) > 0) AS toks
          FROM documents
        ), s AS (
          SELECT doc_id,
                 CAST(len(list_intersect(toks,
                      ['the','be','to','of','and','that','have','with']))
                   AS BIGINT) AS n_stopwords,
                 CAST(len(toks) AS BIGINT) AS n_words
          FROM t WHERE len(toks) > 0
        ), b AS (
          SELECT CAST(SUM(n_words) // 5 AS BIGINT) AS budget FROM s
        ), c AS (
          SELECT doc_id, n_stopwords, n_words,
                 CAST(SUM(n_words) OVER (ORDER BY n_stopwords DESC, doc_id)
                   AS BIGINT) AS cum_weight
          FROM s
        )
        SELECT doc_id, n_stopwords, n_words, cum_weight
        FROM c, b WHERE cum_weight <= budget
        ORDER BY doc_id
        """,
        "X-curation",
        "token-budget selection (FineWeb-Edu shape): keep the highest-"
        "quality docs until 1/5 of the corpus's words are spent — "
        "DISTRIBUTED prefix sum (range partition, per-partition totals "
        "to the driver, broadcast offsets, partition-local windows) "
        "instead of the single-task unpartitioned running-sum window; "
        "kept set layout-invariant under a total order",
    ),
)


def _quality_dedup_url_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup over STRING ids (round 10, ADVICE r09): the
    generic id_col contract — duplicate chains of canonical URLs keep
    the longest member, ties toward the lexicographically smallest URL
    (zero-padded so lexical = numeric order). Pins the two-partial-agg
    representative selection (no numeric-negation tie-break) in the
    driver gate."""
    from mission_data_pipeline_spark.operators.dedup import quality_dedup

    register_views(spark, sf_dir)
    docs = spark.sql(
        """
        SELECT CONCAT('url-', LPAD(CAST(doc_id AS STRING), 4, '0')) AS url,
               n_chars
        FROM documents WHERE doc_id < 40
        """
    )
    pairs = spark.sql(
        """
        SELECT CONCAT('url-', LPAD(CAST(doc_id AS STRING), 4, '0')) AS doc_a,
               CONCAT('url-', LPAD(CAST(doc_id + 1 AS STRING), 4, '0'))
                 AS doc_b
        FROM documents WHERE doc_id < 39 AND doc_id % 4 != 3
        """
    )
    out = quality_dedup(
        docs, pairs, quality_col="n_chars", id_col="url",
        id_a="doc_a", id_b="doc_b",
    )
    return out.select("url", "n_chars").orderBy("url")


_q(
    "curation_quality_dedup_url",
    Query(
        _quality_dedup_url_spark,
        """
        WITH RECURSIVE docs2 AS (
          SELECT 'url-' || LPAD(CAST(doc_id AS VARCHAR), 4, '0') AS url,
                 n_chars
          FROM documents WHERE doc_id < 40
        ),
        pairs AS (
          SELECT 'url-' || LPAD(CAST(doc_id AS VARCHAR), 4, '0') AS doc_a,
                 'url-' || LPAD(CAST(doc_id + 1 AS VARCHAR), 4, '0') AS doc_b
          FROM documents WHERE doc_id < 39 AND doc_id % 4 != 3
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
                                      ORDER BY d.n_chars DESC, c.node) AS rn
            FROM comp c JOIN docs2 d ON d.url = c.node) t
          WHERE rn = 1
        ),
        losers AS (
          SELECT c.node AS url
          FROM comp c JOIN best b ON c.component_id = b.component_id
          WHERE c.node != b.keep_id
        )
        SELECT d.url, d.n_chars FROM docs2 d
        WHERE d.url NOT IN (SELECT url FROM losers)
        ORDER BY d.url
        """,
        "X2,X-curation",
        "quality-aware dedup with STRING ids (generic id_col contract): "
        "URL chains keep the longest member, ties toward the smallest "
        "URL — pins the two-partial-agg representative selection "
        "(max quality then min id among maximal rows; no numeric "
        "negation) against a recursive-CTE closure + argmax oracle",
    ),
)


def _bloom_decontaminate_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination (operators/text.py
    bloom_decontaminate) with the EMBEDDED exact-overlap verification
    the sketch queries carry: docs with doc_id % 20 == 0 act as the
    held-out eval set folded into a 256 Ki-bit / 2-hash Bloom filter
    (sized so the one-sided error is actually EXERCISED at gate scale —
    a handful of false-positive grams at sf0.01, rising with sf); the
    corpus side explodes distinct grams into codegen probes whose only
    exchange is per-doc flagged counts (the gram table never shuffles;
    3.0x faster / 139x less shuffle than the exact join at 5M docs —
    BASELINE.md round 10), joined
    here against the exact join-based decontaminate so the one-sided
    error is visible in-query (``fp_grams >= 0`` row-by-row; the filter
    can only over-flag, never miss). Filter size is bounded by the
    BENCHMARK, which is constant-sized in production — the sf-scaled
    "benchmark" here is a fixture artifact, so the false-positive rate
    grows with sf while correctness stays exact (both engines replay
    the same seeded-md5 probes)."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.text import (
        bloom_decontaminate,
        decontaminate,
    )

    register_views(spark, sf_dir)
    docs = spark.table("documents")
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    bloom = bloom_decontaminate(
        corpus, bench, n=8, m_bits=1 << 18, k=2
    ).select("doc_id", "n_bloom_grams", "bloom_contaminated")
    exact = decontaminate(corpus, bench, n=8).select(
        "doc_id", F.col("n_contaminated_grams").alias("n_exact_grams")
    )
    return (
        bloom.join(exact, "doc_id")
        .select(
            "doc_id",
            "n_bloom_grams",
            "bloom_contaminated",
            "n_exact_grams",
            (F.col("n_bloom_grams") - F.col("n_exact_grams")).alias("fp_grams"),
        )
        .orderBy("doc_id")
    )


_q(
    "curation_bloom_decontaminate",
    Query(
        _bloom_decontaminate_spark,
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
        positions AS (
          SELECT DISTINCT
            CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || gram), 1, 8))
              AS BIGINT) % 262144 AS pos
          FROM bench, UNNEST([1, 2]) AS u(j)
        ),
        corpus AS (
          SELECT doc_id, gram FROM grams WHERE doc_id % 20 != 0
        ),
        probes AS (
          SELECT doc_id, gram,
            CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || gram), 1, 8))
              AS BIGINT) % 262144 AS pos
          FROM corpus, UNNEST([1, 2]) AS u(j)
        ),
        gram_hits AS (
          SELECT p.doc_id, p.gram
          FROM probes p JOIN positions s ON p.pos = s.pos
          GROUP BY p.doc_id, p.gram
          HAVING COUNT(*) = 2
        ),
        bloom AS (
          SELECT doc_id, COUNT(*) AS nb FROM gram_hits GROUP BY doc_id
        ),
        exact AS (
          SELECT g.doc_id, COUNT(*) AS ne
          FROM corpus g JOIN bench b ON g.gram = b.gram
          GROUP BY g.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(bl.nb, 0) AS BIGINT) AS n_bloom_grams,
               COALESCE(bl.nb, 0) > 0 AS bloom_contaminated,
               CAST(COALESCE(ex.ne, 0) AS BIGINT) AS n_exact_grams,
               CAST(COALESCE(bl.nb, 0) - COALESCE(ex.ne, 0) AS BIGINT)
                 AS fp_grams
        FROM documents d
        LEFT JOIN bloom bl ON d.doc_id = bl.doc_id
        LEFT JOIN exact ex ON d.doc_id = ex.doc_id
        WHERE d.doc_id % 20 != 0
        ORDER BY d.doc_id
        """,
        "X-curation",
        "Bloom-filter decontamination (Dolma/RedPajama shape): the "
        "benchmark folds into a broadcast 256 Ki-bit / 2-hash bitset so "
        "the corpus gate is codegen probes over exploded distinct "
        "grams whose only exchange is per-doc flagged counts (the gram "
        "table never shuffles) — with the exact join-based "
        "overlap joined in so the one-sided error (fp_grams >= 0, "
        "never a miss) is verified row-by-row in-query",
    ),
)


def _unimax_sample_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax language-balanced sampling (operators/sampling.py
    unimax_sample, Chung et al. 2023): a budget of 4/5 of the corpus is
    water-filled across languages at an epoch cap of 1 — low-resource
    languages saturate (keep everything), the over-represented language
    is downsampled to the shared waterline. Allocation is closed-form
    integer arithmetic over one bounded per-language count collect; the
    oracle replays the same water-filling with prefix-sum windows over
    the (tiny) language table. Selection is a seeded-hash rank per
    language — layout-invariant membership."""
    from mission_data_pipeline_spark.operators.sampling import unimax_sample

    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "lang")
    budget = docs.count() * 4 // 5
    out = unimax_sample(docs, budget=budget, seed=5)
    return out.select(
        "doc_id", "lang", "lang_rank", "lang_alloc"
    ).orderBy("doc_id")


_q(
    "curation_unimax_sample",
    Query(
        _unimax_sample_spark,
        """
        WITH n AS (
          -- NULL is not a language: the engine drops unlabeled rows
          -- BEFORE allocation (unimax_sample's equi-join exclusion), so
          -- the NULL group must not participate in the water-filling.
          SELECT lang, COUNT(*) AS cnt FROM documents
          WHERE lang IS NOT NULL GROUP BY lang
        ),
        -- budget matches the Spark query's docs.count() * 4 // 5, which
        -- counts ALL rows (including NULL-lang) — only the allocation
        -- excludes them.
        tot AS (SELECT (COUNT(*) * 4) // 5 AS b FROM documents),
        ord AS (
          SELECT lang, cnt AS cap,
                 ROW_NUMBER() OVER (ORDER BY cnt, lang) AS i,
                 SUM(cnt) OVER (ORDER BY cnt, lang
                                ROWS UNBOUNDED PRECEDING) AS pfx,
                 COUNT(*) OVER () AS nl
          FROM n
        ),
        sat AS (
          SELECT *,
                 (cap * (nl - i + 1) <= (SELECT b FROM tot) - (pfx - cap))
                   AS saturated
          FROM ord
        ),
        agg AS (
          SELECT COALESCE(SUM(CASE WHEN saturated THEN cap ELSE 0 END), 0)
                   AS ps,
                 COUNT(*) FILTER (WHERE saturated) AS s,
                 MAX(nl) AS nl
          FROM sat
        ),
        alloc AS (
          SELECT o.lang,
                 CASE WHEN o.saturated THEN o.cap
                      ELSE ((SELECT b FROM tot) - a.ps) // (a.nl - a.s)
                 END AS lang_alloc
          FROM sat o, agg a
        ),
        ranked AS (
          SELECT doc_id, lang,
                 ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY CAST(('0x' || substr(
                       md5('5|' || CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT), doc_id
                 ) AS lang_rank
          FROM documents
        )
        SELECT r.doc_id, r.lang,
               CAST(r.lang_rank AS INT) AS lang_rank,
               CAST(al.lang_alloc AS BIGINT) AS lang_alloc
        FROM ranked r JOIN alloc al ON r.lang = al.lang
        WHERE r.lang_rank <= al.lang_alloc
        ORDER BY r.doc_id
        """,
        "X-curation",
        "UniMax language-balanced sampling: closed-form integer water-"
        "filling of a 4/5-corpus budget across languages at a 1-epoch "
        "cap (low-resource languages saturate, the dominant one is "
        "downsampled to the waterline) + seeded-hash per-language rank "
        "selection — one bounded per-language collect, one broadcast, "
        "one lang-keyed window; membership layout-invariant",
    ),
)


# ---------------------------------------------------------------------------
# Round 11: HTML→text extraction (the missing WARC-path stage)
# ---------------------------------------------------------------------------


def _html_extract_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML→text boilerplate removal (operators/html.py
    extract_html_text, VERDICT r10 item 1): each document is rendered
    into a full synthetic page — nav bar, heading, its text as
    paragraphs, a metadata table, an inline script, a link-only
    footer — and the jusText-lite extractor must recover exactly the
    content lines (>=5 words, link density <= 0.33), dropping the nav/
    footer/script/table boilerplate. The synthesis happens IN-QUERY on
    both engines so the oracle replays byte-identical inputs; the
    extraction is the shared Java∩RE2 rule table, zero Python UDFs."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.html import extract_html_text

    register_views(spark, sf_dir)
    doc = spark.table("documents").select(
        "doc_id", _synth_html_col().alias("html")
    )
    out = extract_html_text(doc, "html", out_col="text", diagnostics=True)
    return out.select(
        "doc_id", "text", "n_lines_kept", "n_lines_total"
    ).orderBy("doc_id")


_HTML_PREFIX = (
    "<html><head><title>Synthetic</title><style>p{margin:0}</style></head>"
    '<body><nav><a href="/">Home</a> <a href="/about">About</a> '
    '<a href="/contact">Contact</a></nav><h1>Document '
)
_HTML_SUFFIX = (
    '<footer><a href="/terms">Terms &amp; conditions apply to all '
    "visitors</a></footer></body></html>"
)


def _synth_html_col():
    """Synthetic full-page HTML Column over ``documents`` rows (nav bar,
    heading, the text as ``. ``-split paragraphs, a metadata table, an
    inline script, a link-only footer) — shared by curation_html_extract
    and the shard-build capstone so both replay byte-identical pages."""
    from pyspark.sql import functions as F

    return F.concat(
        F.lit(_HTML_PREFIX),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.replace(F.col("text"), F.lit(". "), F.lit(".</p><p>")),
        F.lit("</p><table><tr><th>lang</th><th>source</th></tr><tr><td>"),
        F.coalesce(F.col("lang"), F.lit("")),
        F.lit("</td><td>"),
        F.coalesce(F.col("source"), F.lit("")),
        F.lit('</td></tr></table><script>var a = 1 < 2; track("x");</script>'),
        F.lit(_HTML_SUFFIX),
    )


def _synth_html_sql() -> str:
    """DuckDB twin of :func:`_synth_html_col` (same byte output)."""

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    return (
        f"{q(_HTML_PREFIX)} || CAST(doc_id AS VARCHAR) || '</h1><p>' || "
        "replace(text, '. ', '.</p><p>') || "
        "'</p><table><tr><th>lang</th><th>source</th></tr><tr><td>' || "
        "coalesce(lang, '') || '</td><td>' || coalesce(source, '') || "
        "'</td></tr></table><script>var a = 1 < 2; track(\"x\");</script>' || "
        f"{q(_HTML_SUFFIX)}"
    )


def _html_extract_oracle() -> str:
    from mission_data_pipeline_spark.operators.html import duckdb_extract_sql

    p = duckdb_extract_sql("html")
    synth = _synth_html_sql()
    return f"""
        WITH src AS (
          SELECT doc_id, {synth} AS html FROM documents
        ),
        st AS (SELECT doc_id, {p["structs"]} AS s FROM src)
        SELECT doc_id,
               {p["text"].format(col="s")} AS text,
               {p["n_lines_kept"].format(col="s")} AS n_lines_kept,
               {p["n_lines_total"].format(col="s")} AS n_lines_total
        FROM st
        ORDER BY doc_id
        """


_q(
    "curation_html_extract",
    Query(
        _html_extract_spark,
        _html_extract_oracle(),
        "X-curation,X4",
        "HTML→text extraction with jusText-lite boilerplate removal "
        "(comment/script/style strip, anchor-sentinel link density, "
        "block-tag line segmentation, bounded entity decode, per-line "
        "word-count + link-density gates) — the WARC crawl path's "
        "missing stage, as one shared Java∩RE2 rule table both engines "
        "replay; pure per-row JVM expressions, zero shuffles",
    ),
)


# ---------------------------------------------------------------------------
# Round 11: text→vector bridge + ANN over derived vectors
# ---------------------------------------------------------------------------


def _text_embed_ann_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end semantic retrieval with NO external embedding model
    (operators/text.py embed_text_hashed, VERDICT r10 item 3):
    documents → signed hashed TF-IDF folded to dense dim-64 unit
    vectors (md5 bucket/sign hashes, DECIMAL collision sums — fully
    SQL-replayable) → brute-force cosine top-10 for the first five
    docs as queries. One plan: the vector derivation composes straight
    into the broadcast-queries cosine scan (same at-scale shape as
    x3_cosine_topk_bruteforce — the corpus is scanned once, map-side,
    only scored rows reach the per-query top-k window)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from mission_data_pipeline_spark.functions.vectors import cosine_similarity
    from mission_data_pipeline_spark.operators.text import embed_text_hashed

    register_views(spark, sf_dir)
    docs = spark.table("documents").filter(F.col("doc_id") < 200)
    vecs = embed_text_hashed(docs, dim=64, seed=0)
    q = vecs.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        vecs.crossJoin(broadcast(q))
        .filter(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            "doc_id",
            F.round(cosine_similarity(F.col("qv"), F.col("v")), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("query_id", "doc_id", "cosine", "rnk")
        .orderBy("query_id", "rnk")
    )


_q(
    "x3_text_embed_ann",
    Query(
        _text_embed_ann_spark,
        r"""
        WITH toks AS (
          SELECT doc_id, t AS term
          FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
                FROM documents WHERE doc_id < 200),
               UNNEST(ts) AS u(t)
          WHERE length(t) > 0
        ),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        ),
        nd AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents
          WHERE doc_id < 200
        ),
        dfreq AS (
          SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
          FROM tf GROUP BY term
        ),
        sparse AS (
          SELECT tf.doc_id,
                 CAST(('0x' || substr(md5('0|' || tf.term), 1, 12)) AS BIGINT)
                   % 64 AS bucket,
                 ROUND(CAST(CAST(SUM(CAST(
                   (CASE WHEN CAST(('0x' || substr(md5('s|0|' || tf.term), 1, 12))
                              AS BIGINT) % 2 = 0
                         THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)
                   * ROUND(CAST(tf.tf AS DOUBLE)
                     * (ln((n_docs + CAST(1.0 AS DOUBLE))
                           / (df + CAST(1.0 AS DOUBLE))) + CAST(1.0 AS DOUBLE)),
                     9) AS DECIMAL(20,9))) AS STRING) AS DOUBLE), 6) AS weight
          FROM tf JOIN dfreq USING (term) CROSS JOIN nd
          GROUP BY tf.doc_id, bucket
        ),
        entries AS (
          SELECT doc_id, list(struct_pack(b := bucket, w := weight)) AS es
          FROM sparse GROUP BY doc_id
        ),
        dense0 AS (
          SELECT doc_id,
                 list_transform(range(0, 64), i ->
                   coalesce(list_sum(list_transform(
                     list_filter(es, e -> e.b = i), e -> e.w)),
                     CAST(0.0 AS DOUBLE))) AS v0
          FROM entries
        ),
        dense AS (
          SELECT doc_id,
                 CASE WHEN sqrt(list_sum(list_transform(v0, x -> x*x))) > 0
                      THEN list_transform(v0, x -> ROUND(
                        x / sqrt(list_sum(list_transform(v0, y -> y*y))), 9))
                      ELSE v0 END AS v
          FROM dense0
        ),
        q AS (SELECT doc_id AS query_id, v AS qv FROM dense WHERE doc_id < 5),
        scored AS (
          SELECT q.query_id, d.doc_id,
                 ROUND(list_cosine_similarity(q.qv, d.v), 6) AS cosine
          FROM dense d CROSS JOIN q
          WHERE d.doc_id != q.query_id
        ),
        ranked AS (
          SELECT query_id, doc_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, doc_id) AS rnk
          FROM scored
        )
        SELECT query_id, doc_id, cosine, rnk FROM ranked
        WHERE rnk <= 10
        ORDER BY query_id, rnk
        """,
        "X3,X4",
        "text→vector bridge + ANN: signed hashed TF-IDF folded to dense "
        "dim-64 unit vectors entirely in-engine (md5 bucket/sign hashes, "
        "DECIMAL collision sums, staged L2 norm — zero model deps), then "
        "brute-force cosine top-10 with broadcast queries; the full "
        "documents→vectors→retrieval path as ONE declarative plan",
    ),
)


# ---------------------------------------------------------------------------
# Round 11: curation capstone — the full shard-build production path as
# ONE driver-checked query (VERDICT r10 item 5)
# ---------------------------------------------------------------------------


def _shard_build_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-shard build the examples compose, as one
    oracle-checked query: synthetic crawl pages (the shared
    curation_html_extract synthesis) → HTML→text boilerplate removal
    (operators/html.py) → Gopher word-level quality gate
    (operators/text.py) → MinHash-LSH near-dedup (operators/dedup.py)
    → UniMax language-balanced budget selection (operators/sampling.py)
    → per-language token-budget packing (operators/packing.py) → JSONL
    shards partitioned by (lang, pack_id) + a per-language manifest.

    The returned accounting is computed FROM THE EMITTED SHARD FILES
    (read back, grouped per shard) — doc counts, token totals, and an
    md5 membership digest per pack — while the DuckDB oracle derives
    the same table from the SOURCE ``documents`` rows by replaying
    every stage in SQL, so a drop/dup/misroute anywhere in the path
    (including the sink) breaks the match.

    Scale shape: extraction + gate are zero-shuffle map-side column
    chains; dedup shuffles band keys (never pairs); UniMax is one
    bounded per-language collect + broadcast + lang-keyed window;
    packing is a per-shard window (no global sort); the survivor
    materialization is the natural stage barrier a real shard build
    checkpoints anyway, and its footer row count sizes the budget with
    no extra job."""
    import json

    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.dedup import near_dedup_minhash
    from mission_data_pipeline_spark.operators.html import extract_html_text
    from mission_data_pipeline_spark.operators.packing import pack_token_budget
    from mission_data_pipeline_spark.operators.sampling import unimax_sample
    from mission_data_pipeline_spark.operators.text import (
        gopher_quality_signals,
    )

    register_views(spark, sf_dir)
    page = spark.table("documents").select(
        "doc_id", "lang", _synth_html_col().alias("html")
    )
    ext = extract_html_text(page, "html", out_col="text").select(
        "doc_id", "lang", "text"
    )
    sig = gopher_quality_signals(
        ext,
        min_words=10,
        min_mean_word_len=3.0,
        max_mean_word_len=10.0,
        max_symbol_ratio=0.1,
        min_alpha_frac=0.8,
        min_stopwords=1,
        keep_text=True,
        keep_cols=["lang"],
    )
    kept = sig.filter(F.col("gopher_pass")).select(
        "doc_id", "lang", "text", F.col("n_words").alias("n_tokens")
    )

    # Stage barriers: materialize after the gate and after dedup — the
    # extraction/gate column chain is expensive per row and feeds MANY
    # downstream jobs (shingle + verify branches, the budget count, the
    # pack write); without the checkpoint Spark recomputes it per job.
    # A production shard build checkpoints exactly here too (restart
    # points), and the parquet footer then sizes the UniMax budget for
    # free.
    base = _scratch_dir("shard_build_e2e")
    kept_path = os.path.join(base, "gated")
    kept.write.parquet(kept_path)
    keptd = spark.read.parquet(kept_path)
    surv = near_dedup_minhash(
        keptd, n=2, num_hashes=8, bands=4, threshold=0.6
    )
    surv_path = os.path.join(base, "survivors")
    surv.write.parquet(surv_path)
    budget = parquet_row_count(surv_path) * 4 // 5
    survd = spark.read.parquet(surv_path)

    sel = unimax_sample(
        survd.select("doc_id", "lang"), budget=budget, seed=5
    )
    chosen = survd.join(sel.select("doc_id"), "doc_id")
    packed = pack_token_budget(
        chosen, 400, order_cols=["doc_id"], shard_cols=["lang"]
    )
    shards = os.path.join(base, "shards")
    (
        packed.select("doc_id", "n_tokens", "text", "lang", "pack_id")
        .write.partitionBy("lang", "pack_id")
        .json(shards)
    )

    back = spark.read.json(shards)
    acct = (
        back.groupBy("lang", F.col("pack_id").cast("long").alias("pack_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list("doc_id")),
                        lambda x: x.cast("string"),
                    ),
                ).cast("binary")
            ).alias("ids_digest"),
        )
    )
    # Manifest from the emitted shards: one row per language (bounded
    # collect — #languages, not #packs), written next to the shard tree.
    per_lang = (
        acct.groupBy("lang")
        .agg(
            F.count("*").alias("n_packs"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("total_tokens").alias("total_tokens"),
        )
        .collect()
    )
    manifest = {
        "format": "jsonl-shards/v1",
        "shards_dir": "shards",
        "partitioning": ["lang", "pack_id"],
        "pack_budget_tokens": 400,
        "unimax_budget_docs": budget,
        "languages": {
            r["lang"]: {
                "n_packs": int(r["n_packs"]),
                "n_docs": int(r["n_docs"]),
                "total_tokens": int(r["total_tokens"]),
            }
            for r in per_lang
        },
        "n_docs": int(sum(r["n_docs"] for r in per_lang)),
        "total_tokens": int(sum(r["total_tokens"] for r in per_lang)),
    }
    with open(os.path.join(base, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)

    return acct.select(
        "lang", "pack_id", "n_docs", "total_tokens", "ids_digest"
    ).orderBy("lang", "pack_id")


def _shard_build_oracle() -> str:
    from mission_data_pipeline_spark.operators.html import duckdb_extract_sql

    p = duckdb_extract_sql("html")
    synth = _synth_html_sql()
    return f"""
        WITH src AS (
          SELECT doc_id, lang, {synth} AS html FROM documents
        ),
        st AS (SELECT doc_id, lang, {p["structs"]} AS s FROM src),
        ext AS (
          SELECT doc_id, lang, {p["text"].format(col="s")} AS text FROM st
        ),
        t AS (
          SELECT doc_id, lang, text,
                 list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             x -> length(x) > 0) AS toks
          FROM ext
        ),
        sig AS (
          SELECT doc_id, lang, text, toks,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 ROUND(CAST(list_sum(list_transform(toks, x -> length(x)))
                            AS DOUBLE) / len(toks), 6) AS mean_word_len,
                 ROUND((CAST(length(text)
                        - length(replace(text, '#', '')) AS DOUBLE)
                        + (length(text)
                           - length(replace(text, '...', ''))) / 3.0)
                       / len(toks), 6) AS symbol_ratio,
                 ROUND(CAST(len(list_filter(toks,
                        x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
                       / len(toks), 6) AS alpha_frac,
                 CAST(len(list_intersect(toks,
                      ['the','be','to','of','and','that','have','with']))
                   AS BIGINT) AS n_stopwords
          FROM t WHERE len(toks) > 0
        ),
        kept AS (
          SELECT doc_id, lang, text, toks, n_tokens FROM sig
          WHERE n_tokens >= 10 AND n_tokens <= 100000
            AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
            AND symbol_ratio <= 0.1
            AND alpha_frac >= 0.8
            AND n_stopwords >= 1
        ),
        grams0 AS (
          SELECT DISTINCT doc_id,
                 array_to_string(list_slice(toks, CAST(i AS INT) + 1,
                                            CAST(i AS INT) + 2), ' ') AS gram
          FROM kept,
               UNNEST(range(0, greatest(len(toks) - 2, 0) + 1)) AS tt(i)
        ),
        g AS (SELECT * FROM grams0 WHERE length(gram) > 0),
        hashes AS (
          SELECT g.doc_id, s.seed,
                 MIN(CAST(('0x' || SUBSTR(MD5(CAST(s.seed AS VARCHAR) || ':'
                       || g.gram), 1, 12)) AS BIGINT)) AS minhash
          FROM g CROSS JOIN (SELECT UNNEST(range(0, 8)) AS seed) s
          GROUP BY g.doc_id, s.seed
        ),
        banded AS (
          SELECT doc_id, seed % 4 AS band,
                 array_to_string(list_sort(list(CAST(minhash AS VARCHAR))),
                                 ',') AS bsig
          FROM hashes GROUP BY doc_id, seed % 4
        ),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
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
        ),
        surv AS (
          SELECT doc_id, lang, n_tokens FROM kept
          WHERE doc_id NOT IN (SELECT doc_id FROM dups)
        ),
        tot AS (SELECT (COUNT(*) * 4) // 5 AS b FROM surv),
        n AS (
          SELECT lang, COUNT(*) AS cnt FROM surv
          WHERE lang IS NOT NULL GROUP BY lang
        ),
        ord AS (
          SELECT lang, cnt AS cap,
                 ROW_NUMBER() OVER (ORDER BY cnt, lang) AS i,
                 SUM(cnt) OVER (ORDER BY cnt, lang
                                ROWS UNBOUNDED PRECEDING) AS pfx,
                 COUNT(*) OVER () AS nl
          FROM n
        ),
        sat AS (
          SELECT *,
                 (cap * (nl - i + 1) <= (SELECT b FROM tot) - (pfx - cap))
                   AS saturated
          FROM ord
        ),
        agg AS (
          SELECT COALESCE(SUM(CASE WHEN saturated THEN cap ELSE 0 END), 0)
                   AS ps,
                 COUNT(*) FILTER (WHERE saturated) AS s,
                 MAX(nl) AS nl
          FROM sat
        ),
        alloc AS (
          SELECT o.lang,
                 CASE WHEN o.saturated THEN o.cap
                      ELSE ((SELECT b FROM tot) - a.ps) // (a.nl - a.s)
                 END AS lang_alloc
          FROM sat o, agg a
        ),
        ranked AS (
          SELECT doc_id, lang, n_tokens,
                 ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY CAST(('0x' || substr(
                       md5('5|' || CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT), doc_id
                 ) AS lang_rank
          FROM surv
        ),
        chosen AS (
          SELECT r.doc_id, r.lang, r.n_tokens
          FROM ranked r JOIN alloc al ON r.lang = al.lang
          WHERE r.lang_rank <= al.lang_alloc
        ),
        cum AS (
          SELECT doc_id, lang, n_tokens,
                 SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) - n_tokens
                   AS before
          FROM chosen
        )
        SELECT lang, CAST(FLOOR(before / 400) AS BIGINT) AS pack_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               md5(string_agg(CAST(doc_id AS VARCHAR), ','
                              ORDER BY doc_id)) AS ids_digest
        FROM cum
        GROUP BY lang, FLOOR(before / 400)
        ORDER BY lang, pack_id
        """


_q(
    "curation_shard_build_e2e",
    Query(
        _shard_build_spark,
        _shard_build_oracle(),
        "X-curation,X1,X2,X4,L",
        "the curation capstone: crawl pages → HTML→text extraction → "
        "Gopher gate → MinHash-LSH near-dedup → UniMax budget selection "
        "→ per-language token packing → partitioned JSONL shards + "
        "manifest, accounted FROM THE EMITTED FILES (per-pack doc "
        "counts, token totals, md5 membership digests) against a "
        "source-derived SQL replay of the whole path — the one query "
        "that breaks if any stage or the sink drops, dups, or misroutes "
        "a document",
    ),
)


# ---------------------------------------------------------------------------
# Driver-check ordering (STALEST-FIRST, regenerated per round from the
# CORRECTNESS_r0*.json history). The driver verifies the first ~50
# QUERIES entries per round. Round 11: slots 1-5 are the round-11
# additions/changes (the shard-build capstone, HTML→text extraction,
# the text→vector ANN bridge, the NULL-lang-fixed UniMax oracle, the
# single-featurize streaming-ingest compacted index); slots 6-50 are
# the complete r06 staleness tail — after the r11 driver window no
# query's most recent driver check predates r07.
# ---------------------------------------------------------------------------

_CHECK_FIRST = [
    "curation_shard_build_e2e",
    "curation_html_extract",
    "x3_text_embed_ann",
    "curation_unimax_sample",
    "x2_near_dedup_compacted_index",
    "curation_c4_signals",
    "curation_decontaminate",
    "curation_leakage_safe_split",
    "curation_quality_tiers",
    "curation_token_packing",
    "g_pagerank",
    "j_aqe_skew_split",
    "j_dynamic_partition_pruning",
    "j_runtime_bloom_filter",
    "l_compact_roundtrip",
    "l_schema_evolution_merge",
    "q3_bucketed_colocated",
    "q5_nation_revenue",
    "s1_ccsds_datasource_scan",
    "s1_ccsds_streaming_tail",
    "s_corrupt_file_skip",
    "w4_sessionization",
    "w_lttb_downsample",
    "w_resample_grid_gapfill",
    "x2_canonical_per_cluster",
    "x2_duplicate_components",
    "x2_duplicate_span_fraction",
    "x2_lsh_near_dedup_survivors",
    "x2_semantic_dedup",
    "x3_ivf_disk_index_topk",
    "x4_bigram_logprob",
    "x4_bm25_relevance",
    "x4_bpe_corpus_budget",
    "x4_bpe_token_stats",
    "x4_bpe_vocab_freq",
    "x4_heldout_backoff_logprob",
    "x4_lang_id_confusion",
    "x4_linear_probe_fit",
    "x4_repetition_signals",
    "x4_tfidf_sparse",
    "x4_top_terms",
    "x4_unigram_logprob",
    "x4_zipf_slope",
    "x5_avi_meta_decode",
    "x5_image_pixel_stats",
    "x5_image_resize",
    "x5_jpeg_pixel_stats",
    "x5_multimodal_features",
    "x5_video_frame_stats",
    "x6_variant_json_shred",
]

QUERIES = {
    **{name: QUERIES[name] for name in _CHECK_FIRST},
    **{name: q for name, q in QUERIES.items() if name not in _CHECK_FIRST},
}
