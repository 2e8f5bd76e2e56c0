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

#: Which residue class mod ``_INPUT_SAMPLE_MOD`` the sample keeps.
#: Rotating this per round (scripts/round_gate.sh derives it from the
#: commit count) makes successive sampled gates cover DIFFERENT 1/N
#: subsets, so a defect confined to the fixed excluded 9/10 of a single
#: residue class cannot hide forever (ADVICE r11).
_INPUT_SAMPLE_RESIDUE = 0

#: seed for the sampling hash — fixed, so a sampled run is reproducible
#: across engines and sessions by construction.
_INPUT_SAMPLE_SEED = 11


def set_input_repartition(n: "int | None") -> None:
    """Set (or clear with None) the adversarial input repartitioning."""
    global _INPUT_REPARTITION
    _INPUT_REPARTITION = n


def set_input_sample(mod: "int | None", residue: int = 0) -> None:
    """Set (or clear with None) deterministic 1/mod documents sampling.

    ``residue`` selects which residue class of the seeded hash bucket is
    kept (default 0, the historical subset); any 0 <= residue < mod
    yields an equally deterministic, disjoint subset.
    """
    global _INPUT_SAMPLE_MOD, _INPUT_SAMPLE_RESIDUE
    if mod is not None and mod < 1:
        raise ValueError(f"sample modulus must be >= 1, got {mod}")
    if mod is not None and not (0 <= residue < mod):
        raise ValueError(
            f"sample residue must be in [0, {mod}), got {residue}"
        )
    _INPUT_SAMPLE_MOD = mod
    _INPUT_SAMPLE_RESIDUE = residue if mod is not None else 0


def input_sample_predicate_duckdb() -> "str | None":
    """The DuckDB WHERE predicate matching the current sampling knob
    (None when sampling is off) — check_correctness applies it to its
    ``documents`` view so both engines see the identical subset."""
    if _INPUT_SAMPLE_MOD is None:
        return None
    return (
        f"CAST(('0x' || substr(md5('{_INPUT_SAMPLE_SEED}|' || "
        f"CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) "
        f"% {_INPUT_SAMPLE_MOD} = {_INPUT_SAMPLE_RESIDUE}"
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
    key = (sf_dir, _INPUT_REPARTITION, _INPUT_SAMPLE_MOD, _INPUT_SAMPLE_RESIDUE)
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
                == _INPUT_SAMPLE_RESIDUE
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


