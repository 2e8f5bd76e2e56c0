"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full declared operator library
(``mission_data_pipeline_spark/plans/queries.py``) — one entry per
implemented operator from SURVEY.md §2 plus the X-extension ops, each
paired with a DuckDB oracle unless genuinely non-SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mission_data_pipeline_spark.plans.queries import QUERIES


def _pin_session_conf(spark: SparkSession) -> None:
    """Conf the query library assumes, applied to whatever session the
    driver hands us: nanos-as-long for the TIMESTAMP(NANOS) events
    flavor, and UTC so timestamp<->string rendering matches the
    UTC-assuming DuckDB oracles regardless of host timezone."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Split small-but-expensive compressed text tables finer than the
    # 4 MiB open-cost default allows (per-row tokenize work would run
    # near-serial); inert for >=128 MiB files. Mirrors session.py.
    spark.conf.set("spark.sql.files.openCostInBytes", str(512 * 1024))
    # Python UDTFs evaluate via Arrow batches (vectorized transfer);
    # results are identical either way — mirrors session.py.
    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _pin_session_conf(spark)
    return QUERIES["q1_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(name: str) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _pin_session_conf(spark)
            return QUERIES[name].spark(spark, sf_dir)

        return run

    return {name: _wrap(name) for name in QUERIES}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each query (omitted where non-SQL-expressible)."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
