"""Parquet sinks.

Parity: reference ``src/mdp/plugins/loaders/parquet.py`` (L1 per-parameter
files ``:50-62``, L2 wide ``:64-71``, L3 APID partitioning ``:56-60``,
L4 append ``:73-78``). Differences, by design (SURVEY §7.0):

- per-parameter output is a Hive-partitioned *directory* per name
  (``name=<param>/``) instead of one file per name — the layout Spark,
  DuckDB, and every lakehouse reader partition-prunes natively;
- append is Spark's native ``mode("append")`` (new files), not the
  reference's read-whole-file → concat → rewrite, which is O(file) per
  batch and impossible at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mission_data_pipeline_spark.operators.dataset import to_wide


def write_parquet_per_parameter(
    params: DataFrame,
    out_dir: str,
    *,
    compression: str = "snappy",
    partition_by_apid: bool = False,
    overwrite: bool = True,
) -> None:
    """L1/L3/L4: tidy samples partitioned by parameter name (and APID).

    ``partition_by_apid`` nests ``apid=<n>/`` under each ``name=<p>/``
    (reference emits ``apid=XXXX/`` subdirs, ``parquet.py:56-60``).
    Empty input writes only the directory marker — the reference skips
    empty parameters, and partitionBy produces no partition dirs for
    zero rows, so behavior matches.
    """
    cols = ["name"] + (["apid"] if partition_by_apid else [])
    (
        params.write.mode("overwrite" if overwrite else "append")
        .option("compression", compression)
        .partitionBy(*cols)
        .parquet(out_dir)
    )


def write_parquet_wide(
    params: DataFrame,
    out_path: str,
    *,
    compression: str = "snappy",
    overwrite: bool = True,
) -> None:
    """L2: single wide table, one column per parameter, time as a column."""
    (
        to_wide(params)
        .write.mode("overwrite" if overwrite else "append")
        .option("compression", compression)
        .parquet(out_path)
    )


def write_sorted_parquet(
    df: DataFrame,
    out_path: str,
    *,
    sort_cols: list[str],
    n_files: int | None = None,
    compression: str = "snappy",
    overwrite: bool = True,
) -> None:
    """Zone-map-friendly export: range-partition by ``sort_cols`` and
    sort within each file.

    Parquet readers (Spark, DuckDB, every lakehouse engine) prune row
    groups with column min/max statistics; those statistics only prune
    when values are CLUSTERED. ``repartitionByRange`` gives each output
    file a near-disjoint key range and ``sortWithinPartitions`` orders
    rows inside it, so a range predicate at 100 TB touches a handful of
    files instead of all of them. This is the write-side complement of
    predicate pushdown — pushdown decides WHAT to skip, layout decides
    whether skipping is POSSIBLE.

    ``repartitionByRange`` samples the key distribution, so skewed keys
    still yield balanced files (contrast hash-partitioning, where a hot
    key range concentrates).
    """
    cols = [df[c] for c in sort_cols]
    out = (
        df.repartitionByRange(n_files, *cols)
        if n_files is not None
        else df.repartitionByRange(*cols)
    )
    (
        out.sortWithinPartitions(*sort_cols)
        .write.mode("overwrite" if overwrite else "append")
        .option("compression", compression)
        .parquet(out_path)
    )
