"""JSONL (newline-delimited JSON) document source — LLM-corpus ingest.

JSONL is the interchange format of LLM data pipelines (one document
object per line; Dolma, RedPajama, FineWeb all ship it). Spark's JSON
reader is already line-oriented and distributed; this wrapper adds the
two things a 100 TB ingest needs on top:

- an EXPLICIT schema (schema inference reads the data twice and types
  drift across shards — never acceptable at scale);
- corrupt-line surfacing: bad lines land in ``_corrupt_record`` instead
  of failing the job, and ``jsonl_corrupt_stats`` turns them into a
  per-file quality metric (the skip-don't-crash scan contract).

No counterpart in the reference (CCSDS binary + CSV only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: documents-table shape (TESTDATA.md) as the default corpus schema.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    *,
    schema: T.StructType | str = DOCUMENTS_SCHEMA,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Distributed JSONL scan with an explicit schema.

    PERMISSIVE mode: a malformed line yields a row with every data
    column null and the raw line in ``_corrupt_record``; by default
    corrupt rows are dropped (use :func:`jsonl_corrupt_stats` to count
    them first — silently dropping without measuring is how corpora rot).
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if not keep_corrupt:
        # DROPMALFORMED skips bad lines in the scan itself — no corrupt
        # column materialized, no second pass. Measure first via
        # jsonl_corrupt_stats; dropping without measuring rots corpora.
        return (
            spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
        )
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )


def jsonl_corrupt_stats(spark: SparkSession, path: str, **kwargs) -> DataFrame:
    """(n_rows, n_corrupt, corrupt_frac) for a JSONL path — the ingest
    quality gate to check before dropping bad lines.

    Eager: the aggregate is materialized inside the call (one row) so the
    scan's cache can be released before returning — a long-lived session
    calling this per-shard must not accumulate storage memory.
    """
    # Spark refuses plans that reference ONLY the internal corrupt-record
    # column of a raw JSON scan; caching first is the documented pattern
    # (the gate typically runs on a sample shard, not the full corpus).
    df = read_jsonl(spark, path, keep_corrupt=True, **kwargs).cache()
    try:
        agg = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.col(_CORRUPT)).alias("n_corrupt"),
            (
                F.count(F.col(_CORRUPT)) / F.count(F.lit(1))
            ).alias("corrupt_frac"),
        )
        rows = agg.collect()
        return spark.createDataFrame(rows, agg.schema)
    finally:
        df.unpersist()
