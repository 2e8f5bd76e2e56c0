"""JSONL sink — shard-partitioned corpus export.

The write-side mirror of ``sources/jsonl.py``: LLM curation pipelines
emit their final corpus as JSONL shards (optionally compressed, one
directory per split/language). Spark's JSON writer is already
line-per-object; this wrapper pins the two choices that matter at
100 TB: explicit shard count (downstream tokenizer jobs want uniform
shard sizes, not whatever the last shuffle produced) and partitioned
layout for split/language routing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_jsonl(
    df: DataFrame,
    out_dir: str,
    *,
    partition_by: list[str] | None = None,
    n_shards: int | None = None,
    compression: str | None = None,
    overwrite: bool = True,
) -> None:
    """Write ``df`` as JSONL shards under ``out_dir``.

    ``n_shards`` repartitions before the write — uniform shard sizes
    for downstream consumers; ``partition_by`` routes rows into
    subdirectories (e.g. ``lang=en/``); ``compression`` is passed to
    the writer (``gzip``/``zstd``/``snappy``).
    """
    if n_shards is not None:
        df = df.repartition(n_shards)
    writer = df.write.mode("overwrite" if overwrite else "append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(out_dir)
