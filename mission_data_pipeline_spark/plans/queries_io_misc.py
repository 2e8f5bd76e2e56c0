"""Ingest/export round-trips, graph analytics, smoothing, sketches, k-means, TIFF decode, archive ingest.

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
from mission_data_pipeline_spark.plans.queries_window import (  # noqa: F401
    _EV_DUCK,
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
    # One pass over the triangle rows: explode the three corners instead
    # of a 3-way union (1 read instead of 3), aggregate per node ONCE,
    # and truncate — the tiny per-node table then feeds both the top-10
    # branch and the total row, so the wedge join runs exactly once.
    # The total is sum(n_tri) DIV 3 (every triangle contributes exactly
    # 3 corner rows — integer-exact), replacing a second pass over tri.
    from mission_data_pipeline_spark.operators.lineage import query_truncator

    node_counts = query_truncator()(
        tri.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
    )
    pernode = node_counts.orderBy(F.desc("n_tri"), "node").limit(10)
    total = node_counts.agg(
        F.lit(-1).cast("long").alias("node"),
        F.coalesce(
            F.expr("sum(n_tri) div 3").cast("long"), F.lit(0).cast("long")
        ).alias("n_tri"),
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


