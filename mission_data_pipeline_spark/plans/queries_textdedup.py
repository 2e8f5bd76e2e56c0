"""JSON, text-analysis, dedup and similarity queries in pure shared SQL (X4/X1/X2/X3, X6).

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
    _EV_SPARK,
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

