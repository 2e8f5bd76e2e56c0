"""Wider TPC-H-shaped surface and TPC-H-derived complex join / subquery shapes.

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
from mission_data_pipeline_spark.plans.queries_operator_api import (  # noqa: F401
    _lsh_oracle_sql,
)
from mission_data_pipeline_spark.plans.queries_textdedup import (  # noqa: F401
    _MINHASH_DUCK,
    _MINHASH_SPARK,
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
    # The cast table feeds ~8 consumers (query collect, exact, LSH and
    # IVF corpus passes, centroid derivation); truncate the INPUT once
    # (session 2 tried checkpointing the 25-row exact RESULT — a loss;
    # the input-side barrier measures a consistent 6-9% win because it
    # also dedups the scan+cast under LSH/IVF/centroids).
    from mission_data_pipeline_spark.operators.lineage import query_truncator

    emb = query_truncator()(emb)
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




def _ann_recall_tie_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain vs TIE-AWARE recall on a planted clone cluster (r13: the
    sfx10 ANN probe read PQ recall 0.505 purely from ADC ties on
    ~100-clone clusters — the gauge itself must be able to separate
    tie ambiguity from real error). Each query vector gets 6 exact
    clones appended to the corpus; the "ANN method" under test is the
    worst-case admissible answer — the SAME tie group ranked with the
    OPPOSITE id tie-break — so plain recall reads 4/5 (one clone
    swapped) while tie-aware recall reads 5/5, deterministically in
    both engines."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.similarity import (
        ann_recall,
        cosine_topk,
    )

    register_views(spark, sf_dir)
    emb = spark.table("embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    base = emb.filter(F.col("vec_id") < 2)
    clones = base.select(
        "vec_id", "embedding",
        F.explode(F.sequence(F.lit(0), F.lit(5))).alias("j"),
    ).select(
        (F.lit(100000) + F.col("vec_id") * 10 + F.col("j")).alias("vec_id"),
        "embedding",
    )
    corpus = emb.unionByName(clones)
    plain = cosine_topk(corpus, base, k=5, round_digits=6)
    tied = cosine_topk(
        corpus, base, k=5, round_digits=6, include_ties=True
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").desc()
    )
    approx = (
        tied.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .select("query_id", "neighbor_id", F.col("_rn").alias("rank"))
    )
    pr = ann_recall(approx, plain, k=5).select(
        "query_id",
        F.col("n_hit").alias("plain_hit"),
        F.round("recall", 6).alias("plain_recall"),
    )
    tr = ann_recall(approx, tied, k=5, tie_aware=True).select(
        "query_id",
        F.col("n_hit").alias("tie_hit"),
        F.round("recall", 6).alias("tie_recall"),
    )
    return pr.join(tr, "query_id").orderBy("query_id")


_q(
    "x3_ann_recall_tie_aware",
    Query(
        _ann_recall_tie_spark,
        """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        base AS (SELECT vec_id, v FROM e WHERE vec_id < 2),
        clones AS (
          SELECT 100000 + b.vec_id * 10 + j.j AS vec_id, b.v
          FROM base b CROSS JOIN (SELECT UNNEST(range(0, 6)) AS j) j
        ),
        corpus AS (
          SELECT vec_id, v FROM e
          UNION ALL SELECT vec_id, v FROM clones
        ),
        q AS (SELECT vec_id AS query_id, v AS qv FROM base),
        scored AS (
          SELECT q.query_id, c.vec_id AS neighbor_id,
                 ROUND(list_cosine_similarity(q.qv, c.v), 6) AS cosine
          FROM corpus c CROSS JOIN q WHERE c.vec_id != q.query_id
        ),
        plain AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS rank
            FROM scored) t WHERE rank <= 5
        ),
        tied AS (
          SELECT query_id, neighbor_id, cosine FROM (
            SELECT query_id, neighbor_id, cosine,
                   RANK() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC) AS rank
            FROM scored) t WHERE rank <= 5
        ),
        approx AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id DESC) AS rank
            FROM tied) t WHERE rank <= 5
        ),
        ph AS (
          SELECT a.query_id, COUNT(*) AS n
          FROM approx a JOIN plain e USING (query_id, neighbor_id)
          GROUP BY a.query_id
        ),
        th AS (
          SELECT a.query_id, COUNT(*) AS n
          FROM approx a JOIN tied e USING (query_id, neighbor_id)
          GROUP BY a.query_id
        ),
        pd AS (SELECT query_id, COUNT(*) AS n_e FROM plain GROUP BY query_id),
        ad AS (SELECT query_id, COUNT(*) AS n_a FROM approx GROUP BY query_id),
        td AS (SELECT query_id, COUNT(*) AS n_t FROM tied GROUP BY query_id)
        SELECT pd.query_id,
               CAST(COALESCE(ph.n, 0) AS BIGINT) AS plain_hit,
               ROUND(CAST(COALESCE(ph.n, 0) AS DOUBLE) / pd.n_e, 6)
                 AS plain_recall,
               CAST(COALESCE(th.n, 0) AS BIGINT) AS tie_hit,
               -- tie-aware denominator (r14): min(k, approx size), falling
               -- back to min(k, admissible size) for queries the ANN
               -- method missed entirely — mirrors operators/similarity.py
               ROUND(CAST(COALESCE(th.n, 0) AS DOUBLE) /
                     (CASE WHEN COALESCE(ad.n_a, 0) > 0
                           THEN LEAST(5, ad.n_a)
                           ELSE LEAST(5, td.n_t) END), 6)
                 AS tie_recall
        FROM pd
        JOIN td ON td.query_id = pd.query_id
        LEFT JOIN ad ON ad.query_id = pd.query_id
        LEFT JOIN ph ON ph.query_id = pd.query_id
        LEFT JOIN th ON th.query_id = pd.query_id
        ORDER BY pd.query_id
        """,
        "X3",
        "plain vs tie-aware recall@5 on a planted 6-clone cluster: the "
        "admissible-but-differently-tie-broken answer reads 0.8 plain and "
        "1.0 tie-aware — the gauge separates tie ambiguity from real "
        "quantization/bucketing error (RANK()-extended ground truth)",
    ),
)
