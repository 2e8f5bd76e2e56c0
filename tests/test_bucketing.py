"""Bucketed co-located joins and salted skew joins (operators/bucketing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mission_data_pipeline_spark.operators.bucketing import salted_join, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 1000, 3).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("vb")
    )
    try:
        write_bucketed(a, "bt_a", keys=["k"], n_buckets=4, sort_by=["k"])
        write_bucketed(b, "bt_b", keys=["k"], n_buckets=4, sort_by=["k"])
        joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
        got = {r["k"]: (r["va"], r["vb"]) for r in joined.collect()}
        assert len(got) == 334 and got[999] == (1998, 1006)
        # co-located: the executed join plan contains no shuffle at all
        assert "Exchange" not in _executed_plan(joined)
        # and an unbucketed equivalent DOES shuffle (guard that the
        # assertion above is meaningful)
        plain = a.join(b, "k")
        plain.collect()
        assert "Exchange" in _executed_plan(plain)
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_salted_join_matches_plain_join(spark, no_broadcast):
    # 'hot' carries 90% of the big side
    big = spark.createDataFrame(
        [("hot", i) for i in range(900)] + [(f"k{i}", i) for i in range(100)],
        "key string, v int",
    )
    small = spark.createDataFrame(
        [("hot", 1.5), ("k3", 2.5), ("k7", 3.5)], "key string, w double"
    )
    got = salted_join(big, small, "key", n_salts=8).groupBy("key").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    exp = big.join(small, "key").groupBy("key").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in exp.collect()}


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([("a", 1), ("b", 2)], "key string, v int")
    small = spark.createDataFrame([("a", 9.0)], "key string, w double")
    out = {
        r["key"]: r["w"]
        for r in salted_join(big, small, "key", n_salts=4, how="left").collect()
    }
    assert out == {"a": 9.0, "b": None}


def test_salted_join_spelling_variants(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    small = spark.createDataFrame([(1, "x")], "k long, w string")
    from mission_data_pipeline_spark.operators.bucketing import salted_join

    # Spark's own compact spellings are accepted
    assert salted_join(big, small, "k", how="leftouter", n_salts=4).count() == 2
    assert salted_join(big, small, "k", how="leftsemi", n_salts=4).count() == 1
    import pytest

    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(big, small, "k", how="right", n_salts=4)
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(big, small, "k", how="full_outer", n_salts=4)
