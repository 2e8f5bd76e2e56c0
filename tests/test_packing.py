"""Token-budget packing (operators/packing.py) + linear interpolation."""

import pytest
from pyspark.sql import functions as F

from mission_data_pipeline_spark.operators.dataset import interpolate_linear
from mission_data_pipeline_spark.operators.packing import (
    pack_stats,
    pack_token_budget,
)


def test_pack_token_budget_boundaries(spark):
    rows = [(i, 400) for i in range(10)]  # 4000 tokens @ 400 each
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_token_budget(df, 1000, order_cols=["doc_id"])
    got = {r["doc_id"]: (r["pack_id"], r["pack_offset"]) for r in out.collect()}
    # docs 0,1 fit pack 0 (800); doc 2 starts at 800, spans into 1200 → pack 0
    assert got[0] == (0, 0) and got[1] == (0, 400) and got[2] == (0, 800)
    assert got[3] == (1, 200)  # next pack starts mid-budget space
    stats = {r["pack_id"]: r["n_docs"] for r in pack_stats(out).collect()}
    assert sum(stats.values()) == 10


def test_pack_sharded_and_deterministic(spark):
    rows = [(i, f"s{i % 2}", 300 + (i % 3) * 100) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, shard string, n_tokens long")
    a = pack_token_budget(df, 2000, order_cols=["doc_id"], shard_cols=["shard"])
    b = pack_token_budget(df, 2000, order_cols=["doc_id"], shard_cols=["shard"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # every pack except possibly the last per shard is filled past 80%
    st = pack_stats(a, shard_cols=["shard"]).collect()
    per_shard_last = {r["shard"]: max(x["pack_id"] for x in st if x["shard"] == r["shard"]) for r in st}
    for r in st:
        if r["pack_id"] != per_shard_last[r["shard"]]:
            assert r["total_tokens"] >= 1600


def test_pack_bad_budget(spark):
    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        pack_token_budget(df, 0)


def test_interpolate_linear_interior_and_edges(spark):
    rows = [
        ("p", 0.0, 10.0),
        ("p", 1.0, None),
        ("p", 3.0, None),
        ("p", 4.0, 50.0),
        ("p", 5.0, None),  # after last known → stays null
        ("q", 0.0, None),  # before first known → stays null
        ("q", 1.0, 7.0),
    ]
    df = spark.createDataFrame(rows, "name string, t double, v double")
    out = interpolate_linear(df, ["v"], time_col="t", partition_cols=["name"])
    got = {(r["name"], r["t"]): r["v"] for r in out.collect()}
    assert got[("p", 1.0)] == pytest.approx(20.0)  # 10 + (50-10) * 1/4
    assert got[("p", 3.0)] == pytest.approx(40.0)
    assert got[("p", 0.0)] == 10.0 and got[("p", 4.0)] == 50.0  # knowns kept
    assert got[("p", 5.0)] is None and got[("q", 0.0)] is None
    assert got[("q", 1.0)] == 7.0


def test_pack_stats_honors_token_col(spark):
    from mission_data_pipeline_spark.operators.packing import (
        pack_stats,
        pack_token_budget,
    )

    df = spark.createDataFrame(
        [(1, 300), (2, 300), (3, 300)], "doc_id long, tok long"
    )
    packed = pack_token_budget(df, 500, token_col="tok")
    stats = {r["pack_id"]: r for r in pack_stats(packed, token_col="tok").collect()}
    assert stats[0]["total_tokens"] == 600 and stats[1]["total_tokens"] == 300


def test_chunk_tokens_overlap_and_tail(spark):
    from mission_data_pipeline_spark.operators.packing import chunk_tokens

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
            (2, "a b c"),  # shorter than one chunk
            (3, "   "),  # whitespace only -> no chunks
        ],
        "doc_id long, text string",
    )
    out = chunk_tokens(docs, size=4, overlap=2)  # stride 2
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # doc 1: starts 0,2,4,6 -> ceil((10-2)/2) = 4 chunks; a start at 8
    # would yield "t8 t9", fully contained in chunk 3 -> not emitted
    assert sorted(c for d, c in rows if d == 1) == [0, 1, 2, 3]
    assert rows[(1, 0)]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[(1, 1)]["chunk_text"] == "t2 t3 t4 t5"  # overlap of 2
    assert rows[(1, 3)]["chunk_text"] == "t6 t7 t8 t9"
    assert rows[(1, 3)]["n_tokens"] == 4
    # doc 2: single short chunk, kept whole (no redundant "c" tail)
    assert rows[(2, 0)]["chunk_text"] == "a b c"
    assert len([k for k in rows if k[0] == 2]) == 1
    # doc 3: filtered out entirely
    assert not [k for k in rows if k[0] == 3]


def test_chunk_tokens_covers_all_tokens_no_redundant_chunks(spark):
    # Every token appears in some chunk, and every chunk contributes at
    # least one token not covered by its predecessor.
    from mission_data_pipeline_spark.operators.packing import chunk_tokens

    docs = spark.createDataFrame(
        [(n, " ".join(f"w{i}" for i in range(n))) for n in range(1, 40)],
        "doc_id long, text string",
    )
    out = chunk_tokens(docs, size=8, overlap=3).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    stride = 5
    for n, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        # full coverage: last chunk reaches the final token
        last_start = (len(chunks) - 1) * stride
        assert chunks[-1]["chunk_text"].split()[-1] == f"w{n - 1}"
        # chunk count matches the documented ceil((n - overlap)/stride)
        expected = -(-(n - 3) // stride) if n > 3 else 1
        assert len(chunks) == expected, (n, len(chunks), expected)
        # no chunk fully contained in the previous one
        for prev, cur in zip(chunks, chunks[1:]):
            assert not set(cur["chunk_text"].split()) <= set(
                prev["chunk_text"].split()
            )


def test_chunk_tokens_validates_params(spark):
    import pytest as _pytest

    from mission_data_pipeline_spark.operators.packing import chunk_tokens

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_tokens(docs, size=0, overlap=0)
    with _pytest.raises(ValueError):
        chunk_tokens(docs, size=4, overlap=4)
