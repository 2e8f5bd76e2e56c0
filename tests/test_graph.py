"""PageRank operator tests (operators/graph.py)."""

import numpy as np
import pytest


def _reference_pagerank(edges, n, n_iter, d=0.85):
    M = np.zeros((n, n))
    outdeg = {}
    for s, t in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    for s, t in edges:
        M[t, s] += 1.0 / outdeg[s]
    r = np.full(n, 1 / n)
    for _ in range(n_iter):
        dangling = sum(r[i] for i in range(n) if i not in outdeg)
        r = (1 - d) / n + d * (M @ r + dangling / n)
    return r


def test_pagerank_matches_power_iteration(spark):
    from mission_data_pipeline_spark.operators.graph import pagerank

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (2, 4)]  # 4 dangling
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=20).collect()}
    ref = _reference_pagerank(edges, 5, 20)
    assert sorted(got) == [0, 1, 2, 3, 4]
    assert all(abs(got[i] - ref[i]) < 1e-9 for i in range(5))
    assert abs(sum(got.values()) - 1.0) < 1e-9  # no mass leak (dangling)


def test_pagerank_multigraph_and_validation(spark):
    from mission_data_pipeline_spark.operators.graph import pagerank

    # duplicate edge doubles its weight share (multigraph semantics)
    df = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 2)], "src long, dst long"
    )
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=5).collect()}
    assert got[1] > got[2]  # node 1 receives 2/3 of node 0's mass
    with pytest.raises(ValueError):
        pagerank(df, n_iter=0)
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)


def test_pagerank_reliable_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir=... routes lineage truncation through reliable RDD
    checkpointing (files on shared storage survive executor loss) and
    must be result-identical to the localCheckpoint default."""
    from mission_data_pipeline_spark.operators.graph import pagerank

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (2, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    ckpt = str(tmp_path / "pr_ckpt")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, n_iter=8, checkpoint_dir=ckpt).collect()
    }
    base = {r["node"]: r["rank"] for r in pagerank(df, n_iter=8).collect()}
    assert got == base
    # checkpoint files actually landed in the reliable dir
    import os

    found = [f for _, _, fs in os.walk(ckpt) for f in fs]
    assert found, "no reliable checkpoint files written"
