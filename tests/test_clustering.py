"""Distributed Lloyd k-means (operators/clustering.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from mission_data_pipeline_spark.operators.clustering import kmeans_lloyd

_Q = 1_000_000


def _ref_lloyd(vecs, k, n_iter):
    """Driver-side replay of the exact quantized-Lloyd contract."""
    q = lambda x: float(math.floor(float(x) * _Q)) / 1000000.0
    cents = {j: [q(x) for x in vecs[j][1]] for j in range(k)}

    def assign(c):
        out = {}
        for vid, v in vecs:
            best = None
            for j in sorted(c):
                d = 0.0
                for x, y in zip(v, c[j]):
                    d += (float(x) - y) * (float(x) - y)
                if best is None or (d, j) < best:
                    best = (d, j)
            out[vid] = best
        return out

    for _ in range(n_iter):
        a = assign(cents)
        sums, cnts = {}, {}
        for vid, v in vecs:
            j = a[vid][1]
            cnts[j] = cnts.get(j, 0) + 1
            acc = sums.setdefault(j, [0] * len(v))
            for i, x in enumerate(v):
                acc[i] += math.floor(float(x) * _Q)
        cents = {
            j: (
                [float(s) / float(cnts[j]) / 1000000.0 for s in sums[j]]
                if j in sums
                else cents[j]
            )
            for j in range(k)
        }
    return assign(cents), cents


def test_kmeans_lloyd_matches_driver_replay(spark):
    # two tight blobs + an outlier; ids fix the deterministic init
    vecs = [
        (0, [0.0, 0.0]), (1, [10.0, 10.0]),
        (2, [0.1, -0.1]), (3, [9.9, 10.2]), (4, [0.2, 0.05]),
        (5, [10.3, 9.8]), (6, [55.0, 55.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    assigned, cents = kmeans_lloyd(df, k=2, n_iter=3)
    # the DataFrame column is float32 — replay through the same widening
    ref_assign, ref_cents = _ref_lloyd(
        [(i, [float(np.float32(x)) for x in v]) for i, v in vecs],
        k=2,
        n_iter=3,
    )
    got = {r["id"]: (r["dist"], r["cluster"]) for r in assigned.collect()}
    assert {i: c for i, (_, c) in got.items()} == {
        i: c for i, (_, c) in ref_assign.items()
    }
    for j in range(2):
        assert cents[j] == pytest.approx(ref_cents[j], abs=0.0)  # bit-exact
    # blob memberships are the sane ones
    labels = {i: got[i][1] for i in got}
    assert labels[0] == labels[2] == labels[4]
    assert labels[1] == labels[3] == labels[5]
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=0, n_iter=1)
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=100, n_iter=1)


def test_kmeans_assignment_is_mapside(spark):
    """The assignment stage must not shuffle: centroids ride as plan
    literals, so the final assignment plan has no Exchange above scan
    (the groupBy in the query layer is separate)."""
    vecs = [(i, [float(i), 0.0]) for i in range(10)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    assigned, _ = kmeans_lloyd(df, k=2, n_iter=1)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_assign_vectorized_matches_expression_twin(spark):
    """The Arrow-native argmin (_assign) must be bit-identical to its
    Catalyst-expression spec (_assign_expr) — same sequential-fold IEEE
    op order for distances, same struct-min ordering at the edges:
    NULL dist (null/ragged/null-element vectors) sorts FIRST, NaN
    sorts LAST, ties fall to the smaller cluster id."""
    import math

    from mission_data_pipeline_spark.operators.clustering import (
        _assign,
        _assign_expr,
    )

    cents = {0: [0.0, 0.0, 0.0], 1: [1.0, 1.0, 1.0], 2: [5.0, 5.0, 5.0]}
    rows = [
        (0, [0.1, 0.2, 0.3]),          # clean
        (1, [4.9, 5.2, 4.8]),          # clean, other cluster
        (2, None),                     # null vector -> NULL dist, cid 0
        (3, [1.0, 2.0]),               # short: zip_with null-pad -> NULL
        (4, [1.0, 2.0, 3.0, 4.0]),     # long: same
        (5, [math.nan, 0.0, 0.0]),     # NaN -> NaN dist ranks LAST
        (6, [None, 1.0, 1.0]),         # null element -> NULL dist
        (7, [0.5, 0.5, 0.5]),          # equidistant tie -> smaller cid
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    want = {
        r["id"]: (r["cluster"], r["dist"])
        for r in _assign_expr(df, "vec_id", "embedding", cents).collect()
    }
    got = {
        r["id"]: (r["cluster"], r["dist"])
        for r in _assign(df, "vec_id", "embedding", cents).collect()
    }
    assert set(want) == set(got)
    for i in want:
        wc, wd = want[i]
        gc, gd = got[i]
        assert wc == gc, i
        if wd is None or gd is None:
            assert wd is None and gd is None, i
        elif math.isnan(wd) or math.isnan(gd):
            assert math.isnan(wd) and math.isnan(gd), i
        else:
            assert wd == gd, i  # bit-exact
    # and the vectorized path really is the map-side Arrow node
    plan = (
        _assign(df, "vec_id", "embedding", cents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan and "Exchange" not in plan
