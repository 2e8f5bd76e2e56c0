"""Sequential-state time-series ops (operators/timeseries.py)."""

from __future__ import annotations

import pytest

from mission_data_pipeline_spark.operators.timeseries import (
    _lttb_series,
    ewma,
    lttb,
)


def test_ewma_recurrence_exact(spark):
    rows = [
        ("A", 1, 0, 10.0),
        ("A", 2, 1, 20.0),
        ("A", 3, 2, 0.0),
        ("B", 4, 0, 4.0),
        # duplicate timestamp: event_id tiebreak fixes the order
        ("B", 6, 1, 8.0),
        ("B", 5, 1, 6.0),
    ]
    df = spark.createDataFrame(
        rows, "name string, event_id long, t_us long, value double"
    )
    out = {
        (r["name"], r["event_id"]): r["ewma"]
        for r in ewma(
            df,
            alpha=0.5,
            time_col="t_us",
            value_col="value",
            series_cols=["name"],
            order_cols=["event_id"],
        ).collect()
    }
    assert out[("A", 1)] == 10.0
    assert out[("A", 2)] == 15.0
    assert out[("A", 3)] == 7.5
    assert out[("B", 4)] == 4.0
    assert out[("B", 5)] == 5.0  # t=1, event 5 before event 6
    assert out[("B", 6)] == 6.5
    with pytest.raises(ValueError):
        ewma(df, alpha=0.0, time_col="t_us", value_col="value",
             series_cols=["name"])


def test_lttb_series_reference_properties():
    # hand-checkable case: spike must survive downsampling
    ts = list(range(20))
    vs = [0.0] * 20
    vs[7] = 100.0
    kept = _lttb_series(ts, vs, 5)
    assert kept[0] == 0 and kept[-1] == 19  # endpoints always kept
    assert len(kept) == 5
    assert 7 in kept  # the spike dominates its bucket's triangle area
    assert kept == sorted(kept)
    # short series pass through
    assert _lttb_series([1, 2, 3], [1.0, 2.0, 3.0], 5) == [0, 1, 2]
    # flat series: every area ties at 0 -> first point of each bucket
    flat = _lttb_series(list(range(12)), [1.0] * 12, 5)
    assert flat[0] == 0 and flat[-1] == 11 and len(flat) == 5


def test_lttb_dataframe_matches_series_function(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    ts = sorted(int(t) for t in rng.choice(10_000, size=60, replace=False))
    vs = [float(int(v)) for v in rng.integers(0, 500, size=60)]
    df = spark.createDataFrame(
        [("S", t, v) for t, v in zip(ts, vs)],
        "name string, t_us long, value double",
    )
    got = (
        lttb(df, n_out=10, time_col="t_us", value_col="value",
             series_cols=["name"])
        .orderBy("kept_rank")
        .collect()
    )
    kept = _lttb_series(ts, vs, 10)
    assert [r["t_us"] for r in got] == [ts[k] for k in kept]
    assert [r["value"] for r in got] == [vs[k] for k in kept]
    assert [r["kept_rank"] for r in got] == list(range(10))
    with pytest.raises(ValueError):
        lttb(df, n_out=2, time_col="t_us", value_col="value",
             series_cols=["name"])


def test_ewma_null_values_skipped_not_nan(spark):
    """Null inputs are SKIPPED: the row emits SQL NULL (never NaN) and
    the running state carries through unchanged — matching the
    recursive-CTE oracle's convention (ADVICE r06)."""
    import math

    rows = [
        ("A", 1, 0, None),    # leading null: no state yet
        ("A", 2, 1, 10.0),
        ("A", 3, 2, None),    # mid null: state carries
        ("A", 4, 3, 20.0),    # recurrence continues from 10.0
    ]
    df = spark.createDataFrame(
        rows, "name string, event_id long, t_us long, value double"
    )
    out = {
        r["event_id"]: (r["value"], r["ewma"])
        for r in ewma(
            df, alpha=0.5, time_col="t_us", value_col="value",
            series_cols=["name"], order_cols=["event_id"],
        ).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (10.0, 10.0)
    assert out[3] == (None, None)
    assert out[4] == (20.0, 15.0)  # 0.5*20 + 0.5*10, null skipped
    for v, e in out.values():  # genuinely NULL, never smuggled NaN
        assert v is None or not math.isnan(v)
        assert e is None or not math.isnan(e)


def test_ewma_lttb_max_rows_per_series_guard(spark):
    df = spark.createDataFrame(
        [("A", i, i, float(i)) for i in range(50)],
        "name string, event_id long, t_us long, value double",
    )
    with pytest.raises(Exception, match="max_rows_per_series"):
        ewma(
            df, alpha=0.5, time_col="t_us", value_col="value",
            series_cols=["name"], max_rows_per_series=10,
        ).collect()
    with pytest.raises(Exception, match="max_rows_per_series"):
        lttb(
            df, n_out=5, time_col="t_us", value_col="value",
            series_cols=["name"], max_rows_per_series=10,
        ).collect()
    # bound not exceeded -> passes through
    assert ewma(
        df, alpha=0.5, time_col="t_us", value_col="value",
        series_cols=["name"], max_rows_per_series=50,
    ).count() == 50


def test_ewma_sharded_matches_plain_and_handles_nulls(spark):
    """Parallel-prefix EWMA: agrees with the single-pass operator to
    reassociation-ULP level on null-bearing multi-shard series, seeds on
    the first non-null row even when earlier shards are all-null."""
    from mission_data_pipeline_spark.operators.timeseries import ewma_sharded

    rows = []
    for u in range(3):
        for t in range(120):
            # series u=2 starts with a fully-null first shard
            v = (
                None
                if (u == 1 and t % 17 == 5) or (u == 2 and t < 40)
                else float((u * 31 + t * 7) % 101)
            )
            rows.append((f"s{u}", t // 40, t, v))  # 3 shards of 40
    df = spark.createDataFrame(
        rows, "name string, day int, t_us long, value double"
    )
    sharded = {
        (r["name"], r["t_us"]): r["ewma"]
        for r in ewma_sharded(
            df, alpha=0.25, time_col="t_us", value_col="value",
            series_cols=["name"], shard_col="day",
        ).collect()
    }
    plain = {
        (r["name"], r["t_us"]): r["ewma"]
        for r in ewma(
            df, alpha=0.25, time_col="t_us", value_col="value",
            series_cols=["name"],
        ).collect()
    }
    assert set(sharded) == set(plain) and len(plain) == 360
    for k, a in plain.items():
        b = sharded[k]
        assert (a is None) == (b is None), k
        if a is not None:
            assert abs(a - b) < 1e-9, (k, a, b)
    # the all-null first shard emitted nulls, then seeding kicked in
    assert sharded[("s2", 0)] is None
    assert sharded[("s2", 40)] == plain[("s2", 40)] == float((62 + 280) % 101)


def test_ewma_sharded_plan_broadcasts_tail_state(spark):
    """Plan pin: the recombination join puts the tiny per-shard state
    table on the broadcast side — the corpus never reshuffles for it."""
    from mission_data_pipeline_spark.operators.timeseries import ewma_sharded

    df = spark.createDataFrame(
        [("s", 0, i, float(i)) for i in range(10)],
        "name string, day int, t_us long, value double",
    )
    out = ewma_sharded(
        df, alpha=0.25, time_col="t_us", value_col="value",
        series_cols=["name"], shard_col="day",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    # and no shuffle of the row side for the join (the only Exchanges
    # are the applyInPandas groupings and the broadcast itself)
    assert "SortMergeJoin" not in final


def test_holt_linear_recurrence_exact(spark):
    from mission_data_pipeline_spark.operators.timeseries import holt_linear

    rows = [
        ("A", 1, 0, 10.0),
        ("A", 2, 1, 20.0),
        ("A", 3, 2, None),   # skipped: NULL out, state carries
        ("A", 4, 3, 30.0),
        ("B", 5, 0, None),   # series starting with a null
        ("B", 6, 1, 4.0),
    ]
    df = spark.createDataFrame(
        rows, "name string, event_id long, t_us long, value double"
    )
    out = {
        r["event_id"]: (r["level"], r["trend"])
        for r in holt_linear(
            df,
            alpha=0.5,
            beta=0.5,
            time_col="t_us",
            value_col="value",
            series_cols=["name"],
            order_cols=["event_id"],
        ).collect()
    }
    # manual replay: l0=10,b0=0; l1=.5*20+.5*10=15, b1=.5*5+0=2.5;
    # row 3 null; l3=.5*30+.5*17.5=23.75, b3=.5*8.75+.5*2.5=5.625
    assert out[1] == (10.0, 0.0)
    assert out[2] == (15.0, 2.5)
    assert out[3] == (None, None)
    assert out[4] == (23.75, 5.625)
    assert out[5] == (None, None)
    assert out[6] == (4.0, 0.0)  # state seeds at first non-null
    with pytest.raises(ValueError):
        holt_linear(df, alpha=0.5, beta=1.5, time_col="t_us",
                    value_col="value", series_cols=["name"])
    with pytest.raises(Exception):
        holt_linear(
            df, alpha=0.5, beta=0.5, time_col="t_us", value_col="value",
            series_cols=["name"], max_rows_per_series=2,
        ).collect()


def test_holt_winters_additive_recurrence_exact(spark):
    from mission_data_pipeline_spark.operators.timeseries import (
        holt_winters_additive,
    )

    # period-2 seasonal square wave on a ramp; manual replay below
    rows = [("A", i, i, float(10 * i + (5 if i % 2 else -5))) for i in range(6)]
    rows.append(("A", 6, 6, None))
    df = spark.createDataFrame(
        rows, "name string, event_id long, t_us long, value double"
    )
    out = {
        r["event_id"]: (r["level"], r["trend"], r["seasonal"])
        for r in holt_winters_additive(
            df, alpha=0.5, beta=0.5, gamma=0.5, period=2,
            time_col="t_us", value_col="value", series_cols=["name"],
            order_cols=["event_id"],
        ).collect()
    }
    # manual replay of the documented recurrence
    lv = tr = None
    season = [0.0, 0.0]
    exp = {}
    for i, (_, eid, _, x) in enumerate(rows):
        if x is None:
            exp[eid] = (None, None, None)
            continue
        p = i % 2
        if lv is None:
            lv, tr = x, 0.0
            season[p] = 0.5 * (x - lv) + 0.5 * season[p]
        else:
            sp = season[p]
            prev = lv
            lv = 0.5 * (x - sp) + 0.5 * (lv + tr)
            tr = 0.5 * (lv - prev) + 0.5 * tr
            season[p] = 0.5 * (x - lv) + 0.5 * sp
        exp[eid] = (lv, tr, season[p])
    assert out == exp
    # seasonal signal is actually picked up: late even/odd slots differ
    assert abs(out[5][2] - out[4][2]) > 1.0
    with pytest.raises(ValueError):
        holt_winters_additive(
            df, alpha=0.5, beta=0.5, gamma=0.5, period=1,
            time_col="t_us", value_col="value", series_cols=["name"],
        )
