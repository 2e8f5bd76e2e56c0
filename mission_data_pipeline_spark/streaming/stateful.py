"""Custom stateful streaming operator: per-APID sequence-gap detection.

CCSDS packets carry a per-APID 14-bit sequence counter that increments
by 1 mod 16384 (CCSDS 133.0-B-2 §4.1.3.4; reference models the wrap at
``src/mdp/models/packet.py:54`` but never checks continuity — SURVEY
§2.6 W3 lists gap/wrap detection as the natural extension). A gap means
lost packets; ground processors must flag it as soon as it is seen.

Two execution shapes, one semantic:

- **batch** — ``LAG(seq_count) OVER (PARTITION BY apid ORDER BY ...)``:
  one shuffle, whole-stage codegen.
- **streaming** — ``applyInPandasWithState``: the state store keeps one
  tiny record per APID (last seq_count seen), carried across
  micro-batches, so a gap that *straddles* two micro-batches is still
  caught — exactly what the stateless window cannot do. State size is
  O(#APIDs) (≤2048), independent of throughput: safe at any scale.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

SEQ_MOD = 16384

GAP_SCHEMA = T.StructType(
    [
        T.StructField("apid", T.IntegerType()),
        T.StructField("prev_seq", T.IntegerType()),
        T.StructField("seq_count", T.IntegerType()),
        T.StructField("missing", T.IntegerType()),  # packets lost in between
        T.StructField("file_offset", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("last_seq", T.IntegerType())])


def seq_gaps_batch(packets: DataFrame) -> DataFrame:
    """Gap records from an at-rest packets_df (LAG window form).

    Ordering within an APID follows (file_path, file_offset) — scan
    order, which is transmission order for a well-formed capture.
    """
    w = Window.partitionBy("apid").orderBy("file_path", "file_offset")
    prev = F.lag("seq_count").over(w)
    missing = ((F.col("seq_count") - prev - 1) + SEQ_MOD) % SEQ_MOD
    return (
        packets.select("apid", "seq_count", "file_path", "file_offset")
        .withColumn("prev_seq", prev)
        .withColumn("missing", missing)
        .filter(F.col("prev_seq").isNotNull() & (F.col("missing") > 0))
        .select("apid", "prev_seq", "seq_count", "missing", "file_offset")
    )


def _gap_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    (apid,) = key
    last = state.get[0] if state.exists else None
    out: list[dict] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["file_path", "file_offset"])
        for seq, off in zip(pdf["seq_count"].tolist(), pdf["file_offset"].tolist()):
            if last is not None:
                missing = (seq - last - 1) % SEQ_MOD
                if missing:
                    out.append(
                        {
                            "apid": apid,
                            "prev_seq": last,
                            "seq_count": seq,
                            "missing": missing,
                            "file_offset": off,
                        }
                    )
            last = seq
    if last is not None:
        state.update((int(last),))
    yield pd.DataFrame(out, columns=[f.name for f in GAP_SCHEMA.fields])


def seq_gaps_stream(packets: DataFrame) -> DataFrame:
    """Gap records from a streaming packets_df (stateful form).

    ``applyInPandasWithState`` keeps the last seq_count per APID in the
    state store across micro-batches. Output mode is append: each gap is
    emitted exactly once, in the micro-batch where its closing packet
    arrives. No timeout — APID state is a single int and telemetry APIDs
    recur for the mission's lifetime.
    """
    return (
        packets.select("apid", "seq_count", "file_path", "file_offset")
        .groupBy("apid")
        .applyInPandasWithState(
            _gap_fn,
            outputStructType=GAP_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


def seq_gaps(packets: DataFrame) -> DataFrame:
    """Dispatch on execution mode (same semantics either way)."""
    return seq_gaps_stream(packets) if packets.isStreaming else seq_gaps_batch(packets)


# -- cumulative per-key running stats ----------------------------------

CUMULATIVE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("id_sum", T.LongType()),
        T.StructField("ts_min_us", T.LongType()),
        T.StructField("ts_max_us", T.LongType()),
    ]
)

_CUM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("id_sum", T.LongType()),
        T.StructField("ts_min", T.LongType()),
        T.StructField("ts_max", T.LongType()),
    ]
)


def _cumulative_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    (k,) = key
    n, id_sum, ts_min, ts_max = (
        state.get if state.exists else (0, 0, None, None)
    )
    for pdf in pdfs:
        n += len(pdf)
        id_sum += int(pdf["id"].sum())
        lo, hi = int(pdf["ts_us"].min()), int(pdf["ts_us"].max())
        ts_min = lo if ts_min is None else min(ts_min, lo)
        ts_max = hi if ts_max is None else max(ts_max, hi)
    state.update((int(n), int(id_sum), int(ts_min), int(ts_max)))
    yield pd.DataFrame(
        [
            {
                "key": k,
                "n_events": n,
                "id_sum": id_sum,
                "ts_min_us": ts_min,
                "ts_max_us": ts_max,
            }
        ]
    )


def cumulative_group_stats(stream: DataFrame) -> DataFrame:
    """Cumulative per-key running statistics as a CUSTOM stateful
    streaming operator (``applyInPandasWithState``) — the "running
    aggregate that survives micro-batch boundaries" shape built-in
    streaming aggregation only offers in complete/update output modes.
    Input needs columns ``(key, id, ts_us)``; each micro-batch emits
    the group's cumulative ``(n_events, id_sum, ts_min_us, ts_max_us)``
    so far, folding the state-store record carried across batches.

    All accumulators are integers (count, integer id sum, min/max), so
    the cumulative values are order-independent — the final emission
    per key must equal the batch GROUP BY, regardless of how the file
    source split the data into micro-batches. State is one 4-long
    record per key: O(#keys), independent of throughput.
    """
    return stream.groupBy("key").applyInPandasWithState(
        _cumulative_fn,
        outputStructType=CUMULATIVE_SCHEMA,
        stateStructType=_CUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# -- streaming EWMA: per-series smoothing state across micro-batches ----

EWMA_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("t_us", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

_EWMA_STATE_SCHEMA = T.StructType([T.StructField("s", T.DoubleType())])


def ewma_stream(stream: DataFrame, *, alpha: float) -> DataFrame:
    """Per-series EWMA over a LIVE stream: the smoothing state (one
    double per series) rides the state store across micro-batches, so a
    telemetry channel smooths continuously over a live-tail source —
    the streaming twin of
    :func:`~mission_data_pipeline_spark.operators.timeseries.ewma`,
    applying the identical recurrence (``s = alpha*x + (1-alpha)*s``,
    first non-null seeds, nulls skipped with NULL out).

    Input needs ``(key, t_us, event_id, value)``; every row is emitted
    exactly once (append mode) with its smoothed value. Rows sort by
    ``(t_us, event_id)`` WITHIN a micro-batch; correctness across
    batches relies on the source delivering data in time order (true
    for live tails; for an out-of-order replay use the batch operator).
    State is one double per series: O(#channels), throughput-free.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    beta = 1.0 - alpha

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        s = state.get[0] if state.exists else None
        out: list[dict] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["t_us", "event_id"])
            for t, eid, x in zip(
                pdf["t_us"].tolist(),
                pdf["event_id"].tolist(),
                pdf["value"].tolist(),
            ):
                if x is None or pd.isna(x):
                    out.append(
                        {"key": k, "t_us": t, "event_id": eid,
                         "value": None, "ewma": None}
                    )
                    continue
                s = x if s is None else alpha * x + beta * s
                out.append(
                    {"key": k, "t_us": t, "event_id": eid,
                     "value": x, "ewma": s}
                )
        if s is not None:
            state.update((float(s),))
        yield pd.DataFrame(
            out, columns=[f.name for f in EWMA_STREAM_SCHEMA.fields]
        )

    return stream.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=EWMA_STREAM_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# -- transformWithStateInPandas (Spark 4 arbitrary-state API) -----------

TWS_TOPK_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_types", T.LongType()),
        T.StructField("top3_sum", T.DoubleType()),
    ]
)


def running_topk_stats(stream: DataFrame) -> DataFrame:
    """Per-key running (count, distinct-type count, top-3-value sum) via
    ``transformWithStateInPandas`` — Spark 4's arbitrary-state successor
    to ``applyInPandasWithState``, exercising all three typed state
    primitives the new API adds over the single-tuple legacy state:

    - ``ValueState`` — the running event count;
    - ``ListState`` — the current top-3 values (a bounded sketch: state
      is O(3) per key no matter the throughput);
    - ``MapState`` — per-event-type counts, read-modify-write via
      ``getValue``/``updateValue``; ``n_types`` = its key cardinality.

    Every accumulator is order-independent (count, set cardinality,
    running top-k), so the final emission per key must equal the batch
    GROUP BY however the source splits into micro-batches — the same
    contract :func:`cumulative_group_stats` pins for the legacy API.

    Input needs ``(key, event_id, event_type, value)``; append mode,
    ``timeMode="none"``. NOTE: the new API requires (a) the RocksDB
    state store provider (``spark.sql.streaming.stateStore
    .providerClass`` = ``...state.RocksDBStateStoreProvider``) — the
    HDFS-backed default refuses transformWithState queries — and (b)
    the ``protobuf`` Python package (the PySpark state-server protocol
    is protobuf-based). ENV-GATED here: this sandbox has no protobuf
    and installs are forbidden, so the operator raises loudly up front
    (a missing protobuf otherwise surfaces as an opaque "driver worker
    exited unexpectedly (crashed)" stream failure) and its declared
    query is withheld; the logic follows the public API and activates
    unchanged once protobuf is present.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(PySpark's state-server protocol is protobuf-based); it is "
            "not installed in this environment. Use "
            "applyInPandasWithState (cumulative_group_stats) instead, "
            "or install protobuf."
        ) from e

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _TopKRunning(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", "n bigint")
            self._top = handle.getListState("top", "v double")
            self._types = handle.getMapState("types", "t string", "c bigint")

        def handleInputRows(self, key, rows, timer_values):
            (k,) = key
            n = self._n.get()[0] if self._n.exists() else 0
            top = (
                sorted((t[0] for t in self._top.get()), reverse=True)
                if self._top.exists()
                else []
            )
            for pdf in rows:
                n += len(pdf)
                for t, c in pdf["event_type"].value_counts().items():
                    prev = self._types.getValue((str(t),))
                    self._types.updateValue(
                        (str(t),), ((prev[0] if prev else 0) + int(c),)
                    )
                top = sorted(
                    top + [float(x) for x in pdf["value"].tolist()],
                    reverse=True,
                )[:3]
            self._n.update((int(n),))
            self._top.put([(v,) for v in top])
            n_types = sum(1 for _ in self._types.keys())
            yield pd.DataFrame(
                [
                    {
                        "key": k,
                        "n_events": int(n),
                        "n_types": int(n_types),
                        "top3_sum": round(sum(top), 6),
                    }
                ]
            )

        def close(self) -> None:
            pass

    return stream.groupBy("key").transformWithStateInPandas(
        statefulProcessor=_TopKRunning(),
        outputStructType=TWS_TOPK_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
