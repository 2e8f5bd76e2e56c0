"""Structured Streaming tests (W1–W4): file sources, foreachBatch
pipeline, watermarked windows. All use availableNow (drain-and-stop)."""

import math

import pytest

from mission_data_pipeline_spark.core.base import StageConfig, Loader
from mission_data_pipeline_spark.models.ccsds import generate_housekeeping_stream
from mission_data_pipeline_spark.stages import DecomTransformer
from mission_data_pipeline_spark.streaming import (
    StreamingPipeline,
    dedup_late_samples,
    stream_csv_telemetry,
    stream_packets,
    windowed_stats,
)


class MemLoader(Loader):
    def __init__(self):
        super().__init__(StageConfig())
        self.rows = []

    def load(self, batch) -> int:
        got = (batch.params if batch.params is not None else batch.packets).collect()
        self.rows.extend(got)
        return len(got)


def _write_csvs(root, n_files=3, rows_per=10):
    root.mkdir()
    for f in range(n_files):
        lines = ["time,apid,seq_count,temp"]
        for i in range(rows_per):
            t = f * rows_per + i
            lines.append(f"{float(t)},768,{t},{20.0 + math.sin(t):.4f}")
        (root / f"batch{f}.csv").write_text("\n".join(lines) + "\n")


def test_stream_csv_telemetry(spark, tmp_path):
    src = tmp_path / "csvs"
    _write_csvs(src)
    stream = stream_csv_telemetry(
        spark,
        str(src),
        "time double, apid int, seq_count int, temp double",
        max_files_per_trigger=1,
    )
    assert stream.isStreaming
    loader = MemLoader()
    q = StreamingPipeline(loader=loader).start(
        stream, checkpoint_dir=str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)
    assert len(loader.rows) == 30
    assert all(r["name"] == "temp" for r in loader.rows)


def test_stream_packets_with_decom(spark, tmp_path):
    src = tmp_path / "bins"
    src.mkdir()
    for f in range(2):
        (src / f"f{f}.bin").write_bytes(generate_housekeeping_stream(50))
    stream = stream_packets(spark, str(src), sec_hdr_length=4)
    loader = MemLoader()
    decom = DecomTransformer(
        {
            "parameters": [
                {"name": "obc_temp_dn", "apid": 256, "byte_offset": 0,
                 "bit_length": 16}
            ]
        }
    )
    pipe = StreamingPipeline(
        transformers=[decom], loader=loader, stream_is_params=False
    )
    q = pipe.start(
        stream, checkpoint_dir=str(tmp_path / "ckpt2"), available_now=True
    )
    q.awaitTermination(180)
    assert len(loader.rows) == 100
    assert {r["name"] for r in loader.rows} == {"obc_temp_dn"}
    assert pipe.metrics.snapshot()["total_packets"] == 100


def test_windowed_stats_streaming(spark, tmp_path):
    src = tmp_path / "csvs_w"
    _write_csvs(src, n_files=1, rows_per=20)
    stream = stream_csv_telemetry(
        spark, str(src), "time double, apid int, seq_count int, temp double"
    )
    agg = windowed_stats(stream, window="10 seconds", watermark="5 seconds")
    collected = []
    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(lambda df, eid: collected.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # 20 samples at 1 Hz → two complete 10 s windows (the final one may be
    # held back by the watermark in append mode)
    assert len(collected) >= 1
    assert all(r["n"] == 10 for r in collected)


def test_dedup_late_samples_batch_parity(spark):
    df = spark.createDataFrame(
        [("p", 1.0, 10.0), ("p", 1.0, 11.0), ("p", 2.0, 12.0)],
        "name string, time_tai double, eng_value double",
    )
    out = dedup_late_samples(df)
    assert out.count() == 2


def test_windowed_stats_batch_oracle(spark):
    rows = [("p", float(t), float(t)) for t in range(25)]
    df = spark.createDataFrame(rows, "name string, time_tai double, eng_value double")
    out = windowed_stats(df, window="10 seconds")
    got = {
        (r["window_start"].second + r["window_start"].minute * 60): r["n"]
        for r in out.collect()
    }
    assert sum(got.values()) == 25
    assert sorted(got.values(), reverse=True)[:2] == [10, 10]


def _gapped_stream(seqs, apid=0x100):
    """Packets with chosen seq_counts (gaps = missing numbers)."""
    import struct

    from mission_data_pipeline_spark.models.ccsds import build_packet

    out = bytearray()
    for s in seqs:
        out += build_packet(apid, s, struct.pack(">I", s * 10))
    return bytes(out)


def test_seq_gaps_batch(spark, tmp_path):
    from mission_data_pipeline_spark.sources import read_packets
    from mission_data_pipeline_spark.streaming import seq_gaps

    p = tmp_path / "gap.bin"
    # 0,1,2, [3,4 lost], 5,6, [wrap gap: 16382 -> 1 loses 16383,0]
    p.write_bytes(_gapped_stream([0, 1, 2, 5, 6, 16382, 1]))
    pk = read_packets(spark, str(p))
    rows = {r["seq_count"]: r for r in seq_gaps(pk).collect()}
    assert rows[5]["prev_seq"] == 2 and rows[5]["missing"] == 2
    assert rows[16382]["prev_seq"] == 6 and rows[16382]["missing"] == 16375
    assert rows[1]["prev_seq"] == 16382 and rows[1]["missing"] == 2  # wrap
    assert len(rows) == 3


def test_seq_gaps_stream_state_across_batches(spark, tmp_path):
    """A gap straddling two micro-batches is caught only because the
    state store carries last_seq across them."""
    from mission_data_pipeline_spark.streaming import seq_gaps, stream_packets

    d = tmp_path / "in"
    d.mkdir()
    out_rows = []
    # file 1 ends at seq 4; file 2 starts at seq 9 → gap of 4 across batches
    (d / "a.bin").write_bytes(_gapped_stream([0, 1, 2, 3, 4]))
    (d / "b.bin").write_bytes(_gapped_stream([9, 10, 11]))
    pk = stream_packets(spark, str(d), max_files_per_trigger=1)
    q = (
        seq_gaps(pk)
        .writeStream.format("memory")
        .queryName("gaps")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM gaps").collect()
    assert len(got) == 1
    r = got[0]
    assert (r["prev_seq"], r["seq_count"], r["missing"]) == (4, 9, 4)


def test_dedup_stream_content_bounded_state(spark, tmp_path):
    """Streaming exact content dedup via dropDuplicatesWithinWatermark:
    duplicates across micro-batches (within the watermark) collapse to
    one row, and the batch path gives first-wins hash-dedup parity."""
    import json

    from mission_data_pipeline_spark.streaming import dedup_stream_content

    root = tmp_path / "docs"
    root.mkdir()
    texts = ["alpha doc", "beta doc", "alpha doc", "gamma doc", "beta doc"]
    for i, t in enumerate(texts):
        (root / f"f{i}.json").write_text(
            json.dumps({"doc_id": i, "ts": f"2026-01-01 00:00:{i:02d}", "text": t})
            + "\n"
        )
    schema = "doc_id long, ts string, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)  # force multiple micro-batches
        .json(str(root))
        .withColumn("event_time", __import__("pyspark.sql.functions", fromlist=["col"]).col("ts").cast("timestamp"))
    )
    out = dedup_stream_content(stream, watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_content_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT text FROM dedup_content_sink").collect()
    assert sorted(r["text"] for r in rows) == ["alpha doc", "beta doc", "gamma doc"]
    # batch parity: same call on a static frame
    static = spark.read.schema(schema).json(str(root)).withColumn(
        "event_time", __import__("pyspark.sql.functions", fromlist=["col"]).col("ts").cast("timestamp")
    )
    got = sorted(r["text"] for r in dedup_stream_content(static).collect())
    assert got == ["alpha doc", "beta doc", "gamma doc"]


def test_cumulative_group_stats_state_across_batches(spark, tmp_path):
    """The cumulative running aggregate folds state across micro-batches:
    a key split over two files must emit increasing cumulative counts,
    and the final emission equals the batch totals."""
    import json

    from mission_data_pipeline_spark.streaming.stateful import (
        cumulative_group_stats,
    )

    root = tmp_path / "ev"
    root.mkdir()
    # key 1 appears in both files; key 2 only in the second
    batch1 = [(1, 10, 100), (1, 11, 200)]
    batch2 = [(1, 12, 50), (2, 20, 300)]
    for name, rows in (("a.json", batch1), ("b.json", batch2)):
        (root / name).write_text(
            "\n".join(
                json.dumps({"key": k, "id": i, "ts_us": t}) for k, i, t in rows
            )
            + "\n"
        )
    stream = (
        spark.readStream.schema("key long, id long, ts_us long")
        .option("maxFilesPerTrigger", 1)
        .json(str(root))
    )
    q = (
        cumulative_group_stats(stream)
        .writeStream.format("memory")
        .queryName("cum_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM cum_sink").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append(r)
    # key 1 emitted twice (once per micro-batch), cumulative growing
    ones = sorted(by_key[1], key=lambda r: r["n_events"])
    assert [r["n_events"] for r in ones] == [2, 3]
    final = ones[-1]
    assert final["id_sum"] == 33
    assert (final["ts_min_us"], final["ts_max_us"]) == (50, 200)
    # key 2 seen only in batch 2: single emission with its own totals
    (two,) = by_key[2]
    assert (two["n_events"], two["id_sum"]) == (1, 20)
    assert (two["ts_min_us"], two["ts_max_us"]) == (300, 300)


def test_checkpoint_restart_exactly_once_with_merge_sink(spark, tmp_path):
    """Kill a stream mid-run, restart from the SAME checkpoint: the file
    source replays only unprocessed files, and the idempotent MERGE sink
    absorbs any boundary re-delivery — the final base equals the input
    exactly once, no dupes, no holes."""
    import json

    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.sinks.merge import merge_upsert

    src = tmp_path / "src"
    src.mkdir()
    rows = [(i, i * 10) for i in range(40)]
    for f in range(4):
        (src / f"f{f}.json").write_text(
            "\n".join(
                json.dumps({"k": k, "val": v})
                for k, v in rows[f * 10 : (f + 1) * 10]
            )
            + "\n"
        )
    base = str(tmp_path / "base")
    ckpt = str(tmp_path / "ckpt")

    def start():
        stream = (
            spark.readStream.schema("k long, val long")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        return (
            stream.writeStream.foreachBatch(
                lambda df, bid: merge_upsert(
                    spark,
                    base,
                    df.withColumn("v", F.lit(bid + 1)),
                    key_cols=["k"],
                    version_col="v",
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # First run: stop as soon as at least one batch has committed.
    q = start()
    import time as _time

    deadline = _time.time() + 120
    while _time.time() < deadline:
        if q.lastProgress and q.lastProgress["numInputRows"] > 0:
            break
        _time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)
    n_partial = (
        spark.read.parquet(base).count()
        if __import__("os").path.isdir(base)
        else 0
    )
    assert n_partial < 40, "stream finished before we could interrupt it"

    # Restart from the same checkpoint: must complete the remainder.
    q2 = start()
    q2.awaitTermination(120)
    got = {
        (r["k"], r["val"]) for r in spark.read.parquet(base).select("k", "val").collect()
    }
    assert got == set(rows), (len(got), n_partial)


def test_transform_with_state_gate_without_protobuf(spark):
    """Without the protobuf package the operator must refuse loudly up
    front (the raw failure mode is an opaque mid-stream worker crash)."""
    import pytest

    try:
        import google.protobuf  # noqa: F401

        pytest.skip("protobuf installed - gate not applicable")
    except ImportError:
        pass
    from mission_data_pipeline_spark.streaming.stateful import (
        running_topk_stats,
    )

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value AS key", "value AS event_id",
                    "'t' AS event_type", "CAST(value AS DOUBLE) AS value")
    )
    with pytest.raises(ImportError, match="protobuf"):
        running_topk_stats(stream)


def test_transform_with_state_running_topk(spark, tmp_path):
    """Spark 4 transformWithStateInPandas: ValueState count + ListState
    top-3 + MapState type counts fold across micro-batches (RocksDB
    provider); final emission equals batch-computed expectations.
    ENV-GATED: needs the protobuf package (state-server protocol)."""
    import json

    import pytest

    pytest.importorskip("google.protobuf")

    from mission_data_pipeline_spark.streaming.stateful import (
        running_topk_stats,
    )

    root = tmp_path / "ev"
    root.mkdir()
    b1 = [(1, 10, "view", 5.0), (1, 11, "click", 9.0), (1, 12, "view", 1.0)]
    b2 = [(1, 13, "buy", 7.0), (1, 14, "view", 8.0), (2, 20, "view", 2.0)]
    for name, rows in (("a.json", b1), ("b.json", b2)):
        (root / name).write_text(
            "\n".join(
                json.dumps(
                    {"key": k, "event_id": i, "event_type": t, "value": v}
                )
                for k, i, t, v in rows
            )
            + "\n"
        )
    stream = (
        spark.readStream.schema(
            "key long, event_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(root))
    )
    knob = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(knob, None)
    spark.conf.set(
        knob,
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            running_topk_stats(stream)
            .writeStream.format("memory")
            .queryName("tws_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset(knob)
        else:
            spark.conf.set(knob, prev)
    rows = spark.sql("SELECT * FROM tws_sink").collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append(r)
    ones = sorted(by_key[1], key=lambda r: r["n_events"])
    # batch 1: 3 events, 2 types, top3 = 9+5+1
    assert (ones[0]["n_events"], ones[0]["n_types"]) == (3, 2)
    assert ones[0]["top3_sum"] == 15.0
    # batch 2 folds state: 5 events, 3 types, top3 = 9+8+7
    assert (ones[-1]["n_events"], ones[-1]["n_types"]) == (5, 3)
    assert ones[-1]["top3_sum"] == 24.0
    (two,) = by_key[2]
    assert (two["n_events"], two["n_types"], two["top3_sum"]) == (1, 1, 2.0)


def test_ewma_stream_state_and_null_skip_across_batches(spark, tmp_path):
    """Streaming EWMA carries the smoothing state across micro-batches
    and skips nulls exactly like the batch operator: a null value emits
    NULL and leaves the state untouched, even across a batch boundary."""
    import json

    from mission_data_pipeline_spark.streaming.stateful import ewma_stream

    root = tmp_path / "ewma_ev"
    root.mkdir()
    # series 7: 10.0 | (null, 20.0) across two files — the recurrence
    # must bridge the null AND the file boundary: 0.5*20 + 0.5*10 = 15
    batch1 = [(7, 0, 1, 10.0)]
    batch2 = [(7, 1, 2, None), (7, 2, 3, 20.0)]
    for name, rows in (("a.json", batch1), ("b.json", batch2)):
        (root / name).write_text(
            "\n".join(
                json.dumps(
                    {"key": k, "t_us": t, "event_id": e, "value": v}
                )
                for k, t, e, v in rows
            )
            + "\n"
        )
    stream = (
        spark.readStream.schema(
            "key long, t_us long, event_id long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(root))
    )
    q = (
        ewma_stream(stream, alpha=0.5)
        .writeStream.format("memory")
        .queryName("ewma_stream_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r["t_us"]: (r["value"], r["ewma"])
        for r in spark.sql("SELECT * FROM ewma_stream_sink").collect()
    }
    assert rows[0] == (10.0, 10.0)
    assert rows[1] == (None, None)       # null skipped, never NaN
    assert rows[2] == (20.0, 15.0)       # state bridged null + batches
    with pytest.raises(ValueError):
        ewma_stream(stream, alpha=0.0)


def test_streaming_ewma_restart_from_checkpoint(spark, tmp_path):
    """Kill the stateful EWMA stream mid-run, restart from the SAME
    checkpoint: per-channel smoothing state must survive the restart —
    the state store replays committed state, the exactly-once parquet
    file sink absorbs the aborted batch, and the final smoothed series
    equals the uninterrupted recurrence bit-for-bit (VERDICT r07 item
    6: the stream-stream join had this proof; the per-key state op did
    not)."""
    import json
    import os
    import time as _time

    from mission_data_pipeline_spark.streaming.stateful import ewma_stream

    src = tmp_path / "src"
    src.mkdir()
    rows = []
    for i in range(80):
        rows.append(
            {
                "key": i % 2,
                "t_us": 1_000_000 + i * 1_000,
                "event_id": i,
                # deterministic mixed values; a couple of nulls exercise
                # the null-skip path across the restart boundary
                "value": None if i in (13, 47) else ((i * 37) % 101) / 7.0,
            }
        )
    base_mtime = _time.time() - 100

    def write_files(lo: int, hi: int) -> None:
        for f in range(lo, hi):
            p = src / f"f{f}.json"
            p.write_text(
                "\n".join(json.dumps(r) for r in rows[f * 20 : (f + 1) * 20])
                + "\n"
            )
            # file source picks files up in mtime order — pin it so the
            # time-ordered delivery contract holds deterministically
            os.utime(p, (base_mtime + f, base_mtime + f))

    # Deterministic interruption (ADVICE r08): only the first two source
    # files exist before the first run, so it CANNOT emit all 80 rows no
    # matter how fast the machine drains availableNow batches — the
    # stop() below still exercises a mid-stream kill when it wins the
    # race, but the n_partial < 80 invariant no longer depends on it.
    write_files(0, 2)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def start():
        stream = (
            spark.readStream.schema(
                "key long, t_us long, event_id long, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        return (
            ewma_stream(stream, alpha=0.3)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start()
    deadline = _time.time() + 120
    while _time.time() < deadline:
        if q.lastProgress and q.lastProgress["numInputRows"] > 0:
            break
        _time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)
    n_partial = (
        spark.read.parquet(out).count() if os.path.isdir(out) else 0
    )
    assert n_partial < 80, "stream finished before we could interrupt it"

    # remaining source arrives only now — the restarted query must both
    # recover committed EWMA state and pick up the new files
    write_files(2, 4)
    q2 = start()
    q2.awaitTermination(120)

    got = {
        r["event_id"]: r
        for r in spark.read.parquet(out).collect()
    }
    assert len(got) == 80  # exactly once: no dupes, no holes
    # uninterrupted recurrence, replayed in plain IEEE float64
    state: dict[int, float] = {}
    for r in rows:  # already in (t_us, event_id) order per key
        g = got[r["event_id"]]
        if r["value"] is None:
            assert g["ewma"] is None and g["value"] is None
            continue
        k = r["key"]
        s = state.get(k)
        s = r["value"] if s is None else 0.3 * r["value"] + 0.7 * s
        state[k] = s
        assert g["ewma"] == s, (r["event_id"], g["ewma"], s)


def test_streaming_near_dedup_ingest_restart_from_checkpoint(spark, tmp_path):
    """Streaming ingest gate (streaming/ingest.py, VERDICT r08 item 7):
    micro-batches gated against the STORED LSH band index, survivors'
    signatures appended as index deltas, per-epoch idempotent writes.
    The stream is killed between the first and second wave of source
    files and restarted from the checkpoint: across the boundary no
    near-dup may slip through (including near-dups of docs ACCEPTED
    before the kill — delta-index state) and no new doc may be dropped
    or duplicated (exactly-once through the per-epoch overwrite sink)."""
    import json
    import os
    import time as _time

    from mission_data_pipeline_spark.operators.dedup import (
        write_near_dedup_index,
    )
    from mission_data_pipeline_spark.streaming.ingest import (
        near_dedup_ingest_stream,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near river"),
            (2, "completely different corpus text about spark shuffles and joins"),
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    write_near_dedup_index(corpus, idx, n=2, num_hashes=8, bands=4)

    new_11 = "unrelated fresh content with tokens nobody used before today"
    new_13 = "another brand new document mentioning satellites weather and maps"
    new_15 = "totally novel words describing gardens bloom tulip rows in spring"
    new_17 = "final unique entry capturing museum archives and quiet halls"
    files = [
        # near-copy of corpus doc 1 -> drop; brand new -> survive
        [(10, corpus.collect()[0]["text"] + " extra"), (11, new_11)],
        # near-copy of doc 11 (accepted in the PREVIOUS epoch -> must be
        # caught by the delta index); brand new -> survive
        [(12, new_11 + " extra"), (13, new_13)],
        # written only AFTER the kill: near-copy of pre-kill survivor 13
        # (delta state must cross the restart); brand new -> survive
        [(14, new_13 + " extra"), (15, new_15)],
        # near-copy of corpus doc 2 -> drop; brand new -> survive
        [(16, "completely different corpus text about spark shuffles and joins extra"), (17, new_17)],
    ]
    src = tmp_path / "src"
    src.mkdir()
    base_mtime = _time.time() - 100

    def write_files(lo: int, hi: int) -> None:
        for f in range(lo, hi):
            p = src / f"f{f}.json"
            p.write_text(
                "\n".join(
                    json.dumps({"doc_id": d, "text": t}) for d, t in files[f]
                )
                + "\n"
            )
            os.utime(p, (base_mtime + f, base_mtime + f))

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def start():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        return near_dedup_ingest_stream(
            stream,
            idx,
            out,
            checkpoint=ckpt,
            n=2,
            num_hashes=8,
            bands=4,
            threshold=0.6,
        )

    # deterministic interruption: only the first two files exist before
    # the first run (the stop() still exercises a mid-stream kill when
    # it wins the race)
    write_files(0, 2)
    q = start()
    deadline = _time.time() + 120
    while _time.time() < deadline:
        if q.lastProgress and q.lastProgress["numInputRows"] > 0:
            break
        _time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)

    write_files(2, 4)
    q2 = start()
    q2.awaitTermination(120)

    got = sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    )
    assert got == [11, 13, 15, 17]  # exactly once: no near-dups, no holes
    # the index deltas for the accepted docs exist (the stored-corpus
    # index itself is untouched)
    assert os.path.isdir(os.path.join(idx, "delta"))
    assert {r["doc_id"] for r in spark.read.parquet(
        os.path.join(idx, "delta", "*", "grams")).collect()
    } == {11, 13, 15, 17}


def test_compact_near_dedup_index_folds_deltas(spark, tmp_path):
    """Nightly index compaction: after a streamed ingest left per-epoch
    deltas, compact_near_dedup_index folds them into the base tables
    and removes the delta directory — a post-compaction probe must
    still catch near-dups of BOTH the original corpus and the streamed
    survivors, and a second compaction is a no-op."""
    import json
    import os

    from mission_data_pipeline_spark.operators.dedup import (
        incremental_near_dedup,
        read_near_dedup_index,
        write_near_dedup_index,
    )
    from mission_data_pipeline_spark.streaming.ingest import (
        compact_near_dedup_index,
        near_dedup_ingest_stream,
    )

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog near river")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    write_near_dedup_index(corpus, idx, n=2, num_hashes=8, bands=4)

    new_a = "unrelated fresh content with tokens nobody used before today"
    new_b = "another brand new document mentioning satellites weather and maps"
    src = tmp_path / "src"
    src.mkdir()
    (src / "f0.json").write_text(json.dumps({"doc_id": 100, "text": new_a}) + "\n")
    (src / "f1.json").write_text(json.dumps({"doc_id": 101, "text": new_b}) + "\n")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = near_dedup_ingest_stream(
        stream,
        idx,
        str(tmp_path / "out"),
        checkpoint=str(tmp_path / "ckpt"),
        n=2,
        num_hashes=8,
        bands=4,
        threshold=0.6,
    )
    q.awaitTermination(120)
    assert os.path.isdir(os.path.join(idx, "delta"))

    res = compact_near_dedup_index(spark, idx, checkpoint=str(tmp_path / "ckpt"))
    assert res["epochs_folded"] == 2
    assert not os.path.isdir(os.path.join(idx, "delta"))
    # compacted index now gates against corpus AND streamed survivors
    bands_df, grams_df = read_near_dedup_index(
        spark, idx, n=2, num_hashes=8, bands=4
    )
    assert {r["doc_id"] for r in grams_df.select("doc_id").distinct().collect()} == {1, 100, 101}
    probe = spark.createDataFrame(
        [
            (200, new_a + " extra"),      # near-dup of streamed survivor
            (201, "the quick brown fox jumps over the lazy dog near river extra"),
            (202, "genuinely novel words about glaciers penguins and auroras tonight"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"]
        for r in incremental_near_dedup(
            probe,
            n=2,
            num_hashes=8,
            bands=4,
            threshold=0.6,
            corpus_bands=bands_df,
            corpus_grams=grams_df,
        ).collect()
    )
    assert kept == [202]
    # second compaction is a clean no-op
    assert (
        compact_near_dedup_index(
            spark, idx, checkpoint=str(tmp_path / "ckpt")
        )["epochs_folded"]
        == 0
    )


def test_index_manifest_transactional_compaction_and_crash_gc(
    spark, tmp_path
):
    """The manifest-pointer commit protocol (VERDICT r09 item 1):
    interleave probe / compact / probe with a simulated crash between
    the manifest publish and the garbage collection (``gc=False``) and
    prove a reader NEVER sees a torn base/delta set — a probe that
    resolved the manifest before compaction keeps its fully-intact old
    version (nothing it references is deleted until GC), a probe after
    the publish sees the fully-folded new version, and
    ``gc_near_dedup_index`` later removes exactly the superseded
    artifacts without disturbing either."""
    import json
    import os

    from mission_data_pipeline_spark.operators.dedup import (
        incremental_near_dedup,
        read_index_manifest,
        read_near_dedup_index,
        write_near_dedup_index,
    )
    from mission_data_pipeline_spark.streaming.ingest import (
        compact_near_dedup_index,
        gc_near_dedup_index,
        near_dedup_ingest_stream,
    )

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog near river")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    write_near_dedup_index(corpus, idx, n=2, num_hashes=8, bands=4)

    new_a = "unrelated fresh content with tokens nobody used before today"
    src = tmp_path / "src"
    src.mkdir()
    (src / "f0.json").write_text(
        json.dumps({"doc_id": 100, "text": new_a}) + "\n"
    )
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema("doc_id long, text string").json(
        str(src)
    )
    near_dedup_ingest_stream(
        stream,
        idx,
        str(tmp_path / "out"),
        checkpoint=ckpt,
        n=2,
        num_hashes=8,
        bands=4,
        threshold=0.6,
    ).awaitTermination(120)
    assert read_index_manifest(idx)["delta_epochs"] == [0]

    probe = spark.createDataFrame(
        [
            (200, new_a + " extra"),  # near-dup of the streamed survivor
            (201, "genuinely novel words about glaciers penguins tonight"),
        ],
        "doc_id long, text string",
    )

    def gate(bands_df, grams_df):
        return sorted(
            r["doc_id"]
            for r in incremental_near_dedup(
                probe,
                n=2,
                num_hashes=8,
                bands=4,
                threshold=0.6,
                corpus_bands=bands_df,
                corpus_grams=grams_df,
            ).collect()
        )

    # reader resolves the OLD manifest (base v0 + delta epoch 0) ...
    pre_bands, pre_grams = read_near_dedup_index(spark, idx)
    # ... then compaction publishes v1 but "crashes" before GC
    res = compact_near_dedup_index(spark, idx, checkpoint=ckpt, gc=False)
    assert res == {
        "epochs_folded": 1,
        "epochs_skipped_uncommitted": [],
        "version": 1,
    }
    m = read_index_manifest(idx)
    assert m["version"] == 1 and m["delta_epochs"] == []
    # crash point: old version + folded delta still on disk (not torn)
    assert os.path.isdir(os.path.join(idx, "bands-v0"))
    assert os.path.isdir(os.path.join(idx, "delta", "epoch=0"))
    # the pre-compaction reader's plan still scans a complete index
    assert gate(pre_bands, pre_grams) == [201]
    # a post-publish reader resolves the fully-folded v1
    post_bands, post_grams = read_near_dedup_index(spark, idx)
    assert gate(post_bands, post_grams) == [201]
    # delayed GC removes exactly the superseded artifacts
    removed = gc_near_dedup_index(idx)["removed"]
    assert "bands-v0" in removed and "grams-v0" in removed
    assert os.path.join("delta", "epoch=0") in removed
    assert not os.path.isdir(os.path.join(idx, "delta"))
    assert gate(*read_near_dedup_index(spark, idx)) == [201]


def test_compact_refuses_uncommitted_epochs(spark, tmp_path):
    """ADVICE r09 (medium): a delta epoch written to disk whose batch
    never COMMITTED in the stream's checkpoint must not be folded —
    after the crash the stream replays that epoch, and a folded base
    would gate the batch against its own signatures (Jaccard 1.0) and
    silently drop every doc. Compaction consults the checkpoint's
    commits/ log and skips (never folds, never GCs) any delta epoch
    beyond the last committed batch; without a checkpoint it refuses
    outright."""
    import os

    import pytest as _pytest

    from mission_data_pipeline_spark.operators.dedup import (
        band_signatures,
        minhash_signatures,
        read_index_manifest,
        shingles,
        write_index_manifest,
        write_near_dedup_index,
    )
    from mission_data_pipeline_spark.streaming.ingest import (
        compact_near_dedup_index,
        last_committed_epoch,
    )

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog near river")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    write_near_dedup_index(corpus, idx, n=2, num_hashes=8, bands=4)
    # fabricate the crash: epoch 0 committed, epoch 1's delta landed and
    # was registered but its checkpoint commit never happened
    batch = spark.createDataFrame(
        [(50, "fresh crashed-epoch content with brand new tokens")],
        "doc_id long, text string",
    )
    for epoch in (0, 1):
        # fabricated deltas must match the index's featurization mode
        # (hashed grams — the production default since r13)
        g = shingles(batch, n=2, hash_grams=True)
        sig = minhash_signatures(g, num_hashes=8)
        ddir = os.path.join(idx, "delta", f"epoch={epoch}")
        band_signatures(sig, bands=4).write.mode("overwrite").parquet(
            os.path.join(ddir, "bands")
        )
        g.write.mode("overwrite").parquet(os.path.join(ddir, "grams"))
    m = read_index_manifest(idx)
    m["delta_epochs"] = [0, 1]
    write_index_manifest(idx, m)
    ckpt = tmp_path / "ckpt"
    (ckpt / "commits").mkdir(parents=True)
    (ckpt / "commits" / "0").write_text("v1\n{}")
    assert last_committed_epoch(str(ckpt)) == 0

    with _pytest.raises(ValueError, match="commits"):
        compact_near_dedup_index(spark, idx)  # no checkpoint: refuse

    res = compact_near_dedup_index(spark, idx, checkpoint=str(ckpt))
    assert res["epochs_folded"] == 1
    assert res["epochs_skipped_uncommitted"] == [1]
    m = read_index_manifest(idx)
    assert m["version"] == 1 and m["delta_epochs"] == [1]
    # the uncommitted epoch's delta survives GC for the replay to
    # overwrite; the folded epoch's is gone
    assert os.path.isdir(os.path.join(idx, "delta", "epoch=1"))
    assert not os.path.isdir(os.path.join(idx, "delta", "epoch=0"))


def test_streaming_near_dedup_ingest_intra_batch_pair(spark, tmp_path):
    """A near-dup pair arriving in the SAME micro-batch must still be
    deduplicated (cluster keeps its smallest id). Rate limits like
    maxFilesPerTrigger are best-effort — a restart can coalesce several
    pending files into one epoch, which is exactly how the kill-restart
    test intermittently caught doc 14 slipping past doc 13: the index
    gate only sees EARLIER epochs, so the intra-batch pass is the only
    thing standing between same-epoch near-dups."""
    import json
    import os

    from mission_data_pipeline_spark.operators.dedup import (
        write_near_dedup_index,
    )
    from mission_data_pipeline_spark.streaming.ingest import (
        near_dedup_ingest_stream,
    )

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog near river")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    write_near_dedup_index(corpus, idx, n=2, num_hashes=8, bands=4)

    fresh = "unrelated fresh content with tokens nobody used before today"
    other = "another brand new document mentioning satellites weather and maps"
    src = tmp_path / "src"
    src.mkdir()
    # ONE file -> ONE batch: 21 is a near-copy of 20 (same epoch), 22 is
    # a near-copy of the corpus, 23 is novel
    (src / "f0.json").write_text(
        "\n".join(
            json.dumps({"doc_id": d, "text": t})
            for d, t in [
                (20, fresh),
                (21, fresh + " extra"),
                (22, corpus.collect()[0]["text"] + " extra"),
                (23, other),
            ]
        )
        + "\n"
    )
    out = str(tmp_path / "out")
    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    q = near_dedup_ingest_stream(
        stream,
        idx,
        out,
        checkpoint=str(tmp_path / "ckpt"),
        n=2,
        num_hashes=8,
        bands=4,
        threshold=0.6,
    )
    q.awaitTermination(120)
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [20, 23]
    # the epoch delta carries ONLY the true survivors
    assert {
        r["doc_id"]
        for r in spark.read.parquet(
            os.path.join(idx, "delta", "*", "grams")
        ).collect()
    } == {20, 23}


def test_near_dedup_ingest_stream_start_validation_and_hashed_mode(
    spark, tmp_path
):
    """ADVICE r12: the ingest gate validates max_bucket AND the
    featurization mode at stream START — a bad value must raise from
    near_dedup_ingest_stream() itself, never inside the first epoch's
    foreachBatch (which fails the stream mid-run). A matched
    hash_grams=True gate then runs end-to-end against a hashed index."""
    import json
    import os
    import pytest as _pytest

    from mission_data_pipeline_spark.operators.dedup import (
        write_near_dedup_index,
    )
    from mission_data_pipeline_spark.streaming.ingest import (
        near_dedup_ingest_stream,
    )

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog near river")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    write_near_dedup_index(
        corpus, idx, n=2, num_hashes=8, bands=4, hash_grams=True
    )
    src = tmp_path / "src"
    src.mkdir()
    (src / "f0.json").write_text(
        json.dumps(
            {
                "doc_id": 10,
                "text": "the quick brown fox jumps over the lazy dog near river extra",
            }
        )
        + "\n"
        + json.dumps(
            {
                "doc_id": 11,
                "text": "unrelated fresh content with tokens nobody used before today",
            }
        )
        + "\n"
    )
    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    out = str(tmp_path / "out")
    # max_bucket=1 passes incremental_near_dedup's >=1 check but
    # lsh_pairs_from_bands needs >=2: must fail at start
    with _pytest.raises(ValueError, match="max_bucket"):
        near_dedup_ingest_stream(
            stream, idx, out, checkpoint=str(tmp_path / "c1"),
            n=2, num_hashes=8, bands=4, max_bucket=1, hash_grams=True,
        )
    # string-gram probe against a hashed index: fail at start
    with _pytest.raises(ValueError, match="hash_grams"):
        near_dedup_ingest_stream(
            stream, idx, out, checkpoint=str(tmp_path / "c2"),
            n=2, num_hashes=8, bands=4, hash_grams=False,
        )
    # matched mode: near-copy of corpus doc gated, fresh doc survives,
    # and the landed delta is hashed-gram (bigint) like the base index
    q = near_dedup_ingest_stream(
        stream, idx, out, checkpoint=str(tmp_path / "c3"),
        n=2, num_hashes=8, bands=4, threshold=0.6, hash_grams=True,
    )
    q.awaitTermination(120)
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    ) == [11]
    delta_grams = spark.read.parquet(
        os.path.join(idx, "delta", "*", "grams")
    )
    assert dict(delta_grams.dtypes)["gram"] == "bigint"
    assert {r["doc_id"] for r in delta_grams.collect()} == {11}


def test_near_dedup_ingest_stream_pre_r13_index_migration(
    spark, tmp_path
):
    """Migration path: an index written BEFORE the mode was recorded
    (params.json without the hash_grams key — always a string-gram
    build) must reject the post-r13 hashed default at stream START
    with the mode named, and gate correctly once the caller passes
    hash_grams=False."""
    import json
    import os
    import pytest as _pytest

    from mission_data_pipeline_spark.operators.dedup import (
        write_near_dedup_index,
    )
    from mission_data_pipeline_spark.streaming.ingest import (
        near_dedup_ingest_stream,
    )

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog near river")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    write_near_dedup_index(
        corpus, idx, n=2, num_hashes=8, bands=4, hash_grams=False
    )
    pj = os.path.join(idx, "params.json")
    with open(pj) as f:
        params = json.load(f)
    params.pop("hash_grams")  # simulate a pre-r13 index
    with open(pj, "w") as f:
        json.dump(params, f)
    src = tmp_path / "src"
    src.mkdir()
    (src / "f0.json").write_text(
        json.dumps(
            {
                "doc_id": 10,
                "text": "the quick brown fox jumps over the lazy dog near river extra",
            }
        )
        + "\n"
        + json.dumps(
            {
                "doc_id": 11,
                "text": "unrelated fresh content with tokens nobody used before today",
            }
        )
        + "\n"
    )
    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    out = str(tmp_path / "out")
    # post-r13 hashed default vs the legacy string index: loud at start
    with _pytest.raises(ValueError, match="hash_grams"):
        near_dedup_ingest_stream(
            stream, idx, out, checkpoint=str(tmp_path / "c1"),
            n=2, num_hashes=8, bands=4,
        )
    # explicit string mode: the gate runs and near-dups are caught
    q = near_dedup_ingest_stream(
        stream, idx, out, checkpoint=str(tmp_path / "c2"),
        n=2, num_hashes=8, bands=4, threshold=0.6, hash_grams=False,
    )
    q.awaitTermination(120)
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    ) == [11]
