"""``spark.read.format("ccsds")`` — Python Data Source (V2) wrapper
around the split-range CCSDS binary scan.

The engine's native entry point is :func:`sources.binary.read_packets`
(ranges DataFrame + ``mapInPandas``); this module packages the SAME
range planner and range parser as a PySpark 4 ``DataSource`` so the
scan gets first-class reader ergonomics: a registered format name,
options through ``.option(...)``, a real scan node in the plan (with
scan metrics), and composability with ``.schema()``-less loading.
SURVEY §4.2 option (b).

    from mission_data_pipeline_spark.sources import register_ccsds_source
    register_ccsds_source(spark)
    pk = (spark.read.format("ccsds")
          .option("sec_hdr_length", 4)
          .option("apid_filter", "291,292")
          .load("/data/telemetry/*.bin"))

Scale shape is identical to ``read_packets``: ``partitions()`` plans one
``InputPartition`` per byte range on the driver (file metadata only —
no data is read), ``read()`` parses its range on the executor and
emits one Arrow ``RecordBatch`` (zero row-by-row Python), with the
APID pushdown applied inside the range parser. Exactly-once across
ranges comes from the same resync + tail-overlap convention.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from mission_data_pipeline_spark.models.schemas import PACKET_SCHEMA
from mission_data_pipeline_spark.sources.binary import _parse_range, plan_ranges

#: Arrow schema mirroring PACKET_SCHEMA (names/types must match what the
#: reader yields; Spark maps arrow int32/int64/float64/binary/string back
#: to the declared source schema).
_ARROW_SCHEMA = pa.schema(
    [
        pa.field("apid", pa.int32()),
        pa.field("version", pa.int32()),
        pa.field("packet_type", pa.int32()),
        pa.field("sec_hdr_flag", pa.int32()),
        pa.field("seq_flags", pa.int32()),
        pa.field("seq_count", pa.int32()),
        pa.field("data_length", pa.int32()),
        pa.field("sec_hdr", pa.binary()),
        pa.field("user_data", pa.binary()),
        pa.field("source_time_tai", pa.float64()),
        pa.field("ground_receipt_time", pa.float64()),
        pa.field("source_id", pa.string()),
        pa.field("file_path", pa.string()),
        pa.field("file_offset", pa.int64()),
    ]
)

_TRUE = {"true", "1", "yes"}


class CcsdsDataSource(DataSource):
    """Format name ``ccsds``; schema is the fixed PACKET_SCHEMA."""

    @classmethod
    def name(cls) -> str:
        return "ccsds"

    def schema(self) -> StructType:
        return PACKET_SCHEMA

    def reader(self, schema: StructType) -> "CcsdsReader":
        return CcsdsReader(dict(self.options))


class CcsdsReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError(
                "ccsds source needs a path: spark.read.format('ccsds')"
                ".load('/data/*.bin') or .option('path', ...)"
            )
        apids = options.get("apid_filter")
        self._ranges = plan_ranges(
            path,
            apid_filter=(
                [int(a) for a in str(apids).split(",") if a.strip()]
                if apids
                else None
            ),
            sec_hdr_length=int(options.get("sec_hdr_length", 0)),
            frame_sync=str(options.get("frame_sync", "false")).lower() in _TRUE,
            source_id=options.get("source_id"),
            ground_receipt_time=(
                float(options["ground_receipt_time"])
                if options.get("ground_receipt_time") is not None
                else None
            ),
            split_size=int(options.get("split_size", 128 * 1024 * 1024)),
            max_packet_len=int(options.get("max_packet_len", 65542)),
            resync_chain=int(options.get("resync_chain", 2)),
            weak_resync=str(options.get("weak_resync", "false")).lower()
            in _TRUE,
        )

    def partitions(self) -> list[InputPartition]:
        # Degenerate all-empty-file case still needs >= 1 partition
        # (Spark requires a non-empty partition list); the parser of a
        # zero-byte range emits zero rows.
        if not self._ranges:
            return [InputPartition(None)]
        return [InputPartition(r) for r in self._ranges]

    def read(self, partition: InputPartition) -> Iterator[pa.RecordBatch]:
        if partition.value is None:
            return
        cols = _parse_range(partition.value)
        yield pa.RecordBatch.from_pydict(
            {f.name: list(cols[f.name]) for f in _ARROW_SCHEMA},
            schema=_ARROW_SCHEMA,
        )


def register_ccsds_source(spark: SparkSession) -> None:
    """Register the ``ccsds`` format on this session (idempotent)."""
    spark.dataSource.register(CcsdsDataSource)
