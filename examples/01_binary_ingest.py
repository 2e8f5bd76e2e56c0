"""Example 01 — Binary telemetry ingest to Parquet.

Parity: reference ``examples/01_binary_ingest.py`` — same scenario, same
numbers, Spark-first execution:

  1. Scan raw CCSDS Space Packets from a housekeeping APID (0x100)
     with the split-range parallel binary source (``binary_packets``).
  2. Decommutate three parameters: obc_temp_dn, bus_voltage_dn,
     bat_current_dn (byte-slice projections, no per-row Python).
  3. Calibrate raw DN to engineering units (polynomial for temp and
     voltage, piecewise table for current) — constant-folded Catalyst
     expressions via a broadcast calibration join.
  4. Write Hive-partitioned Parquet, one directory per parameter.

The whole pipeline compiles to ONE distributed Catalyst plan per batch;
nothing ever collects to the driver.

Run from the repo root::

    python examples/01_binary_ingest.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mission_data_pipeline_spark import get_spark
from mission_data_pipeline_spark.core import Pipeline, PipelineConfig
from mission_data_pipeline_spark.models.ccsds import generate_housekeeping_stream
from mission_data_pipeline_spark.observability import configure_logging
from mission_data_pipeline_spark.stages import (
    BinaryPacketExtractor,
    CalibrationTransformer,
    DecomTransformer,
    ParquetLoader,
)

# MIB-style parameter definitions: user_data layout of the synthetic HK
# stream (FIXTURES.md §2 — identical numbers to the reference example).
PARAM_DEFS = [
    {"name": "obc_temp_dn", "apid": 0x100, "byte_offset": 0, "bit_length": 16,
     "param_type": "uint", "unit": "DN",
     "description": "On-board computer temperature (raw ADC)"},
    {"name": "bus_voltage_dn", "apid": 0x100, "byte_offset": 2, "bit_length": 16,
     "param_type": "uint", "unit": "DN",
     "description": "Primary bus voltage (raw ADC)"},
    {"name": "bat_current_dn", "apid": 0x100, "byte_offset": 4, "bit_length": 16,
     "param_type": "uint", "unit": "DN",
     "description": "Battery current (raw ADC)"},
]

CALIBRATIONS = [
    {"parameter": "obc_temp_dn", "method": "polynomial",
     "coefficients": [-55.0, 0.04394531], "unit": "degC"},
    {"parameter": "bus_voltage_dn", "method": "polynomial",
     "coefficients": [0.0, 0.008056640625], "unit": "V"},
    {"parameter": "bat_current_dn", "method": "table",
     "table_raw": [0.0, 1024.0, 2048.0, 3072.0, 4095.0],
     "table_eng": [-2.0, -1.0, 0.0, 1.0, 2.0], "unit": "A"},
]


def main() -> None:
    configure_logging(level="INFO", fmt="console")
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory(prefix="mdps_example_") as tmpdir:
        tmp = Path(tmpdir)
        raw_file = tmp / "hk_telemetry.bin"
        output_dir = tmp / "parquet_out"

        raw_file.write_bytes(generate_housekeeping_stream(200))
        print(f"[gen] Wrote 200 HK packets to {raw_file}")

        pipeline = Pipeline(
            config=PipelineConfig(name="hk-ingest", stop_on_error=True),
            extractor=BinaryPacketExtractor(
                {"path": str(raw_file), "apid_filter": [0x100],
                 "sec_hdr_length": 4, "source_id": "GROUND_STATION_1"}
            ),
            transformers=[
                DecomTransformer({"parameters": PARAM_DEFS}),
                CalibrationTransformer({"calibrations": CALIBRATIONS}),
            ],
            loader=ParquetLoader(
                {"output_dir": str(output_dir), "compression": "snappy"}
            ),
        )

        result = pipeline.run(spark)
        print(result.summary())

        if result.ok:
            print("\nOutput (Hive layout, one directory per parameter):")
            back = spark.read.parquet(str(output_dir))
            back.groupBy("name", "unit").count().orderBy("name").show()
            sample = back.filter("name = 'obc_temp_dn'").orderBy("seq_count")
            sample.select("seq_count", "raw_value", "eng_value").show(5)


if __name__ == "__main__":
    main()
