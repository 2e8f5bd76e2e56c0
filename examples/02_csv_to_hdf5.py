"""Example 02 — CSV telemetry to HDF5 with calibration.

Parity: reference ``examples/02_csv_to_hdf5.py`` — same scenario, same
numbers, Spark-first execution:

  1. Read a wide CSV export (one column per parameter) with the
     ``csv_telemetry`` extractor — melted to the tidy long layout in
     one distributed unpivot.
  2. Apply a polynomial calibration to one parameter
     (star_tracker_temp: 0.1*DN - 273.15 → degC).
  3. Export to HDF5 (``/telemetry/<param>/...`` layout) for xarray /
     h5py tooling. HDF5 has no distributed writer, so this loader is a
     driver-side export boundary — at scale, keep Parquet (example 01);
     this exists for tool compatibility.

``h5py`` is an optional dependency. When it is not installed the script
falls back to the distributed Parquet sink so it still runs end-to-end,
and says so.

Run from the repo root::

    python examples/02_csv_to_hdf5.py
"""

from __future__ import annotations

import csv
import math
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mission_data_pipeline_spark import get_spark
from mission_data_pipeline_spark.core import Pipeline, PipelineConfig
from mission_data_pipeline_spark.observability import configure_logging
from mission_data_pipeline_spark.sinks.hdf5 import h5py
from mission_data_pipeline_spark.stages import (
    CalibrationTransformer,
    CsvTelemetryExtractor,
    Hdf5Loader,
    ParquetLoader,
)


def generate_csv(path: Path, rows: int = 300) -> None:
    """Synthetic attitude telemetry — same numbers as the reference
    example: star tracker temperature and reaction wheel RPM."""
    with open(path, "w", newline="") as fh:
        writer = csv.writer(fh)
        writer.writerow(
            ["time", "apid", "seq_count", "star_tracker_temp", "reaction_wheel_rpm"]
        )
        for i in range(rows):
            writer.writerow(
                [
                    round(i * 1.0, 3),
                    0x300,
                    i,
                    round(2200 + 100 * math.sin(i / 30.0), 2),
                    round(5000 + 200 * math.cos(i / 20.0), 2),
                ]
            )
    print(f"[gen] Wrote {rows} CSV rows to {path}")


def main() -> None:
    configure_logging(level="INFO", fmt="console")
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory(prefix="mdps_example_") as tmpdir:
        tmp = Path(tmpdir)
        csv_file = tmp / "attitude_telem.csv"
        hdf5_file = tmp / "attitude_telem.h5"
        parquet_dir = tmp / "attitude_parquet"

        generate_csv(csv_file)

        if h5py is not None:
            loader = Hdf5Loader({"output_path": str(hdf5_file), "overwrite": True})
        else:
            print("[note] h5py not installed - exporting Parquet instead")
            loader = ParquetLoader({"output_dir": str(parquet_dir)})

        pipeline = Pipeline(
            config=PipelineConfig(name="csv-to-hdf5"),
            extractor=CsvTelemetryExtractor(
                {
                    "path": str(csv_file),
                    "time_column": "time",
                    "apid_column": "apid",
                    "seq_count_column": "seq_count",
                    "parameter_columns": [
                        "star_tracker_temp",
                        "reaction_wheel_rpm",
                    ],
                    "source_id": "ATTITUDE_CONTROL",
                }
            ),
            transformers=[
                CalibrationTransformer(
                    {
                        "calibrations": [
                            {
                                "parameter": "star_tracker_temp",
                                "method": "polynomial",
                                "coefficients": [-273.15, 0.1],
                                "unit": "degC",
                            }
                        ]
                    }
                )
            ],
            loader=loader,
        )

        result = pipeline.run(spark)
        print(result.summary())

        if result.ok and h5py is not None:
            with h5py.File(hdf5_file, "r") as hf:
                print("\nHDF5 structure:")
                hf.visititems(lambda name, obj: print(f"  {name}  {obj}"))
        elif result.ok:
            back = spark.read.parquet(str(parquet_dir))
            print("\nParquet fallback output:")
            back.groupBy("name", "unit").count().orderBy("name").show()
            back.filter("name = 'star_tracker_temp'").orderBy("seq_count").select(
                "seq_count", "raw_value", "eng_value"
            ).show(5)


if __name__ == "__main__":
    main()
