"""Canonical Spark schemas for the engine's two core DataFrames.

Replaces the reference's object model (``src/mdp/models/packet.py:92-176``,
``src/mdp/models/parameter.py:26-56``, ``src/mdp/models/frame.py:24-102``)
with fixed columnar schemas: the "dataset" contract becomes two
DataFrames, and dynamic parameter names become *values* of the ``name``
column (tidy/long form) rather than schema members — which is what makes
the layout stable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: One row per CCSDS space packet.
PACKET_SCHEMA = T.StructType(
    [
        T.StructField("apid", T.IntegerType(), False),
        T.StructField("version", T.IntegerType(), False),
        T.StructField("packet_type", T.IntegerType(), False),
        T.StructField("sec_hdr_flag", T.IntegerType(), False),
        T.StructField("seq_flags", T.IntegerType(), False),
        T.StructField("seq_count", T.IntegerType(), False),
        T.StructField("data_length", T.IntegerType(), False),
        T.StructField("sec_hdr", T.BinaryType(), True),
        T.StructField("user_data", T.BinaryType(), False),
        T.StructField("source_time_tai", T.DoubleType(), True),
        T.StructField("ground_receipt_time", T.DoubleType(), True),
        T.StructField("source_id", T.StringType(), True),
        T.StructField("file_path", T.StringType(), True),
        T.StructField("file_offset", T.LongType(), True),
    ]
)

#: Tidy/long engineering-parameter samples (FIXTURES.md §4).
PARAMS_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("apid", T.IntegerType(), True),
        T.StructField("seq_count", T.IntegerType(), True),
        T.StructField("time_tai", T.DoubleType(), True),
        T.StructField("raw_value", T.DoubleType(), True),
        T.StructField("raw_value_str", T.StringType(), True),
        T.StructField("eng_value", T.DoubleType(), True),
        T.StructField("eng_value_str", T.StringType(), True),
        T.StructField("unit", T.StringType(), True),
        T.StructField("validity", T.BooleanType(), True),
        T.StructField("calibration_id", T.StringType(), True),
        T.StructField("out_of_limit", T.BooleanType(), True),
        T.StructField("alarm_level", T.IntegerType(), True),
    ]
)

#: CCSDS TM transfer frame (modeled for parity with reference
#: ``src/mdp/models/frame.py``; no stage consumes frames there either).
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("scid", T.IntegerType(), False),
        T.StructField("vcid", T.IntegerType(), False),
        T.StructField("frame_count", T.IntegerType(), False),
        T.StructField("data_field", T.BinaryType(), False),
        T.StructField("quality", T.StringType(), True),
        T.StructField("ground_receipt_time", T.DoubleType(), True),
        T.StructField("source_id", T.StringType(), True),
    ]
)
