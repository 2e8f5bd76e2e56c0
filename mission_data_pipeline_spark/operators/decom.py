"""Decommutation: packets_df → tidy params_df.

Parity: reference ``src/mdp/plugins/transformers/decom.py:55-124`` —
per-APID parameter definitions slice typed fields out of ``user_data``;
out-of-range slices are silently skipped; unknown APIDs are skipped (or
rejected up front when ``skip_unknown_apids=False``); ``eng_value``
initializes to the raw value (hex string for BINARY).

Spark-first shape: **one scan, no shuffle**. For every definition we
build a conditional struct expression (guarded by ``apid = def.apid``
and a payload-length check), collect them into an array, and
``explode``. Each packet row fans out to its parameters inside
whole-stage codegen; only IEEE-754 float decode leaves the JVM (one
Arrow batch per task). Contrast with the naive per-definition
``filter → select → union`` shape, which rescans the source N times.

At 100 TB: the decom output inherits the scan's partitioning; no
repartition happens until an aggregation asks for one. The definition
"join" (reference's ``_apid_map`` dict lookup, ``decom.py:61-64``) is
constant-folded into the plan — the MIB is plan metadata, not data,
which is exactly what a broadcast hash join would do but with zero
build side.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from math import ceil

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mission_data_pipeline_spark.functions import decode as dec


class ParameterType(str, Enum):
    UINT = "uint"
    INT = "int"
    FLOAT = "float"
    DOUBLE = "double"
    BOOLEAN = "boolean"
    ENUMERATED = "enumerated"
    BINARY = "binary"
    STRING = "string"


@dataclass(frozen=True)
class ParameterDefinition:
    """MIB-style physical layout of one parameter within an APID's
    user data (reference ``decom.py:35-47``)."""

    name: str
    apid: int
    byte_offset: int
    bit_length: int
    param_type: ParameterType = ParameterType.UINT
    unit: str | None = None
    little_endian: bool = False
    description: str | None = None

    @property
    def n_bytes(self) -> int:
        return ceil(self.bit_length / 8)


def _decode_numeric(pdef: ParameterDefinition, data: Column) -> Column | None:
    """Numeric raw value (double) for a definition, None if non-numeric."""
    t, off, n, le = pdef.param_type, pdef.byte_offset, pdef.n_bytes, pdef.little_endian
    if t in (ParameterType.UINT, ParameterType.ENUMERATED):
        return dec.decode_uint(data, off, n, le).cast("double")
    if t == ParameterType.INT:
        return dec.decode_int(data, off, n, le).cast("double")
    if t == ParameterType.FLOAT:
        return dec.decode_float(data, off, 4, le)
    if t == ParameterType.DOUBLE:
        return dec.decode_float(data, off, 8, le)
    if t == ParameterType.BOOLEAN:
        return dec.decode_bool(data, off).cast("double")
    return None


def _decode_str(pdef: ParameterDefinition, data: Column) -> Column | None:
    if pdef.param_type == ParameterType.STRING:
        return dec.decode_string(data, pdef.byte_offset, pdef.n_bytes)
    if pdef.param_type == ParameterType.BINARY:
        return dec.decode_hex(data, pdef.byte_offset, pdef.n_bytes)
    return None


def decommutate(
    packets: DataFrame,
    definitions: list[ParameterDefinition],
    *,
    skip_unknown_apids: bool = True,
) -> DataFrame:
    """Extract one tidy parameter row per (packet, matching definition)."""
    known_apids = sorted({d.apid for d in definitions})

    data = F.col("user_data")
    payload_len = F.length(data)
    branches = []
    if not skip_unknown_apids:
        # Reference raises KeyError at runtime per packet; relationally
        # that is a constraint violation — enforced as a runtime error
        # branch *inside the evaluated explode expression* (a standalone
        # dropped check column would be pruned by Catalyst and never fire).
        error_struct = F.struct(
            F.raise_error(
                F.concat(F.lit("unknown APID: "), F.col("apid").cast("string"))
            ).cast("string").alias("name"),
            F.lit(None).cast("double").alias("raw_value"),
            F.lit(None).cast("string").alias("raw_value_str"),
            F.lit(None).cast("string").alias("unit"),
        )
        branches.append(F.when(~F.col("apid").isin(known_apids), error_struct))
    for d in definitions:
        fits = F.lit(d.byte_offset + d.n_bytes) <= payload_len  # silent skip (T1)
        num = _decode_numeric(d, data)
        sv = _decode_str(d, data)
        struct = F.struct(
            F.lit(d.name).alias("name"),
            (num if num is not None else F.lit(None).cast("double")).alias("raw_value"),
            (sv if sv is not None else F.lit(None).cast("string")).alias("raw_value_str"),
            F.lit(d.unit).cast("string").alias("unit"),
        )
        branches.append(F.when((F.col("apid") == d.apid) & fits, struct))

    exploded = packets.select(
        F.col("apid"),
        F.col("seq_count"),
        dec.tai_time(F.col("source_time_tai"), F.col("seq_count")).alias("time_tai"),
        F.explode(
            F.filter(F.array(*branches), lambda s: s.isNotNull())
        ).alias("p"),
    )

    return exploded.select(
        F.col("p.name").alias("name"),
        F.col("apid"),
        F.col("seq_count"),
        F.col("time_tai"),
        F.col("p.raw_value").alias("raw_value"),
        F.col("p.raw_value_str").alias("raw_value_str"),
        # eng value initialises to raw; hex string for BINARY (decom.py:100)
        F.col("p.raw_value").alias("eng_value"),
        F.col("p.raw_value_str").alias("eng_value_str"),
        F.col("p.unit").alias("unit"),
        F.lit(True).alias("validity"),
        F.lit(None).cast("string").alias("calibration_id"),
        F.lit(False).alias("out_of_limit"),
        F.lit(0).alias("alarm_level"),
    )
