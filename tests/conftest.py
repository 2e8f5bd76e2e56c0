"""Shared fixtures: one session-scoped Spark, synthetic telemetry files.

Ports the reference's fixture strategy (``tests/conftest.py:19-98``):
hand-packed packets with known golden values, a small binary file, and
a CSV file — regenerated here from the public CCSDS layout, not copied.
"""

from __future__ import annotations

import math
import os
import struct

import pytest

from mission_data_pipeline_spark import get_spark
from mission_data_pipeline_spark.models.ccsds import (
    build_packet,
    generate_housekeeping_stream,
    generate_simple_stream,
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="mdps-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tmp_root(tmp_path_factory):
    return tmp_path_factory.mktemp("mdps")


@pytest.fixture(scope="session")
def simple_bin(tmp_root):
    """10 packets, apid=0x100, user_data = uint32 BE i*1000, no sec hdr."""
    p = tmp_root / "simple.bin"
    p.write_bytes(generate_simple_stream(10))
    return str(p)


@pytest.fixture(scope="session")
def hk_bin(tmp_root):
    """200 housekeeping packets (FIXTURES.md §2 layout)."""
    p = tmp_root / "hk.bin"
    p.write_bytes(generate_housekeeping_stream(200))
    return str(p)


@pytest.fixture(scope="session")
def mixed_apid_bin(tmp_root):
    """Packets across apids 0x100/0x200/0x300 with distinct payloads."""
    out = bytearray()
    for i in range(30):
        apid = (0x100, 0x200, 0x300)[i % 3]
        out += build_packet(apid, i, struct.pack(">HI", i, i * 10))
    p = tmp_root / "mixed.bin"
    p.write_bytes(bytes(out))
    return str(p)


@pytest.fixture(scope="session")
def csv_file(tmp_root):
    """Wide telemetry CSV (FIXTURES.md §3) with NaN holes."""
    lines = ["time,apid,seq_count,star_tracker_temp,reaction_wheel_rpm"]
    for i in range(50):
        st = f"{2200 + 100 * math.sin(i / 30):.2f}" if i % 7 != 3 else ""
        rw = f"{5000 + 200 * math.cos(i / 20):.2f}" if i % 11 != 5 else ""
        lines.append(f"{float(i)},768,{i},{st},{rw}")
    p = tmp_root / "telemetry.csv"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf0001():
    if not os.path.isdir(SF0001):
        pytest.skip("driver testdata not present")
    return SF0001
