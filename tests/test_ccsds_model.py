"""Header codec parity tests (reference ``tests/test_models_packet.py``)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mission_data_pipeline_spark.models.ccsds import (
    PRIMARY_HEADER_LEN,
    CCSDSPrimaryHeader,
    build_packet,
)


def test_header_roundtrip_golden():
    h = CCSDSPrimaryHeader(
        version=0, packet_type=0, sec_hdr_flag=1, apid=0x100,
        seq_flags=0b11, seq_count=42, data_length=15,
    )
    assert CCSDSPrimaryHeader.from_bytes(h.to_bytes()) == h
    assert h.packet_length == PRIMARY_HEADER_LEN + 16


@settings(max_examples=200, deadline=None)
@given(
    version=st.integers(0, 7),
    packet_type=st.integers(0, 1),
    sec_hdr_flag=st.integers(0, 1),
    apid=st.integers(0, 2047),
    seq_flags=st.integers(0, 3),
    seq_count=st.integers(0, 16383),
    data_length=st.integers(0, 65535),
)
def test_header_roundtrip_property(**kw):
    h = CCSDSPrimaryHeader(**kw)
    assert CCSDSPrimaryHeader.from_bytes(h.to_bytes()) == h


def test_header_short_buffer_raises():
    with pytest.raises(ValueError):
        CCSDSPrimaryHeader.from_bytes(b"\x00\x01\x02")


def test_max_field_values():
    h = CCSDSPrimaryHeader(apid=2047, seq_count=16383, data_length=65535)
    r = CCSDSPrimaryHeader.from_bytes(h.to_bytes())
    assert (r.apid, r.seq_count, r.data_length) == (2047, 16383, 65535)


def test_seq_count_wraps():
    pkt = build_packet(0x10, 16384 + 5, b"\x00")
    h = CCSDSPrimaryHeader.from_bytes(pkt)
    assert h.seq_count == 5


def test_data_length_convention():
    pkt = build_packet(0x10, 0, b"\x01\x02\x03\x04")
    h = CCSDSPrimaryHeader.from_bytes(pkt)
    assert h.data_length == 3  # len(data_field) - 1
    assert len(pkt) == h.packet_length


def test_empty_data_field_rejected():
    with pytest.raises(ValueError):
        build_packet(0x10, 0, b"")
