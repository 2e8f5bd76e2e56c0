"""Property-based invariants (hypothesis) for the binary codecs.

Driver-side pure-Python properties — no Spark session needed, so these
run in milliseconds and explore the corners the golden tests pin:
header bit-packing, frame segmentation, packing math.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from mission_data_pipeline_spark.models.ccsds import (
    APID_IDLE,
    PRIMARY_HEADER_LEN,
    CCSDSPrimaryHeader,
    TMFramePrimaryHeader,
    build_packet,
    frame_packet_stream,
)


@given(
    version=st.integers(0, 7),
    packet_type=st.integers(0, 1),
    sec_hdr_flag=st.integers(0, 1),
    apid=st.integers(0, 0x7FF),
    seq_flags=st.integers(0, 3),
    seq_count=st.integers(0, 0x3FFF),
    data_length=st.integers(0, 0xFFFF),
)
def test_ccsds_header_roundtrip(**fields):
    hdr = CCSDSPrimaryHeader(**fields)
    assert CCSDSPrimaryHeader.from_bytes(hdr.to_bytes()) == hdr


@given(
    version=st.integers(0, 3),
    spacecraft_id=st.integers(0, 0x3FF),
    virtual_channel_id=st.integers(0, 7),
    ocf_flag=st.integers(0, 1),
    master_channel_frame_count=st.integers(0, 0xFF),
    virtual_channel_frame_count=st.integers(0, 0xFF),
    secondary_header_flag=st.integers(0, 1),
    sync_flag=st.integers(0, 1),
    packet_order_flag=st.integers(0, 1),
    segment_length_id=st.integers(0, 3),
    first_header_pointer=st.integers(0, 0x7FF),
)
def test_tm_frame_header_roundtrip(**fields):
    hdr = TMFramePrimaryHeader(**fields)
    assert TMFramePrimaryHeader.from_bytes(hdr.to_bytes()) == hdr


@settings(max_examples=50, deadline=None)
@given(
    sizes=st.lists(st.integers(1, 120), min_size=1, max_size=30),
    frame_data_len=st.integers(16, 96),
)
def test_frame_segmentation_preserves_every_packet(sizes, frame_data_len):
    """Segmenting any packet stream into any frame size loses nothing:
    walking the frames' data fields end-to-end recovers every packet
    byte-for-byte (pure-Python mirror of the frames_to_packets walk)."""
    packets = [
        build_packet(0x100 + (i % 5), i, bytes([(i * 7 + j) % 256 for j in range(n)]))
        for i, n in enumerate(sizes)
    ]
    stream = b"".join(packets)
    frames = frame_packet_stream(stream, frame_data_len=frame_data_len)
    # frames carry exactly the stream plus padding
    data = b"".join(f[6:] for f in frames)
    assert data[: len(stream)] == stream
    # padding is a well-formed idle packet or short fill
    pad = data[len(stream):]
    if len(pad) >= PRIMARY_HEADER_LEN + 1:
        hdr = CCSDSPrimaryHeader.from_bytes(pad[:PRIMARY_HEADER_LEN])
        assert hdr.apid == APID_IDLE
        assert hdr.packet_length == len(pad)
    # every frame's first_header_pointer points at a real packet header
    starts, pos = set(), 0
    for p in packets:
        starts.add(pos)
        pos += len(p)
    starts.add(len(stream))  # idle pad start
    for i, f in enumerate(frames):
        fhp = TMFramePrimaryHeader.from_bytes(f).first_header_pointer
        if fhp != 0x7FF:
            assert i * frame_data_len + fhp in starts
