"""CCSDS Space Packet primitives (CCSDS 133.0-B-2).

Behavioral parity target: reference ``src/mdp/models/packet.py:34-176``
(6-byte big-endian bit-packed primary header, ``data_length`` =
len(user_data_field) - 1, 14-bit wrapping sequence counter). This module
is the *driver/task-side* codec used by the binary source's packet
splitter and by test fixture generators; inside Spark plans the same
fields are recomputed with native expressions (see ``sources/binary.py``).

No code is copied from the reference — the bit layout is the public
CCSDS 133.0-B-2 standard.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

#: Attached-sync-marker pattern used by CCSDS channel frames; the
#: reference optionally scans for it between packets
#: (``src/mdp/plugins/extractors/binary.py:125-136``).
CCSDS_SYNC_MARKER = b"\x1a\xcf\xfc\x1d"

PRIMARY_HEADER_LEN = 6
SEQ_COUNT_MOD = 1 << 14  # 14-bit sequence counter wraps at 16384
APID_MAX = (1 << 11) - 1


@dataclass(frozen=True)
class CCSDSPrimaryHeader:
    """Parsed 48-bit CCSDS primary header.

    Field widths (bits): version 3, packet_type 1, sec_hdr_flag 1,
    apid 11, seq_flags 2, seq_count 14, data_length 16.
    ``data_length`` is the CCSDS convention: one fewer than the number
    of bytes in the packet data field.
    """

    version: int = 0
    packet_type: int = 0
    sec_hdr_flag: int = 0
    apid: int = 0
    seq_flags: int = 0b11  # unsegmented
    seq_count: int = 0
    data_length: int = 0

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CCSDSPrimaryHeader":
        if len(buf) < PRIMARY_HEADER_LEN:
            raise ValueError(
                f"CCSDS primary header needs {PRIMARY_HEADER_LEN} bytes, got {len(buf)}"
            )
        w0, w1, w2 = struct.unpack(">HHH", buf[:PRIMARY_HEADER_LEN])
        return cls(
            version=(w0 >> 13) & 0x7,
            packet_type=(w0 >> 12) & 0x1,
            sec_hdr_flag=(w0 >> 11) & 0x1,
            apid=w0 & 0x7FF,
            seq_flags=(w1 >> 14) & 0x3,
            seq_count=w1 & 0x3FFF,
            data_length=w2,
        )

    def to_bytes(self) -> bytes:
        w0 = ((self.version & 0x7) << 13) | ((self.packet_type & 0x1) << 12) | (
            (self.sec_hdr_flag & 0x1) << 11
        ) | (self.apid & 0x7FF)
        w1 = ((self.seq_flags & 0x3) << 14) | (self.seq_count & 0x3FFF)
        return struct.pack(">HHH", w0, w1, self.data_length & 0xFFFF)

    @property
    def packet_length(self) -> int:
        """Total packet bytes: header + data field (data_length + 1)."""
        return PRIMARY_HEADER_LEN + self.data_length + 1


def build_packet(
    apid: int,
    seq_count: int,
    user_data: bytes,
    *,
    sec_hdr: bytes = b"",
    packet_type: int = 0,
    seq_flags: int = 0b11,
) -> bytes:
    """Serialize one space packet (header + optional sec hdr + user data)."""
    data_field = sec_hdr + user_data
    if len(data_field) == 0:
        raise ValueError("CCSDS packet data field must be non-empty")
    hdr = CCSDSPrimaryHeader(
        version=0,
        packet_type=packet_type,
        sec_hdr_flag=1 if sec_hdr else 0,
        apid=apid,
        seq_flags=seq_flags,
        seq_count=seq_count % SEQ_COUNT_MOD,
        data_length=len(data_field) - 1,
    )
    return hdr.to_bytes() + data_field


def generate_housekeeping_stream(
    n_packets: int,
    *,
    apid: int = 0x100,
    with_sync_marker: bool = False,
    garbage_prefix: bytes = b"",
) -> bytes:
    """Synthetic housekeeping telemetry, FIXTURES.md §2 layout.

    Each packet: 4-byte uint32 BE secondary header (counter) + 12-byte
    user data: obc_temp_dn u16, bus_voltage_dn u16, bat_current_dn u16,
    mission_time_s f32, checksum u16 (0xABCD). Deterministic in ``i``.
    """
    out = bytearray()
    for i in range(n_packets):
        obc = int(2048 + 200 * math.sin(i / 20.0))
        bus = int(3000 + 50 * math.sin(i / 50.0))
        bat = int(1500 + 300 * math.cos(i / 15.0))
        user = struct.pack(">HHHfH", obc, bus, bat, i * 4.0, 0xABCD)
        pkt = build_packet(apid, i, user, sec_hdr=struct.pack(">I", i))
        if with_sync_marker:
            out += garbage_prefix + CCSDS_SYNC_MARKER
        out += pkt
    return bytes(out)


def generate_simple_stream(n_packets: int, *, apid: int = 0x100) -> bytes:
    """10-packet-style fixture: user_data = uint32 BE (i*1000), no sec hdr."""
    out = bytearray()
    for i in range(n_packets):
        out += build_packet(apid, i, struct.pack(">I", i * 1000))
    return bytes(out)
