"""Parallel CCSDS binary packet scan.

Capability parity: reference ``src/mdp/plugins/extractors/binary.py:58-136``
(contiguous packet parse, optional 0x1ACFFC1D sync-marker scan, malformed
header skip, truncation stop, APID pushdown). The reference reads one
file sequentially on one core; here the scan is a *split-range* scan in
the style of Hadoop's FileInputFormat: the file set is carved into byte
ranges, each Spark task parses its range and must first **resynchronize**
to a packet boundary, because a range may start mid-packet. Two resync
modes:

- ``frame_sync=True``: scan forward for the attached sync marker
  (0x1ACFFC1D) — exact, O(range).
- ``frame_sync=False``: validated-header-chain heuristic: accept an
  offset iff a plausible primary header parses there AND the *next*
  ``resync_chain`` packets chain-parse with plausible headers. This is
  the standard recovery strategy of CCSDS ground processors; the
  probability of a false lock on random bytes falls geometrically with
  chain length.

A task parses from its first locked boundary through the first packet
that *starts* at or beyond ``range_end`` (reading into the next range's
bytes for the tail packet) — the same overlap convention that makes
line-based text splitting exact. Every packet is therefore emitted
exactly once, by exactly one task.

At 100 TB this is the right shape: no driver-side parse, no shuffle —
the scan is embarrassingly parallel over ranges, and the APID filter is
applied inside the range parser (predicate pushdown into the scan).
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from glob import glob

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from mission_data_pipeline_spark.models.ccsds import (
    CCSDS_SYNC_MARKER,
    PRIMARY_HEADER_LEN,
    CCSDSPrimaryHeader,
)
from mission_data_pipeline_spark.models.schemas import PACKET_SCHEMA

_RANGE_SCHEMA = (
    "path string, range_start long, range_end long, file_size long, "
    "sec_hdr_length int, frame_sync boolean, source_id string, "
    "ground_receipt_time double, max_packet_len int, resync_chain int, "
    "apid_filter array<int>"
)


def _header_plausible(hdr: CCSDSPrimaryHeader, max_packet_len: int) -> bool:
    return hdr.version == 0 and hdr.packet_length <= max_packet_len


def _find_sync(buf: bytes, start: int) -> int:
    i = buf.find(CCSDS_SYNC_MARKER, start)
    return -1 if i < 0 else i + len(CCSDS_SYNC_MARKER)


def _resync_heuristic(
    buf: bytes,
    start: int,
    limit: int,
    max_packet_len: int,
    chain: int,
    eof_in_buf: bool = False,
) -> int:
    """First offset in [start, limit) where a validated header chain locks.

    A candidate locks only if, through a validation horizon (64 KiB or
    ``chain`` links, whichever is longer):

    - every header in the chain parses plausible (version 0, sane
      length),
    - at least one *complete* packet fits in the buffer (random bytes
      love to claim a length that jumps straight past the buffer end),
    - and the CCSDS per-APID 14-bit sequence counter increments by
      exactly 1 (mod 16384) between consecutive same-APID packets.

    The sequence-continuity rule is the decisive discriminator: real
    telemetry payloads are often *periodic* (constant checksum fields,
    slow sine housekeeping values), so a misaligned offset can chain
    plausible headers with a self-consistent fake length forever — but
    the bytes it reads as ``seq_count`` come from payload fields and do
    not count 1-by-1. A true boundary always does (CCSDS 133.0-B-2
    §4.1.3.4). This is what makes a false lock — and therefore a
    duplicated or phantom packet in a parallel range scan — vanishingly
    unlikely.
    """
    horizon = max(64 * 1024, max_packet_len + PRIMARY_HEADER_LEN)
    pos = start
    while pos < limit:
        ok = True
        overran = False
        complete = 0
        p = pos
        last_seq: dict[int, int] = {}
        validate_until = min(len(buf), pos + horizon)
        while p + PRIMARY_HEADER_LEN <= len(buf) and (
            p < validate_until or complete <= chain
        ):
            hdr = CCSDSPrimaryHeader.from_bytes(buf[p : p + PRIMARY_HEADER_LEN])
            if not _header_plausible(hdr, max_packet_len):
                ok = False
                break
            prev = last_seq.get(hdr.apid)
            if prev is not None and (hdr.seq_count - prev) % 16384 != 1:
                ok = False
                break
            last_seq[hdr.apid] = hdr.seq_count
            if p + hdr.packet_length > len(buf):
                overran = True
                break
            complete += 1
            p += hdr.packet_length
        if ok:
            # Acceptance evidence, by how the chain walk terminated:
            # - ended exactly at true EOF: the precise landing is itself
            #   strong evidence; accepts trailing runs shorter than
            #   `chain` (the only way to recover an isolated tail packet).
            # - claimed extent past a *mid-file* buffer end: fine — the
            #   tail overlap holds chain+2 max-size packets, so a true
            #   chain accumulated `chain` completes first.
            # - claimed extent past true EOF: suspect. A real chain
            #   there lands exactly on EOF (or the file is truncated, in
            #   which case the parse loop drops the tail anyway) — random
            #   bytes love a length that jumps out of the file, so
            #   demand strictly more than `chain` completes.
            at_eof = eof_in_buf and p == len(buf)
            if overran and eof_in_buf:
                accept = complete > chain
            else:
                accept = complete >= max(chain, 1) or (at_eof and complete >= 1)
            if accept:
                return pos
        pos += 1
    return -1


def _parse_range(row: dict) -> Iterator[dict]:
    """Parse one byte range of one file into packet rows."""
    path = row["path"]
    range_start = int(row["range_start"])
    range_end = int(row["range_end"])
    file_size = int(row["file_size"])
    max_packet_len = int(row["max_packet_len"])
    chain = int(row["resync_chain"])

    # Read the range plus a tail overlap so the packet straddling
    # range_end can be completed by *this* task.
    tail = max_packet_len * (chain + 2) + len(CCSDS_SYNC_MARKER)
    read_end = min(file_size, range_end + tail)
    with open(path, "rb") as f:
        f.seek(range_start)
        buf = f.read(read_end - range_start)
    yield from _parse_buffer(buf, row, eof_in_buf=read_end >= file_size)


def _parse_buffer(
    buf: bytes, row: dict, *, eof_in_buf: bool
) -> Iterator[dict]:
    """Parse packets out of one in-memory buffer (shared with streaming)."""
    path = row["path"]
    range_start = int(row["range_start"])
    range_end = int(row["range_end"])
    sec_hdr_length = int(row["sec_hdr_length"])
    frame_sync = bool(row["frame_sync"])
    max_packet_len = int(row["max_packet_len"])
    chain = int(row["resync_chain"])
    apids = row["apid_filter"]
    apid_set = set(int(a) for a in apids) if apids is not None and len(apids) else None
    local_end = range_end - range_start  # packets must *start* before this
    pos = 0
    if range_start > 0 or frame_sync:
        if frame_sync:
            pos = _find_sync(buf, 0)
        else:
            pos = _resync_heuristic(buf, 0, local_end, max_packet_len, chain, eof_in_buf)
        if pos < 0:
            return

    while pos < local_end and pos + PRIMARY_HEADER_LEN <= len(buf):
        hdr = CCSDSPrimaryHeader.from_bytes(buf[pos : pos + PRIMARY_HEADER_LEN])
        if not _header_plausible(hdr, max_packet_len):
            # Malformed header: skip forward to next lock point
            # (reference skips a single byte and rescans for sync).
            if frame_sync:
                nxt = _find_sync(buf, pos + 1)
            else:
                nxt = _resync_heuristic(
                    buf, pos + 1, local_end, max_packet_len, chain, eof_in_buf
                )
            if nxt < 0:
                return
            pos = nxt
            continue
        end = pos + hdr.packet_length
        if end > len(buf):
            return  # truncated trailing packet — stop (reference behavior)
        if apid_set is None or hdr.apid in apid_set:
            data_field = buf[pos + PRIMARY_HEADER_LEN : end]
            n_sec = sec_hdr_length if hdr.sec_hdr_flag else 0
            yield {
                "apid": hdr.apid,
                "version": hdr.version,
                "packet_type": hdr.packet_type,
                "sec_hdr_flag": hdr.sec_hdr_flag,
                "seq_flags": hdr.seq_flags,
                "seq_count": hdr.seq_count,
                "data_length": hdr.data_length,
                "sec_hdr": bytes(data_field[:n_sec]) if n_sec else None,
                "user_data": bytes(data_field[n_sec:]),
                "source_time_tai": None,
                "ground_receipt_time": row["ground_receipt_time"],
                "source_id": row["source_id"],
                "file_path": path,
                "file_offset": range_start + pos,
            }
        pos = end
        if frame_sync and pos < local_end:
            nxt = _find_sync(buf, pos)
            if nxt < 0:
                return
            pos = nxt


def _split_ranges(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in pdfs:
        rows = []
        for row in pdf.to_dict("records"):
            rows.extend(_parse_range(row))
        yield pd.DataFrame(
            rows, columns=[f.name for f in PACKET_SCHEMA.fields]
        ) if rows else pd.DataFrame({f.name: [] for f in PACKET_SCHEMA.fields})


def read_packets(
    spark: SparkSession,
    path: str | list[str],
    *,
    apid_filter: list[int] | None = None,
    sec_hdr_length: int = 0,
    frame_sync: bool = False,
    source_id: str | None = None,
    ground_receipt_time: float | None = None,
    split_size: int = 128 * 1024 * 1024,
    max_packet_len: int = 65542,
    resync_chain: int = 2,
) -> DataFrame:
    """Scan CCSDS binary file(s) into a ``packets_df`` (PACKET_SCHEMA).

    ``split_size`` controls scan parallelism: each file is carved into
    ceil(size / split_size) ranges, one Spark task each. The default
    128 MiB matches ``spark.sql.files.maxPartitionBytes``.

    ``apid_filter`` is pushed into the range parser (packets are dropped
    before they ever materialize as rows — reference behavior
    ``binary.py:103-104``).
    """
    paths: list[str] = []
    for p in [path] if isinstance(path, str) else list(path):
        matches = sorted(glob(p)) if any(c in p for c in "*?[") else [p]
        for m in matches:
            if not os.path.exists(m):
                raise FileNotFoundError(m)
            paths.append(m)
    if not paths:
        raise FileNotFoundError(str(path))

    ranges = []
    for p in paths:
        size = os.path.getsize(p)
        start = 0
        while start < size:
            ranges.append(
                {
                    "path": os.path.abspath(p),
                    "range_start": start,
                    "range_end": min(size, start + split_size),
                    "file_size": size,
                    "sec_hdr_length": sec_hdr_length,
                    "frame_sync": frame_sync,
                    "source_id": source_id,
                    "ground_receipt_time": ground_receipt_time,
                    "max_packet_len": max_packet_len,
                    "resync_chain": resync_chain,
                    "apid_filter": apid_filter,
                }
            )
            start += split_size

    if not ranges:  # all files empty
        return spark.createDataFrame([], schema=PACKET_SCHEMA)
    ranges_df = spark.createDataFrame(ranges, schema=_RANGE_SCHEMA)
    # One task per range: repartition to the number of ranges so no two
    # ranges serialize behind each other on one core.
    ranges_df = ranges_df.repartition(len(ranges))
    return ranges_df.mapInPandas(_split_ranges, schema=PACKET_SCHEMA)
