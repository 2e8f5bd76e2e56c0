"""ZIP archive source — one row per member, distributed per archive.

Corpus deliveries routinely arrive as ZIP/tar bundles of documents
(scanned-page bundles, per-site crawls, dataset dumps). This source
mirrors the WARC reader's shape (``sources/warc.py``): ``binaryFile``
distributes WHOLE archives — a ZIP's central directory lives at EOF, so
members are not splittable without reading it; one archive per task is
the right granularity for the ~100 MiB–1 GiB bundles deliveries ship —
and the member fan-out runs inside Arrow-batched ``mapInPandas``.
Payloads come out as opaque bytes for the downstream text/multimodal
operators; per-member CRC32 is verified during extraction, so
corruption surfaces as ``crc_ok = false`` rows rather than task
failures (the corrupt-input quarantine discipline of
``s_corrupt_file_skip``).

Stdlib ``zipfile`` only — deflate decompression is zlib, available on
every executor.
"""

from __future__ import annotations

import io
import zipfile
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, types as T

__all__ = ["ZIP_SCHEMA", "read_zip"]

ZIP_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("member_idx", T.IntegerType(), False),
        T.StructField("member_name", T.StringType(), False),
        T.StructField("compress_type", T.StringType(), False),
        T.StructField("compressed_size", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("size", T.LongType(), False),
        T.StructField("crc_ok", T.BooleanType(), False),
    ]
)

_COMPRESS_NAMES = {
    zipfile.ZIP_STORED: "stored",
    zipfile.ZIP_DEFLATED: "deflated",
    zipfile.ZIP_BZIP2: "bzip2",
    zipfile.ZIP_LZMA: "lzma",
}


def read_zip(
    spark: SparkSession,
    path: str,
    *,
    path_glob: str | None = None,
) -> DataFrame:
    """One row per ZIP member across every archive under ``path``.

    Directory entries are skipped. A member that fails extraction —
    CRC32 mismatch or decompression error — yields a quarantine row
    (``crc_ok = false``, ``payload`` NULL, ``size`` from the directory
    entry) instead of failing the task: corrupted members must never
    flow downstream as if intact, and one bad member must never kill a
    whole-archive task.
    """
    reader = spark.read.format("binaryFile")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    files = reader.load(path).select("path", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(bytes(content))) as zf:
                    idx = 0
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        try:
                            # zf.read verifies CRC32 at EOF and raises
                            # BadZipFile on mismatch; the belt-and-
                            # suspenders recheck guards older zipfile
                            # variants that skip it for stored members
                            payload = zf.read(info.filename)
                            ok = (zlib.crc32(payload) & 0xFFFFFFFF) == info.CRC
                            if not ok:
                                payload = None
                        except Exception:
                            payload, ok = None, False
                        rows.append(
                            {
                                "path": path_,
                                "member_idx": idx,
                                "member_name": info.filename,
                                "compress_type": _COMPRESS_NAMES.get(
                                    info.compress_type,
                                    str(info.compress_type),
                                ),
                                "compressed_size": int(info.compress_size),
                                "payload": payload,
                                "size": (
                                    len(payload)
                                    if payload is not None
                                    else int(info.file_size)
                                ),
                                "crc_ok": ok,
                            }
                        )
                        idx += 1
            cols = [f.name for f in ZIP_SCHEMA.fields]
            yield (
                pd.DataFrame(rows, columns=cols)
                if rows
                else pd.DataFrame({c: [] for c in cols})
            )

    return files.mapInPandas(run, schema=ZIP_SCHEMA)
