"""Binlog frame integrity: distributed CRC32 checksum audit.

The reference strips the 4-byte checksum without verifying it
(`/root/reference/replication/binlog_event.go` — length arithmetic
only); so does the engine's hot decode path (P10, ``strip_checksum``) —
verification on every event would tax the steady state for corruption
that in practice enters via storage/transfer, not the socket. This
operator is the INTEGRITY SCAN run where it matters: over archived
binlog files or frame stores before a backfill, after a transfer, or on
a sampling schedule.

Scale shape: one narrow Arrow pass (``zlib.crc32`` is C, ~GB/s per
core; frames visit their existing partitions, zero shuffles) folding
per-file counters, then a tiny per-file aggregation. Output is one row
per binlog file — (n_frames, n_valid, n_corrupt) — so a 10^10-event
scan shuffles only file-count rows.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def checksum_audit(frames: DataFrame) -> DataFrame:
    """Verify every frame's trailing BINLOG_CHECKSUM_ALG_CRC32 against a
    CRC32 of the rest of the event (header included). Frames shorter
    than header+slot count as corrupt."""

    def _audit(batches):
        for pdf in batches:
            counts: dict = {}
            for fname, frame in zip(pdf["file"], pdf["frame"]):
                b = bytes(frame)
                ok = (len(b) >= 23
                      and zlib.crc32(b[:-4]) & 0xFFFFFFFF
                      == int.from_bytes(b[-4:], "little"))
                st = counts.setdefault(fname, [0, 0])
                st[0] += 1
                st[1] += 1 if ok else 0
            if counts:
                yield pd.DataFrame(
                    {"file": list(counts),
                     "n_frames": [v[0] for v in counts.values()],
                     "n_valid": [v[1] for v in counts.values()]})

    part = (frames.select("file", "frame")
            .mapInPandas(_audit,
                         "file string, n_frames long, n_valid long"))
    return (part.groupBy("file")
            .agg(F.sum("n_frames").alias("n_frames"),
                 F.sum("n_valid").alias("n_valid"))
            .withColumn("n_corrupt", F.col("n_frames") - F.col("n_valid")))
