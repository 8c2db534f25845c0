"""Offline raw-binlog-file source: the mysqlbinlog-style entry path.

The reference consumes the dump protocol over a socket
(`/root/reference/dump/`, mirrored live by `sources/dump_protocol.py`);
this module is the OTHER way real deployments obtain binlogs — archived
`binlog.NNNNNN` files copied off the server (or out of an object store),
each ``\\xfebin`` magic + back-to-back events, every event carrying the
v4 common header (type@4, event_length@9, next_position@13 —
`/root/reference/replication/binlog_event.go` documents the layout).

Scale shape: ``spark.read.format("binaryFile")`` yields one row per
file; a single Arrow pass walks the header chain and explodes the blob
into the engine's FRAME rows (file, pos, etype, frame), after which the
ENTIRE existing pipeline — decode, transaction assembly, fold, MERGE —
runs unchanged. One binlog file is bounded by the server's
``max_binlog_size`` (1 GiB default), so a whole-file blob is a safe
executor-memory unit, and files are the natural partition: the splitter
is narrow (zero shuffles), parallelism = file count, exactly like the
parquet frame layout.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MAGIC = b"\xfebin"
_HDR = 19  # v4 common header bytes


def write_binlog_files(result, out_dir: str) -> str:
    """Serialize a generated world's frames into REAL binlog files —
    byte-for-byte what a server would have written (magic + events at
    their recorded offsets). Test/benchmark utility; production inputs
    are files copied off a server."""
    os.makedirs(out_dir, exist_ok=True)
    by_file: dict = {}
    for fname, pos, _etype, frame in result.frames:
        by_file.setdefault(fname, []).append((pos, frame))
    for fname, rows in by_file.items():
        rows.sort()
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(MAGIC)
            for pos, frame in rows:
                assert f.tell() == pos, (fname, pos, f.tell())
                f.write(frame)
    return out_dir


def split_binlog_blob(name: str, buf: bytes):
    """Walk one binlog file's header chain → [(pos, etype, frame)].

    Strict: a corrupt length field or a mid-event truncation (crashed
    server) raises rather than silently dropping the tail — the caller
    decides whether a truncated final file is acceptable."""
    if buf[:4] != MAGIC:
        raise ValueError(f"{name}: not a binlog file (bad magic "
                         f"{buf[:4]!r})")
    out = []
    pos, n = 4, len(buf)
    while pos < n:
        if pos + _HDR > n:
            raise ValueError(f"{name}: truncated header at {pos}")
        elen = int.from_bytes(buf[pos + 9:pos + 13], "little")
        if elen < _HDR or pos + elen > n:
            raise ValueError(f"{name}: bad event_length {elen} at {pos}")
        out.append((pos, buf[pos + 4], buf[pos:pos + elen]))
        pos += elen
    return out


def read_binlog_files(spark: SparkSession, path: str) -> DataFrame:
    """Directory (or glob) of raw binlog files → FRAME rows, ready for
    ``pipeline.replay_batch`` / the streaming source — the offline
    equivalent of the dump-protocol client."""
    return frames_from_binary_df(spark.read.format("binaryFile").load(path))


def frames_from_binary_df(raw: DataFrame) -> DataFrame:
    """``binaryFile``-shaped rows (path, content) → FRAME rows. Shared by
    the batch reader and the streaming archive tail (each microbatch of
    ``readStream.format("binaryFile")`` passes through here inside
    ``foreachBatch``)."""

    def _split(batches):
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(p)
                events = split_binlog_blob(name, bytes(content))
                yield pd.DataFrame({
                    "file": [name] * len(events),
                    "pos": [e[0] for e in events],
                    "etype": [int(e[1]) for e in events],
                    "frame": [e[2] for e in events],
                })

    return (raw.select("path", "content")
            .mapInPandas(_split,
                         "file string, pos long, etype int, frame binary"))
