"""End-to-end batch replay: frames → decode → transactions → fold → MERGE.

The Spark lifecycle equivalent of the reference's flagship path
(`RowStreamer.Stream`, `/root/reference/row_streamer.go:66-88` — traced in
SURVEY.md §3/E1): one shuffle-free Arrow decode stage, one window shuffle
per binlog file for transaction assembly, one key shuffle for the fold,
and a bucket-pruned copy-on-write MERGE.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schema as S
from .operators.decode import decode_frames, discover_stream_meta
from .operators.lineage import write_lineage
from .operators.lww import fold_changes
from .operators.merge import LakeTable
from .operators.transactions import assemble_transactions, ddl_stream

_ADD_COLUMN_RE = re.compile(
    r"alter\s+table\s+\S+\s+add\s+(?:column\s+)?(\w+)", re.IGNORECASE)


def decode_to_changes(spark: SparkSession, frames: DataFrame,
                      registry: dict) -> DataFrame:
    """frames → committed change rows (CHANGE_SCHEMA), GTID-ordered."""
    meta = discover_stream_meta(frames)
    decoded = decode_frames(spark, frames, meta, registry)
    return assemble_transactions(decoded)


def apply_ddls(lake: LakeTable, ddls: list):
    """Iceberg-style in-flight schema evolution from the DDL side channel."""
    for row in ddls:
        m = _ADD_COLUMN_RE.match(row["sql"].strip())
        if m:
            lake.evolve_add_column(m.group(1))


def replay_batch(spark: SparkSession, frames: DataFrame, lake: LakeTable,
                 registry: dict, batch_id=None, chunk_size: int | None = None,
                 record_lineage: bool = True) -> dict:
    """Decode+apply one (micro)batch of frames into the lake table."""
    # Four Spark actions per batch, everything else pipelined inside them:
    #   1. schema discovery (tiny collect over TABLE_MAP/FORMAT_DESC frames)
    #   2. DDL side channel (first action → materializes the decode persist)
    #   3. per-bucket stats over the folded delta (collect: changed buckets
    #      + n_changes + gtid high-water mark, one small row per bucket)
    #   4. the MERGE join + bucket rewrite itself
    meta = discover_stream_meta(frames)
    decoded = decode_frames(spark, frames, meta, registry)
    decoded.persist()
    folded = None
    try:
        ddls = [r.asDict() for r in ddl_stream(decoded).collect()]
        apply_ddls(lake, ddls)

        changes = assemble_transactions(decoded)
        if record_lineage and batch_id is not None:
            changes.persist()
        folded = lake.bucket_of(
            fold_changes(changes, tuple(lake.meta["key"]),
                         chunk_size=chunk_size))
        folded.persist()
        per_bucket = (folded.groupBy("_bucket")
                      .agg(F.sum("n_events").alias("n"),
                           F.max("g").alias("g")).collect())
        n_changes = sum(r["n"] for r in per_bucket)
        max_gtid = max((r["g"] for r in per_bucket), default=None)
        stats = lake.merge_apply(
            folded, batch_id=batch_id, max_gtid=max_gtid,
            changed_buckets=[r["_bucket"] for r in per_bucket])
        stats["n_changes"] = n_changes
        stats["n_ddls"] = len(ddls)
        if record_lineage and batch_id is not None:
            write_lineage(changes, lake.path, batch_id)
            changes.unpersist()
        return stats
    finally:
        if folded is not None:
            folded.unpersist()
        decoded.unpersist()


def read_frames(spark: SparkSession, frames_dir: str) -> DataFrame:
    return spark.read.schema(S.FRAME_SCHEMA).parquet(frames_dir)
