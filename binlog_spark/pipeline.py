"""End-to-end batch replay: frames → decode → transactions → fold → MERGE.

The Spark lifecycle equivalent of the reference's flagship path
(`RowStreamer.Stream`, `/root/reference/row_streamer.go:66-88` — traced in
SURVEY.md §3/E1): one shuffle-free Arrow decode stage, one window shuffle
per binlog file for transaction assembly, one key shuffle for the fold,
and a bucket-pruned copy-on-write MERGE.
"""

from __future__ import annotations

import re
import time as _time

from pyspark.accumulators import AccumulatorParam
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schema as S
from .operators.decode import decode_frames, discover_stream_meta
from .operators.lineage import write_lineage
from .operators.lww import fold_changes, fold_changes_prefold
from .operators.merge import LakeTable
from .operators.transactions import assemble_transactions

_ADD_COLUMN_RE = re.compile(
    r"alter\s+table\s+(\S+)\s+add\s+(?:column\s+)?(\w+)", re.IGNORECASE)

# sentinel for replay_batch(stream_meta=...): skip the discovery job and
# let the decode stage self-discover TABLE_MAPs from its own partitions
INLINE_DISCOVERY = "__inline_discovery__"


class _DdlAccum(AccumulatorParam):
    """List accumulator carrying DDL rows out of the decode stage."""

    def zero(self, value):
        return []

    def addInPlace(self, a, b):
        a.extend(b)
        return a


def decode_to_changes(spark: SparkSession, frames: DataFrame,
                      registry: dict) -> DataFrame:
    """frames → committed change rows (CHANGE_SCHEMA), GTID-ordered."""
    meta = discover_stream_meta(frames)
    decoded = decode_frames(spark, frames, meta, registry)
    return assemble_transactions(decoded)


# above this many discovered files the (file → segment) mapping rides a
# broadcast join instead of a map literal: a many-thousand-entry literal
# inflates plan compile/serialize time on every batch
SEGMENT_LITERAL_MAX = 1000


def _segment_runs(spark: SparkSession, meta: dict):
    """Discovered file list → ``[(file, segment_id)]``: contiguous runs of
    binlog files, one run per shuffle partition. Returns None when the
    meta carries no file index (inline discovery)."""
    files = sorted({f for (f, _tid) in meta["table_maps"]})
    if not files:
        return None
    p = int(spark.conf.get("spark.sql.shuffle.partitions", "16"))
    per_seg = max(1, -(-len(files) // max(p, 1)))
    return [(f, f"s:{i // per_seg}") for i, f in enumerate(files)]


def _segment_fallback():
    # a file absent from the TABLE_MAP index (e.g. pure markers) gets its
    # OWN segment: collapsing unmapped files into one NULL partition
    # would let last(gtid) carry-forward cross a file gap and stamp rows
    # with a gtid from a non-adjacent file (r3 ADVICE)
    return F.concat(F.lit("f:"), F.col("file"))


def segment_expr(spark: SparkSession, meta: dict):
    """File → segment-id Column (map-literal form, small file sets).

    Segments give the transaction windows and the map-side pre-fold
    their physical contract (a partition = whole gtid-contiguous slices
    of the stream) while keeping partition count at the cluster's
    parallelism even when the batch spans thousands of small files. The
    file list comes from the already-collected stream meta — no extra
    job. Returns None above ``SEGMENT_LITERAL_MAX`` files — callers
    attach the broadcast segment table instead (``attach_segments``)."""
    runs = _segment_runs(spark, meta)
    if runs is None:
        return F.col("file")
    if len(runs) > SEGMENT_LITERAL_MAX:
        return None
    pairs = []
    for f, seg in runs:
        pairs += [F.lit(f), F.lit(seg)]
    return F.coalesce(F.element_at(F.create_map(*pairs), F.col("file")),
                      _segment_fallback())


def attach_segments(spark: SparkSession, decoded: DataFrame,
                    meta: dict) -> DataFrame:
    """``decoded`` + ``_seg`` via a BROADCAST join against the tiny
    (file → segment) table — constant plan size at any file count (the
    scale path for batches spanning thousands of binlog files)."""
    runs = _segment_runs(spark, meta)
    if runs is None:
        return decoded.withColumn("_seg", F.col("file"))
    segs = spark.createDataFrame(runs, "file string, _seg_map string")
    return (decoded.join(F.broadcast(segs), "file", "left")
            .withColumn("_seg", F.coalesce(F.col("_seg_map"),
                                           _segment_fallback()))
            .drop("_seg_map"))


def apply_ddls(lake: LakeTable, ddls: list):
    """Iceberg-style in-flight schema evolution from the DDL side channel.

    In a multi-table stream only the lake's own table's ALTERs apply: the
    statement's table token (``tbl`` or ``db.tbl``, optionally quoted)
    must match the lake identity when one is recorded."""
    target = lake.meta.get("table")
    for row in ddls:
        m = _ADD_COLUMN_RE.match(row["sql"].strip())
        if not m:
            continue
        if target is not None:
            db, tbl = target
            token = m.group(1).strip('`"').lower()
            names = {tbl.lower(), f"{db}.{tbl}".lower()}
            if token not in names:
                continue
        lake.evolve_add_column(m.group(2))


def replay_batch(spark: SparkSession, frames: DataFrame, lake: LakeTable,
                 registry: dict, batch_id=None, chunk_size: int | None = None,
                 record_lineage: bool = True,
                 stream_meta: dict | None = None,
                 target_table: tuple | None = None,
                 fold_engine: str = "shuffle") -> dict:
    """Decode+apply one (micro)batch of frames into the lake table.

    ``stream_meta``: pass a pre-merged TABLE_MAP index (streaming keeps an
    accumulated one across microbatches) to skip the discovery job.
    ``target_table``: ``(db, tbl)`` this lake table materializes; other
    tables' change rows in the same stream are excluded before the fold
    (the MERGE idempotency key is (gtid, table, row-key) per the north
    rule — one LakeTable applies one table). Defaults to the lake
    manifest's recorded identity, else no filter (single-table streams).
    ``fold_engine``: ``"shuffle"`` (default) shuffles the change set on
    the key and folds sorted runs; ``"prefold"`` pre-reduces map-side per
    (key, file segment) before a partials-only shuffle — wins when keys
    are hot (events per key per segment ≫ 1, the 10^10-event hot-repo
    regime), loses when most keys are touched once per batch (the
    partials add a second Arrow conversion for no volume cut) — both
    A/B-measured in BENCH/BASELINE.md.

    ``stream_meta=INLINE_DISCOVERY`` skips the schema-discovery job
    entirely: the decode stage self-discovers TABLE_MAP /
    FORMAT_DESCRIPTION frames from its own partitions (the colsplit
    overlay). Sound whenever decode partitions hold whole binlog files
    or file prefixes — the standard layout (one parquet per binlog
    file) — because a TABLE_MAP physically precedes its ROWS events; a
    rows event whose TABLE_MAP sits in another partition dead-letters
    rather than mis-decoding. One fewer Spark job per batch.
    """
    # Three Spark actions per batch (two with INLINE_DISCOVERY),
    # everything else pipelined inside them:
    #   1. schema discovery (tiny collect over TABLE_MAP/FORMAT_DESC
    #      frames) — skipped in inline mode (decode self-discovers)
    #   2. per-bucket stats over the folded delta (collect) — this single
    #      action materializes decode+assemble+fold, and the DDL side
    #      channel rides along in an accumulator instead of its own job
    #   3. the MERGE join + bucket rewrite itself
    t_start = _time.perf_counter()
    if stream_meta is INLINE_DISCOVERY:
        if fold_engine == "prefold":
            raise ValueError("prefold needs the discovered file list for "
                             "segmenting; use discovery or fold_engine="
                             "'shuffle'")
        meta = {"checksum_alg": 1, "table_maps": {}}
    elif stream_meta is not None:
        meta = stream_meta
    else:
        meta = discover_stream_meta(frames)
    ddl_acc = spark.sparkContext.accumulator([], _DdlAccum())
    # decoded is NOT persisted: the fold's stats action is the only pass
    # through it (the lineage re-read is served by changes.persist, which
    # that same pass populates) — caching the full decoded set would cost
    # a storage-memory write of every change row for zero re-reads
    decoded = decode_frames(spark, frames, meta, registry, ddl_acc=ddl_acc)
    folded = None
    changes = None
    try:
        prefold = fold_engine == "prefold" and not chunk_size
        if prefold:
            seg = segment_expr(spark, meta)
            if seg is None:  # >SEGMENT_LITERAL_MAX files: broadcast join
                changes = assemble_transactions(
                    attach_segments(spark, decoded, meta),
                    segment=F.col("_seg"))
            else:
                changes = assemble_transactions(decoded, segment=seg)
        else:
            changes = assemble_transactions(decoded)
        target = target_table or lake.meta.get("table")
        if target is not None:
            db, tbl = target
            changes = changes.where((F.col("db") == db) & (F.col("tbl") == tbl))
        if record_lineage and batch_id is not None:
            changes.persist()
        if prefold:
            # map-side pre-fold riding the segment windows' partitioning
            # and sort: the key shuffle carries ~one partial per
            # (key, segment) instead of every change row
            folded = lake.bucket_of(
                fold_changes_prefold(changes, tuple(lake.meta["key"])))
        else:
            folded = lake.bucket_of(
                fold_changes(changes, tuple(lake.meta["key"]),
                             chunk_size=chunk_size))
        folded.persist()
        per_bucket = (folded.groupBy("_bucket")
                      .agg(F.sum("n_events").alias("n"),
                           F.max("g").alias("g")).collect())
        n_changes = sum(r["n"] for r in per_bucket)
        max_gtid = max((r["g"] for r in per_bucket), default=None)
        # merge_apply drops delta rows at-or-below the lake's gtid
        # watermark; apply the same cut to the changed-bucket list so a
        # re-delivered batch commits a no-op instead of rewriting every
        # touched bucket byte-identically
        hwm = lake.meta.get("last_gtid", -1)
        effective = [r for r in per_bucket if r["g"] > hwm]

        # accumulator is complete once the stats action returns; dedupe by
        # (file, pos) — task retries re-fire accumulator updates
        seen, ddls = set(), []
        for file, pos, ts, db, sql, cat in sorted(ddl_acc.value):
            if (file, pos) in seen:
                continue
            seen.add((file, pos))
            ddls.append({"file": file, "pos": pos, "ts": ts, "db": db,
                         "sql": sql, "category": cat})
        apply_ddls(lake, ddls)

        stats = lake.merge_apply(
            folded, batch_id=batch_id, max_gtid=max_gtid,
            changed_buckets=[r["_bucket"] for r in effective])
        stats["n_changes"] = n_changes
        stats["n_ddls"] = len(ddls)
        if record_lineage and batch_id is not None:
            secs = _time.perf_counter() - t_start
            write_lineage(changes, lake.path, batch_id, metrics={
                "n_changes": n_changes, "n_ddls": len(ddls),
                "seconds": round(secs, 3),
                "events_per_sec": round(n_changes / secs, 1) if secs else None,
            })
        return stats
    finally:
        if changes is not None and record_lineage and batch_id is not None:
            changes.unpersist()
        if folded is not None:
            folded.unpersist()


def replay_batch_multi(spark: SparkSession, frames: DataFrame, lakes: dict,
                       registry: dict, batch_id=None,
                       stream_meta: dict | None = None) -> dict:
    """One decode pass fanned out to multiple lake tables.

    ``lakes``: ``{(db, tbl): LakeTable}``. The stream is decoded and
    transaction-assembled ONCE (persisted across the fan-out), then each
    table's changes fold and MERGE into that table's lake — the
    multi-consumer shape of the reference's single callback receiving
    every table's events (`row_streamer.go:33-39`), with per-table
    exactly-once (each lake tracks its own batch ids / GTID watermark)
    and per-table DDL routing (``apply_ddls`` matches the statement's
    table token against each lake's identity).

    Returns ``{(db, tbl): merge_stats}``."""
    meta = (stream_meta if stream_meta is not None
            else discover_stream_meta(frames))
    ddl_acc = spark.sparkContext.accumulator([], _DdlAccum())
    decoded = decode_frames(spark, frames, meta, registry, ddl_acc=ddl_acc)
    changes_all = assemble_transactions(decoded)
    changes_all.persist()
    ddls = None
    out = {}
    try:
        for (db, tbl), lake in lakes.items():
            ch = changes_all.where(
                (F.col("db") == db) & (F.col("tbl") == tbl))
            folded = lake.bucket_of(
                fold_changes(ch, tuple(lake.meta["key"])))
            folded.persist()
            try:
                per_bucket = (folded.groupBy("_bucket")
                              .agg(F.sum("n_events").alias("n"),
                                   F.max("g").alias("g")).collect())
                n_changes = sum(r["n"] for r in per_bucket)
                max_gtid = max((r["g"] for r in per_bucket), default=None)
                hwm = lake.meta.get("last_gtid", -1)
                effective = [r for r in per_bucket if r["g"] > hwm]
                if ddls is None:  # accumulator complete after first action
                    seen, ddls = set(), []
                    for f, p, ts, d, sql, cat in sorted(ddl_acc.value):
                        if (f, p) in seen:
                            continue
                        seen.add((f, p))
                        ddls.append({"file": f, "pos": p, "ts": ts,
                                     "db": d, "sql": sql, "category": cat})
                apply_ddls(lake, ddls)
                stats = lake.merge_apply(
                    folded, batch_id=batch_id, max_gtid=max_gtid,
                    changed_buckets=[r["_bucket"] for r in effective])
                stats["n_changes"] = n_changes
                out[(db, tbl)] = stats
            finally:
                folded.unpersist()
        return out
    finally:
        changes_all.unpersist()


def read_frames(spark: SparkSession, frames_dir: str) -> DataFrame:
    return spark.read.schema(S.FRAME_SCHEMA).parquet(frames_dir)


def read_frames_from(spark: SparkSession, frames_dir: str,
                     start_file: str, start_pos: int) -> DataFrame:
    """Batch resume cursor — the analogue of the reference's
    COM_BINLOG_DUMP (offset, filename) request (P5,
    dump/packets.go:991-1007) and ``SetStartBinlogPosition``: scan only
    frames at or after the position. Both predicates push down to the
    parquet scan (file names sort chronologically: binlog.NNNNNN)."""
    f = read_frames(spark, frames_dir)
    return f.where(
        (F.col("file") > start_file)
        | ((F.col("file") == start_file) & (F.col("pos") >= start_pos)))


def bootstrap_from_snapshot(spark: SparkSession, snapshot: DataFrame,
                            lake: LakeTable, snapshot_gtid: int,
                            batch_id: str = "bootstrap") -> dict:
    """Initial load, then stream — the Debezium/DMS bootstrap mode the
    reference leaves to its consumers (they run `SHOW MASTER STATUS`,
    dump the table, then Stream from that position —
    /root/reference/example_test.go:76-98 sketches exactly this order).

    ``snapshot`` carries one row per live key with the lake's columns,
    transactionally consistent AS OF ``snapshot_gtid`` (MySQL guarantees
    such a cut under `FLUSH TABLES WITH READ LOCK` / a consistent-read
    dump). Every snapshot row is written stamped ``(_gtid_seq =
    snapshot_gtid, _seq_in_txn = 0)`` and the lake's GTID high-water mark
    advances to the snapshot position, so catch-up replay may start from
    ANY position at or before the snapshot: the overlap — every change
    with gtid ≤ snapshot_gtid, already reflected in the snapshot — is
    dropped wholesale by the watermark guard (tombstone-safe: keys the
    overlap deleted are simply absent from the snapshot and stay absent),
    and everything after applies through the normal LWW merge.

    Implementation is one ``merge_apply`` of the snapshot expressed as a
    full-row folded delta — bootstrap rides the same exactly-once
    bookkeeping (re-delivering the bootstrap batch is a manifest no-op)
    and the same one-shuffle bucketed write as every CDC batch.
    """
    if batch_id in lake.meta["applied_batches"]:
        return {"skipped": True, "batch_id": batch_id}  # crash re-delivery
    if lake.meta["buckets"] or lake.meta["applied_batches"]:
        raise ValueError("bootstrap_from_snapshot requires an empty lake "
                         "(bootstrap is the FIRST batch by definition)")
    cols = lake.meta["columns"]
    key_cols = lake.meta["key"]
    m = F.create_map(*[x for c in cols
                       for x in (F.lit(c), F.col(c).cast("string"))])
    folded = snapshot.select(
        *[F.col(k).cast("string").alias(f"_k_{k}") for k in key_cols],
        F.lit(False).alias("del"), F.lit(True).alias("full"),
        m.alias("m"),
        F.lit(int(snapshot_gtid)).cast("long").alias("g"),
        F.lit(0).cast("int").alias("s"),
        F.lit(1).cast("long").alias("n_events"))
    return lake.merge_apply(lake.bucket_of(folded), batch_id=batch_id,
                            max_gtid=int(snapshot_gtid))
