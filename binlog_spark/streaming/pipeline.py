"""Structured Streaming CDC apply with checkpointed exactly-once resume.

The streaming analogue of the reference's ``Stream(ctx, sendTransaction)``
loop (`/root/reference/row_streamer.go:66-88`): a file-based frame source
feeds ``foreachBatch``; each microbatch runs decode → transaction assembly
→ fold → idempotent MERGE. Resumability mirrors
``SetStartBinlogPosition``/``NextPosition`` (`row_streamer.go:57-63,86`):

* source offsets live in the Spark streaming checkpoint,
* the lake manifest records applied ``(batch_id)`` and the GTID high-water
  mark — a batch replayed after a crash (offsets committed but sink not,
  or vice versa) is a no-op thanks to the batch-id + row-level guards,
* the TABLE_MAP schema cache discovered so far is persisted next to the
  checkpoint (tiny JSON) and merged per batch, so a rows-event whose
  TABLE_MAP arrived in an earlier microbatch still decodes — the streaming
  equivalent of the reference's per-tableID cache refresh
  (`row_streamer.go:220-243`).

Microbatches are the tumbling processing-time windows of SURVEY §2.2; the
generator emits whole transactions within one binlog file, and the file
source never splits a file across batches, so transaction boundaries are
batch-internal by construction.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from .. import schema as S
from ..operators.decode import discover_stream_meta
from ..operators.merge import LakeTable
from ..pipeline import replay_batch, replay_batch_multi


class _MetaStore:
    """Persisted accumulated stream meta (checksum alg + table-map index)."""

    def __init__(self, path: str):
        self.path = path

    def load(self) -> dict:
        if not os.path.exists(self.path):
            return {"checksum_alg": 1, "table_maps": {}}
        with open(self.path) as f:
            raw = json.load(f)
        tms = {}
        for k, vers in raw["table_maps"].items():
            file, tid = k.rsplit("@", 1)
            tms[(file, int(tid))] = [(p, tuple(s)) for p, s in vers]
        return {"checksum_alg": raw["checksum_alg"], "table_maps": tms}

    def save(self, meta: dict):
        raw = {
            "checksum_alg": meta["checksum_alg"],
            "table_maps": {
                f"{f}@{tid}": [[p, list(s)] for p, s in vers]
                for (f, tid), vers in meta["table_maps"].items()
            },
        }
        tmp = self.path + ".tmp"
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(tmp, "w") as fh:
            json.dump(raw, fh)
        os.replace(tmp, self.path)


def _merge_meta(acc: dict, new: dict) -> dict:
    out = {"checksum_alg": new.get("checksum_alg", acc["checksum_alg"]),
           "table_maps": dict(acc["table_maps"])}
    for key, vers in new["table_maps"].items():
        merged = {v[0]: v[1] for v in out["table_maps"].get(key, [])}
        for pos, schema in vers:
            merged[pos] = tuple(schema) if not isinstance(schema, tuple) else schema
        out["table_maps"][key] = sorted(merged.items())
    return out


class _FileOrderGuard:
    """Cross-batch binlog-file order guard.

    Spark's file streaming source lists new files by modification time;
    binlog correctness needs NAME order (file names sort chronologically:
    ``binlog.NNNNNN``). A later-named file applied first would advance
    the lake's GTID watermark and make the earlier file's changes look
    already-applied — silent data loss. The guard persists the highest
    file name applied and fails the microbatch LOUDLY (before any state
    is touched; offsets stay uncommitted) if a batch would go backwards.
    For a source that is genuinely mtime-scrambled, use
    ``run_stream_ordered`` — it ingests by name, immune to mtimes."""

    def __init__(self, path: str):
        self.path = path

    def check_and_advance(self, files, batch_id):
        if not files:
            return
        lo, hi = min(files), max(files)
        prev = None
        if os.path.exists(self.path):
            with open(self.path) as f:
                prev = json.load(f)
        if prev is not None:
            if prev["batch_id"] == batch_id:
                return  # crash re-delivery of the same microbatch: fine
            # equality is a CONTINUATION, not a violation: one logical
            # binlog file legitimately spans several source chunks /
            # microbatches, and a re-delivered equal-name batch is a
            # no-op at the lake (GTID watermark + batch-id guards); only
            # a strictly EARLIER name proves out-of-order delivery
            if lo < prev["max_file"]:
                raise ValueError(
                    f"binlog file order violation: batch contains {lo!r} "
                    f"but {prev['max_file']!r} was already applied — the "
                    "file source delivered files out of name order "
                    "(mtime-scrambled directory?); use run_stream_ordered "
                    "for name-ordered ingestion")
        tmp = self.path + ".tmp"
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump({"max_file": hi, "batch_id": batch_id}, f)
        os.replace(tmp, self.path)


def run_stream(spark: SparkSession, frames_dir: str, lake_path: str,
               registry: dict, checkpoint_dir: str,
               max_files_per_trigger: int = 2,
               chunk_size: int | None = None,
               enforce_name_order: bool = True):
    """Start the streaming apply; returns the StreamingQuery.

    Call ``query.awaitTermination()`` / ``processAllAvailable()`` to drive;
    kill and re-invoke with the same checkpoint_dir to resume.
    ``enforce_name_order`` fails a microbatch loudly if the file source
    delivers binlog files out of name order (see ``_FileOrderGuard``).
    """
    store = _MetaStore(os.path.join(checkpoint_dir, "table_map_cache.json"))
    guard = _FileOrderGuard(
        os.path.join(checkpoint_dir, "file_order_hwm.json"))

    def apply_batch(batch_df, batch_id: int):
        lake = LakeTable(spark, lake_path)  # re-read manifest each batch
        if enforce_name_order:
            names = [r["file"] for r in
                     batch_df.select("file").distinct().collect()]
            guard.check_and_advance(names, batch_id)
        meta = _merge_meta(store.load(), discover_stream_meta(batch_df))
        store.save(meta)
        # same fused 3-action pipeline as the batch path (DDLs ride the
        # decode accumulator; stats+fold in one action; MERGE in one)
        replay_batch(spark, batch_df, lake, registry,
                     batch_id=f"stream-{batch_id}", chunk_size=chunk_size,
                     record_lineage=True, stream_meta=meta)

    stream = (
        spark.readStream.schema(S.FRAME_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(frames_dir)
    )
    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_stream_ordered(spark: SparkSession, frames_dir: str, lake_path: str,
                       registry: dict, checkpoint_dir: str,
                       max_files_per_trigger: int = 2,
                       fold_engine: str = "shuffle") -> dict:
    """Name-ordered AvailableNow ingestion: processes every parquet file
    under ``frames_dir`` in LEXICOGRAPHIC order (binlog names sort
    chronologically) in microbatches of ``max_files_per_trigger`` files —
    completely independent of file modification times, which Spark's file
    streaming source uses for ordering and which nothing on a real file
    system guarantees (copies, restores and parallel writers scramble
    them).

    Resume contract: a tiny cursor (last file fully applied) persists in
    ``checkpoint_dir``; batch ids derive from the first FILE NAME of each
    batch, so a crash between lake commit and cursor write re-delivers a
    batch whose id the lake has already applied — a no-op, same
    exactly-once algebra as the checkpointed stream. Returns
    ``{"batches": n, "files": m}``."""
    store = _MetaStore(os.path.join(checkpoint_dir, "table_map_cache.json"))
    cursor_path = os.path.join(checkpoint_dir, "file_cursor.json")
    last = None
    if os.path.exists(cursor_path):
        with open(cursor_path) as f:
            last = json.load(f)["last_file"]
    names = sorted(n for n in os.listdir(frames_dir)
                   if n.endswith(".parquet"))
    todo = [n for n in names if last is None or n > last]
    batches = 0
    for i in range(0, len(todo), max_files_per_trigger):
        chunk = todo[i : i + max_files_per_trigger]
        df = spark.read.schema(S.FRAME_SCHEMA).parquet(
            *[os.path.join(frames_dir, n) for n in chunk])
        lake = LakeTable(spark, lake_path)
        meta = _merge_meta(store.load(), discover_stream_meta(df))
        store.save(meta)
        replay_batch(spark, df, lake, registry,
                     batch_id=f"ordered-{chunk[0]}", record_lineage=True,
                     stream_meta=meta, fold_engine=fold_engine)
        tmp = cursor_path + ".tmp"
        os.makedirs(checkpoint_dir, exist_ok=True)
        with open(tmp, "w") as f:
            json.dump({"last_file": chunk[-1]}, f)
        os.replace(tmp, cursor_path)
        batches += 1
    return {"batches": batches, "files": len(todo)}


def run_stream_multi(spark: SparkSession, frames_dir: str, lake_paths: dict,
                     registry: dict, checkpoint_dir: str,
                     max_files_per_trigger: int = 2):
    """Streaming multi-table fan-out: one source, one decode per
    microbatch, each table's changes applied to its own lake
    (``lake_paths``: ``{(db, tbl): lake_path}``). Same resume contract
    as ``run_stream`` — checkpointed offsets plus each lake's own
    batch-id/GTID guards make a replayed microbatch a per-table no-op;
    the same ``_FileOrderGuard`` fails an mtime-scrambled source loudly
    before ANY table's watermark advances."""
    store = _MetaStore(os.path.join(checkpoint_dir, "table_map_cache.json"))
    guard = _FileOrderGuard(
        os.path.join(checkpoint_dir, "file_order_hwm.json"))

    def apply_batch(batch_df, batch_id: int):
        names = [r["file"] for r in
                 batch_df.select("file").distinct().collect()]
        guard.check_and_advance(names, batch_id)
        lakes = {key: LakeTable(spark, path)
                 for key, path in lake_paths.items()}
        meta = _merge_meta(store.load(), discover_stream_meta(batch_df))
        store.save(meta)
        replay_batch_multi(spark, batch_df, lakes, registry,
                           batch_id=f"stream-{batch_id}", stream_meta=meta)

    stream = (
        spark.readStream.schema(S.FRAME_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(frames_dir)
    )
    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_stream_raw(spark: SparkSession, raw_dir: str, lake_path: str,
                   registry: dict, checkpoint_dir: str,
                   max_files_per_trigger: int = 1):
    """Live ingestion of a GROWING raw-binlog archive directory — the
    deployment where the server (or a copy job) keeps dropping completed
    ``binlog.NNNNNN`` files into object storage and the engine tails the
    directory: ``readStream.format("binaryFile")`` discovers new files
    via the checkpointed file index, each microbatch's blobs split into
    frames by the shared header-chain kernel
    (``sources/binlog_file.frames_from_binary_df``), then the exact
    batch apply. Resume contract is identical to ``run_stream``:
    checkpointed source offsets + the lake's batch-id / GTID guards make
    a re-delivered microbatch a no-op.

    One binlog file is bounded by ``max_binlog_size`` (1 GiB default),
    so whole-file blobs are a safe executor-memory unit; keep
    ``max_files_per_trigger`` small to bound microbatch memory."""
    from ..sources.binlog_file import frames_from_binary_df

    store = _MetaStore(os.path.join(checkpoint_dir, "table_map_cache.json"))
    # binaryFile lists new files by MODIFICATION TIME, same as the parquet
    # source — an mtime-scrambled archive (copies/restores/parallel
    # writers) must fail loudly before the lake GTID watermark advances
    # past an unapplied earlier file (see _FileOrderGuard)
    guard = _FileOrderGuard(
        os.path.join(checkpoint_dir, "file_order_hwm.json"))

    def apply_batch(batch_df, batch_id: int):
        names = [os.path.basename(r["path"]) for r in
                 batch_df.select("path").collect()]
        guard.check_and_advance(names, batch_id)
        frames = frames_from_binary_df(batch_df)
        lake = LakeTable(spark, lake_path)
        meta = _merge_meta(store.load(), discover_stream_meta(frames))
        store.save(meta)
        replay_batch(spark, frames, lake, registry,
                     batch_id=f"raw-{batch_id}", record_lineage=True,
                     stream_meta=meta)

    stream = (
        spark.readStream.format("binaryFile")
        # the file streaming source requires an explicit schema; this is
        # binaryFile's fixed one
        .schema("path string, modificationTime timestamp, "
                "length long, content binary")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(raw_dir)
    )
    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
