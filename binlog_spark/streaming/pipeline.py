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


def run_stream(spark: SparkSession, frames_dir: str, lake_path: str,
               registry: dict, checkpoint_dir: str,
               max_files_per_trigger: int = 2,
               chunk_size: int | None = None):
    """Start the streaming apply; returns the StreamingQuery.

    Call ``query.awaitTermination()`` / ``processAllAvailable()`` to drive;
    kill and re-invoke with the same checkpoint_dir to resume.
    """
    store = _MetaStore(os.path.join(checkpoint_dir, "table_map_cache.json"))

    def apply_batch(batch_df, batch_id: int):
        lake = LakeTable(spark, lake_path)  # re-read manifest each batch
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


def run_stream_multi(spark: SparkSession, frames_dir: str, lake_paths: dict,
                     registry: dict, checkpoint_dir: str,
                     max_files_per_trigger: int = 2):
    """Streaming multi-table fan-out: one source, one decode per
    microbatch, each table's changes applied to its own lake
    (``lake_paths``: ``{(db, tbl): lake_path}``). Same resume contract
    as ``run_stream`` — checkpointed offsets plus each lake's own
    batch-id/GTID guards make a replayed microbatch a per-table no-op."""
    store = _MetaStore(os.path.join(checkpoint_dir, "table_map_cache.json"))

    def apply_batch(batch_df, batch_id: int):
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
