"""Per-partition lineage + throughput metrics (north-rule requirement).

The reference exposes only a resume Position (`row_streamer.go:57-63,86`);
we additionally record, per applied batch and binlog file, the position
range and per-op event counts — enough to audit exactly which slice of the
stream landed in which lake version.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lineage_summary(changes: DataFrame) -> DataFrame:
    """Per binlog file: position range + op counts for an applied batch."""
    return changes.groupBy("file").agg(
        F.min("pos").alias("min_pos"),
        F.max("next_pos").alias("max_next_pos"),
        F.min("gtid_seq").alias("min_gtid"),
        F.max("gtid_seq").alias("max_gtid"),
        F.count("*").alias("n_changes"),
        F.sum((F.col("op") == "I").cast("long")).alias("n_insert"),
        F.sum((F.col("op") == "U").cast("long")).alias("n_update"),
        F.sum((F.col("op") == "D").cast("long")).alias("n_delete"),
    )


def write_lineage(changes: DataFrame, lake_path: str, batch_id,
                  metrics: dict | None = None) -> list:
    """Persist the per-file lineage plus batch throughput metrics
    (events applied, wall seconds, events/sec) next to the lake data."""
    rows = [r.asDict() for r in lineage_summary(changes).collect()]
    out_dir = os.path.join(lake_path, "_lineage")
    os.makedirs(out_dir, exist_ok=True)
    doc = {"batch_id": batch_id, "wall_time": time.time(), "files": rows}
    if metrics:
        doc["metrics"] = metrics
    with open(os.path.join(out_dir, f"batch-{batch_id}.json"), "w") as f:
        json.dump(doc, f, default=str)
    return rows
