"""Incrementally-maintained time rollup (continuous aggregate).

The hypertable-rollup pattern: a pre-aggregated table keyed by (time
bucket, dimensions) that is maintained INCREMENTALLY as batches of rows
arrive, instead of recomputed from the raw table. The reference has no
aggregation at all (SURVEY §2.2); this is part of the engine's
lake-side half, built like the LWW lake table (operators/merge.py):

* additive state per group — ``(n_rows, sum_value, min_value,
  max_value)`` — whose merge is associative/commutative, so each batch
  contributes one tiny pre-aggregated delta (map-side partial combine is
  free: it's a plain groupBy);
* hash-bucketed copy-on-write storage with an atomic JSON manifest: a
  batch only rewrites buckets whose groups it touched;
* exactly-once by batch id: addition is NOT idempotent, so re-applying
  a crashed batch must be (and is) a manifest-level no-op — the same
  ``applied_batches`` guard as the lake table.

At 100 TB: the delta per batch is O(groups touched), buckets scale like
the lake's, and the combine join touches only changed buckets — the
standard continuous-aggregate cost model (work ∝ new data, not table
size).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

AGG_COLS = ["n_rows", "sum_value", "min_value", "max_value"]


def _bucket_expr(group_cols, n_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(c) for c in group_cols]),
                  F.lit(n_buckets))


class RollupTable:
    """Bucketed additive-aggregate store over ``group_cols``.

    ``sum_value`` is stored at DECIMAL(38,6) — the type Spark's SUM over
    DECIMAL(28,6) inputs naturally widens to — so merges never narrow-cast
    (a cast back to (28,6) would silently NULL on overflow in non-ANSI
    mode, corrupting the rollup). Exact, association-free: the incremental
    result matches a one-shot GROUP BY bit-for-bit (and the DuckDB
    oracle)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, "_meta.json")) as f:
            self.meta = json.load(f)

    @classmethod
    def create(cls, spark: SparkSession, path: str, group_cols: list,
               n_buckets: int = 16) -> "RollupTable":
        os.makedirs(path, exist_ok=True)
        meta = {"group_cols": list(group_cols), "n_buckets": n_buckets,
                "buckets": {}, "version": 0, "applied_batches": []}
        tmp = os.path.join(path, "_meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(path, "_meta.json"))
        return cls(spark, path)

    def _commit_meta(self, meta: dict):
        tmp = os.path.join(self.path, "_meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.path, "_meta.json"))
        self.meta = meta

    def _schema(self) -> T.StructType:
        fields = [T.StructField(c, T.StringType(), True)
                  for c in self.meta["group_cols"]]
        fields += [T.StructField("n_rows", T.LongType(), True),
                   T.StructField("sum_value", T.DecimalType(38, 6), True),
                   T.StructField("min_value", T.DoubleType(), True),
                   T.StructField("max_value", T.DoubleType(), True)]
        return T.StructType(fields)

    def read(self, buckets=None) -> DataFrame:
        live = self.meta["buckets"]
        want = [str(b) for b in buckets] if buckets is not None else list(live)
        paths = [os.path.join(self.path, "data", f"v{live[b]:06d}",
                              f"_bucket={b}") for b in want if b in live]
        if not paths:
            return self.spark.createDataFrame([], self._schema())
        return self.spark.read.schema(self._schema()).parquet(*paths)

    def to_df(self) -> DataFrame:
        return self.read().select(*self.meta["group_cols"], *AGG_COLS)

    def apply_batch(self, rows: DataFrame, value_col: str,
                    batch_id=None) -> dict:
        """Fold one batch of raw rows into the rollup.

        ``rows`` must carry the group columns (as strings) + ``value_col``.
        Exactly-once: an already-applied ``batch_id`` is a no-op (additive
        merges cannot rely on row-level idempotency)."""
        if batch_id is not None and batch_id in self.meta["applied_batches"]:
            return {"skipped": True, "batch_id": batch_id}
        gcols = self.meta["group_cols"]
        n_buckets = self.meta["n_buckets"]

        v = F.col(value_col)
        delta = (rows.groupBy(*gcols)
                 .agg(F.count("*").alias("n_rows"),
                      F.sum(v.cast("decimal(28,6)")).alias("sum_value"),
                      F.min(v.cast("double")).alias("min_value"),
                      F.max(v.cast("double")).alias("max_value"))
                 .withColumn("_bucket", _bucket_expr(gcols, n_buckets)))
        delta.persist()
        try:
            changed = [r["_bucket"] for r in
                       delta.select("_bucket").distinct().collect()]
            if not changed:
                return self._commit(batch_id, [], None)
            base = self.read(changed).withColumn(
                "_bucket", _bucket_expr(gcols, n_buckets))
            merged = (
                base.unionByName(delta)
                .groupBy(*gcols)
                .agg(F.sum("n_rows").alias("n_rows"),
                     F.sum("sum_value").cast("decimal(38,6)")
                     .alias("sum_value"),
                     F.min("min_value").alias("min_value"),
                     F.max("max_value").alias("max_value"))
                .withColumn("_bucket", _bucket_expr(gcols, n_buckets)))
            new_version = self.meta["version"] + 1
            out_dir = os.path.join(self.path, "data", f"v{new_version:06d}")
            (merged.repartition(max(len(changed), 1), F.col("_bucket"))
             .write.mode("overwrite").partitionBy("_bucket")
             .parquet(out_dir))
            written = {d.split("=", 1)[1] for d in os.listdir(out_dir)
                       if d.startswith("_bucket=")}
            return self._commit(batch_id,
                                [b for b in changed if str(b) in written],
                                new_version)
        finally:
            delta.unpersist()

    def _commit(self, batch_id, changed, new_version):
        meta = dict(self.meta)
        meta["buckets"] = dict(meta["buckets"])
        for b in changed:
            meta["buckets"][str(b)] = new_version
        if new_version is not None:
            meta["version"] = new_version
        if batch_id is not None:
            meta["applied_batches"] = meta["applied_batches"] + [batch_id]
        self._commit_meta(meta)
        return {"skipped": False, "batch_id": batch_id,
                "buckets_rewritten": len(changed)}
