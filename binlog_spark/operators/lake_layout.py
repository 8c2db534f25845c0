"""Lake-layout maintenance operators: small-file compaction planning and
Z-order clustering keys.

A CDC ingest engine commits a micro-batch per trigger, so the lake table
accumulates small files; the two standard maintenance jobs (cf. Iceberg's
``rewrite_data_files`` and sort-order rewrite) are

* **compaction planning** — bin-pack the ordered file inventory into
  target-size groups so each rewrite task reads ~one HDFS-block-sized
  input, and
* **Z-order clustering** — an interleaved-bit sort key over two pruning
  columns so multi-dimensional predicates skip files.

Both are pure JVM plans. The inventory prefix sum reuses the two-level
segmented cumsum of transaction assembly (``queries.cdc_txn_assembly``):
per-segment windows run in parallel and only the one-row-per-segment
totals see a global window, so there is no single-partition pass over
the full inventory (at 10^10 events / 128-event files the inventory is
~10^8 rows — too big for one partition, while segments stay tiny).
The bit interleave is a statically unrolled expression (32 shift/mask
terms), fully inside whole-stage codegen — no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# default geometry: one "file" per 64 change events, segments of 64 files
FILE_EVENTS = 64
SEG_FILES = 64
TARGET_BYTES = 16 * 1024
ZBITS = 16
ZCELL = 256


def file_inventory(events: DataFrame) -> DataFrame:
    """Simulated commit-file inventory from the change stream: one file
    per ``FILE_EVENTS`` events, sized by its payload bytes (the props
    JSON plus a fixed per-row header)."""
    return (events
            .withColumn("file_id",
                        F.expr(f"event_id div {FILE_EVENTS}"))
            .groupBy("file_id")
            .agg((F.sum(F.length("props") + F.lit(64)))
                 .cast("long").alias("size_bytes")))


def compaction_plan(events: DataFrame,
                    target_bytes: int = TARGET_BYTES) -> DataFrame:
    """Bin-pack the ordered file inventory into fixed-capacity compaction
    groups: a file starting at cumulative offset ``c`` joins bin
    ``c div target_bytes`` (deterministic, order-preserving — the greedy
    plan Iceberg's binpack rewrite computes).

    The running offset is a two-level prefix sum: per-segment window
    cumsum (parallel) + a broadcast prefix over one-row-per-segment
    totals, never a global window over the inventory itself.
    """
    inv = file_inventory(events).withColumn(
        "seg", F.expr(f"file_id div {SEG_FILES}"))
    w_in = (Window.partitionBy("seg").orderBy("file_id")
            .rowsBetween(Window.unboundedPreceding, -1))
    seg_tot = inv.groupBy("seg").agg(F.sum("size_bytes").alias("sz"))
    w_seg = Window.orderBy("seg").rowsBetween(Window.unboundedPreceding, -1)
    prefix = seg_tot.select(
        "seg", F.coalesce(F.sum("sz").over(w_seg), F.lit(0)).alias("prior"))
    offs = (inv.join(F.broadcast(prefix), "seg")
            .select("file_id", "size_bytes",
                    (F.col("prior")
                     + F.coalesce(F.sum("size_bytes").over(w_in), F.lit(0))
                     ).alias("start_off")))
    return (offs
            .withColumn("bin_id",
                        F.expr(f"start_off div {target_bytes}"))
            .groupBy("bin_id")
            .agg(F.count("*").alias("n_files"),
                 F.sum("size_bytes").cast("long").alias("total_bytes"),
                 F.min("file_id").alias("first_file"),
                 F.max("file_id").alias("last_file")))


def compaction_plan_sql(table: str = "events",
                        target_bytes: int = TARGET_BYTES) -> str:
    # CASTs: DuckDB widens sum()/windowed sum() to HUGEINT; the driver's
    # value hash is type-sensitive, so everything lands as BIGINT
    return f"""
WITH inv AS (
  SELECT event_id // {FILE_EVENTS} AS file_id,
         CAST(sum(length(props) + 64) AS BIGINT) AS size_bytes
  FROM {table} GROUP BY 1
), offs AS (
  SELECT file_id, size_bytes,
         CAST(coalesce(sum(size_bytes) OVER (
             ORDER BY file_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS start_off
  FROM inv
)
SELECT start_off // {target_bytes} AS bin_id,
       count(*) AS n_files,
       CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
       min(file_id) AS first_file,
       max(file_id) AS last_file
FROM offs GROUP BY 1
"""


def _z_terms_spark(x: str, y: str, bits: int = ZBITS) -> str:
    return " + ".join(
        f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})"
        f" + shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})"
        for i in range(bits))


def _z_terms_duckdb(x: str, y: str, bits: int = ZBITS) -> str:
    return " + ".join(
        f"((({x} >> {i}) & 1) << {2 * i})"
        f" + ((({y} >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits))


def zorder_cells(events: DataFrame, cell: int = ZCELL) -> DataFrame:
    """Z-order clustering layout preview: interleave the low ``ZBITS``
    bits of (user bucket, time bucket) into a Morton key and report the
    row/user distribution per target cell — the statistic a clustering
    rewrite uses to choose file split points.

    The interleave is 32 statically unrolled shift/mask terms — pure
    whole-stage-codegen arithmetic, narrow (no shuffle until the final
    cell aggregate)."""
    ev = events.select(
        "user_id", "event_id",
        F.expr("user_id % 65536").alias("zx"),
        F.expr("(event_id div 16) % 65536").alias("zy"))
    z = F.expr(_z_terms_spark("zx", "zy"))
    return (ev.withColumn("z", z)
            .withColumn("zcell", F.expr(f"z div {cell}"))
            .groupBy("zcell")
            .agg(F.count("*").alias("n_rows"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.min("z").alias("z_min"),
                 F.max("z").alias("z_max")))


def zorder_cells_sql(table: str = "events", cell: int = ZCELL) -> str:
    zexpr = _z_terms_duckdb("zx", "zy")
    return f"""
WITH base AS (
  SELECT user_id, user_id % 65536 AS zx,
         (event_id // 16) % 65536 AS zy
  FROM {table}
), keyed AS (
  SELECT user_id, CAST({zexpr} AS BIGINT) AS z FROM base
)
SELECT z // {cell} AS zcell,
       count(*) AS n_rows,
       count(DISTINCT user_id) AS n_users,
       min(z) AS z_min,
       max(z) AS z_max
FROM keyed GROUP BY 1
"""
