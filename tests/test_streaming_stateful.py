"""applyInPandasWithState operator: running per-key LWW across batches.

Exercises the streaming state store (not foreachBatch): state must carry
between microbatches, stale (lower-ordered) updates must not re-emit,
and the CDC wrapper must key change rows from their row images.
"""

import glob
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq

from binlog_spark.streaming.stateful import cdc_running_lww, running_lww


def _write_watch_file(watch_dir, name, table, mtime):
    path = os.path.join(watch_dir, name)
    pq.write_table(table, path)
    os.utime(path, (mtime, mtime))


def _drain(out, query_name):
    q = (out.writeStream.format("memory").queryName(query_name)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()


def test_running_lww_state_carries_across_microbatches(spark, tmp_path):
    watch = str(tmp_path / "in")
    os.makedirs(watch)
    schema = pa.schema([("k", pa.string()), ("g", pa.int64()),
                        ("s", pa.int32()), ("v", pa.string())])
    now = time.time()
    _write_watch_file(watch, "f1.parquet", pa.table(
        {"k": ["A", "B"], "g": [5, 1], "s": [0, 0], "v": ["a5", "b1"]},
        schema=schema), now - 20)
    _write_watch_file(watch, "f2.parquet", pa.table(
        {"k": ["A", "B"], "g": [3, 2], "s": [0, 0],
         "v": ["stale", "b2"]}, schema=schema), now - 10)

    stream = (spark.readStream.schema("k string, g long, s int, v string")
              .option("maxFilesPerTrigger", 1).parquet(watch))
    out = running_lww(stream, ("k",), ("g", "s"), ("v",),
                      "k string", "g long, s int", "v string")
    _drain(out, "lww_state_test")

    got = {tuple(r) for r in spark.sql(
        "SELECT k, g, s, v, n_changes FROM lww_state_test").collect()}
    # batch 1 emits both keys; batch 2 emits ONLY B (A's g=3 is stale —
    # the state store remembered g=5 from the previous microbatch);
    # n_changes is per-key: B has seen 2 rows by batch 2
    assert got == {
        ("A", 5, 0, "a5", 1),
        ("B", 1, 0, "b1", 1),
        ("B", 2, 0, "b2", 2),
    }


def test_cdc_running_lww_keys_from_row_images(spark, tmp_path):
    watch = str(tmp_path / "in_cdc")
    os.makedirs(watch)
    after_t = pa.map_(pa.string(), pa.string())
    schema = pa.schema([
        ("gtid_seq", pa.int64()), ("seq_in_txn", pa.int32()),
        ("op", pa.string()), ("before", after_t), ("after", after_t)])

    def row(g, s, op, before, after):
        return {"gtid_seq": g, "seq_in_txn": s, "op": op,
                "before": list(before.items()) if before else None,
                "after": list(after.items()) if after else None}

    now = time.time()
    _write_watch_file(watch, "b1.parquet", pa.Table.from_pylist([
        row(1, 0, "I", None, {"repo": "r1", "path": "p", "content": "v1"}),
        row(2, 0, "I", None, {"repo": "r2", "path": "p", "content": "w1"}),
    ], schema=schema), now - 20)
    _write_watch_file(watch, "b2.parquet", pa.Table.from_pylist([
        # delete carries the key only in the before image
        row(3, 0, "D", {"repo": "r1", "path": "p"}, None),
    ], schema=schema), now - 10)

    stream = (spark.readStream.schema(
        "gtid_seq long, seq_in_txn int, op string, "
        "before map<string,string>, after map<string,string>")
        .option("maxFilesPerTrigger", 1).parquet(watch))
    out = cdc_running_lww(stream)
    _drain(out, "cdc_lww_state_test")

    got = {(r["_k_repo"], r["_k_path"], r["gtid_seq"], r["op"],
            r["n_changes"])
           for r in spark.sql("SELECT * FROM cdc_lww_state_test").collect()}
    assert got == {
        ("r1", "p", 1, "I", 1),
        ("r2", "p", 2, "I", 1),
        ("r1", "p", 3, "D", 2),  # tombstone wins; key came from `before`
    }


def test_watermark_drops_late_rows(spark, tmp_path):
    """Event-time watermark: a row arriving later than the allowed
    lateness (behind the previous batch's max event time - watermark) is
    DROPPED from its window; in-time rows keep aggregating."""
    from binlog_spark.streaming.windows import tumbling_counts

    watch = str(tmp_path / "in_wm")
    os.makedirs(watch)
    schema = pa.schema([("ts", pa.timestamp("us")), ("value", pa.float64())])

    def ts(minute):
        import datetime
        return datetime.datetime(2026, 1, 1, minute // 60, minute % 60)

    now = time.time()
    # batch 0: max event time 02:00 → watermark 01:30 (Spark activates a
    # new watermark one batch after the stats that produced it, hence the
    # spacer batch before the late row arrives)
    _write_watch_file(watch, "w1.parquet", pa.table(
        {"ts": [ts(10), ts(120)], "value": [1.0, 2.0]}, schema=schema),
        now - 30)
    _write_watch_file(watch, "w2.parquet", pa.table(
        {"ts": [ts(125)], "value": [2.5]}, schema=schema), now - 20)
    # batch 2: 00:20 is behind the 01:30 watermark → dropped;
    # 02:10 is in time → counted
    _write_watch_file(watch, "w3.parquet", pa.table(
        {"ts": [ts(20), ts(130)], "value": [10.0, 3.0]}, schema=schema),
        now - 10)

    stream = (spark.readStream.schema("ts timestamp, value double")
              .option("maxFilesPerTrigger", 1).parquet(watch))
    out = tumbling_counts(stream, window="1 hour", watermark="30 minutes")
    q = (out.writeStream.format("memory").queryName("wm_test")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()

    rows = spark.sql(
        "SELECT win_start, n_events, sum_value FROM wm_test").collect()
    per_window = {}
    for r in rows:  # update mode: last emission per window wins
        per_window[r["win_start"].strftime("%H:%M")] = (
            r["n_events"], r["sum_value"])
    # the 00:00 window NEVER saw the late 00:20 row (would be n=2, sum=11)
    assert per_window["00:00"] == (1, 1.0)
    assert per_window["02:00"] == (3, 7.5)


def test_retract_agg_across_microbatches_equals_one_shot(spark):
    """Incremental view maintenance: folding the changelog in three
    microbatches through per-batch retraction deltas yields exactly the
    one-shot batch aggregate — updates, deletes, and group migration
    crossing batch boundaries included."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from binlog_spark.queries import cdc_retract_agg, _OP_EXPR
    from binlog_spark.streaming.stateful import maintain_retract_agg

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev = ev.withColumn("op", F.expr(_OP_EXPR))
    m = ev.agg(F.max("event_id")).first()[0]
    cuts = [m // 3, 2 * m // 3]
    batches = [
        ev.where(F.col("event_id") <= cuts[0]),
        ev.where((F.col("event_id") > cuts[0])
                 & (F.col("event_id") <= cuts[1])),
        ev.where(F.col("event_id") > cuts[1]),
    ]
    got = maintain_retract_agg(spark, batches, "user_id", "event_type",
                               "value", "event_id")
    want = cdc_retract_agg(spark, "/root/testdata/sf0.001")
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w, (sorted(g), sorted(w))
