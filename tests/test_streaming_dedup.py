"""dropDuplicatesWithinWatermark surface: redelivered change events are
dropped across microbatches while their key is inside the watermark
horizon, and the state really evicts afterwards (bounded-state contract
— re-arrival beyond the horizon emits again, by design)."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from binlog_spark.streaming.windows import dedup_within_watermark


def _write(watch, name, rows, mtime):
    table = pa.table(
        {"k": [r[0] for r in rows],
         "ts": pa.array([r[1] for r in rows],
                        type=pa.timestamp("us"))})
    path = os.path.join(watch, name)
    pq.write_table(table, path)
    os.utime(path, (mtime, mtime))


def test_dedup_within_watermark_drops_then_evicts(spark, tmp_path):
    watch = str(tmp_path / "in")
    os.makedirs(watch)
    t0 = 1_700_000_000_000_000  # us
    mins = 60 * 1_000_000
    now = time.time()
    # b1: first sight of A            b2: A redelivered inside horizon
    _write(watch, "f1.parquet", [("A", t0)], now - 40)
    _write(watch, "f2.parquet", [("A", t0 + 10 * mins),
                                 ("B", t0 + 10 * mins)], now - 30)
    # b3 jumps the watermark far past A's expiry; b4 is one more batch
    # because state eviction at batch N uses batch N-1's watermark
    # (Spark guarantees dedup WITHIN the delay; eviction beyond it is
    # best-effort and lags one batch)
    _write(watch, "f3.parquet", [("C", t0 + 1000 * mins)], now - 25)
    _write(watch, "f4.parquet", [("D", t0 + 1010 * mins)], now - 20)
    # b5: A re-delivered AFTER eviction -> emits again (horizon contract)
    _write(watch, "f5.parquet", [("A", t0 + 1020 * mins)], now - 10)

    stream = (spark.readStream.schema("k string, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(watch))
    out = dedup_within_watermark(stream, keys=("k",), ts_col="ts",
                                 watermark="30 minutes")
    q = (out.writeStream.format("memory").queryName("dedup_wm")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()

    got = [r["k"] for r in spark.sql("SELECT k FROM dedup_wm").collect()]
    assert sorted(got) == ["A", "A", "B", "C", "D"], got
