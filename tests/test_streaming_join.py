"""Stream-stream interval join (streaming/joins.py): pairs match across
microbatches while both sides' state is live, a right-side row arriving
with event time far behind the global watermark is dropped (two-sided
bounded state — the contract that makes the join feasible unbounded),
and batch execution of the same plan agrees with a plain range join."""

import os
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlog_spark.streaming.joins import interval_join  # noqa: E402

T0 = 1_700_000_000_000_000  # event-time origin, microseconds
MIN = 60 * 1_000_000


def _write(d, name, rows, mtime):
    table = pa.table(
        {"user_id": [r[0] for r in rows],
         "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
         "event_id": [r[2] for r in rows]})
    path = os.path.join(d, name)
    pq.write_table(table, path)
    os.utime(path, (mtime, mtime))


def test_interval_join_streams_and_drops_late(spark, tmp_path):
    clicks_d, purch_d = str(tmp_path / "c"), str(tmp_path / "p")
    os.makedirs(clicks_d), os.makedirs(purch_d)
    now = time.time()

    # b1: click u1@t0. b2 (other side, later batch): purchase u1@t0+10m
    # -> must match ACROSS microbatches via buffered state.
    _write(clicks_d, "c1.parquet", [(1, T0, 100)], now - 50)
    _write(purch_d, "p1.parquet", [(1, T0 + 10 * MIN, 200)], now - 40)
    # b3: purchase u1@t0+2h -> outside the 1h interval, no match.
    _write(purch_d, "p2.parquet", [(1, T0 + 120 * MIN, 201)], now - 30)
    # b4: advance BOTH watermarks far ahead (the join watermark is the
    # min over inputs), then one more batch so eviction (which lags one
    # batch) completes.
    _write(clicks_d, "c2.parquet", [(9, T0 + 3000 * MIN, 101)], now - 25)
    _write(purch_d, "p3.parquet", [(9, T0 + 3001 * MIN, 202)], now - 24)
    # b5: a LATE purchase inside u1's original hour — its event time is
    # ~3000min behind the watermark, so the row is discarded: no match,
    # even though it would pair with click 100 in batch mode.
    _write(purch_d, "p4.parquet", [(1, T0 + 20 * MIN, 203)], now - 10)

    schema = "user_id long, ts timestamp, event_id long"
    cs = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(clicks_d)
          .withColumnRenamed("event_id", "click_id"))
    ps = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(purch_d)
          .withColumnRenamed("event_id", "purchase_id"))
    out = interval_join(cs, ps, key="user_id",
                        interval="1 hour", watermark="30 minutes")
    q = (out.writeStream.format("memory").queryName("ivj")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()

    got = sorted((r["click_id"], r["purchase_id"]) for r in
                 spark.sql("SELECT click_id, purchase_id FROM ivj")
                 .collect())
    # in-window cross-batch pair (100,200) and the advancing pair
    # (101,202); NOT the out-of-interval 201, NOT the late 203
    assert got == [(100, 200), (101, 202)], got

    # batch mode: same function, watermark a no-op -> the late row DOES
    # pair (it is only "late" relative to streaming arrival order)
    cb = (spark.read.schema(schema).parquet(clicks_d)
          .withColumnRenamed("event_id", "click_id"))
    pb = (spark.read.schema(schema).parquet(purch_d)
          .withColumnRenamed("event_id", "purchase_id"))
    bgot = sorted((r["click_id"], r["purchase_id"]) for r in
                  interval_join(cb, pb, key="user_id", interval="1 hour",
                                watermark="30 minutes")
                  .select("click_id", "purchase_id").collect())
    assert bgot == [(100, 200), (100, 203), (101, 202)], bgot
