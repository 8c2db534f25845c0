"""transformWithStateInPandas sessions (streaming/sessions.py): sessions
accumulate across microbatches, close via their EVENT-TIME TIMER when the
watermark passes last_event + gap, and a still-open session emits
nothing — the Spark 4 arbitrary-state surface."""

import os
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the transformWithState state-server protocol needs protobuf, which this
# sandbox does not ship; the contract test runs wherever it is present
pytest.importorskip(
    "google.protobuf.descriptor",
    reason="transformWithStateInPandas needs google.protobuf at runtime")

from binlog_spark.streaming.sessions import activity_sessions  # noqa: E402

T0 = 1_700_000_000_000_000  # us
MIN = 60 * 1_000_000


def _write(d, name, rows, mtime):
    table = pa.table(
        {"k": [r[0] for r in rows],
         "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us"))})
    path = os.path.join(d, name)
    pq.write_table(table, path)
    os.utime(path, (mtime, mtime))


def test_sessions_close_on_event_time_timer(spark, tmp_path):
    watch = str(tmp_path / "in")
    os.makedirs(watch)
    now = time.time()
    # repo A: events at t0 and t0+10m (same session, split across TWO
    # microbatches — state must carry over); repo B: one event.
    _write(watch, "f1.parquet", [("A", T0)], now - 50)
    _write(watch, "f2.parquet", [("A", T0 + 10 * MIN),
                                 ("B", T0 + 5 * MIN)], now - 40)
    # f3 advances the watermark past both sessions' last+gap (30m):
    # timers fire, sessions close and emit. C's own session stays OPEN
    # (nothing ever advances past it) -> must NOT emit.
    _write(watch, "f3.parquet", [("C", T0 + 500 * MIN)], now - 30)
    _write(watch, "f4.parquet", [("C", T0 + 505 * MIN)], now - 20)

    stream = (spark.readStream.schema("k string, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(watch))
    out = activity_sessions(stream, key_col="k", ts_col="ts",
                            gap="30 minutes")
    q = (out.writeStream.format("memory").queryName("sess")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()

    rows = {r["k"]: r for r in spark.sql("SELECT * FROM sess").collect()}
    assert set(rows) == {"A", "B"}, rows
    a, b = rows["A"], rows["B"]
    assert a["n_events"] == 2
    assert a["session_start_ms"] == T0 // 1000
    assert a["session_end_ms"] == (T0 + 10 * MIN) // 1000
    assert b["n_events"] == 1
    assert b["session_start_ms"] == b["session_end_ms"] == (
        T0 + 5 * MIN) // 1000
