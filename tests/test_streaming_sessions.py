"""transformWithStateInPandas sessions (streaming/sessions.py).

The merge/expiry core is pure and tested directly (runs everywhere);
the end-to-end streaming run — state carried across microbatches,
timer-driven close, open sessions emitting nothing — additionally needs
``google.protobuf`` (PySpark's state-server protocol), which this
sandbox does not ship, so that case skips itself here and runs where
the dependency exists."""

import os
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlog_spark.streaming.sessions import (  # noqa: E402
    activity_sessions,
    merge_sessions,
    split_expired,
)

T0 = 1_700_000_000_000_000  # us
MIN = 60 * 1_000_000
GAP = 30 * 60 * 1000  # 30 min in ms


def ms(us):
    return us // 1000


# ---------------------------------------------------------------- pure logic
def test_merge_splits_on_gap():
    # two events farther apart than the gap stay two sessions — even when
    # they arrive in the same batch (the bug a naive min/max merge has)
    got = merge_sessions([], [ms(T0), ms(T0 + 100 * MIN)], GAP)
    assert got == [(ms(T0), ms(T0), 1),
                   (ms(T0 + 100 * MIN), ms(T0 + 100 * MIN), 1)]


def test_merge_within_gap_and_against_state():
    st = merge_sessions([], [ms(T0)], GAP)
    st = merge_sessions(st, [ms(T0 + 10 * MIN)], GAP)
    assert st == [(ms(T0), ms(T0 + 10 * MIN), 2)]
    # exactly at the gap boundary still merges (<=)
    st2 = merge_sessions(st, [ms(T0 + 40 * MIN)], GAP)
    assert st2 == [(ms(T0), ms(T0 + 40 * MIN), 3)]


def test_late_event_bridges_two_sessions():
    # out-of-order arrival between two open sessions fuses them when it
    # is within the gap of BOTH (25min to each side, gap 30min)...
    st = merge_sessions([], [ms(T0), ms(T0 + 50 * MIN)], GAP)
    assert len(st) == 2
    st = merge_sessions(st, [ms(T0 + 25 * MIN)], GAP)
    assert st == [(ms(T0), ms(T0 + 50 * MIN), 3)]
    # ...but an event farther than the gap from both bridges nothing
    st2 = merge_sessions([], [ms(T0), ms(T0 + 100 * MIN)], GAP)
    st2 = merge_sessions(st2, [ms(T0 + 50 * MIN)], GAP)
    assert len(st2) == 3


def test_split_expired_closes_only_provably_complete():
    st = merge_sessions([], [ms(T0), ms(T0 + 100 * MIN)], GAP)
    closed, open_ = split_expired(st, ms(T0 + 100 * MIN), GAP)
    assert closed == [(ms(T0), ms(T0), 1)]
    assert open_ == [(ms(T0 + 100 * MIN), ms(T0 + 100 * MIN), 1)]
    closed2, open2 = split_expired(open_, ms(T0 + 131 * MIN), GAP)
    assert closed2 == open_ and open2 == []


def test_multiplicity_preserved():
    st = merge_sessions([], [ms(T0)] * 5, GAP)
    assert st == [(ms(T0), ms(T0), 5)]


# ----------------------------------------------------------------- streaming
def _write(d, name, rows, mtime):
    table = pa.table(
        {"k": [r[0] for r in rows],
         "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us"))})
    path = os.path.join(d, name)
    pq.write_table(table, path)
    os.utime(path, (mtime, mtime))


def test_sessions_close_on_event_time_timer(spark, tmp_path):
    # transformWithStateInPandas needs google.protobuf at runtime; the
    # sessions module installs the vendored miniproto shim when the real
    # wheel is absent, so this e2e runs everywhere (r4 directive 4).
    # It also needs the RocksDB state store (typed state = one column
    # family per state variable; the HDFS-backed default supports one).
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev_prov = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key, "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
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

    try:
        stream = (spark.readStream.schema("k string, ts timestamp")
                  .option("maxFilesPerTrigger", 1).parquet(watch))
        out = activity_sessions(stream, key_col="k", ts_col="ts",
                                gap="30 minutes")
        q = (out.writeStream.format("memory").queryName("sess")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
    finally:
        if prev_prov is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prev_prov)

    rows = {r["k"]: r for r in spark.sql("SELECT * FROM sess").collect()}
    assert set(rows) == {"A", "B"}, rows
    a, b = rows["A"], rows["B"]
    assert a["n_events"] == 2
    assert a["session_start_ms"] == T0 // 1000
    assert a["session_end_ms"] == (T0 + 10 * MIN) // 1000
    assert b["n_events"] == 1
    assert b["session_start_ms"] == b["session_end_ms"] == (
        T0 + 5 * MIN) // 1000
