"""Arbitrary-state streaming on the Spark 4 ``transformWithState`` API:
event-time activity sessions with timer-driven close.

The engine already covers the two classic state mechanisms — built-in
watermarked windows (`windows.py`, incl. ``session_window``) and
``applyInPandasWithState`` (`stateful.py`). This module exercises the
third, modern surface (Spark 4's ``transformWithStateInPandas``): typed
value state plus EVENT-TIME TIMERS, which the older API cannot express —
a session here closes exactly when the watermark passes its last event
plus the gap, with no per-batch polling of every key.

Operator: per-key activity sessions over a change/event feed (e.g. "a
repo's burst of commits") — each closed session emits one summary row.

ENVIRONMENT NOTE: executing a transformWithState query requires
``google.protobuf`` (PySpark's state-server protocol), which this
sandbox does not ship — tests/test_streaming_sessions.py skips itself
when the import is missing and runs the full timer/close contract when
it is present. The module itself imports and builds plans without it.
At scale state is sharded by key across the state store; per-key state
is O(1) (start, last, count) and each key holds at most ONE registered
timer, so state ∝ distinct ACTIVE keys, and idle keys are evicted by
their own timer rather than by a scan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUT_SCHEMA = ("k string, session_start_ms long, session_end_ms long, "
              "n_events long")


class _SessionProcessor(StatefulProcessor):
    """State: (start_ms, last_ms, n). One event-time timer per key at
    last_ms + gap; firing closes and emits the session."""

    def __init__(self, gap_ms: int):
        self._gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState(
            "sess", "start_ms long, last_ms long, n long")

    def handleInputRows(self, key, rows, timerValues):
        lo, hi, n = None, None, 0
        for pdf in rows:
            ms = (pdf["ts"].astype("int64") // 1_000_000)
            lo = min(lo, int(ms.min())) if lo is not None else int(ms.min())
            hi = max(hi, int(ms.max())) if hi is not None else int(ms.max())
            n += len(pdf)
        if n == 0:
            return iter(())
        if self._state.exists():
            start, last, prev_n = self._state.get()
            self._handle.deleteTimer(last + self._gap_ms)
            start, last, n = min(start, lo), max(last, hi), prev_n + n
        else:
            start, last = lo, hi
        self._state.update((start, last, n))
        self._handle.registerTimer(last + self._gap_ms)
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if not self._state.exists():
            return iter(())
        start, last, n = self._state.get()
        self._state.clear()
        yield pd.DataFrame(
            {"k": [key[0]], "session_start_ms": [start],
             "session_end_ms": [last], "n_events": [n]})

    def close(self) -> None:
        pass


def activity_sessions(stream: DataFrame, key_col: str = "k",
                      ts_col: str = "ts", gap: str = "30 minutes",
                      watermark: str = "0 seconds") -> DataFrame:
    """Per-key event-time sessions: a session is a run of events where
    consecutive gaps stay under ``gap``; it closes (and emits its summary
    row) when the watermark passes ``last_event + gap``."""
    gap_ms = _duration_ms(gap)
    src = (stream
           .select(F.col(key_col).alias("k"), F.col(ts_col).alias("ts"))
           .withWatermark("ts", watermark))
    return (src.groupBy("k")
            .transformWithStateInPandas(
                _SessionProcessor(gap_ms), OUT_SCHEMA,
                "append", "eventTime"))


def _duration_ms(s: str) -> int:
    n, unit = s.split()
    mult = {"second": 1_000, "seconds": 1_000,
            "minute": 60_000, "minutes": 60_000,
            "hour": 3_600_000, "hours": 3_600_000}[unit]
    return int(n) * mult
