"""Arbitrary-state streaming on the Spark 4 ``transformWithState`` API:
event-time activity sessions with timer-driven close.

The engine already covers the two classic state mechanisms — built-in
watermarked windows (`windows.py`, incl. ``session_window``) and
``applyInPandasWithState`` (`stateful.py`). This module exercises the
third, modern surface (Spark 4's ``transformWithStateInPandas``): typed
state plus EVENT-TIME TIMERS, which the older API cannot express — a
session here closes exactly when the watermark passes its last event
plus the gap, with no per-batch polling of every key.

Because data may arrive out of order (anything newer than the watermark
is admissible), a key holds a LIST of open candidate sessions: an event
landing between two of them can merge them, and only the watermark —
via the timer — proves a session can never grow again and may close.
The merge/expiry logic is pure (``merge_sessions`` / ``split_expired``)
and unit-tested without Spark; the processor is a thin shell around it.
The end-to-end run needs ``google.protobuf`` for the worker↔JVM state
protocol (the data plane is Arrow); environments without the wheel get
the vendored minimal runtime (`vendor/miniproto.py`, public wire format
only) — installed at import time below, which covers Spark workers too
because unpickling the processor imports this module first.

At scale state is sharded by key across the state store; per-key state
is O(open sessions) — bounded by the watermark horizon over the gap —
and each key holds ONE registered timer (earliest candidate close), so
idle keys are evicted by their own timer rather than by a scan.
"""

from __future__ import annotations

import pandas as pd

from ..vendor import miniproto

miniproto.install()  # no-op when the real google.protobuf exists

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUT_SCHEMA = ("k string, session_start_ms long, session_end_ms long, "
              "n_events long")


def merge_sessions(sessions: list, event_ms: list, gap_ms: int) -> list:
    """Fold event timestamps into a sorted list of disjoint sessions
    ``(start_ms, last_ms, n)`` where any two sessions are separated by
    MORE than ``gap_ms``; an event within ``gap_ms`` of two neighbors
    bridges them into one. Pure function — unit-tested directly."""
    out = list(sessions)
    for t in sorted(event_ms):
        t = int(t)
        merged = (t, t, 1)
        keep = []
        for s in out:
            if s[0] - gap_ms <= merged[1] and merged[0] - gap_ms <= s[1]:
                merged = (min(merged[0], s[0]), max(merged[1], s[1]),
                          merged[2] + s[2])
            else:
                keep.append(s)
        keep.append(merged)
        out = sorted(keep)
    return out


def split_expired(sessions: list, watermark_ms: int, gap_ms: int):
    """(closed, still_open): a session is provably complete once the
    watermark passed STRICTLY beyond ``last + gap`` — an event at
    exactly ``last + gap`` still merges (see ``merge_sessions``) and an
    event at exactly the watermark is still admissible. Pure function —
    unit-tested directly."""
    closed = [s for s in sessions if s[1] + gap_ms < watermark_ms]
    return closed, [s for s in sessions if s[1] + gap_ms >= watermark_ms]


class _SessionProcessor(StatefulProcessor):
    def __init__(self, gap_ms: int):
        self._gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getListState(
            "sessions", "start_ms long, last_ms long, n long")

    def _load(self):
        return sorted(tuple(r) for r in self._state.get())

    def _store(self, sessions):
        self._state.clear()
        if sessions:
            self._state.appendList([tuple(s) for s in sessions])

    def handleInputRows(self, key, rows, timerValues):
        events = []
        for pdf in rows:
            events.extend((pdf["ts"].astype("int64") // 1_000_000).tolist())
        if not events:
            return iter(())
        sessions = merge_sessions(self._load(), events, self._gap_ms)
        self._store(sessions)
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        # +1: the close test is strict (an event AT last+gap still merges)
        self._handle.registerTimer(sessions[0][1] + self._gap_ms + 1)
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        # split at the CURRENT watermark, not the fired timer's own
        # expiry: the watermark may have advanced far past it (e.g. a
        # quiet key whose one registered timer — the earliest candidate
        # close — fires long after several of its sessions became
        # provably complete), and every session the watermark proves
        # complete must close on THIS firing. Splitting at the expiry
        # time closed only the earliest session per firing, deferring
        # the rest to one-more-batch-each — late closes on low-traffic
        # keys and never-closed tails on finite streams. The max() is
        # defensive: both points are watermark-passed.
        wm = max(timerValues.getCurrentWatermarkInMs(),
                 expiredTimerInfo.getExpiryTimeInMs())
        closed, open_ = split_expired(self._load(), wm, self._gap_ms)
        self._store(open_)
        if open_:
            self._handle.registerTimer(open_[0][1] + self._gap_ms + 1)
        if closed:
            yield pd.DataFrame(
                {"k": [key[0]] * len(closed),
                 "session_start_ms": [s[0] for s in closed],
                 "session_end_ms": [s[1] for s in closed],
                 "n_events": [s[2] for s in closed]})

    def close(self) -> None:
        pass


def activity_sessions(stream: DataFrame, key_col: str = "k",
                      ts_col: str = "ts", gap: str = "30 minutes",
                      watermark: str = "0 seconds") -> DataFrame:
    """Per-key event-time sessions: a session is a maximal run of events
    where consecutive gaps stay at or under ``gap``; it closes (and emits
    its summary row) when the watermark passes ``last_event + gap``."""
    gap_ms = int(pd.Timedelta(gap).total_seconds() * 1000)
    src = (stream
           .select(F.col(key_col).alias("k"), F.col(ts_col).alias("ts"))
           .withWatermark("ts", watermark))
    return (src.groupBy("k")
            .transformWithStateInPandas(
                _SessionProcessor(gap_ms), OUT_SCHEMA,
                "append", "eventTime"))
