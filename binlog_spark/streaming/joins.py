"""Stream-stream event-time interval join (watermark-bounded state).

SURVEY §2.2 joins row, streaming half: the reference never joins two
live feeds (its single binlog stream is totally ordered), but a derived
-stream consumer routinely does — the canonical case is attribution:
match each `click` to every `purchase` by the same user within the
following hour, both sides unbounded.

Structured Streaming executes this with per-side keyed state; the join
is only feasible unbounded because BOTH sides carry a watermark and the
join condition bounds event-time distance, so each side's state evicts
once the other side's watermark passes the interval — the exact
contract a 1000-executor deployment needs (state ∝ events inside the
interval horizon, not stream length). In batch mode ``withWatermark``
is a no-op and the same plan is an ordinary range join, which is how
the registered query replays against the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(left: DataFrame, right: DataFrame, key: str,
                  left_ts: str = "ts", right_ts: str = "ts",
                  interval: str = "1 hour",
                  watermark: str = "30 minutes") -> DataFrame:
    """Inner join ``left`` x ``right`` on ``key`` where the right event
    time falls in ``[left_ts, left_ts + interval]``.

    Column names must be disjoint apart from ``key`` (rename upstream);
    the output carries both timestamp columns so downstream code can
    compute lags. Works identically on batch DataFrames (watermarks are
    ignored there) — the streaming contract is exercised in
    tests/test_streaming_join.py.
    """
    lts, rts = f"__l_{left_ts}", f"__r_{right_ts}"
    l = left.withColumnRenamed(left_ts, lts).withWatermark(lts, watermark)
    r = right.withColumnRenamed(right_ts, rts).withWatermark(rts, watermark)
    cond = ((l[key] == r[key])
            & (F.col(rts) >= F.col(lts))
            & (F.col(rts) <= F.col(lts) + F.expr(f"INTERVAL {interval}")))
    return (l.join(r, cond).drop(r[key])
            .withColumnRenamed(lts, left_ts + "_l")
            .withColumnRenamed(rts, right_ts + "_r"))
