"""Custom stateful streaming operator: running per-key LWW state.

The reference's only cross-event state is the single-threaded txn buffer
+ table-map cache (`/root/reference/row_streamer.go:91-96`); the engine's
``foreachBatch`` MERGE path persists per-key state in the lake manifest.
This module adds the third Spark-native state mechanism — a true
``applyInPandasWithState`` operator — for consumers that want the
current LWW winner per key pushed DOWNSTREAM as a stream (e.g. a cache
invalidation feed) without reading the lake: state lives in the
streaming state store (checkpointed, partitioned by key, scales with
shuffle partitions), and each microbatch emits only the keys whose
winner changed.

At 100 TB scale this is the standard keyed-state pattern: state is
sharded by ``key_cols`` across the cluster's state store; per-key state
is O(1) (the current winner), so total state is O(distinct keys) and a
hot key costs no more than a cold one.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_lww(stream: DataFrame, key_cols: tuple, order_cols: tuple,
                value_cols: tuple, key_ddl: str, order_ddl: str,
                value_ddl: str) -> DataFrame:
    """Per-key last-writer-wins over an unbounded stream.

    Keeps the row with the greatest ``order_cols`` tuple per key ACROSS
    microbatches (state store), emits a row per key per batch in which
    its winner changed. ``*_ddl`` are the DDL fragments for the three
    column groups (state schemas are declared, not inferred).
    """
    out_schema = f"{key_ddl}, {order_ddl}, {value_ddl}, n_changes long"
    state_schema = f"{order_ddl}, {value_ddl}, n_changes long"
    n_order = len(order_cols)
    n_value = len(value_cols)
    cols = list(key_cols) + list(order_cols) + list(value_cols)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = list(state.get)
            best = tuple(st[:n_order])
            value = st[n_order : n_order + n_value]
            n = st[-1]
        else:
            best, value, n = None, None, 0
        changed = False
        for pdf in pdfs:
            for row in pdf[list(order_cols) + list(value_cols)].itertuples(
                    index=False):
                n += 1
                order = tuple(row[:n_order])
                if best is None or order > best:
                    best, value = order, list(row[n_order:])
                    changed = True
        state.update((*best, *value, n))
        if changed:
            yield pd.DataFrame([[*key, *best, *value, n]], columns=cols
                               + ["n_changes"])

    return (stream.groupBy(*key_cols)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "update",
                                    GroupStateTimeout.NoTimeout))


def cdc_running_lww(changes: DataFrame,
                    key_cols: tuple = ("repo", "path")) -> DataFrame:
    """LWW winner feed over a CHANGE_SCHEMA stream: key from the row
    images, ordered by (gtid_seq, seq_in_txn), payload = (op, after as
    JSON — map columns are not state-schema types)."""
    from pyspark.sql import functions as F

    from ..operators.lww import with_key

    keyed = (with_key(changes, key_cols)
             .withColumn("after_json", F.to_json("after"))
             .select(*[f"_k_{k}" for k in key_cols], "gtid_seq",
                     "seq_in_txn", "op", "after_json"))
    key_ddl = ", ".join(f"_k_{k} string" for k in key_cols)
    return running_lww(
        keyed,
        tuple(f"_k_{k}" for k in key_cols),
        ("gtid_seq", "seq_in_txn"),
        ("op", "after_json"),
        key_ddl,
        "gtid_seq long, seq_in_txn int",
        "op string, after_json string",
    )
