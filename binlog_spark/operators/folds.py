"""Shared bounded per-partition group fold.

The scale shape behind the sampling/sketch family (weighted reservoir,
bottom-k quantile sample; the KMV sketch and the similarity partial
top-k keep their specialized variants — distinct-hash semantics and a
cross-row query-id fold respectively): each partition keeps at most k
candidate rows per group, so operator state is groups × k regardless of
partition size and the shuffle carries n_partitions × k rows per group.
The caller's final merge re-sorts the bounded partials (collect_list →
sort_array → slice), which is exact because a candidate that would make
the global top-k under the deterministic order is by construction in
its own partition's top-k under the same order.

The sort columns are the parity-critical part: they must include the
tie-break the DuckDB oracle uses (e.g. ["h", "value"] or ["nk", "i"]),
or a partition could drop a boundary tie the oracle keeps.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def bounded_group_topk(df: DataFrame, group_col: str,
                       sort_cols: list[str], k: int,
                       schema: str) -> DataFrame:
    """Bounded partials: the k first rows per group under ascending
    ``sort_cols`` order, per input partition (a mapInPandas stage with
    state = groups × k; empty partitions yield nothing)."""

    def fold(batches):
        state: dict = {}
        for pdf in batches:
            for g, grp in pdf.groupby(group_col, sort=False):
                cur = grp if g not in state else pd.concat([state[g], grp])
                state[g] = cur.sort_values(sort_cols).head(k)
        if state:
            yield pd.concat(state.values())

    return df.mapInPandas(fold, schema)


def misra_gries_partials(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra–Gries heavy-hitter summaries: at most ``k``
    ``(key, lb)`` rows per partition, where ``lb`` underestimates the
    partition-local frequency by at most ``n_partition / (k + 1)``.

    The summaries are mergeable (Agarwal et al., "Mergeable summaries",
    PODS'12): summing ``lb`` per key across partitions gives a global
    lower bound whose total error is at most ``N / (k + 1)``, so every
    key with true frequency above a threshold ``T > N / (k + 1)`` is
    guaranteed to survive into the merged candidate set. State is k
    counters per partition regardless of partition size — the batched
    decrement subtracts the running minimum from all survivors when the
    counter table overflows, which is the vectorized equivalent of
    repeated single-decrements.

    Intra-partition arrival order can change the ``lb`` values (not the
    superset guarantee); callers MUST re-count candidates exactly
    before emitting (see ``queries.agg_heavy_hitters``) so the final
    output is order-independent."""

    def fold(batches):
        counters: dict = {}
        for pdf in batches:
            for key, cnt in pdf[key_col].value_counts().items():
                if key in counters:
                    counters[key] += int(cnt)
                elif len(counters) < k:
                    counters[key] = int(cnt)
                else:
                    # batched decrement: absorbing m copies of a new key
                    # into a full table decrements everyone by up to m,
                    # floored at the smallest survivor
                    m = min(int(cnt), min(counters.values()))
                    counters = {x: c - m for x, c in counters.items()
                                if c - m > 0}
                    if int(cnt) - m > 0 and len(counters) < k:
                        counters[key] = int(cnt) - m
        if counters:
            yield pd.DataFrame({key_col: list(counters.keys()),
                                "lb": list(counters.values())})

    return df.select(key_col).mapInPandas(
        fold, f"{key_col} long, lb long")
