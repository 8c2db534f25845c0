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
