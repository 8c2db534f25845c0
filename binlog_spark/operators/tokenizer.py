"""Tokenizer-training primitives: the BPE merge-candidate count.

One iteration of byte-pair-encoding training (Sennrich et al. 2016;
the GPT-2 recipe) is: over the word-split corpus with words initialised
as character sequences, count every adjacent symbol pair and merge the
most frequent one. The count step is the distributed-scale part — the
merge table itself is tiny driver state — so that is the operator here,
exactly like ``kmeans_assign`` exposes one Lloyd step.

Scale shape: a per-batch Arrow kernel folds the batch's pair counts
into a dict keyed by the (left, right) codepoint pair — bounded by the
number of DISTINCT adjacent pairs (≈ alphabet², a few thousand), not by
corpus positions — and emits one row per distinct pair per batch. The
shuffle therefore carries ``n_partitions × distinct_pairs`` tiny rows
(the KMV/simhash bounded-fold idiom); the final groupBy-sum and top-k
run over that. Per batch the pairing is one vectorized numpy pass over
the UTF-32 codepoint array, no per-character Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textnorm import WS_REGEX, ws_tokens


def bpe_pair_counts(df: DataFrame, col: str = "text") -> DataFrame:
    """Corpus-wide adjacent character-pair counts, word-boundary
    constrained (pairs never straddle whitespace — BPE merges operate
    within words). Returns ``(a, b, n)`` — one row per distinct pair."""

    def fold(batches):
        counts: dict = {}
        for pdf in batches:
            # one split+join per doc keeps tokenization identical to the
            # corpus convention (str.split, parity-proven vs the SQL
            # oracles); the pair scan itself is vectorized
            joined = " ".join(
                " ".join(ws_tokens(t)) for t in pdf[col])
            if len(joined) < 2:
                continue
            codes = np.frombuffer(joined.encode("utf-32-le"),
                                  dtype=np.uint32)
            left, right = codes[:-1], codes[1:]
            sp = np.uint32(ord(" "))
            mask = (left != sp) & (right != sp)
            combo = (left[mask].astype(np.uint64) << np.uint64(32)) \
                | right[mask].astype(np.uint64)
            uniq, cnt = np.unique(combo, return_counts=True)
            for u, c in zip(uniq.tolist(), cnt.tolist()):
                counts[u] = counts.get(u, 0) + c
        yield pd.DataFrame(
            {"a": [chr(u >> 32) for u in counts],
             "b": [chr(u & 0xFFFFFFFF) for u in counts],
             "n": list(counts.values())})

    part = df.select(col).mapInPandas(fold, "a string, b string, n long")
    return part.groupBy("a", "b").agg(F.sum("n").alias("n"))


def bpe_top_pairs(df: DataFrame, col: str = "text",
                  top: int = 20) -> DataFrame:
    """The merge-candidate ranking: top ``top`` pairs by count, total
    order (count desc, then pair asc) so the cutoff is deterministic —
    row 1 is the merge BPE training would apply this iteration."""
    return (bpe_pair_counts(df, col)
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(top))


def bpe_top_pairs_sql(table: str = "documents", top: int = 20) -> str:
    ws = WS_REGEX
    return rf"""
WITH words AS (
  SELECT unnest(string_split_regex(text, '{ws}')) AS w FROM {table}
), pos AS (
  SELECT w, unnest(range(1, len(w))) AS i FROM words WHERE len(w) >= 2
), pairs AS (SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b
             FROM pos)
SELECT a, b, CAST(count(*) AS BIGINT) AS n
FROM pairs GROUP BY 1, 2
ORDER BY n DESC, a, b LIMIT {top}
"""
