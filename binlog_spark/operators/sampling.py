"""Training-data sampling & sequence packing (deterministic, oracle-able).

The operations a pretraining-corpus pipeline runs after dedup/quality:
rebalance languages (stratified sampling), compute source-mixture
reweighting, and pack documents into fixed token budgets. All three are
deterministic — sampling decisions derive from md5(doc_id), so the same
rows are selected on any cluster at any parallelism, the runs are
reproducible, and DuckDB replays them exactly.

Scale shapes:
* stratified sampling is a pure narrow filter — no shuffle at all; the
  sampling hash is JVM built-ins (md5/conv), Catalyst keeps it in
  whole-stage codegen next to the scan;
* mixture weights aggregate once on the source key (tiny output) — the
  total ride-along is a scalar subquery/broadcast, never a global sort;
* packing orders docs inside each language partition only (one keyed
  window shuffle); the pack id is a cumulative-sum bucket — the
  standard approximate "contiguous fill" used at 10^9-doc scale, where
  true first-fit bin packing would serialize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textnorm import WS_REGEX, ws_token_count, ws_token_count_sql

# per-language keep rates: downsample the dominant language, keep the
# tails — the classic pretraining rebalance
DEFAULT_RATES = {"en": 0.3, "de": 0.8, "es": 0.8, "fr": 0.8, "zh": 0.8}
_SCALE = 10_000  # hash-bucket resolution for the Bernoulli decision


def _hash_bucket(col):
    """Deterministic uniform bucket in [0, _SCALE): top 32 bits of
    md5(id) mod the scale — stable across engines and partitionings."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
    return h.cast("long") % _SCALE


def stratified_sample(df: DataFrame, rates: dict[str, float] | None = None,
                      strata_col: str = "lang",
                      id_col: str = "doc_id") -> DataFrame:
    """Keep each row iff hash_bucket(id) < rate[stratum] * _SCALE."""
    rates = DEFAULT_RATES if rates is None else rates
    rate = F.lit(None).cast("double")
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(rate)
    bucket = _hash_bucket(F.col(id_col))
    return (df.withColumn("bucket", bucket)
            .where(F.col("bucket") < rate * _SCALE)
            .select(id_col, strata_col, "bucket"))


def stratified_sample_sql(rates: dict[str, float] | None = None,
                          table: str = "documents",
                          strata_col: str = "lang",
                          id_col: str = "doc_id") -> str:
    rates = DEFAULT_RATES if rates is None else rates
    case = " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(rates.items()))
    return f"""
SELECT {id_col}, {strata_col},
       ('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 8))::BIGINT
           % {_SCALE} AS bucket
FROM {table}
WHERE ('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 8))::BIGINT
          % {_SCALE}
      < (CASE {strata_col} {case} END) * {_SCALE}
"""


def mixture_weights(df: DataFrame, group_col: str = "source") -> DataFrame:
    """Per-source resampling weight toward a uniform target mixture:
    weight = target_share / actual_share (>1 means upsample)."""
    counts = df.groupBy(group_col).agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy()  # tiny: one row per source
    total = F.sum("n_docs").over(w)
    n_groups = F.count("*").over(w)
    share = F.col("n_docs") / total
    return counts.select(
        group_col, "n_docs",
        F.round(share, 6).alias("actual_share"),
        F.round((F.lit(1.0) / n_groups) / share, 6).alias("weight"))


def mixture_weights_sql(table: str = "documents",
                        group_col: str = "source") -> str:
    return f"""
SELECT {group_col}, CAST(count(*) AS BIGINT) AS n_docs,
       round(count(*) / sum(count(*)) OVER (), 6) AS actual_share,
       round((1.0 / count(*) OVER ())
             / (count(*) / sum(count(*)) OVER ()), 6) AS weight
FROM {table} GROUP BY {group_col}
"""


def pack_sequences(df: DataFrame, budget: int = 512,
                   part_col: str = "lang") -> DataFrame:
    """Contiguous token packing: docs ordered by id within each
    partition column get pack_id = floor(exclusive-prefix-tokens /
    budget) — the vectorizable approximation of greedy packing (a doc
    may straddle a boundary; no pack starves)."""
    tokens = ws_token_count(F.col("text"))
    w = (Window.partitionBy(part_col).orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    prior = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (df.select("doc_id", part_col, tokens.alias("n_tokens"))
            .withColumn("pack_id",
                        F.floor(prior / budget).cast("long")))


def pack_sequences_sql(budget: int = 512, table: str = "documents",
                       part_col: str = "lang") -> str:
    return f"""
SELECT doc_id, {part_col}, n_tokens,
       CAST(floor(coalesce(sum(n_tokens) OVER (
                PARTITION BY {part_col} ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            / {budget}) AS BIGINT) AS pack_id
FROM (
  SELECT doc_id, {part_col},
         {ws_token_count_sql('text')} AS n_tokens
  FROM {table}
)
"""


# ------------------------------------------------- weighted sampling
_ES_K = 32
_H48 = float(1 << 48)


def weighted_sample(df: DataFrame, k: int = _ES_K,
                    group_col: str = "lang", id_col: str = "doc_id",
                    weight_col: str = "n_chars") -> DataFrame:
    """Efraimidis–Spirakis weighted sampling without replacement, k per
    group: each row gets key = ln(u) / w with u a deterministic uniform
    from md5(id), and the k largest keys per group are the sample (the
    classic distributed one-pass weighted reservoir — PODS'06 / the
    exp-sort trick). Deterministic: same rows win on any cluster at any
    parallelism, and DuckDB replays the selection exactly.

    Scale shape: a bounded mapInPandas fold keeps at most k candidates
    per group PER PARTITION (state = groups x k), the shuffle carries
    n_partitions x k rows per group, and the final merge re-sorts that
    bounded set — never a full per-group sort of the corpus."""
    from .folds import bounded_group_topk

    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 12),
               16, 10).cast("double")
    u = (h + F.lit(0.5)) / F.lit(_H48)
    # negate so ascending (nk, id) order == "key DESC, id ASC"
    nk = -(F.log(u) / F.col(weight_col).cast("double"))
    slim = df.select(F.col(group_col).alias("g"), nk.alias("nk"),
                     F.col(id_col).alias("i"),
                     F.col(weight_col).alias("w"))
    partial = bounded_group_topk(slim, "g", ["nk", "i"], k,
                                 "g string, nk double, i long, w long")
    merged = partial.groupBy("g").agg(
        F.slice(F.sort_array(F.collect_list(F.struct("nk", "i", "w"))),
                1, k).alias("top"))
    ex = merged.select("g", F.posexplode("top").alias("pos", "r"))
    return ex.select(
        F.col("g").alias(group_col),
        (F.col("pos") + 1).cast("long").alias("sample_rank"),
        F.col("r.i").alias(id_col),
        F.col("r.w").alias(weight_col))


def weighted_sample_sql(k: int = _ES_K, table: str = "documents",
                        group_col: str = "lang", id_col: str = "doc_id",
                        weight_col: str = "n_chars") -> str:
    return f"""
WITH keyed AS (
  SELECT {group_col}, {id_col}, {weight_col},
         ln((('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 12))::BIGINT
             + 0.5) / {_H48!r}) / {weight_col} AS key
  FROM {table}
), ranked AS (
  SELECT {group_col}, {id_col}, {weight_col},
         row_number() OVER (PARTITION BY {group_col}
                            ORDER BY key DESC, {id_col}) AS sample_rank
  FROM keyed
)
SELECT {group_col}, CAST(sample_rank AS BIGINT) AS sample_rank,
       {id_col}, {weight_col}
FROM ranked WHERE sample_rank <= {k}
"""


def source_cap(df: DataFrame, cap: int = 10, group_col: str = "source",
               id_col: str = "doc_id") -> DataFrame:
    """Domain-balanced capping: keep at most ``cap`` documents per
    source, chosen DETERMINISTICALLY by md5(id) order — the standard
    web-corpus balancing step ("no domain contributes more than N"),
    immune to input order and parallelism.

    Same scale shape as ``weighted_sample``: the bounded per-partition
    fold keeps ≤ cap candidates per domain (state = domains × cap), so a
    hot domain never funnels its full posting into one task the way a
    row_number window would — the shuffle carries n_partitions × cap
    rows per domain and the final merge re-sorts that bounded set."""
    from .folds import bounded_group_topk

    slim = df.select(F.col(group_col).alias("g"),
                     F.md5(F.col(id_col).cast("string")).alias("h"),
                     F.col(id_col).alias("i"))
    partial = bounded_group_topk(slim, "g", ["h", "i"], cap,
                                 "g string, h string, i long")
    merged = partial.groupBy("g").agg(
        F.slice(F.sort_array(F.collect_list(F.struct("h", "i"))),
                1, cap).alias("top"))
    ex = merged.select("g", F.posexplode("top").alias("pos", "r"))
    return ex.select(F.col("g").alias(group_col),
                     (F.col("pos") + 1).cast("long").alias("cap_rank"),
                     F.col("r.i").alias(id_col))


def source_cap_sql(cap: int = 10, table: str = "documents",
                   group_col: str = "source",
                   id_col: str = "doc_id") -> str:
    return f"""
SELECT {group_col}, CAST(rn AS BIGINT) AS cap_rank, {id_col}
FROM (
  SELECT {group_col}, {id_col},
         row_number() OVER (
             PARTITION BY {group_col}
             ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}) AS rn
  FROM {table})
WHERE rn <= {cap}
"""
