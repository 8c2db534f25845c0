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


# ------------------------------------------------- DSIR importance weights
DSIR_BUCKETS = 256   # hashed-gram feature space (the paper hashes to 10k;
                     # 256 keeps the oracle's inline score table small)
DSIR_CLIP = 4096     # count clip: QL is evaluated on min(count, CLIP)+1,
                     # so the shared quantized-log table stays bounded and
                     # corpus-size-independent (a documented deviation from
                     # the paper's unclipped counts — hot buckets saturate)


def dsir_importance(df: DataFrame, target_lang: str = "en",
                    col: str = "text", lang_col: str = "lang",
                    n_buckets: int = DSIR_BUCKETS,
                    clip: int = DSIR_CLIP) -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    features are hashed unigram+bigram counts; a document's weight is the
    log-likelihood ratio of a target distribution (here: the
    ``target_lang`` slice standing in for the target domain) against the
    raw corpus, summed over the document's grams.

    Cross-engine exactness: per-bucket counts are clipped at ``clip`` and
    looked up in the shared ``floor(log2(n)·2^20)`` table
    (``textstats._qlog`` — the char-entropy trick), so the per-bucket
    log-ratio and every per-doc sum are pure int64 arithmetic; the only
    float is ONE final division of two exact integers. The true DSIR
    weight differs by the constant ``log2((N_raw+B)/(N_target+B))`` per
    gram — affine in ``n_grams``, identical for every bucket, irrelevant
    to ranking within equal-length docs and left to the consumer (it
    needs a log of two corpus-sized integers, which the quantized table
    deliberately does not cover).

    Scale shape (two map-only Arrow passes, no gram explosion ever hits
    a shuffle): pass 1 folds per-partition (bucket → target/raw count)
    partials — state is 2×``n_buckets`` int64 per partition, the shuffle
    carries partitions × buckets tiny rows; the 256-entry score table is
    then closed over (broadcast) by pass 2, which emits one row per doc.
    At 10^9 docs both passes stream; nothing is ever wider than the
    corpus itself."""
    import hashlib

    import numpy as np
    import pandas as pd

    from .textnorm import ws_tokens
    from .textstats import _QLOG_SCALE, _qlog

    def _buckets(text):
        toks = ws_tokens(text)
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return np.array(
            [int(hashlib.md5(g.encode()).hexdigest()[:12], 16) % n_buckets
             for g in grams], dtype=np.int64)

    def count_partials(batches):
        ct = np.zeros(n_buckets, np.int64)
        cr = np.zeros(n_buckets, np.int64)
        for pdf in batches:
            for text, lang in zip(pdf[col], pdf[lang_col]):
                b = _buckets(text)
                if len(b):
                    add = np.bincount(b, minlength=n_buckets)
                    cr += add
                    if lang == target_lang:
                        ct += add
        yield pd.DataFrame({"bkt": np.arange(n_buckets), "ct": ct, "cr": cr})

    part = df.select(col, lang_col).mapInPandas(
        count_partials, "bkt long, ct long, cr long")
    rows = (part.groupBy("bkt")
            .agg(F.sum("ct").alias("ct"), F.sum("cr").alias("cr"))
            .collect())
    ql = _qlog(clip + 1)
    score = np.zeros(n_buckets, np.int64)
    for r in rows:
        score[r["bkt"]] = (ql[min(r["ct"], clip)]      # QL(min(ct,C)+1):
                           - ql[min(r["cr"], clip)])   # ql[i] = QL(i+1)

    def per_doc(batches):
        for pdf in batches:
            ids, ngs, sqs = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[col]):
                b = _buckets(text)
                ids.append(doc_id)
                ngs.append(len(b))
                sqs.append(int(score[b].sum()) if len(b) else 0)
            yield pd.DataFrame({"doc_id": ids, "n_grams": ngs,
                                "score_q": sqs})

    out = df.select("doc_id", col).mapInPandas(
        per_doc, "doc_id long, n_grams long, score_q long")
    return out.select(
        "doc_id", "n_grams", "score_q",
        F.when(F.col("n_grams") == 0, F.lit(0.0))
        .otherwise(F.col("score_q")
                   / (F.col("n_grams") * float(_QLOG_SCALE)))
        .alias("avg_bits"))


def dsir_importance_sql(table: str = "documents", target_lang: str = "en",
                        n_buckets: int = DSIR_BUCKETS,
                        clip: int = DSIR_CLIP) -> str:
    """DuckDB replay of :func:`dsir_importance` — same gram extraction
    (textnorm WS contract), md5 buckets, clipped counts, shared
    quantized-log table (inlined literals), integer score sums."""
    from .textnorm import WS_REGEX
    from .textstats import _QLOG_SCALE, _qlog

    lits = ", ".join(str(int(v)) for v in _qlog(clip + 1))
    return f"""
WITH ql(t) AS (SELECT [{lits}]),
toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(coalesce(text, ''), '{WS_REGEX}'),
                     x -> x <> '') AS w
  FROM {table}
), grams AS (
  SELECT doc_id, lang, unnest(w) AS g FROM toks
  UNION ALL
  SELECT doc_id, lang, w[i] || ' ' || w[i + 1] AS g
  FROM toks, unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS t(i)
), b AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(g), 1, 12))::BIGINT % {n_buckets} AS bkt
  FROM grams
), cnt AS (
  SELECT bkt, sum(CASE WHEN lang = '{target_lang}' THEN 1 ELSE 0 END) AS ct,
         count(*) AS cr
  FROM b GROUP BY bkt
), sc AS (
  SELECT bkt,
         q.t[CAST(least(ct, {clip}) AS BIGINT) + 1]
         - q.t[CAST(least(cr, {clip}) AS BIGINT) + 1] AS s
  FROM cnt, ql q
), perdoc AS (
  SELECT doc_id, count(*) AS n_grams, CAST(sum(s) AS BIGINT) AS score_q
  FROM b JOIN sc USING (bkt) GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(p.score_q, 0) AS BIGINT) AS score_q,
       CASE WHEN coalesce(p.n_grams, 0) = 0 THEN 0.0
            ELSE p.score_q / (p.n_grams * {float(_QLOG_SCALE)}) END
           AS avg_bits
FROM {table} d LEFT JOIN perdoc p USING (doc_id)
"""


# ------------------------------------------------- temperature mixing
# Temperature-scaled source mixture (multilingual-T5 / ROOTS / the Pile
# all sample sources ∝ p^(1/T) to flatten the head without drowning the
# tail). T = 2 is the common setting and makes the weight an integer
# square root — exact on both engines: w_q = floor(sqrt((n_s·10^12) div
# N)), every derived share/upsample factor is ONE division of two exact
# int64 products.

TEMP_SCALE = 10 ** 12


def temperature_mix(df: DataFrame, group_col: str = "source") -> DataFrame:
    """Per-source T=2 mixture: ``(source, n_docs, t2_weight_q, t2_share,
    upsample)`` where upsample > 1 means the source is drawn more often
    than its natural share (tail boost). One grouped count, then pure
    arithmetic over the tiny one-row-per-source frame (the window is
    over ≤ #sources rows)."""
    counts = df.groupBy(group_col).agg(F.count("*").alias("n"))
    w = Window.partitionBy()  # tiny: one row per source
    t = (counts.withColumn("tot", F.sum("n").over(w))
         .withColumn("wq", F.expr(
             f"CAST(floor(sqrt(CAST((n * {TEMP_SCALE}) div tot AS DOUBLE)))"
             f" AS BIGINT)"))
         .withColumn("sumq", F.sum("wq").over(w)))
    return t.select(
        group_col, F.col("n").alias("n_docs"),
        F.col("wq").alias("t2_weight_q"),
        F.round(F.col("wq") / F.col("sumq"), 6).alias("t2_share"),
        F.round((F.col("wq") * F.col("tot"))
                / (F.col("sumq") * F.col("n")), 6).alias("upsample"))


def temperature_mix_sql(table: str = "documents",
                        group_col: str = "source") -> str:
    return f"""
WITH c AS (SELECT {group_col}, count(*) AS n FROM {table} GROUP BY 1),
t AS (
  SELECT {group_col}, n,
         CAST(floor(sqrt(CAST((n * {TEMP_SCALE})
             // (SELECT CAST(sum(n) AS BIGINT) FROM c) AS DOUBLE)))
             AS BIGINT) AS wq
  FROM c
)
SELECT {group_col}, CAST(n AS BIGINT) AS n_docs, wq AS t2_weight_q,
       round(wq / CAST(sum(wq) OVER () AS DOUBLE), 6) AS t2_share,
       round((wq * (SELECT CAST(sum(n) AS BIGINT) FROM c))
             / CAST(sum(wq) OVER () * n AS DOUBLE), 6) AS upsample
FROM t
"""


# ------------------------------------------------- epoch scheduling
EPOCH_Q = 10 ** 6  # epochs quantized to 1e-6 for cross-engine exactness


def epoch_schedule(df: DataFrame, budget: int = 1_000_000,
                   max_epochs: int = 4,
                   group_col: str = "source") -> DataFrame:
    """Training-run epoch schedule under a token budget (the
    data-constrained planning step from Muennighoff et al. '23, "Scaling
    Data-Constrained Language Models": repeating a source beyond ~4
    epochs stops helping, so each source's draw is capped at
    ``max_epochs`` passes): per source —

    * ``n_tokens`` available (whitespace tokenization, the same
      contract every other token stat uses),
    * ``target_draw``: the budget's uniform per-source allocation,
    * ``sched_draw``: that allocation after the repeat cap
      ``min(target, max_epochs · available)``,
    * ``epochs_q``: scheduled passes over the source, quantized to
      1e-6 (integer arithmetic — bit-identical on any engine),
    * ``shortfall``: budget tokens the cap left unspent on this source
      (a planner redistributes these in its next iteration).

    Scale shape: ONE grouped sum over the corpus (map-side partials),
    then pure arithmetic on the tiny one-row-per-source frame; the
    window is over ≤ #sources rows."""
    tokens = ws_token_count(F.col("text"))
    counts = (df.select(F.col(group_col), tokens.alias("t"))
              .groupBy(group_col).agg(F.sum("t").alias("n_tokens")))
    w = Window.partitionBy()  # tiny: one row per source
    t = (counts.withColumn("g", F.count("*").over(w))
         .withColumn("target_draw", F.expr(f"{budget} div g"))
         .withColumn("sched_draw",
                     F.least(F.col("target_draw"),
                             F.lit(max_epochs) * F.col("n_tokens"))))
    return t.select(
        group_col, "n_tokens", "target_draw", "sched_draw",
        F.expr(f"(sched_draw * {EPOCH_Q}) div n_tokens")
        .alias("epochs_q"),
        (F.col("target_draw") - F.col("sched_draw")).alias("shortfall"))


def epoch_schedule_sql(budget: int = 1_000_000, max_epochs: int = 4,
                       table: str = "documents",
                       group_col: str = "source") -> str:
    return f"""
WITH c AS (
  SELECT {group_col},
         CAST(sum({ws_token_count_sql('text')}) AS BIGINT) AS n_tokens
  FROM {table} GROUP BY 1
), t AS (
  SELECT {group_col}, n_tokens,
         CAST({budget} // (SELECT count(*) FROM c) AS BIGINT)
             AS target_draw
  FROM c
), s AS (
  SELECT *, least(target_draw, {max_epochs} * n_tokens) AS sched_draw
  FROM t
)
SELECT {group_col}, n_tokens, target_draw, sched_draw,
       CAST((sched_draw * {EPOCH_Q}) // n_tokens AS BIGINT) AS epochs_q,
       target_draw - sched_draw AS shortfall
FROM s
"""
