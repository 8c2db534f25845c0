"""Text analysis over document tables: language-ID, quality scoring,
token counting, fingerprinting.

All built from JVM-side ``pyspark.sql.functions`` (whole-stage codegen;
no Python in the hot path) and each with an exact ANSI-SQL equivalent so
the DuckDB oracle can verify value-level parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textnorm import (WS_REGEX, ws_token_count,
                       ws_token_count_sql, ws_tokens)

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "to"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "und", "die", "das", "ist"],
    "fr": ["le", "et", "les", "des", "une"],
}
_LANG_ORDER = ["en", "es", "de", "fr"]

PUNCT_RE = r"[.,;:!?]"
# BPE-ish pre-tokenizer: letter runs, digit runs, single other non-space
# \s spelled out: Java includes VT in \s, RE2 excludes it — the negated
# class would then disagree on vertical tab (textnorm.WS_CLASS contract)
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f\x0B]"
STOPWORDS_EN = ["the", "a", "and", "of", "to", "is", "in", "it"]


def _word_pattern(words) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def token_count(df: DataFrame, col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per document."""
    return df.select(
        "doc_id",
        ws_token_count(F.col(col)).alias("ws_tokens"),
        F.regexp_count(F.col(col), F.lit(BPE_RE)).alias("bpe_tokens"),
    )


def quality_score(df: DataFrame, col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality signals.

    Ratios are rounded to 6 dp so they are bit-comparable across engines.
    """
    length = F.length(F.col(col))
    n_tokens = ws_token_count(F.col(col))
    n_punct = F.regexp_count(F.col(col), F.lit(PUNCT_RE))
    n_stop = F.regexp_count(F.lower(F.col(col)),
                            F.lit(_word_pattern(STOPWORDS_EN)))
    return df.select(
        "doc_id",
        length.alias("n_chars_text"),
        n_tokens.alias("n_tokens"),
        # try_divide: an empty document must yield NULL (the oracle's
        # x/0 semantics), not an ANSI divide-by-zero failure
        F.round(F.try_divide(n_punct, length), 6).alias("punct_ratio"),
        F.round(F.try_divide(n_stop, n_tokens), 6).alias("stopword_ratio"),
        # simple composite quality gate (C4-style heuristics)
        ((length >= 50) & (n_tokens >= 10)).cast("int").alias("passes_quality"),
    )


def lang_id(df: DataFrame, col: str = "text") -> DataFrame:
    """Marker-stopword language ID: argmax of per-language marker hits with
    deterministic tie-break in ``_LANG_ORDER``; no hits -> 'und'."""
    lowered = F.lower(F.col(col))
    hits = {
        lang: F.regexp_count(lowered, F.lit(_word_pattern(words)))
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*[hits[lang] for lang in _LANG_ORDER])
    pred = F.when(best == 0, F.lit("und"))
    for lang in _LANG_ORDER:
        pred = pred.when(hits[lang] == best, F.lit(lang))
    out = df.select("doc_id",
                    *[hits[lang].alias(f"hits_{lang}") for lang in _LANG_ORDER],
                    pred.alias("pred_lang"))
    return out


def fingerprint(df: DataFrame, col: str = "text") -> DataFrame:
    """Normalization fingerprint: md5 of lowercase, whitespace-collapsed
    text (document identity for exact dedup across formatting)."""
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(F.col(col)), WS_REGEX, " "), "^ | $", "")
    return df.select("doc_id", F.md5(norm).alias("fp"))


# ---- matching ANSI-SQL (DuckDB) oracles ------------------------------------

def token_count_sql(table: str = "documents") -> str:
    return f"""
SELECT doc_id,
       {ws_token_count_sql('text')} AS ws_tokens,
       len(regexp_extract_all(text, '{BPE_RE}')) AS bpe_tokens
FROM {table}
"""


def quality_score_sql(table: str = "documents") -> str:
    stop = _word_pattern(STOPWORDS_EN)
    return f"""
SELECT doc_id,
       length(text) AS n_chars_text,
       {ws_token_count_sql('text')} AS n_tokens,
       round(len(regexp_extract_all(text, '{PUNCT_RE}'))
             / CAST(length(text) AS DOUBLE), 6) AS punct_ratio,
       round(len(regexp_extract_all(lower(text), '{stop}'))
             / CAST({ws_token_count_sql('text')} AS DOUBLE), 6)
           AS stopword_ratio,
       CAST(length(text) >= 50
            AND {ws_token_count_sql('text')} >= 10 AS INT)
           AS passes_quality
FROM {table}
"""


def lang_id_sql(table: str = "documents") -> str:
    hit_exprs = {
        lang: f"len(regexp_extract_all(lower(text), '{_word_pattern(words)}'))"
        for lang, words in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(hit_exprs[lang] for lang in _LANG_ORDER) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' "
    for lang in _LANG_ORDER:
        case += f"WHEN {hit_exprs[lang]} = {best} THEN '{lang}' "
    case += "END"
    cols = ",\n       ".join(
        f"{hit_exprs[lang]} AS hits_{lang}" for lang in _LANG_ORDER)
    return f"SELECT doc_id,\n       {cols},\n       {case} AS pred_lang\nFROM {table}"


def fingerprint_sql(table: str = "documents") -> str:
    return (f"SELECT doc_id, md5(regexp_replace(regexp_replace(lower(text), '{WS_REGEX}', ' ', 'g'), '^ | $', '', 'g'))"
            f" AS fp FROM {table}")


def tfidf_topk(df: DataFrame, k: int = 3, col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document top-k TF-IDF terms: tf = in-doc term count, idf =
    ln(N / doc-frequency), ties broken (score DESC, term ASC). Tokens
    are lowercase letter runs.

    Scale shape: explode → one composite-key shuffle for (doc, term)
    counts; the document-frequency table shuffles on term (vocab-sized,
    ≪ corpus — Zipf) and joins back on term; the per-doc top-k window
    rides a doc-keyed exchange. The ranking key is the score QUANTIZED
    to 6 dp: mathematically-equal scores from different (tf, df) pairs
    (e.g. 2·ln10 vs ln100) may differ by an ulp between libm
    implementations, so ranking on the raw double would let the two
    engines break such "ties" differently — after quantization both
    agree the scores are equal and the (term ASC) tie-break decides."""
    from pyspark.sql import Window

    toks = (df.select(id_col,
                      F.explode(F.split(F.lower(F.col(col)),
                                        "[^a-z]+")).alias("term"))
            .where(F.col("term") != ""))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (tf.join(dfreq, "term")
              .crossJoin(F.broadcast(n_docs))
              .withColumn("tfidf",
                          F.round(F.col("tf") * F.log(F.col("n_docs")
                                                      / F.col("df")),
                                  6)))
    w = (Window.partitionBy(id_col)
         .orderBy(F.desc("tfidf"), F.asc("term")))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(id_col, F.col("rank").cast("long").alias("rank"),
                    "term", "tf", "tfidf"))


def tfidf_topk_sql(k: int = 3, table: str = "documents",
                   col: str = "text", id_col: str = "doc_id") -> str:
    return f"""
WITH toks AS (
  SELECT {id_col}, t.term
  FROM {table}, unnest(string_split_regex(lower({col}), '[^a-z]+'))
       AS t(term)
  WHERE t.term != ''
), tf AS (
  SELECT {id_col}, term, count(*) AS tf FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), scored AS (
  SELECT tf.{id_col}, tf.term, tf.tf,
         round(tf.tf * ln((SELECT count(DISTINCT {id_col}) FROM {table})
                          / dfreq.df), 6) AS tfidf
  FROM tf JOIN dfreq USING (term)
)
SELECT {id_col}, CAST(rank AS BIGINT) AS rank, term, tf, tfidf
FROM (SELECT *, row_number() OVER (PARTITION BY {id_col}
                                   ORDER BY tfidf DESC, term) AS rank
      FROM scored)
WHERE rank <= {k}
"""


# ------------------------------------------------------------- repetition
def repetition_counters(texts):
    """Batch-vectorized token/bigram tabulation: for each text, the five
    int64 counters (n_tokens, n_distinct, top_cnt, n_bigrams,
    n_distinct_bigrams) as an (n, 5) array. Tokens of the whole batch are
    factorized ONCE; per-(doc, token) counts come from a single
    ``np.unique`` over composed int64 keys and per-doc maxima/distinct
    counts from ``np.maximum.reduceat``/``np.diff`` over the grouped runs
    — O(batch tokens) vectorized work. Property-tested against a naive
    ``collections.Counter`` reference (tests/test_textstats_property.py).
    """
    import numpy as np
    import pandas as pd

    n = len(texts)
    out = {k: np.zeros(n, dtype=np.int64)
           for k in ("n_tokens", "n_distinct", "top_cnt",
                     "n_bigrams", "n_distinct_bigrams")}
    doc_idx, toks = [], []
    for i, t in enumerate(texts):
        tt = ws_tokens(t)
        out["n_tokens"][i] = len(tt)
        out["n_bigrams"][i] = max(len(tt) - 1, 0)
        if tt:
            doc_idx.append(np.full(len(tt), i, dtype=np.int64))
            toks.extend(tt)
    if toks:
        doc_idx = np.concatenate(doc_idx)
        codes, uniq = pd.factorize(pd.Series(toks, dtype=object))
        v = np.int64(len(uniq))
        # per-(doc, token) counts: one sort over composed keys
        ukey, ucnt = np.unique(doc_idx * v + codes, return_counts=True)
        udoc = ukey // v
        starts = np.flatnonzero(np.r_[True, np.diff(udoc) != 0])
        docs_with = udoc[starts]
        out["n_distinct"][docs_with] = np.diff(np.r_[starts, len(ukey)])
        out["top_cnt"][docs_with] = np.maximum.reduceat(ucnt, starts)
        # per-doc distinct bigrams: factorize code pairs, same trick
        same = doc_idx[:-1] == doc_idx[1:]
        if same.any():
            bd = doc_idx[:-1][same]
            pair, _ = pd.factorize(codes[:-1][same] * v + codes[1:][same])
            bkey = np.unique(bd * np.int64(len(pair) + 1) + pair)
            bdoc = bkey // np.int64(len(pair) + 1)
            bstarts = np.flatnonzero(np.r_[True, np.diff(bdoc) != 0])
            out["n_distinct_bigrams"][bdoc[bstarts]] = np.diff(
                np.r_[bstarts, len(bkey)])
    return np.column_stack([out[k] for k in
                            ("n_tokens", "n_distinct", "top_cnt",
                             "n_bigrams", "n_distinct_bigrams")])


def repetition_stats(df: DataFrame, col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition quality signals per document: distinct-token
    ratio, most-frequent-token fraction, duplicate-bigram fraction, and a
    composite ``repetitive`` gate (Rae et al. 2021 §A1.1 use exactly these
    shapes to drop boilerplate/spam from web-scale corpora).

    The token/bigram tabulation is one shuffle-free Arrow kernel in the
    ``simhash64`` batch-vectorized style: tokens of the whole batch are
    factorized ONCE (``pd.factorize``), per-(doc, code) counts come from a
    single ``np.unique`` over composed int64 keys, per-doc maxima/distinct
    counts from ``np.maximum.reduceat``/``np.diff`` over the grouped runs —
    O(batch tokens) vectorized work, no per-doc Python loop beyond the
    initial split, and NO token-level shuffle (the explode+groupBy
    formulation would shuffle ≈ the corpus token stream at 10^9 docs).

    The ``repetitive`` gate compares on cross-multiplied INTEGERS
    (``top_cnt * 8 > n_tokens``), never on rounded doubles, so the flag is
    bit-identical across engines at any data.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # five int64 counters per doc, packed as array<long> (a struct-returning
    # scalar pandas_udf signature isn't supported by the type-hint protocol)
    # NOTE: no type hints — this module has `from __future__ import
    # annotations`, which stringifies them, and pyspark's hint resolver
    # can't see the function-local `pd` import; hint-less pandas_udf
    # defaults to the scalar eval type, which is what this is.
    @pandas_udf("array<long>")
    def _rep(texts):
        return pd.Series(list(repetition_counters(texts)))

    r = df.select(id_col, _rep(F.col(col)).alias("a")).select(
        id_col,
        F.element_at("a", 1).alias("n_tokens"),
        F.element_at("a", 2).alias("n_distinct"),
        F.element_at("a", 3).alias("top_cnt"),
        F.element_at("a", 4).alias("n_bigrams"),
        F.element_at("a", 5).alias("n_distinct_bigrams"))
    nt, nb = F.col("n_tokens"), F.col("n_bigrams")
    return r.select(
        id_col, "n_tokens",
        F.when(nt > 0, F.round(F.col("n_distinct") / nt, 6))
        .otherwise(F.lit(0.0)).alias("distinct_ratio"),
        F.when(nt > 0, F.round(F.col("top_cnt") / nt, 6))
        .otherwise(F.lit(0.0)).alias("top_token_frac"),
        F.when(nb > 0,
               F.round(1 - F.col("n_distinct_bigrams") / nb, 6))
        .otherwise(F.lit(0.0)).alias("dup_bigram_frac"),
        ((F.col("top_cnt") * 8 > nt)
         | ((nb - F.col("n_distinct_bigrams")) * 10 > 3 * nb))
        .cast("int").alias("repetitive"),
    )


def repetition_sql(table: str = "documents", col: str = "text",
                   id_col: str = "doc_id") -> str:
    ws = WS_REGEX
    return rf"""
WITH toks AS (
  SELECT {id_col},
         list_filter(string_split_regex({col}, '{ws}'),
                     x -> x != '') AS t
  FROM {table}
), tok AS (
  SELECT {id_col}, unnest(t) AS tok FROM toks
), cnt AS (
  SELECT {id_col}, tok, count(*) AS c FROM tok GROUP BY 1, 2
), uni AS (
  SELECT {id_col}, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(max(c) AS BIGINT) AS top_cnt
  FROM cnt GROUP BY 1
), big AS (
  SELECT {id_col},
         CAST(greatest(len(t) - 1, 0) AS BIGINT) AS n_bigrams,
         CAST(len(list_distinct(list_transform(
             range(1, greatest(len(t) - 1, 0) + 1),
             i -> t[i] || ' ' || t[i + 1]))) AS BIGINT)
           AS n_distinct_bigrams
  FROM toks
)
SELECT d.{id_col},
       coalesce(u.n_tokens, 0) AS n_tokens,
       CASE WHEN coalesce(u.n_tokens, 0) > 0
            THEN round(u.n_distinct / CAST(u.n_tokens AS DOUBLE), 6)
            ELSE 0.0 END AS distinct_ratio,
       CASE WHEN coalesce(u.n_tokens, 0) > 0
            THEN round(u.top_cnt / CAST(u.n_tokens AS DOUBLE), 6)
            ELSE 0.0 END AS top_token_frac,
       CASE WHEN b.n_bigrams > 0
            THEN round(1 - b.n_distinct_bigrams
                       / CAST(b.n_bigrams AS DOUBLE), 6)
            ELSE 0.0 END AS dup_bigram_frac,
       CAST(coalesce(u.top_cnt * 8 > u.n_tokens, FALSE)
            OR (b.n_bigrams - b.n_distinct_bigrams) * 10
               > 3 * b.n_bigrams AS INT) AS repetitive
FROM {table} d
LEFT JOIN uni u USING ({id_col})
JOIN big b USING ({id_col})
"""


# -------------------------------------------------------------- PII scrub
# dialect-portable patterns (no lookaround/backreferences: valid in both
# Java regex and DuckDB's RE2)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b555-\d{4}\b"

# deterministic PII augmentation: the documents corpus is synthetic word
# salad with no real PII, so each doc gets a seeded contact line appended
# (identically in the Spark plan and the oracle) — the scrubber is then
# exercised against known-positive text
_AUG_SPARK = ("concat(text, ' contact user', CAST(doc_id AS STRING),"
              " '@mail.example.com from 10.', CAST(doc_id % 200 AS STRING),"
              " '.7.', CAST(doc_id % 250 AS STRING),"
              " ' tel 555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'))")
_AUG_DUCK = ("text || ' contact user' || CAST(doc_id AS VARCHAR)"
             " || '@mail.example.com from 10.'"
             " || CAST(doc_id % 200 AS VARCHAR)"
             " || '.7.' || CAST(doc_id % 250 AS VARCHAR)"
             " || ' tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR),"
             " 4, '0')")


def pii_scrub(df: DataFrame) -> DataFrame:
    """PII redaction pass over the corpus: count and replace emails, IPv4
    addresses and phone-shaped numbers with typed placeholders; emit the
    redaction counts plus an md5 digest of the scrubbed text (the digest,
    not the text, is what a privacy audit trail stores).

    Pure JVM ``regexp_replace``/``regexp_count`` — whole-stage codegen,
    narrow, no shuffle; at 10^9 documents this is a map-only pass.
    """
    aug = F.expr(_AUG_SPARK)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, F.lit(EMAIL_RE), F.lit("<EMAIL>")),
            F.lit(IPV4_RE), F.lit("<IP>")),
        F.lit(PHONE_RE), F.lit("<PHONE>"))
    return df.select(
        "doc_id",
        F.regexp_count(aug, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(aug, F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(aug, F.lit(PHONE_RE)).alias("n_phones"),
        F.md5(scrubbed.cast("binary")).alias("scrub_digest"),
        F.length(scrubbed).alias("n_chars_scrubbed"),
    )


def pii_scrub_sql(table: str = "documents") -> str:
    return rf"""
WITH aug AS (
  SELECT doc_id, {_AUG_DUCK} AS s FROM {table}
), scrubbed AS (
  SELECT doc_id, s,
         regexp_replace(regexp_replace(regexp_replace(
             s, '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{IPV4_RE}', '<IP>', 'g'),
             '{PHONE_RE}', '<PHONE>', 'g') AS sc
  FROM aug
)
SELECT doc_id,
       CAST(len(regexp_extract_all(s, '{EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(s, '{IPV4_RE}')) AS INT) AS n_ips,
       CAST(len(regexp_extract_all(s, '{PHONE_RE}')) AS INT) AS n_phones,
       md5(sc) AS scrub_digest,
       CAST(length(sc) AS INT) AS n_chars_scrubbed
FROM scrubbed
"""


# --------------------------------------------------------------- entropy
_QLOG_SCALE = 1 << 20


def _qlog(max_len: int):
    """floor(log2(c) * 2^20) for c in 1..max_len — the shared quantized
    log table that makes character entropy INTEGER-EXACT across engines.
    A float sum of p·log2 p would drift between numpy's and DuckDB's
    libm in the last ulp and can flip a 6-dp rounding; with the shared
    table the per-doc statistic is pure int64 arithmetic on both sides
    and only ONE final division happens (same two ints → same double)."""
    import numpy as np
    return np.floor(
        np.log2(np.arange(1, max_len + 1, dtype=np.float64))
        * _QLOG_SCALE).astype(np.int64)


def char_entropy(df: DataFrame, col: str = "text",
                 max_len: int = 4096) -> DataFrame:
    """Character-level Shannon entropy per document — the classic cheap
    gibberish / repetition / encoding-junk signal (low entropy = repeated
    characters or tiny alphabets; high = random bytes). Quantized:
    H ≈ (n·Q(n) − Σ m·Q(m)) / (n·2^20), Q = ``_qlog`` — exact int64 on
    both engines. Per-batch Arrow kernel (np.unique over the UTF-32
    codepoint array, no per-char Python); docs longer than ``max_len``
    extend the table locally with the identical formula (the SQL oracle
    is generated at a table size covering the corpus)."""
    import numpy as np
    import pandas as pd

    Q = _qlog(max_len)

    def fold(batches):
        q = Q
        for pdf in batches:
            ids, ns, ks, qsums = [], [], [], []
            for doc_id, t in zip(pdf["doc_id"], pdf[col]):
                codes = np.frombuffer((t or "").encode("utf-32-le"),
                                      dtype=np.uint32)
                n = len(codes)
                if n > len(q):
                    q = _qlog(n)
                if n == 0:
                    row = (0, 0, 0)
                else:
                    _, m = np.unique(codes, return_counts=True)
                    m = m.astype(np.int64)
                    row = (n, len(m),
                           int(n * q[n - 1] - int((m * q[m - 1]).sum())))
                ids.append(doc_id)
                ns.append(row[0])
                ks.append(row[1])
                qsums.append(row[2])
            yield pd.DataFrame({"doc_id": ids, "n_chars": ns,
                                "n_distinct": ks, "qsum": qsums})

    part = df.select("doc_id", col).mapInPandas(
        fold, "doc_id long, n_chars long, n_distinct long, qsum long")
    # one JVM-side division + round (HALF_UP, same as DuckDB for
    # non-negative values) — never Python round (banker's)
    return part.select(
        "doc_id", "n_chars", "n_distinct",
        F.when(F.col("n_chars") == 0, F.lit(0.0))
        .otherwise(F.round(F.col("qsum")
                           / (F.col("n_chars") * float(_QLOG_SCALE)), 6))
        .alias("entropy_bits"))


def char_entropy_sql(table: str = "documents", max_len: int = 4096) -> str:
    lits = ", ".join(str(int(v)) for v in _qlog(max_len))
    return f"""
WITH qlog(t) AS (SELECT [{lits}]),
ch AS (
  SELECT doc_id, unnest(string_split(text, '')) AS c
  FROM {table} WHERE len(text) > 0
), cnt AS (SELECT doc_id, c, count(*) AS m FROM ch GROUP BY 1, 2),
agg AS (
  SELECT doc_id, CAST(sum(cnt.m) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS k,
         CAST(sum(cnt.m * q.t[cnt.m]) AS BIGINT) AS sq
  FROM cnt, qlog q GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n_chars,
       CAST(coalesce(a.k, 0) AS BIGINT) AS n_distinct,
       CASE WHEN coalesce(a.n, 0) = 0 THEN 0.0
            ELSE round((a.n * q.t[a.n] - a.sq)
                       / (a.n * {float(_QLOG_SCALE)}), 6) END
           AS entropy_bits
FROM {table} d LEFT JOIN agg a USING (doc_id), qlog q
"""


# ------------------------------------------------------- Gopher rule filter
# Gopher's document-level quality rules (Rae et al. 2021, Appendix A):
# word-count bounds, mean-word-length band, symbol-to-word ratio,
# fraction of words with an alphabetic character, and a minimum number
# of DISTINCT stop words present. The reference has no analogue — this
# is lake-side corpus curation the CDC-fed repo-content table feeds.
GOPHER_SYMBOLS = "[#…]"  # '#' and ellipsis, per the paper


def gopher_rules(df: DataFrame, col: str = "text",
                 min_words: int = 50, max_words: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 min_alpha_ratio: float = 0.8,
                 min_stop_distinct: int = 2) -> DataFrame:
    """Per-document Gopher rule flags + the conjunctive ``keep`` gate.

    Map-only, pure JVM (``split`` + higher-order ``filter`` + ``rlike``):
    no shuffle, no Python — at 10^9 documents this is one codegen pass.
    Ratios divide two identically-derived ints, so the doubles (and the
    keep flag built from them) are bit-equal across engines; displayed
    ratios are rounded to 6 dp for the cross-engine hash. Zero-word
    documents report 0.0 ratios (and keep=0) rather than NULL.
    """
    c = F.col(col)
    words = F.filter(F.split(c, WS_REGEX), lambda w: F.length(w) > 0)
    n_words = ws_token_count(c)
    # sum of word lengths == length with every delimiter removed
    word_chars = F.length(F.regexp_replace(c, WS_REGEX, ""))
    mean_wl = F.try_divide(word_chars, n_words)
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    n_sym = F.size(F.filter(words, lambda w: w.rlike(GOPHER_SYMBOLS)))
    alpha_ratio = F.try_divide(n_alpha, n_words)
    sym_ratio = F.try_divide(n_sym, n_words)
    stop_hits = [
        (F.regexp_count(F.lower(c), F.lit(rf"\b{w}\b")) > 0).cast("int")
        for w in STOPWORDS_EN
    ]
    n_stop = sum(stop_hits[1:], stop_hits[0])
    keep = ((n_words >= min_words) & (n_words <= max_words)
            & (mean_wl >= min_mean_word_len)
            & (mean_wl <= max_mean_word_len)
            & (sym_ratio <= max_symbol_ratio)
            & (alpha_ratio >= min_alpha_ratio)
            & (n_stop >= min_stop_distinct))
    return df.select(
        "doc_id",
        n_words.alias("n_words"),
        F.coalesce(F.round(mean_wl, 6), F.lit(0.0)).alias("mean_word_len"),
        F.coalesce(F.round(sym_ratio, 6), F.lit(0.0)).alias("symbol_ratio"),
        F.coalesce(F.round(alpha_ratio, 6), F.lit(0.0)).alias("alpha_ratio"),
        n_stop.alias("n_stop_distinct"),
        F.coalesce(keep.cast("int"), F.lit(0)).alias("keep"),
    )


def gopher_rules_sql(table: str = "documents",
                     min_words: int = 50, max_words: int = 100_000,
                     min_mean_word_len: float = 3.0,
                     max_mean_word_len: float = 10.0,
                     max_symbol_ratio: float = 0.1,
                     min_alpha_ratio: float = 0.8,
                     min_stop_distinct: int = 2) -> str:
    nw = ws_token_count_sql("text")
    words = f"list_filter(string_split_regex(text, '{WS_REGEX}'), x -> x <> '')"
    stop_sum = " + ".join(
        rf"CAST(regexp_matches(lower(text), '\b{w}\b') AS INT)"
        for w in STOPWORDS_EN)
    return f"""
WITH m AS (
  SELECT doc_id,
         {nw} AS n_words,
         length(regexp_replace(text, '{WS_REGEX}', '', 'g')) AS word_chars,
         len(list_filter({words}, x -> regexp_matches(x, '[A-Za-z]')))
             AS n_alpha,
         len(list_filter({words}, x -> regexp_matches(x, '{GOPHER_SYMBOLS}')))
             AS n_sym,
         {stop_sum} AS n_stop
  FROM {table}
), r AS (
  SELECT doc_id, n_words, n_stop,
         word_chars / CAST(NULLIF(n_words, 0) AS DOUBLE) AS mean_wl,
         n_sym / CAST(NULLIF(n_words, 0) AS DOUBLE) AS sym_r,
         n_alpha / CAST(NULLIF(n_words, 0) AS DOUBLE) AS alpha_r
  FROM m
)
SELECT doc_id,
       n_words,
       coalesce(round(mean_wl, 6), 0.0) AS mean_word_len,
       coalesce(round(sym_r, 6), 0.0) AS symbol_ratio,
       coalesce(round(alpha_r, 6), 0.0) AS alpha_ratio,
       n_stop AS n_stop_distinct,
       coalesce(CAST(n_words BETWEEN {min_words} AND {max_words}
                AND mean_wl BETWEEN {min_mean_word_len} AND {max_mean_word_len}
                AND sym_r <= {max_symbol_ratio}
                AND alpha_r >= {min_alpha_ratio}
                AND n_stop >= {min_stop_distinct} AS INT), 0) AS keep
FROM r
"""


# ---------------------------------------------------------------------------
# C4-style page cleaning (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning...", §2.2): line-level retention rules followed by
# page-level drop rules. The reference engine has no document operators at
# all (it stops at CDC delivery); this is part of the training-data
# pipeline family layered on the same lake tables.

# terminal punctuation per C4: period, exclamation, question, end quote
C4_TERMINAL_RE = '[.!?"]$'
# stand-in for C4's external "dirty words" list: the operator takes the
# real list as a parameter; tests and the registered config use small
# deterministic lists
C4_BANNED_DEFAULT = ("badword",)


def c4_rules(df: DataFrame, col: str = "text",
             min_words_per_line: int = 5,
             min_kept_lines: int = 3,
             banned_words=C4_BANNED_DEFAULT) -> DataFrame:
    """C4 cleaning rules per document: keep lines ending in terminal
    punctuation with >= ``min_words_per_line`` words and no
    "javascript"; drop pages with < ``min_kept_lines`` surviving lines,
    any banned word, the phrase "lorem ipsum", or a curly brace.

    Map-only JVM expressions (``split`` + higher-order ``filter`` +
    ``rlike``): no shuffle, no Python — one codegen pass per document at
    any corpus size. Lines are literal ``\\n`` splits of ``col`` and are
    ASCII-space ``trim``-med before the rules (both engines trim only
    U+0020); word counts use the shared ``WS_CLASS`` contract
    (textnorm). Returns one row per input row with the line/page flags
    and the cleaned page (kept lines re-joined with ``\\n``).
    """
    c = F.coalesce(F.col(col), F.lit(""))
    lines = F.transform(F.split(c, "\n"), lambda l: F.trim(l))

    def _line_ok(l):
        n_words = F.size(F.filter(F.split(l, WS_REGEX),
                                  lambda w: F.length(w) > 0))
        return (l.rlike(C4_TERMINAL_RE)
                & (n_words >= F.lit(min_words_per_line))
                & ~F.lower(l).contains("javascript"))

    kept = F.filter(lines, _line_ok)
    low = F.lower(c)
    has_banned = low.rlike(_word_pattern(banned_words)).cast("int")
    has_lorem = low.contains("lorem ipsum").cast("int")
    has_brace = c.contains("{").cast("int")
    n_kept = F.size(kept)
    keep = ((n_kept >= F.lit(min_kept_lines))
            & (has_banned == 0) & (has_lorem == 0) & (has_brace == 0))
    return df.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        has_banned.alias("has_banned"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        keep.cast("int").alias("keep"),
        F.array_join(kept, "\n").alias("cleaned"),
    )


def c4_rules_sql(table: str = "documents",
                 min_words_per_line: int = 5,
                 min_kept_lines: int = 3,
                 banned_words=C4_BANNED_DEFAULT) -> str:
    """DuckDB equivalent of :func:`c4_rules` (same output columns)."""
    wc = ("len(list_filter(string_split_regex(l, '" + WS_REGEX + "'), "
          "x -> x <> ''))")
    banned_re = _word_pattern(banned_words)
    return f"""
WITH m AS (
  SELECT doc_id,
         coalesce(text, '') AS t,
         list_transform(string_split(coalesce(text, ''), chr(10)),
                        l -> trim(l)) AS lines
  FROM {table}
), k AS (
  SELECT doc_id, t, len(lines) AS n_lines,
         list_filter(lines, l -> regexp_matches(l, '{C4_TERMINAL_RE}')
             AND {wc} >= {min_words_per_line}
             AND NOT contains(lower(l), 'javascript')) AS kept
  FROM m
)
SELECT doc_id,
       n_lines,
       len(kept) AS n_kept_lines,
       CAST(regexp_matches(lower(t), '{banned_re}') AS INT) AS has_banned,
       CAST(contains(lower(t), 'lorem ipsum') AS INT) AS has_lorem,
       CAST(contains(t, '{{') AS INT) AS has_brace,
       CAST(len(kept) >= {min_kept_lines}
            AND NOT regexp_matches(lower(t), '{banned_re}')
            AND NOT contains(lower(t), 'lorem ipsum')
            AND NOT contains(t, '{{') AS INT) AS keep,
       coalesce(array_to_string(kept, chr(10)), '') AS cleaned
FROM k
"""


# --------------------------------------------------- hashed bigram LM score
# CCNet-style LM quality filter (Wenzek et al. 2020 §3.3 score documents
# by LM perplexity; production pipelines bucket the model to bound its
# size). Here the model is a HASHED bigram LM trained on the corpus
# itself: context and bigram counts live in md5-derived buckets (bounded
# state — the DSIR trick), probabilities are add-one smoothed, and all
# log2 values come from the shared quantized table so the per-document
# score is exact int64 arithmetic on both engines.

LM_BUCKETS = 256
LM_CLIP = 4096


def bigram_lm_score(df: DataFrame, col: str = "text",
                    n_buckets: int = LM_BUCKETS,
                    clip: int = LM_CLIP) -> DataFrame:
    """Per-document average negative-log2-likelihood under the hashed
    bigram model: ``(doc_id, n_bigrams, avg_nll_bits)`` where
    bits(w|u) = QL(min(C_ctx[h(u)], clip) + 1) − QL(min(C_bg[h(u,w)],
    clip) + 1) — the bucketed, clipped, quantized form of
    −log2 (C(u,w)+1)/(C(u)+1). Low score = predictable boilerplate,
    high = unusual token transitions; the filter thresholds both tails.

    Scale shape (two map-only Arrow passes, the DSIR pipeline shape):
    pass 1 folds per-partition bucket-count partials — state is
    2×``n_buckets`` int64 per partition and the shuffle carries
    partitions × buckets tiny rows; the two ``n_buckets``-sized count
    tables are then closed over (broadcast) by pass 2, which emits one
    row per document. Gram extraction never reaches a shuffle."""
    import hashlib
    import numpy as np
    import pandas as pd

    def _bkt(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:7], 16) % n_buckets

    def count_fold(batches):
        ctx = np.zeros(n_buckets, np.int64)
        bg = np.zeros(n_buckets, np.int64)
        cache: dict = {}
        for pdf in batches:
            for t in pdf[col]:
                toks = ws_tokens(t)
                for i in range(len(toks) - 1):
                    u, w = toks[i], toks[i + 1]
                    k = (u, w)
                    hit = cache.get(k)
                    if hit is None:
                        hit = (_bkt(u), _bkt(u + " " + w))
                        cache[k] = hit
                    ctx[hit[0]] += 1
                    bg[hit[1]] += 1
        yield pd.DataFrame({
            "kind": ["c"] * n_buckets + ["b"] * n_buckets,
            "bkt": np.concatenate([np.arange(n_buckets)] * 2),
            "ct": np.concatenate([ctx, bg]),
        })

    partial = df.select(col).mapInPandas(
        count_fold, "kind string, bkt int, ct long")
    totals = (partial.groupBy("kind", "bkt").agg(F.sum("ct").alias("ct"))
              .collect())  # bounded: 2 × n_buckets rows
    ctx_ct = np.zeros(n_buckets, dtype="int64")
    bg_ct = np.zeros(n_buckets, dtype="int64")
    for r in totals:
        (ctx_ct if r["kind"] == "c" else bg_ct)[r["bkt"]] = r["ct"]
    ql = _qlog(clip + 1)
    ctx_q = ql[np.minimum(ctx_ct, clip)]   # QL(min(ct, clip) + 1)
    bg_q = ql[np.minimum(bg_ct, clip)]

    def score_fold(batches):
        import pandas as pd
        cache: dict = {}
        for pdf in batches:
            ids, ns, qs = [], [], []
            for doc_id, t in zip(pdf["doc_id"], pdf[col]):
                toks = ws_tokens(t)
                q = 0
                n = max(len(toks) - 1, 0)
                for i in range(n):
                    u, w = toks[i], toks[i + 1]
                    k = (u, w)
                    hit = cache.get(k)
                    if hit is None:
                        hit = (_bkt(u), _bkt(u + " " + w))
                        cache[k] = hit
                    q += int(ctx_q[hit[0]]) - int(bg_q[hit[1]])
                ids.append(doc_id)
                ns.append(n)
                qs.append(q)
            yield pd.DataFrame({"doc_id": ids, "n_bigrams": ns,
                                "qsum": qs})

    part = df.select("doc_id", col).mapInPandas(
        score_fold, "doc_id long, n_bigrams long, qsum long")
    return part.select(
        "doc_id", "n_bigrams",
        F.when(F.col("n_bigrams") == 0, F.lit(0.0))
        .otherwise(F.round(F.col("qsum")
                           / (F.col("n_bigrams") * float(_QLOG_SCALE)), 6))
        .alias("avg_nll_bits"))


def bigram_lm_score_sql(table: str = "documents",
                        n_buckets: int = LM_BUCKETS,
                        clip: int = LM_CLIP) -> str:
    lits = ", ".join(str(int(v)) for v in _qlog(clip + 1))
    ws = WS_REGEX
    return rf"""
WITH ql(t) AS (SELECT [{lits}]),
toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '{ws}'), x -> x <> '') AS tk
  FROM {table}
), grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
                               i -> tk[i])) AS u,
         unnest(list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
                               i -> tk[i + 1])) AS w
  FROM toks
), hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(u), 1, 7))::BIGINT % {n_buckets} AS hc,
         ('0x' || substr(md5(u || ' ' || w), 1, 7))::BIGINT
             % {n_buckets} AS hb
  FROM grams
), ctx AS (SELECT hc, count(*) AS ct FROM hashed GROUP BY hc),
bg AS (SELECT hb, count(*) AS ct FROM hashed GROUP BY hb),
scored AS (
  SELECT h.doc_id,
         q.t[least(coalesce(c.ct, 0), {clip}) + 1]
         - q.t[least(coalesce(b.ct, 0), {clip}) + 1] AS bits_q
  FROM hashed h
  LEFT JOIN ctx c ON c.hc = h.hc
  LEFT JOIN bg b ON b.hb = h.hb, ql q
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(bits_q) AS BIGINT) AS qsum
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CASE WHEN coalesce(a.n_bigrams, 0) = 0 THEN 0.0
            ELSE round(a.qsum / (a.n_bigrams * {float(_QLOG_SCALE)}), 6)
       END AS avg_nll_bits
FROM {table} d LEFT JOIN agg a USING (doc_id)
"""
