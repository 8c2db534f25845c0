"""Text analysis over document tables: language-ID, quality scoring,
token counting, fingerprinting.

All built from JVM-side ``pyspark.sql.functions`` (whole-stage codegen;
no Python in the hot path) and each with an exact ANSI-SQL equivalent so
the DuckDB oracle can verify value-level parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
STOPWORDS_EN = ["the", "a", "and", "of", "to", "is", "in", "it"]


def _word_pattern(words) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def token_count(df: DataFrame, col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per document."""
    return df.select(
        "doc_id",
        F.size(F.split(F.trim(F.col(col)), r"\s+")).alias("ws_tokens"),
        F.regexp_count(F.col(col), F.lit(BPE_RE)).alias("bpe_tokens"),
    )


def quality_score(df: DataFrame, col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality signals.

    Ratios are rounded to 6 dp so they are bit-comparable across engines.
    """
    length = F.length(F.col(col))
    n_tokens = F.size(F.split(F.trim(F.col(col)), r"\s+"))
    n_punct = F.regexp_count(F.col(col), F.lit(PUNCT_RE))
    n_stop = F.regexp_count(F.lower(F.col(col)),
                            F.lit(_word_pattern(STOPWORDS_EN)))
    return df.select(
        "doc_id",
        length.alias("n_chars_text"),
        n_tokens.alias("n_tokens"),
        F.round(n_punct / length, 6).alias("punct_ratio"),
        F.round(n_stop / n_tokens, 6).alias("stopword_ratio"),
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
    norm = F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")
    return df.select("doc_id", F.md5(norm).alias("fp"))


# ---- matching ANSI-SQL (DuckDB) oracles ------------------------------------

def token_count_sql(table: str = "documents") -> str:
    return f"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
       len(regexp_extract_all(text, '{BPE_RE}')) AS bpe_tokens
FROM {table}
"""


def quality_score_sql(table: str = "documents") -> str:
    stop = _word_pattern(STOPWORDS_EN)
    return f"""
SELECT doc_id,
       length(text) AS n_chars_text,
       len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       round(len(regexp_extract_all(text, '{PUNCT_RE}'))
             / CAST(length(text) AS DOUBLE), 6) AS punct_ratio,
       round(len(regexp_extract_all(lower(text), '{stop}'))
             / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE), 6)
           AS stopword_ratio,
       CAST(length(text) >= 50
            AND len(string_split_regex(trim(text), '\\s+')) >= 10 AS INT)
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
    return (f"SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"
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
