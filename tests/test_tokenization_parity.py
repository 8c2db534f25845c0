"""Exotic-whitespace tokenization parity (r3 ADVICE).

Python ``str.split()``, Java ``\\s`` and RE2 ``\\s`` disagree on
vertical tab and non-ASCII whitespace (NBSP, U+2028, ...). Every
tokenizing kernel/expression/oracle now uses one explicit ASCII class
(``operators/textnorm.WS_REGEX``); the synthetic corpus is ASCII-space
joined and cannot catch a divergence, so this suite runs the affected
query/oracle pairs over a corpus peppered with hostile whitespace."""

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlog_spark.queries import ORACLES, QUERIES  # noqa: E402

# non-ASCII whitespace (str.split() would split, the contract must NOT),
# vertical tab (Java \s splits, RE2 \s does not — the contract DOES:
# it's in the explicit class), plus edge/repeated delimiters
DOCS = [
    (0, "plain ascii words repeated words words"),
    (1, "nbsp joined tokens here"),        # NBSP inside a "token"
    (2, "line sep and ideographic　space"),
    (3, "vertical\x0btab split here"),          # VT IS a delimiter
    (4, "\t leading and trailing \n"),
    (5, "many     spaces\t\tand\ttabs"),
    (6, "narrow nbsp and zero​width"),  # no split on either
    (7, ""),
    (8, "  　"),                 # exotic ws survives as one token
    (9, "x"),
]

AFFECTED = [
    "text_token_count", "text_quality", "text_fingerprint",
    "text_repetition", "tok_bpe_top_pairs", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_minhash_signature",
    "dedup_exact_substr_spans", "text_decontaminate",
    "text_gopher_rules", "text_c4_rules",
]


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hostile_ws")
    pdf = pd.DataFrame(
        [{"doc_id": i, "text": t, "lang": "en", "source": f"s{i % 3}",
          "n_chars": len(t)} for i, t in DOCS])
    pdf.to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return str(d)


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.6f}"
    return v


def _rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


@pytest.mark.parametrize("name", AFFECTED)
def test_hostile_whitespace_matches_oracle(spark, hostile_dir, name):
    sdf = QUERIES[name](spark, hostile_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{hostile_dir}/documents.parquet'")
    res = con.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols)
    a, b = _rows(scols, srows), _rows(dcols, drows)
    diffs = [p for p in zip(a, b) if p[0] != p[1]]
    assert len(a) == len(b) and not diffs, f"{name}: first diffs {diffs[:3]}"


def test_ws_tokens_contract():
    from binlog_spark.operators.textnorm import ws_tokens

    assert ws_tokens("a\x0bb") == ["a", "b"]            # VT splits
    assert ws_tokens("a b") == ["a b"]        # NBSP does not
    assert ws_tokens("a b") == ["a b"]        # LS does not
    assert ws_tokens("  a \t b \n ") == ["a", "b"]      # edges collapse
    assert ws_tokens(None) == []
    assert ws_tokens("") == []
