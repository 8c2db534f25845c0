"""C4-style page cleaning (Raffel et al. 2020 §2.2) on real multi-line
pages: every rule exercised individually — terminal-punctuation line
retention, min-words-per-line, the "javascript" line drop, and the
page-level min-kept-lines / banned-word / "lorem ipsum" / curly-brace
gates — plus the cleaned-page reassembly. (The registered sf-corpus
config is covered by the oracle-parity suite; this file covers the
operator's generality on text the synthetic corpus can't produce.)"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlog_spark.operators import textstats  # noqa: E402

GOOD_LINE = "this line has plenty of words and ends well."

PAGES = [
    # 0: clean page, three good lines -> kept
    (0, "\n".join([GOOD_LINE, "another fine sentence with many words!",
                   'a quoted ending with enough words here"'])),
    # 1: only two lines survive (one lacks terminal punctuation) -> dropped
    (1, "\n".join([GOOD_LINE, "no terminal punctuation on this line",
                   "short one."])),  # "short one." < 5 words
    # 2: javascript line is removed but page still has 3 good lines
    (2, "\n".join([GOOD_LINE, "please enable JavaScript to view this.",
                   "second good line with enough words here.",
                   "third good line with enough words too."])),
    # 3: banned word -> page dropped even though lines are fine
    (3, "\n".join([GOOD_LINE, "this badword sentence has enough words.",
                   "third good line with enough words too."])),
    # 4: lorem ipsum -> dropped
    (4, "\n".join([GOOD_LINE, "lorem ipsum dolor sit amet consectetur.",
                   "third good line with enough words too."])),
    # 5: curly brace -> dropped
    (5, "\n".join([GOOD_LINE, "function f() { return 1; } is code.",
                   "third good line with enough words too."])),
    # 6: empty / null-ish page
    (6, ""),
    # 7: whitespace-only lines trim to empty and are dropped
    (7, "   \n\t\n  . \n" + GOOD_LINE),
]


def test_c4_rules_all_paths(spark):
    df = spark.createDataFrame(PAGES, "doc_id long, text string")
    out = {r.doc_id: r for r in
           textstats.c4_rules(df, min_words_per_line=5,
                              min_kept_lines=3).collect()}

    assert out[0].keep == 1 and out[0].n_kept_lines == 3
    assert out[0].cleaned.count("\n") == 2

    # page 1: the unpunctuated line and the 2-word line both fall
    assert out[1].n_kept_lines == 1 and out[1].keep == 0

    # page 2: javascript line removed, 3 good lines remain -> kept
    r2 = out[2]
    assert r2.n_lines == 4 and r2.n_kept_lines == 3 and r2.keep == 1
    assert "javascript" not in r2.cleaned.lower()

    # page-level drops keep the line stats but zero the gate
    assert out[3].has_banned == 1 and out[3].keep == 0
    assert out[4].has_lorem == 1 and out[4].keep == 0
    assert out[5].has_brace == 1 and out[5].keep == 0
    # the brace line itself also fails (it would be kept otherwise:
    # it ends with '.'), proving page- and line-rules are independent
    assert out[5].n_kept_lines == 3

    assert out[6].n_lines == 1 and out[6].n_kept_lines == 0
    assert out[6].keep == 0 and out[6].cleaned == ""

    # page 7: blank lines and the 1-word "." line all fail; one survivor
    assert out[7].n_lines == 4 and out[7].n_kept_lines == 1
    assert out[7].cleaned == GOOD_LINE


def test_c4_rules_matches_duckdb_on_multiline(spark, tmp_path):
    """Value parity on multi-line pages (the sf corpus is single-line,
    so the registry-level parity test can't cover the line machinery)."""
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame([{"doc_id": i, "text": t} for i, t in PAGES])
    p = os.path.join(tmp_path, "documents.parquet")
    pdf.to_parquet(p, index=False)

    sdf = (textstats.c4_rules(spark.read.parquet(p))
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM read_parquet('{p}')")
    odf = (con.sql(textstats.c4_rules_sql())
           .df().sort_values("doc_id").reset_index(drop=True))
    for c in sorted(sdf.columns):
        assert (sdf[c].astype(str) == odf[c].astype(str)).all(), c
