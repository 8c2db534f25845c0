"""C4 duplicated-span removal (Raffel et al. 2020 §2.2: discard all but
one occurrence of any three-sentence span): keep-one semantics, keeper
determinism (global min (doc_id, pos)), within-document duplication,
and degenerate pages (too few sentences, empty)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlog_spark.operators import dedup  # noqa: E402

BOILER = "all rights reserved. click here to subscribe. terms of use."

PAGES = [
    # doc 0 holds the canonical (first) occurrence of the boilerplate span
    (0, BOILER + " unique opening sentence zero! another unique zero."),
    # docs 1-2 repeat it -> their occurrence of that span is removed
    (1, "unique opening sentence one. " + BOILER),
    (2, "unique opening sentence two? second unique two! " + BOILER),
    # doc 3: within-document duplication — the same span appears twice;
    # the second occurrence is removed even with no other doc involved
    (3, "alpha beta. gamma delta. epsilon zeta. "
        "alpha beta. gamma delta. epsilon zeta."),
    # doc 4: two sentences only -> no 3-sentence span
    (4, "just one. and two."),
    (5, ""),
]


def test_keep_one_semantics(spark):
    df = spark.createDataFrame(PAGES, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.c4_span_dedup(df, span=3).collect()}

    # doc 0: its BOILER span is the global keeper -> nothing removed
    assert out[0].n_removed_spans == 0 and out[0].n_spans == 3

    # docs 1-2 each contain the duplicated span once, at a later
    # (doc_id, pos) than doc 0 -> exactly that occurrence is removed
    assert out[1].n_removed_spans == 1
    assert out[2].n_removed_spans == 1

    # doc 3: 6 sentences -> 4 spans; span "alpha beta gamma delta
    # epsilon zeta" occurs at pos 1 (keeper) and pos 4 (removed)
    assert out[3].n_sents == 6 and out[3].n_spans == 4
    assert out[3].n_removed_spans == 1
    assert abs(out[3].dup_frac - 0.25) < 1e-9

    # too-short and empty pages: zero spans, zero removals, 0.0 frac
    for d in (4, 5):
        assert out[d].n_spans == 0 and out[d].n_removed_spans == 0
        assert out[d].dup_frac == 0.0
    assert out[4].n_sents == 2 and out[5].n_sents == 0


def test_keeper_is_global_min_not_per_pair(spark):
    """Three occurrences of one span: exactly occurrences 2 and 3 are
    removed (count>1 logic must not remove the keeper or double-count)."""
    tri = "x y. z w. q r."
    df = spark.createDataFrame(
        [(10, tri), (11, tri), (12, tri)], "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.c4_span_dedup(df, span=3).collect()}
    assert out[10].n_removed_spans == 0
    assert out[11].n_removed_spans == 1
    assert out[12].n_removed_spans == 1


def test_matches_duckdb_on_multisentence(spark, tmp_path):
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame([{"doc_id": i, "text": t} for i, t in PAGES])
    p = os.path.join(tmp_path, "documents.parquet")
    pdf.to_parquet(p, index=False)

    sdf = (dedup.c4_span_dedup(spark.read.parquet(p), span=3)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    odf = (con.sql(dedup.c4_span_dedup_sql(span=3))
           .df().sort_values("doc_id").reset_index(drop=True))
    for c in sorted(sdf.columns):
        assert (sdf[c].astype(str) == odf[c].astype(str)).all(), c
