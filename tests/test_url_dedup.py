"""URL canonicalization + dedup: tricky-input unit coverage (the oracle
parity suite covers the registered synthetic-URL query end-to-end)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlog_spark.operators.dedup import url_canonicalize, url_dedup  # noqa: E402


CASES = [
    # scheme + www + default port + trailing slash all stripped
    ("https://www.Example.org:443/a/b/", "example.org/a/b"),
    ("http://example.org:80/a/b", "example.org/a/b"),
    # tracking params dropped, survivors sorted
    ("https://example.org/p?utm_source=x&b=2&a=1", "example.org/p?a=1&b=2"),
    ("https://example.org/p?a=1&b=2&fbclid=zzz&gclid=q", "example.org/p?a=1&b=2"),
    # param order never splits a group
    ("https://example.org/p?b=2&a=1", "example.org/p?a=1&b=2"),
    # all params tracking -> no query at all
    ("http://www.example.org/p?utm_medium=m&utm_campaign=c", "example.org/p"),
    # empty path
    ("https://example.org", "example.org/"),
    # case folding covers host AND path (documented: whole-URL lowercase)
    ("HTTPS://WWW.EXAMPLE.ORG/A?B=1", "example.org/a?b=1"),
    # non-default port kept; www only stripped at the start
    ("https://example.org:8080/x", "example.org:8080/x"),
    ("https://wwwx.example.org/x", "wwwx.example.org/x"),
    # utm-prefixed VALUE (not key) survives
    ("https://example.org/p?q=utm_source", "example.org/p?q=utm_source"),
]


def test_url_canonicalize_cases(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)],
                               "doc_id long, url string")
    got = {r["doc_id"]: r["c"] for r in
           df.select("doc_id", url_canonicalize(F.col("url")).alias("c"))
           .collect()}
    for i, (u, want) in enumerate(CASES):
        assert got[i] == want, (u, got[i], want)


def test_url_dedup_groups_and_digest(spark):
    rows = [
        (1, "https://www.site.org/a?x=1&utm_source=s"),
        (2, "http://site.org:80/a/?x=1"),
        (3, "HTTPS://SITE.ORG/a?x=1&fbclid=f"),
        (4, "https://site.org/other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["canonical_url"]: r for r in url_dedup(df).collect()}
    assert set(out) == {"site.org/a?x=1", "site.org/other"}
    g = out["site.org/a?x=1"]
    assert g["n_docs"] == 3 and g["keeper_doc_id"] == 1
    assert g["member_digest"] == (1 ^ 2 ^ 3)
    assert out["site.org/other"]["n_docs"] == 1
