"""Property-based cross-check: the batch-vectorized repetition kernel
(`textstats.repetition_counters`) == a naive per-document Counter
reference, over randomized corpora (empty docs, single tokens, heavy
duplication, whitespace variety, tokens that collide across documents —
the factorize/compose-key arithmetic must never leak counts between
documents or between unigram and bigram tabulations)."""

import os
import sys
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlog_spark.operators.textstats import repetition_counters  # noqa: E402

_token = st.sampled_from(["a", "b", "ab", "x1", "the", "zz", "q"])
_ws = st.sampled_from([" ", "  ", "\t", " \t ", "\n"])


def _doc(draw):
    toks = draw(st.lists(_token, min_size=0, max_size=40))
    seps = [draw(_ws) for _ in toks]
    lead = draw(_ws) if draw(st.booleans()) else ""
    return lead + "".join(t + s for t, s in zip(toks, seps))


@st.composite
def corpus(draw):
    return [_doc(draw) for _ in range(draw(st.integers(0, 12)))]


def _reference(texts):
    rows = []
    for t in texts:
        tt = (t or "").split()
        uni = Counter(tt)
        bi = Counter(zip(tt, tt[1:]))
        rows.append((len(tt), len(uni), max(uni.values()) if uni else 0,
                     max(len(tt) - 1, 0), len(bi)))
    return rows


@settings(max_examples=200, deadline=None)
@given(corpus())
def test_repetition_counters_match_counter_reference(texts):
    got = repetition_counters(texts)
    assert [tuple(int(x) for x in row) for row in got] == _reference(texts)


def test_repetition_counters_edge_cases():
    texts = ["", "   ", "a", "a a a a", "a b a b", None, "\t\n", "q q"]
    got = [tuple(int(x) for x in row) for row in repetition_counters(texts)]
    assert got == _reference(texts)
