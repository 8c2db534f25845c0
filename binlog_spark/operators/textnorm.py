"""Cross-engine whitespace-tokenization contract.

Three regex engines touch the same text: Python kernels (``re`` /
``str.split``), Spark's JVM expressions (``java.util.regex``), and the
DuckDB oracles (RE2). Their whitespace classes all DIFFER:

* Python ``str.split()`` splits on every Unicode whitespace char
  (NBSP, U+2028, vertical tab, ...);
* Java ``\\s`` is ``[ \\t\\n\\x0B\\f\\r]`` (ASCII, includes VT);
* RE2 ``\\s`` is ``[ \\t\\n\\f\\r]`` (ASCII, EXCLUDES VT).

A document containing a non-ASCII space (or a vertical tab) therefore
tokenized differently per engine (r3 ADVICE). Every tokenizing kernel,
Spark expression and DuckDB oracle uses THE SAME explicit class below —
spelled with ``\\x0B``, never ``\\v``: Java's ``\\v`` is a whole
vertical-whitespace CLASS (adds U+0085/U+2028/U+2029) while Python's and
RE2's ``\\v`` is the single VT char.
"""

from __future__ import annotations

import re

# the delimiter class, valid verbatim in Python re, java.util.regex, RE2
WS_CLASS = "[ \\t\\n\\r\\f\\x0B]"
WS_REGEX = WS_CLASS + "+"

_WS_RE = re.compile(WS_REGEX)


def ws_tokens(text: str | None) -> list[str]:
    """Non-empty tokens of ``text`` under the shared delimiter class —
    the ``str.split()`` analogue (leading/trailing/repeated delimiters
    produce no empty tokens)."""
    return [w for w in _WS_RE.split(text or "") if w]


def ws_token_count(col):
    """Spark Column: COUNT of ``ws_tokens`` — without engine ``trim``
    (Spark trims only ASCII space, DuckDB trims Unicode whitespace, so a
    trim-then-split count diverges on exotic-edge documents). ``split``
    leaves at most one empty token per whitespace-touching end; subtract
    them. Pure JVM codegen — no interpreted lambda per element."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    raw = F.size(F.split(c, WS_REGEX))
    lead = c.rlike("^" + WS_CLASS).cast("int")
    trail = c.rlike(WS_CLASS + "$").cast("int")
    return (F.when(c.isNull(), F.lit(None).cast("int"))
            .when(F.length(c) == 0, F.lit(0))
            .otherwise(raw - lead - trail))


def ws_token_count_sql(expr: str) -> str:
    """DuckDB expression: same non-empty-token count as
    ``ws_token_count`` (NULL text → NULL, empty → 0)."""
    return (f"len(list_filter(string_split_regex({expr}, '{WS_REGEX}'), "
            f"x -> x <> ''))")
