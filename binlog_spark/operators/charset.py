"""Charset-aware text decoding over byte-transparent cells.

The decode pipeline keeps row cells byte-transparent: non-UTF8 bytes ride
latin-1-mapped strings (one char per byte — the engine's ``CellBytes``
parity with the reference's charset-oblivious model,
`/root/reference/replication/binlog_event_rbr.go` string handling). This
module is the opt-in layer on top: given the column's MySQL collation
(from ``desc``/information_schema — TABLE_MAP v1 does not carry per-
column charsets), re-interpret those bytes in the real charset and
produce proper Unicode strings.

Spark's built-in ``decode()`` only speaks the JVM charset shortlist, so
anything beyond latin1/utf8/utf16 goes through an Arrow-batched pandas
UDF (``Series.str.encode('latin-1').str.decode(codec)`` — two vectorized
passes, no per-row Python loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..wire.collations import codec_for_collation

# codecs Spark's JVM decode() handles natively — stay JVM-side for these
_JVM_CHARSETS = {"utf-8": "UTF-8", "ascii": "US-ASCII",
                 "utf-16-be": "UTF-16BE", "utf-16-le": "UTF-16LE"}


def charset_decode_column(col, collation: int):
    """Column expression decoding a byte-transparent string column under
    ``collation``. Returns the column unchanged for binary/unknown
    charsets (stay-bytes semantics)."""
    codec = codec_for_collation(collation)
    if codec is None:
        return col
    if codec in _JVM_CHARSETS:
        return F.decode(F.encode(col, "ISO-8859-1"), _JVM_CHARSETS[codec])

    @pandas_udf("string")
    def _recode(s):
        # substitution on both steps mirrors the JVM path's U+FFFD/?
        # behavior: one corrupt cell must not fail the job
        return s.str.encode("latin-1", errors="replace").str.decode(
            codec, errors="replace")

    return _recode(col)


def decode_text_columns(df: DataFrame,
                        collations: dict[str, int]) -> DataFrame:
    """Re-interpret the named byte-transparent columns per their MySQL
    collation ids (``{"name": 51}`` → cp1251 text)."""
    for name, cid in collations.items():
        df = df.withColumn(name, charset_decode_column(F.col(name), cid))
    return df
