"""Charset-aware text decoding over byte-transparent cells.

The decode pipeline keeps row cells byte-transparent: ``codec.to_text``
tries UTF-8 first and falls back to a latin-1 mapping (one char per
byte — the engine's ``CellBytes`` parity with the reference's
charset-oblivious model,
`/root/reference/replication/binlog_event_rbr.go` string handling).
This module is the opt-in layer on top: given the column's MySQL
collation (from ``desc``/information_schema — TABLE_MAP v1 does not
carry per-column charsets), recover the original wire bytes and
re-interpret them in the real charset.

Byte recovery inverts ``to_text`` exactly (r3 ADVICE — the previous
``encode('latin-1', 'replace')`` mangled any cell whose non-UTF-8 bytes
happened to form valid UTF-8, e.g. cp1251 Cyrillic pairs, into ``?``):

* a string with code points above U+00FF can only have come from the
  UTF-8 arm → ``encode('utf-8')`` reproduces the wire bytes exactly
  (this is precisely the cp1251-pair case: 0xD0 0xB0 decoded as U+0430);
* a string whose latin-1 encoding is itself valid non-ASCII UTF-8 can
  NOT have come from the latin-1 arm (``to_text`` would have taken the
  UTF-8 branch and produced different text) → UTF-8 arm again;
* otherwise the latin-1 encoding is the wire image.

One documented residual ambiguity: UTF-8 text consisting SOLELY of
U+0080–U+00FF code points (e.g. ``é`` stored as 0xC3 0xA9) is
indistinguishable from latin-1-mapped bytes 0xE9 after decode, and is
attributed to the latin-1 arm — the correct attribution for a known
non-UTF-8 column, which is this module's use case. Columns that need
exact recovery of such text should be decoded charset-aware at the
source instead of re-interpreted post-hoc — supported since r5: a
schema provider returning ``(name, unsigned, collation_id)`` entries
(e.g. ``DescTableMapper`` via SHOW FULL COLUMNS) routes known
non-UTF-8 text columns through ``collations.source_codec`` inside both
decode kernels (``wire/codec.make_cell_str_decoder`` codec arm,
``colsplit`` var-step codec), eliminating the ambiguity entirely
(tests/test_charset_decode.py::test_charset_at_source_both_kernels_cp1251).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..wire.collations import codec_for_collation


def recover_wire_bytes(s: str) -> bytes:
    """Right-inverse of ``codec.to_text`` (see module docstring)."""
    try:
        b = s.encode("latin-1")
    except UnicodeEncodeError:
        return s.encode("utf-8")  # >U+FF: only the UTF-8 arm reaches here
    if any(c >= 0x80 for c in b):
        try:
            b.decode("utf-8")
        except UnicodeDecodeError:
            return b  # invalid UTF-8: the latin-1 arm's signature
        return s.encode("utf-8")  # latin-1 arm impossible for valid UTF-8
    return b  # pure ASCII: both arms agree


def charset_decode_column(col, collation: int):
    """Column expression decoding a byte-transparent string column under
    ``collation``. Returns the column unchanged for binary/unknown
    charsets (stay-bytes semantics) and for UTF-8 collations (the decode
    path already produced UTF-8 text; bytes that were NOT valid UTF-8
    stay latin-1-mapped rather than turning into U+FFFD — lossless)."""
    codec = codec_for_collation(collation)
    if codec is None or codec in ("utf-8", "ascii"):
        return col

    @pandas_udf("string")
    def _recode(s):
        # exact byte recovery, then the target charset with substitution
        # on decode only: one corrupt cell must not fail the job
        return s.map(lambda v: None if v is None else
                     recover_wire_bytes(v).decode(codec, errors="replace"))

    return _recode(col)


def decode_text_columns(df: DataFrame,
                        collations: dict[str, int]) -> DataFrame:
    """Re-interpret the named byte-transparent columns per their MySQL
    collation ids (``{"name": 51}`` → cp1251 text)."""
    for name, cid in collations.items():
        df = df.withColumn(name, charset_decode_column(F.col(name), cid))
    return df
