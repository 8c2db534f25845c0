"""Charset-aware text layer over byte-transparent cells."""

from pyspark.sql import functions as F

from binlog_spark.operators.charset import (charset_decode_column,
                                            decode_text_columns)


def _one(spark, raw_bytes: bytes, collation: int):
    cell = raw_bytes.decode("latin-1")  # byte-transparent engine cell
    df = spark.createDataFrame([(cell,)], "c string")
    out = df.select(charset_decode_column(F.col("c"), collation).alias("c"))
    return out.collect()[0].c


def test_cp1251_and_gbk_pandas_path(spark):
    assert _one(spark, "данные".encode("cp1251"), 51) == "данные"
    assert _one(spark, "数据".encode("gbk"), 28) == "数据"


def test_latin1_stays_cp1252(spark):
    # MySQL latin1 is cp1252: 0x80 is the euro sign, not a C1 control
    assert _one(spark, b"caf\xe9 \x80", 8) == "café €"


def test_utf8_collation_is_identity(spark):
    # the decode path (codec.to_text) already tried UTF-8 first, so a
    # UTF-8 collation cell IS proper text — identity, no Python stage.
    # (The r3 JVM round-trip encode('ISO-8859-1') mangled any real
    # UTF-8 text with >U+FF code points into '?'.)
    df = spark.createDataFrame([("héllo",), ("привет",)], "c string")
    out = df.select(charset_decode_column(F.col("c"), 45).alias("c"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert [r.c for r in out.collect()] == ["héllo", "привет"]


def test_cp1251_bytes_that_form_valid_utf8_recover_exactly(spark):
    # r3 ADVICE regression: cp1251 Cyrillic pairs are VALID UTF-8, so the
    # engine's to_text decoded them as UTF-8 (>U+FF chars); recovery must
    # re-encode via UTF-8 — the old encode('latin-1','replace') gave '?'
    raw = "да".encode("cp1251")          # 0xE4 0xE0 — invalid UTF-8
    assert _one(spark, raw, 51) == "да"
    utf8ish = b"\xd0\xb0\xd0\xb1"        # valid UTF-8 "аб"; to_text arm
    cell = utf8ish.decode("utf-8")       # what to_text actually yields
    df = spark.createDataFrame([(cell,)], "c string")
    out = df.select(charset_decode_column(F.col("c"), 51).alias("c"))
    # cp1251 re-interpretation of the recovered wire bytes 0xD0B0D0B1
    assert out.collect()[0].c == utf8ish.decode("cp1251")


def test_binary_collation_is_identity(spark):
    blob = bytes(range(256)).decode("latin-1")
    df = spark.createDataFrame([(blob,)], "c string")
    out = decode_text_columns(df, {"c": 63})  # binary: stay bytes
    assert out.collect()[0].c == blob


def test_corrupt_cell_substitutes_not_fails(spark):
    # a lone GBK lead byte must not kill the job — substitution, like
    # the JVM decode() path
    assert "�" in _one(spark, b"\x81", 28)
    # unknown collation id (MySQL 8.0 family): identity, stay-bytes
    blob = "data\xe9"
    df = spark.createDataFrame([(blob,)], "c string")
    assert decode_text_columns(df, {"c": 255}).collect()[0].c == blob


def test_multi_column_map(spark):
    df = spark.createDataFrame(
        [("данные".encode("cp1251").decode("latin-1"),
          "ascii ok")], "a string, b string")
    out = decode_text_columns(df, {"a": 51, "b": 11})
    row = out.collect()[0]
    assert (row.a, row.b) == ("данные", "ascii ok")
