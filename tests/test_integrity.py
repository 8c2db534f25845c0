"""CRC32 checksum audit (operators/integrity.py): generated streams are
fully valid (the generator writes real server-style CRC32s), single-byte
corruption anywhere — header, payload, or the checksum itself — is
detected, and the decode path's strip_checksum remains consistent with
the verified layout."""

import os
import sys
import zlib

import pytest
from pyspark.sql import functions as F  # noqa: F401

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlog_spark import genlog  # noqa: E402
from binlog_spark.operators.integrity import checksum_audit  # noqa: E402
from binlog_spark.wire import events as E  # noqa: E402


@pytest.fixture(scope="module")
def result():
    gen = genlog.CdcWorldGenerator(seed=7, n_repos=8, paths_per_repo=10,
                                   txns_per_file=30)
    return gen.generate(n_txns=60)


def test_generated_frames_all_valid(spark, result):
    df = spark.createDataFrame(
        [(f, p, et, fr) for f, p, et, fr in result.frames],
        "file string, pos long, etype int, frame binary")
    rows = {r["file"]: r for r in checksum_audit(df).collect()}
    assert rows and all(r["n_corrupt"] == 0 for r in rows.values()), rows
    assert sum(r["n_frames"] for r in rows.values()) == len(result.frames)


def test_corruption_detected_anywhere(spark, result):
    frames = [list(x) for x in result.frames[:50]]
    # flip one byte in the payload of #3, the header of #7, the CRC of #11
    for idx, off in [(3, 21), (7, 5), (11, -1)]:
        b = bytearray(frames[idx][3])
        b[off] ^= 0xFF
        frames[idx][3] = bytes(b)
    df = spark.createDataFrame(
        [tuple(x) for x in frames],
        "file string, pos long, etype int, frame binary")
    total = checksum_audit(df).agg(
        F.sum("n_corrupt").alias("c")).collect()[0]["c"]
    assert total == 3


def test_crc_helper_matches_zlib(result):
    _f, _p, _et, frame = result.frames[0]
    assert int.from_bytes(frame[-4:], "little") == zlib.crc32(frame[:-4])
    # re-applying is idempotent
    assert E.apply_crc32(frame) == frame
