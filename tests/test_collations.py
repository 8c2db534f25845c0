"""Collation registry + connection charset behavior.

Mirrors the reference's collation table and DSN semantics
(`/root/reference/dump/collations.go`, `dump/packets.go:300-308` unknown-
collation error, `dump/connection.go:119-135` SET NAMES fallbacks) — the
id↔name data itself is public MySQL ``information_schema.COLLATIONS``
metadata.
"""

import pytest

from binlog_spark.wire import collations as CL


def test_registry_shape_and_known_ids():
    # 97 irregular low ids + 2 mysql500 legacy + 5 families x 24 suffixes
    # = 219, the reference table's exact entry count (dump/collations.go)
    assert len(CL.ID_TO_COLLATION) == 99 + 5 * 24
    assert CL.ID_TO_COLLATION[33] == "utf8_general_ci"
    assert CL.ID_TO_COLLATION[63] == "binary"
    assert CL.ID_TO_COLLATION[8] == "latin1_swedish_ci"
    assert CL.ID_TO_COLLATION[224] == "utf8mb4_unicode_ci"
    assert CL.ID_TO_COLLATION[247] == "utf8mb4_vietnamese_ci"
    assert CL.ID_TO_COLLATION[159] == "ucs2_general_mysql500_ci"
    # names are unique, so the inverse map is lossless
    assert len(CL.COLLATION_TO_ID) == len(CL.ID_TO_COLLATION)
    assert CL.collation_id("utf8mb4_general_ci") == 45
    # every id fits the 1-byte handshake field
    assert all(0 < cid < 256 for cid in CL.ID_TO_COLLATION)


def test_unknown_collation_raises():
    with pytest.raises(ValueError, match="unknown collation"):
        CL.collation_id("klingon_general_ci")


def test_charset_prefix_and_codecs():
    assert CL.charset_of("latin1_german2_ci") == "latin1"
    assert CL.charset_of("utf8mb4_bin") == "utf8mb4"  # not 'utf8'
    assert CL.charset_of("binary") == "binary"
    assert CL.codec_for_collation(8) == "cp1252"  # MySQL latin1 quirk
    assert CL.codec_for_collation(63) is None  # binary stays bytes
    assert CL.codec_for_collation(45) == "utf-8"
    # every collation's charset resolves to a (possibly None) codec entry
    for name in CL.COLLATION_TO_ID:
        assert CL.charset_of(name) in CL.CHARSET_CODECS
    # declared codecs actually exist in the Python codec registry
    import codecs

    for codec in CL.CHARSET_CODECS.values():
        if codec is not None:
            codecs.lookup(codec)


def test_unknown_id_stays_bytes():
    # MySQL 8.0-era collations (utf8mb4_0900_* family, ids 255+) are
    # outside the byte-sized registry: stay-bytes, never KeyError
    assert CL.codec_for_collation(255) is None
    assert CL.codec_for_collation(0) is None


def test_round_trip_decode_examples():
    assert "käse".encode("cp1252").decode(CL.codec_for_collation(8)) == "käse"
    assert "данные".encode("cp1251").decode(
        CL.codec_for_collation(51)) == "данные"
