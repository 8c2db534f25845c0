"""All-types table through the full wire → decode pipeline.

The Spark analogue of the reference's flagship E2E
(`/root/reference/tests/binlogStream/scripts/type_test.sql:1-67` — a
wide all-types `type_table` with extreme values: max uint64, >24h TIME,
UTF-8 column name `t_中文列`, binary literals, NULLs — replayed and
diffed against golden JSON). Here: encode one txn of INSERT (extremes) +
minimal-image UPDATE + DELETE into real binlog frames, decode through
the distributed pipeline, assert the canonical strings exactly.

Types not covered by the frame *encoder* (DATETIME2/TIME2/NEWDECIMAL/
ENUM/SET/BIT) are pinned at cell level by the golden corpus in
test_celldecode.py (ported from binlog_event_rbr_test.go).
"""

import struct

import pyarrow as pa
import pyarrow.parquet as pq

from binlog_spark import pipeline
from binlog_spark.wire import constants as C
from binlog_spark.wire import events as E

DB = "testdb"
TBL = "type_table"
TID = 7777

# (name, wire type, metadata, unsigned)
COLUMNS = [
    ("t_id", C.TYPE_LONG, 0, False),
    ("t_tiny_u", C.TYPE_TINY, 0, True),
    ("t_tiny_s", C.TYPE_TINY, 0, False),
    ("t_short", C.TYPE_SHORT, 0, False),
    ("t_int24", C.TYPE_INT24, 0, False),
    ("t_ulong", C.TYPE_LONG, 0, True),
    ("t_ubig", C.TYPE_LONGLONG, 0, True),   # max uint64 case
    ("t_big", C.TYPE_LONGLONG, 0, False),
    ("t_float", C.TYPE_FLOAT, 0, False),
    ("t_double", C.TYPE_DOUBLE, 0, False),
    ("t_year", C.TYPE_YEAR, 0, False),
    ("t_date", C.TYPE_DATE, 0, False),
    ("t_time", C.TYPE_TIME, 0, False),      # supports >24h and negative
    ("t_datetime", C.TYPE_DATETIME, 0, False),
    ("t_varchar", C.TYPE_VARCHAR, 255, False),
    ("t_中文列", C.TYPE_VARCHAR, 1024, False),  # UTF-8 column name
    ("t_blob", C.TYPE_BLOB, 2, False),
    ("t_dec", C.TYPE_NEWDECIMAL, (12 << 8) | 4, False),
    ("t_dt2", C.TYPE_DATETIME2, 3, False),
    ("t_time2", C.TYPE_TIME2, 2, False),
    ("t_ts2", C.TYPE_TIMESTAMP2, 0, False),
    ("t_enum", C.TYPE_ENUM, (C.TYPE_ENUM << 8) | 1, False),
    ("t_set", C.TYPE_STRING, (C.TYPE_SET << 8) | 2, False),
]

SPEC = E.TableMapSpec(database=DB, name=TBL,
                      columns=[(n, t, m, u) for n, t, m, u in COLUMNS],
                      key_cols=("t_id",))

REGISTRY = {(DB, TBL): [[(n, u) for n, t, m, u in COLUMNS]]}

ROW1 = {
    "t_id": "1",
    "t_tiny_u": "255",
    "t_tiny_s": "-128",
    "t_short": "-32768",
    "t_int24": "-8388608",
    "t_ulong": "4294967295",
    "t_ubig": "18446744073709551615",
    "t_big": "-9223372036854775808",
    "t_float": "1.5",
    "t_double": "-2.718281828459045",
    "t_year": "2026",
    "t_date": "2026-08-17",
    "t_time": "26:00:00",
    "t_datetime": "2026-08-17 12:34:56",
    "t_varchar": "hello world",
    "t_中文列": "código↦测试 🚀",
    "t_blob": "\x00\x01binary\xc3\xa9",
    "t_dec": "-12345678.9012",
    "t_dt2": "2026-08-17 23:59:59.999",
    "t_time2": "-838:59:58.97",
    "t_ts2": "86400",
    "t_enum": "3",
    "t_set": "513",
}
# TIMESTAMP2 is stored as epoch seconds but canonically rendered UTC
ROW1_EXPECT = dict(ROW1, t_ts2="1970-01-02 00:00:00")
ROW2 = {
    "t_id": "2",
    "t_tiny_u": "0",
    "t_tiny_s": "127",
    "t_short": "32767",
    "t_int24": "8388607",
    "t_ulong": "0",
    "t_ubig": "0",
    "t_big": "9223372036854775807",
    "t_float": "-0.25",
    "t_double": "3.14",
    "t_year": "0000",
    "t_date": "1970-01-01",
    "t_time": "-12:34:56",
    "t_datetime": "1000-01-01 00:00:00",
    # t_varchar omitted -> SQL NULL
    "t_中文列": "",
    "t_blob": "",
    "t_dec": "0.0001",
    "t_dt2": "1000-01-01 00:00:00.000",
    "t_time2": "00:00:00.01",
    "t_ts2": "0",
    "t_enum": "255",
    "t_set": "0",
}
# epoch 0 is MySQL's zero-timestamp sentinel (rbr.go:14-15,315-327)
ROW2_EXPECT_TS2 = "0000-00-00 00:00:00"


def _build_frames():
    fmt = E.BinlogFormat()
    frames = []
    pos = 4

    def emit(etype, payload, ts=1700000000):
        nonlocal pos
        frame = bytearray(E.packetize(fmt, etype, 0, payload, timestamp=ts,
                                      server_id=1, log_position=pos))
        next_pos = pos + len(frame)
        struct.pack_into("<I", frame, 13, next_pos & 0xFFFFFFFF)
        frames.append(("binlog.000000", pos, etype, bytes(frame)))
        pos = next_pos

    emit(C.E_FORMAT_DESCRIPTION, E.make_format_description(fmt))
    emit(C.E_GTID, E.make_gtid(1))
    emit(C.E_QUERY, E.make_query(DB, "BEGIN"))
    emit(C.E_TABLE_MAP, E.make_table_map(SPEC, TID))
    emit(C.E_WRITE_ROWS_V2,
         E.make_rows_event(SPEC, TID, C.E_WRITE_ROWS_V2,
                           [(None, ROW1), (None, ROW2)]))
    emit(C.E_TABLE_MAP, E.make_table_map(SPEC, TID))
    emit(C.E_UPDATE_ROWS_V2,
         E.make_rows_event(SPEC, TID, C.E_UPDATE_ROWS_V2,
                           [({"t_id": "1"},
                             {"t_id": "1", "t_varchar": "updated",
                              "t_time": "00:00:01"})]))
    emit(C.E_TABLE_MAP, E.make_table_map(SPEC, TID))
    emit(C.E_DELETE_ROWS_V2,
         E.make_rows_event(SPEC, TID, C.E_DELETE_ROWS_V2,
                           [({"t_id": "2"}, None)]))
    emit(C.E_XID, E.make_xid(1))
    return frames


def test_all_types_decode_exactly(spark, tmp_path):
    frames = _build_frames()
    table = pa.table({
        "file": pa.array([f[0] for f in frames], pa.string()),
        "pos": pa.array([f[1] for f in frames], pa.int64()),
        "etype": pa.array([f[2] for f in frames], pa.int32()),
        "frame": pa.array([f[3] for f in frames], pa.binary()),
    })
    d = tmp_path / "frames"
    d.mkdir()
    pq.write_table(table, str(d / "f.parquet"))

    changes = pipeline.decode_to_changes(
        spark, pipeline.read_frames(spark, str(d)), REGISTRY)
    got = sorted((r.asDict() for r in changes.collect()),
                 key=lambda r: r["seq_in_txn"])
    assert [g["op"] for g in got] == ["I", "I", "U", "D"]

    ins1, ins2, upd, dele = got
    # blob round-trips utf-8: encode_cell utf-8-encodes the str, the
    # canonical decode utf-8-decodes it back
    assert ins1["after"] == ROW1_EXPECT
    want2 = dict(ROW2, t_ts2=ROW2_EXPECT_TS2)
    want2["t_varchar"] = None  # SQL NULL survives as None in the map
    assert ins2["after"] == want2

    # minimal row image: only the changed columns present in the after map
    assert upd["before"] == {"t_id": "1"}
    assert upd["after"] == {"t_id": "1", "t_varchar": "updated",
                            "t_time": "00:00:01"}
    assert dele["after"] is None
    assert dele["before"] == {"t_id": "2"}

    # transaction bookkeeping: one txn, ordered seq, resume positions set
    assert {g["gtid_seq"] for g in got} == {1}
    assert [g["seq_in_txn"] for g in got] == [0, 1, 2, 3]
    assert all(g["next_pos"] > g["pos"] for g in got)
