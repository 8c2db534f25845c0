"""Columnar cell splitter vs the scalar reference kernel: row-for-row
equality on worlds exercising schema evolution, NULL diversion, minimal
row images, non-UTF8 bytes, and exotic-type fallback."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlog_spark import genlog  # noqa: E402
from binlog_spark.operators import colsplit as CS  # noqa: E402
from binlog_spark.operators import decode as D  # noqa: E402
from binlog_spark.wire import constants as C  # noqa: E402
from binlog_spark.wire import events as E  # noqa: E402


def make_meta(frames):
    fmt = E.BinlogFormat()
    index, checksum = {}, None
    for f, p, et, fr in frames:
        if et == C.E_FORMAT_DESCRIPTION:
            checksum = E.parse_format_description(fr).checksum_algorithm
            fmt.checksum_algorithm = checksum
        elif et == C.E_TABLE_MAP:
            tm = E.parse_table_map(fmt, E.strip_checksum(fmt, et, fr))
            key = (f, tm.table_id)
            sig = (tm.database, tm.name, tuple(tm.types), tuple(tm.metadata))
            lst = index.setdefault(key, [])
            if not any(s == sig for _, s in lst):
                lst.append((p, sig))
    return {
        "checksum_alg": checksum,
        "table_maps": {
            k: [(p, (s[0], s[1], list(s[2]), list(s[3]))) for p, s in v]
            for k, v in index.items()
        },
    }


def to_batch(frames):
    return pa.RecordBatch.from_arrays(
        [
            pa.array([f for f, _, _, _ in frames]),
            pa.array([p for _, p, _, _ in frames], pa.int64()),
            pa.array([et for _, _, et, _ in frames], pa.int32()),
            pa.array([fr for _, _, _, fr in frames], pa.binary()),
        ],
        names=["file", "pos", "etype", "frame"],
    )


def norm(df):
    rows = []
    for r in df.itertuples(index=False):
        t = list(r)
        for j in (10, 11):  # before/after maps: dict or list-of-pairs
            if isinstance(t[j], dict):
                t[j] = tuple(sorted(t[j].items()))
            elif isinstance(t[j], list):
                t[j] = tuple(sorted(t[j]))
        t = [None if (isinstance(x, float) and np.isnan(x)) else x for x in t]
        rows.append(tuple(t))
    return sorted(rows, key=str)


def cross_check(frames, registry):
    meta = make_meta(frames)
    pdf = pd.DataFrame(
        {
            "file": [f for f, _, _, _ in frames],
            "pos": [p for _, p, _, _ in frames],
            "etype": [et for _, _, et, _ in frames],
            "frame": [fr for _, _, _, fr in frames],
        }
    )
    ref = D.decode_batch(pdf, D.build_decode_context(meta, registry))
    outs = list(
        CS.decode_batch_arrow(to_batch(frames),
                              D.build_decode_context(meta, registry)))
    if outs:
        got = pd.concat([rb.to_pandas() for rb in outs], ignore_index=True)
    else:
        got = pd.DataFrame(columns=ref.columns)
    assert len(ref) == len(got)
    assert norm(ref) == norm(got)
    return ref, got


def test_flagship_world_with_evolution_matches_scalar_kernel():
    gen = genlog.CdcWorldGenerator(seed=7, n_repos=30, paths_per_repo=10,
                                   txns_per_file=80, evolve_at_txn=150)
    res = gen.generate(n_txns=400)
    ref, got = cross_check(res.frames, genlog.table_registry())
    assert (ref["kind"] == "change").sum() == len(res.changes)


def test_small_batches_match_scalar_kernel():
    """Group/plan caches persist across batches; per-batch state resets."""
    gen = genlog.CdcWorldGenerator(seed=3, n_repos=10, paths_per_repo=5,
                                   txns_per_file=40)
    res = gen.generate(n_txns=120)
    meta = make_meta(res.frames)
    ctx = D.build_decode_context(meta, genlog.table_registry())
    outs = []
    for lo in range(0, len(res.frames), 97):  # uneven batch boundaries
        outs.extend(CS.decode_batch_arrow(
            to_batch(res.frames[lo:lo + 97]), ctx))
    got = pd.concat([rb.to_pandas() for rb in outs], ignore_index=True)
    pdf = pd.DataFrame(
        {
            "file": [f for f, _, _, _ in res.frames],
            "pos": [p for _, p, _, _ in res.frames],
            "etype": [et for _, _, et, _ in res.frames],
            "frame": [fr for _, _, _, fr in res.frames],
        }
    )
    ref = D.decode_batch(pdf,
                         D.build_decode_context(meta, genlog.table_registry()))
    assert norm(ref) == norm(got)


def _custom_world(columns, rows_events, table="t1", db="d1",
                  checksum_alg=C.CHECKSUM_ALG_CRC32):
    """Hand-built frame stream: FORMAT_DESCRIPTION + per-event
    TABLE_MAP/GTID/ROWS for a custom schema."""
    fmt = E.BinlogFormat(checksum_algorithm=checksum_alg)
    spec = E.TableMapSpec(database=db, name=table, columns=columns)
    frames = []
    pos = 4

    def emit(etype, payload, ts=1700000000):
        nonlocal pos
        frame = E.packetize(fmt, etype, 0, payload, timestamp=ts,
                            server_id=1, log_position=0)
        import struct

        frame = bytearray(frame)
        struct.pack_into("<I", frame, 13, (pos + len(frame)) & 0xFFFFFFFF)
        frames.append(("binlog.000000", pos, etype, bytes(frame)))
        pos += len(frame)

    emit(C.E_FORMAT_DESCRIPTION, E.make_format_description(fmt))
    g = 0
    for etype, rows in rows_events:
        g += 1
        emit(C.E_GTID, E.make_gtid(g))
        emit(C.E_QUERY, E.make_query(db, "BEGIN"))
        emit(C.E_TABLE_MAP, E.make_table_map(spec, 77))
        emit(etype, E.make_rows_event(spec, 77, etype, rows))
        emit(C.E_XID, E.make_xid(g))
    registry = {(db, table): [[(n, u) for n, _, _, u in columns]]}
    return frames, registry


def test_null_rows_divert_to_scalar_kernel_exactly():
    cols = [("id", C.TYPE_LONG, 0, False),
            ("name", C.TYPE_VARCHAR, 80, False),
            ("num", C.TYPE_LONGLONG, 0, True)]
    rows = [(None, {"id": "1", "name": "alice", "num": "42"}),
            (None, {"id": "2", "name": None, "num": "7"}),   # SQL NULL
            (None, {"id": "3", "name": "carol", "num": str(2**63 + 9)}),
            (None, {"id": "4", "name": None, "num": None}),
            (None, {"id": "5", "name": "eve", "num": "0"})]
    frames, registry = _custom_world(
        cols, [(C.E_WRITE_ROWS_V2, rows)])
    ref, got = cross_check(frames, registry)
    ch = ref[ref["kind"] == "change"]
    assert len(ch) == 5
    # NULL cells survive with None values in the map
    maps = {dict(m if not isinstance(m, dict) else m)["id"]:
            dict(m if not isinstance(m, dict) else m)
            for m in ch["after"]}
    assert maps["2"]["name"] is None
    assert maps["3"]["num"] == str(2**63 + 9)  # unsigned 64-bit range


def test_minimal_update_and_delete_images_match():
    cols = [("id", C.TYPE_LONG, 0, False),
            ("body", C.TYPE_BLOB, 2, False)]
    events = [
        (C.E_WRITE_ROWS_V2, [(None, {"id": "1", "body": "x" * 300})]),
        (C.E_UPDATE_ROWS_V2, [({"id": "1"}, {"body": "y" * 5})]),
        (C.E_DELETE_ROWS_V2, [({"id": "1"}, None)]),
    ]
    frames, registry = _custom_world(cols, events)
    ref, got = cross_check(frames, registry)
    ops = ref[ref["kind"] == "change"]["op"].tolist()
    assert ops == ["I", "U", "D"]


def test_non_utf8_blob_falls_back_to_latin1_losslessly():
    cols = [("id", C.TYPE_LONG, 0, False),
            ("raw", C.TYPE_BLOB, 2, False)]
    bad = b"ok\xff\xfe\x00bytes".decode("latin-1")
    frames, registry = _custom_world(
        cols, [(C.E_WRITE_ROWS_V2,
                [(None, {"id": "1", "raw": bad}),
                 (None, {"id": "2", "raw": "plain"})])])
    ref, got = cross_check(frames, registry)
    ch = ref[ref["kind"] == "change"]
    vals = {dict(m)["id"]: dict(m)["raw"] for m in ch["after"]}
    assert vals["1"] == bad  # byte-transparent round trip
    assert vals["2"] == "plain"


def test_exotic_types_fall_back_to_scalar_kernel():
    cols = [("id", C.TYPE_LONG, 0, False),
            ("price", C.TYPE_NEWDECIMAL, (12 << 8) | 4, False),
            ("seen", C.TYPE_DATETIME2, 0, False)]
    frames, registry = _custom_world(
        cols, [(C.E_WRITE_ROWS_V2,
                [(None, {"id": "1", "price": "-1234.5678",
                         "seen": "2024-02-29 23:59:59"})])])
    meta = make_meta(frames)
    ctx = D.build_decode_context(meta, registry)
    assert CS.make_image_plan(
        [c[1] for c in cols], [c[2] for c in cols],
        [c[3] for c in cols], [c[0] for c in cols], 0b111) is None
    ref, got = cross_check(frames, registry)
    ch = ref[ref["kind"] == "change"]
    assert dict(ch["after"].iloc[0])["price"] == "-1234.5678"


def test_inline_discovery_checksumless_stream_sizes_bodies_right():
    """r3 ADVICE regression: the per-batch checksum width must follow the
    FORMAT_DESCRIPTION overlay, not the batch-entry value. A checksum-less
    stream decoded under INLINE_DISCOVERY (whose meta hardcodes
    checksum_alg=1 until the FD frame corrects it) used to mis-size every
    ROWS body by 4 bytes — silently dropping a tiny final row or
    wave-decoding garbage from the missing-CRC slot."""
    cols = [("id", C.TYPE_LONG, 0, False)]  # 5-byte row images (nb=1 + 4)
    rows = [(None, {"id": str(v)}) for v in (11, 22, 33)]
    frames, registry = _custom_world(
        cols, [(C.E_WRITE_ROWS_V2, rows)], checksum_alg=0)
    # INLINE_DISCOVERY contract: empty table_maps + assumed CRC32 until
    # the stream's own FORMAT_DESCRIPTION says otherwise
    ctx = D.build_decode_context(
        {"checksum_alg": C.CHECKSUM_ALG_CRC32, "table_maps": {}}, registry)
    outs = list(CS.decode_batch_arrow(to_batch(frames), ctx))
    got = pd.concat([rb.to_pandas() for rb in outs], ignore_index=True)
    ch = got[got["kind"] == "change"]
    assert sorted(dict(m)["id"] for m in ch["after"]) == ["11", "22", "33"]
    assert sorted(ch["seq_in_event"].tolist()) == [0, 1, 2]
    # and the full stream matches the scalar kernel run with correct meta
    pdf = pd.DataFrame(
        {"file": [f for f, _, _, _ in frames],
         "pos": [p for _, p, _, _ in frames],
         "etype": [et for _, _, et, _ in frames],
         "frame": [fr for _, _, _, fr in frames]})
    ref = D.decode_batch(pdf, D.build_decode_context(make_meta(frames),
                                                     registry))
    assert norm(ref) == norm(got)


def test_wave_overrun_diverts_group_to_scalar_kernel():
    """Pin the wave-kernel bounds check (r4 VERDICT directive 6): a
    corrupt interior length byte that drives the wave cursor past the
    rows-event body must divert the WHOLE plan group to the scalar
    kernel (exactness contract: byte-identical output to a pure scalar
    run) instead of emitting invented rows from out-of-range offsets —
    and the intact frames of the same group must still decode fully."""
    cols = [("id", C.TYPE_LONG, 0, False),
            ("name", C.TYPE_VARCHAR, 80, False)]
    good = [(None, {"id": "1", "name": "aaa"}),
            (None, {"id": "2", "name": "bbb"})]
    bad = [(None, {"id": "3", "name": "zz9"})]
    frames, registry = _custom_world(
        cols, [(C.E_WRITE_ROWS_V2, good), (C.E_WRITE_ROWS_V2, bad)])
    # inflate the last row's VARCHAR length prefix (the byte before the
    # unique payload) far past the remaining body
    patched = []
    for f, p, et, fr in frames:
        if et == C.E_WRITE_ROWS_V2 and b"zz9" in fr:
            buf = bytearray(fr)
            buf[fr.index(b"zz9") - 1] = 250
            fr = bytes(buf)
        patched.append((f, p, et, fr))
    meta = make_meta(patched)
    ctx = D.build_decode_context(meta, registry)
    outs = list(CS.decode_batch_arrow(to_batch(patched), ctx))
    got = pd.concat([rb.to_pandas() for rb in outs], ignore_index=True)
    # exactness: identical to the scalar kernel on the same stream
    pdf = pd.DataFrame(
        {"file": [f for f, _, _, _ in patched],
         "pos": [p for _, p, _, _ in patched],
         "etype": [et for _, _, et, _ in patched],
         "frame": [fr for _, _, _, fr in patched]})
    ref = D.decode_batch(pdf, D.build_decode_context(meta, registry))
    assert norm(ref) == norm(got)
    # the intact event's rows survive untruncated...
    ch = got[got["kind"] == "change"]
    names = sorted(dict(m).get("name") for m in ch["after"]
                   if dict(m).get("id") in ("1", "2"))
    assert names == ["aaa", "bbb"]
    # ...and nothing invented: no change row carries bytes the corrupt
    # frame does not actually hold (a 250-byte string cannot exist)
    for m in ch["after"]:
        name = dict(m).get("name")
        assert name is None or len(name) <= 80


def test_wide_table_int_matrix():
    """>8 present columns exercises the multi-byte null bitmap path."""
    cols = [(f"c{i}", C.TYPE_LONG, 0, False) for i in range(12)]
    row1 = {f"c{i}": str(i * 1000 - 5) for i in range(12)}
    row2 = {f"c{i}": (None if i % 3 == 0 else str(-i)) for i in range(12)}
    frames, registry = _custom_world(
        cols, [(C.E_WRITE_ROWS_V2, [(None, row1), (None, row2)])])
    ref, got = cross_check(frames, registry)
    assert (ref["kind"] == "change").sum() == 2


@pytest.mark.parametrize("engine", ["arrow", "pandas"])
def test_decode_frames_engines_agree_in_spark(spark, engine):
    gen = genlog.CdcWorldGenerator(seed=5, n_repos=10, paths_per_repo=6,
                                   txns_per_file=50)
    res = gen.generate(n_txns=150)
    from binlog_spark.schema import FRAME_SCHEMA

    df = spark.createDataFrame(res.frames, FRAME_SCHEMA).repartition(4)
    meta = make_meta(res.frames)
    out = D.decode_frames(spark, df, meta, genlog.table_registry(),
                          engine=engine)
    ch = out.where(out.kind == "change")
    assert ch.count() == len(res.changes)
    got = {(r["file"], r["pos"], r["seq_in_event"]):
           (r["op"], dict(r["after"] or {}))
           for r in ch.collect()}
    want = {}
    seqs = {}
    for c in res.changes:
        k = (c["file"], c["pos"])
        s = seqs.get(k, 0)
        seqs[k] = s + 1
        want[(c["file"], c["pos"], s)] = (c["op"], dict(c["after"] or {}))
    assert got == want
