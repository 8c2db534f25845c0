"""End-to-end decode + transaction assembly + merge-apply parity.

The Spark analogue of the reference's pipeline test
(`/root/reference/row_streamer_test.go:243-371`): replay synthetic frames
through the full job and assert the decoded change rows and the final lake
state exactly (content sha256 parity per BASELINE.json input_hint).
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from binlog_spark import genlog, pipeline
from binlog_spark.operators.lww import fold_changes, lww_latest
from binlog_spark.operators.merge import LakeTable
from binlog_spark.operators.transactions import transaction_summaries


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    gen = genlog.CdcWorldGenerator(seed=7, n_repos=20, paths_per_repo=25,
                                   txns_per_file=40)
    result = gen.generate(n_txns=120)
    frames_dir = str(tmp_path_factory.mktemp("frames"))
    genlog.write_frames_parquet(result, frames_dir)
    return result, frames_dir


def _norm_change(c):
    return (
        c["gtid_seq"], c["seq_in_txn"], c["file"], c["pos"], c["op"],
        c["db"], c["tbl"],
        tuple(sorted((c["before"] or {}).items())),
        tuple(sorted((c["after"] or {}).items())),
    )


def test_decode_matches_generator_changes(spark, world):
    result, frames_dir = world
    frames = pipeline.read_frames(spark, frames_dir)
    changes = pipeline.decode_to_changes(spark, frames, genlog.table_registry())
    got = [_norm_change(r.asDict()) for r in changes.collect()]
    want = [_norm_change(c) for c in result.changes]
    assert sorted(got) == sorted(want)
    assert len(got) == len(want)


def test_merge_apply_final_state_sha_parity(spark, world, tmp_path):
    result, frames_dir = world
    lake = LakeTable.create(spark, str(tmp_path / "lake"),
                            columns=genlog.table_spec().col_names,
                            key_cols=list(genlog.KEY_COLS), n_buckets=8)
    frames = pipeline.read_frames(spark, frames_dir)
    stats = pipeline.replay_batch(spark, frames, lake,
                                  genlog.table_registry(), batch_id=0)
    assert stats["n_changes"] == len(result.changes)

    got = {(r["repo"], r["path"]):
           hashlib.sha256(r["content"].encode()).hexdigest()
           for r in lake.to_df().collect()}
    want = {(repo, path): hashlib.sha256(row["content"].encode()).hexdigest()
            for (repo, path), row in result.final_state.items()}
    assert got == want

    # full column equality, not just sha
    got_rows = {(r["repo"], r["path"]): r.asDict()
                for r in lake.to_df().collect()}
    for key, row in result.final_state.items():
        g = got_rows[key]
        for col in ("commit", "lang", "content"):
            assert g[col] == row[col], (key, col)


def test_merge_apply_is_idempotent(spark, world, tmp_path):
    result, frames_dir = world
    lake = LakeTable.create(spark, str(tmp_path / "lake2"),
                            columns=genlog.table_spec().col_names,
                            key_cols=list(genlog.KEY_COLS), n_buckets=4)
    frames = pipeline.read_frames(spark, frames_dir)
    pipeline.replay_batch(spark, frames, lake, genlog.table_registry(),
                          batch_id=0)
    v1 = lake.meta["version"]
    state1 = sorted(tuple(r) for r in lake.to_df().collect())

    # same batch id -> exactly-once no-op
    stats = pipeline.replay_batch(spark, frames, lake,
                                  genlog.table_registry(), batch_id=0)
    assert stats["skipped"]
    # different batch id, same data -> row-level gtid guard keeps state fixed
    pipeline.replay_batch(spark, frames, lake, genlog.table_registry(),
                          batch_id=1)
    state2 = sorted(tuple(r) for r in lake.to_df().collect())
    assert state1 == state2


def test_chunked_fold_equals_plain_fold(spark, world):
    result, frames_dir = world
    frames = pipeline.read_frames(spark, frames_dir)
    changes = pipeline.decode_to_changes(spark, frames, genlog.table_registry())
    plain = {tuple(r[k] for k in ("_k_repo", "_k_path")):
             (r["del"], r["full"], dict(r["m"]), r["g"], r["s"])
             for r in fold_changes(changes).collect()}
    chunked = {tuple(r[k] for k in ("_k_repo", "_k_path")):
               (r["del"], r["full"], dict(r["m"]), r["g"], r["s"])
               for r in fold_changes(changes, chunk_size=16).collect()}
    assert plain == chunked


def test_segment_broadcast_join_equals_literal_and_bounds_plan(spark, world):
    """VERDICT r3 #6: thousand-file batches must not inflate the plan with
    a per-file map literal — above SEGMENT_LITERAL_MAX the segment map
    rides a broadcast join; both forms fold identically, and unmapped
    files get per-file segments instead of one collapsed NULL partition
    (r3 ADVICE)."""
    from binlog_spark.operators.decode import (decode_frames,
                                               discover_stream_meta)
    from binlog_spark.operators.lww import fold_changes_prefold
    from binlog_spark.operators.transactions import assemble_transactions
    from binlog_spark import plans

    result, frames_dir = world
    frames = pipeline.read_frames(spark, frames_dir)
    meta = discover_stream_meta(frames)
    decoded = decode_frames(spark, frames, meta, genlog.table_registry())

    def norm(df):
        return {tuple(r[k] for k in ("_k_repo", "_k_path")):
                (r["del"], r["full"], dict(r["m"]), r["g"], r["s"],
                 r["n_events"])
                for r in df.collect()}

    lit_fold = fold_changes_prefold(assemble_transactions(
        decoded, segment=pipeline.segment_expr(spark, meta)))
    joined = pipeline.attach_segments(spark, decoded, meta)
    join_fold = fold_changes_prefold(assemble_transactions(
        joined, segment=F.col("_seg")))
    assert plans.has_broadcast_join(joined)
    assert norm(join_fold) == norm(lit_fold)

    # a huge file index routes OFF the literal (no >1k-entry create_map)
    big_meta = {"checksum_alg": meta["checksum_alg"],
                "table_maps": {(f"binlog.{i:06d}", 1): []
                               for i in range(pipeline.SEGMENT_LITERAL_MAX
                                              + 1)}}
    assert pipeline.segment_expr(spark, big_meta) is None

    # unmapped files get their own segment, never a shared NULL
    seg = pipeline.segment_expr(spark, meta)
    probe = spark.createDataFrame(
        [("binlog.999998",), ("binlog.999999",)], "file string")
    vals = [r[0] for r in probe.select(seg.alias("s")).collect()]
    assert vals == ["f:binlog.999998", "f:binlog.999999"]


def test_prefold_equals_shuffle_fold(spark, world):
    """Map-side pre-fold over segment windows == the key-shuffle fold,
    key for key and field for field (incl. tiny flush caps that force a
    key's run to split into several chunk-ordered partials)."""
    from binlog_spark.operators.decode import (decode_frames,
                                               discover_stream_meta)
    from binlog_spark.operators.lww import (combine_partials,
                                            fold_changes_prefold,
                                            prefold_partials)
    from binlog_spark.operators.transactions import assemble_transactions

    result, frames_dir = world
    frames = pipeline.read_frames(spark, frames_dir)
    meta = discover_stream_meta(frames)
    decoded = decode_frames(spark, frames, meta, genlog.table_registry())
    seg = pipeline.segment_expr(spark, meta)
    ch_seg = assemble_transactions(decoded, segment=seg)
    ch_plain = assemble_transactions(decoded)

    def norm(df):
        return {tuple(r[k] for k in ("_k_repo", "_k_path")):
                (r["del"], r["full"], dict(r["m"]), r["g"], r["s"],
                 r["n_events"])
                for r in df.collect()}

    want = norm(fold_changes(ch_plain))
    assert norm(fold_changes_prefold(ch_seg)) == want
    # a 1-entry state cap flushes on every new key: many partials per
    # key, still exact after the ordered combine
    tiny = combine_partials(prefold_partials(ch_seg, flush_cap=1))
    assert norm(tiny) == want


def test_replay_batch_prefold_engine_state_parity(spark, world, tmp_path):
    result, frames_dir = world
    lake = LakeTable.create(spark, str(tmp_path / "lake_pf"),
                            columns=genlog.table_spec().col_names,
                            key_cols=list(genlog.KEY_COLS), n_buckets=8)
    frames = pipeline.read_frames(spark, frames_dir)
    stats = pipeline.replay_batch(spark, frames, lake,
                                  genlog.table_registry(), batch_id=0,
                                  fold_engine="prefold")
    assert stats["n_changes"] == len(result.changes)
    got = {(r["repo"], r["path"]):
           hashlib.sha256(r["content"].encode()).hexdigest()
           for r in lake.to_df().collect()}
    want = {(repo, path): hashlib.sha256(row["content"].encode()).hexdigest()
            for (repo, path), row in result.final_state.items()}
    assert got == want


def test_prefold_hot_key_world_and_volume_cut(spark, tmp_path):
    """The regime prefold exists for: few hot keys, many events per key
    per segment — partials shrink by ~events-per-key; result identical."""
    from binlog_spark.operators.decode import (decode_frames,
                                               discover_stream_meta)
    from binlog_spark.operators.lww import (fold_changes_prefold,
                                            prefold_partials)
    from binlog_spark.operators.transactions import assemble_transactions

    gen = genlog.CdcWorldGenerator(seed=13, n_repos=4, paths_per_repo=2,
                                   hot_repos=2, txns_per_file=500)
    result = gen.generate(n_txns=1000)
    frames_dir = str(tmp_path / "hotframes")
    genlog.write_frames_parquet(result, frames_dir)
    frames = pipeline.read_frames(spark, frames_dir)
    meta = discover_stream_meta(frames)
    decoded = decode_frames(spark, frames, meta, genlog.table_registry())
    ch_seg = assemble_transactions(
        decoded, segment=pipeline.segment_expr(spark, meta))
    n_changes = len(result.changes)
    n_partials = prefold_partials(ch_seg).count()
    assert n_partials < n_changes / 5  # the map-side cut is real
    ch_plain = assemble_transactions(decoded)

    def norm(df):
        return {tuple(r[k] for k in ("_k_repo", "_k_path")):
                (r["del"], r["full"], dict(r["m"]), r["g"], r["s"],
                 r["n_events"])
                for r in df.collect()}

    assert norm(fold_changes_prefold(ch_seg)) == norm(fold_changes(ch_plain))


def test_inline_discovery_replay_parity(spark, tmp_path):
    """INLINE_DISCOVERY skips the discovery job; the decode overlay
    resolves TABLE_MAPs from its own partitions — including a mid-stream
    ALTER — and the final state matches the discovered-meta replay."""
    gen = genlog.CdcWorldGenerator(seed=17, n_repos=12, paths_per_repo=8,
                                   txns_per_file=30, evolve_at_txn=45)
    result = gen.generate(n_txns=120)
    frames_dir = str(tmp_path / "frames")
    genlog.write_frames_parquet(result, frames_dir)
    frames = pipeline.read_frames(spark, frames_dir)
    lake = LakeTable.create(spark, str(tmp_path / "lake_inline"),
                            columns=genlog.table_spec(True).col_names,
                            key_cols=list(genlog.KEY_COLS), n_buckets=4)
    stats = pipeline.replay_batch(
        spark, frames, lake, genlog.table_registry(), batch_id=0,
        record_lineage=False, stream_meta=pipeline.INLINE_DISCOVERY)
    assert stats["n_changes"] == len(result.changes)
    got = {(r["repo"], r["path"]): (r["content"], r["stars"])
           for r in lake.to_df().collect()}
    want = {k: (v["content"], v.get("stars"))
            for k, v in result.final_state.items()}
    assert got == want


def test_inline_discovery_foreign_partition_dead_letters(spark, tmp_path):
    """The documented contract when partitions do NOT hold whole files:
    a ROWS event whose TABLE_MAP landed elsewhere dead-letters (never
    mis-decodes); with the discovery job the same layout decodes fully."""
    from binlog_spark.operators.decode import (decode_frames,
                                               discover_stream_meta)

    gen = genlog.CdcWorldGenerator(seed=18, n_repos=6, paths_per_repo=5,
                                   txns_per_file=50)
    result = gen.generate(n_txns=3)  # few TABLE_MAPs vs many partitions
    from binlog_spark.schema import FRAME_SCHEMA

    # scramble frames across partitions: file locality destroyed, most
    # partitions hold ROWS events but no TABLE_MAP at all
    df = spark.createDataFrame(result.frames, FRAME_SCHEMA).repartition(8)
    inline_meta = {"checksum_alg": 1, "table_maps": {}}
    out = decode_frames(spark, df, inline_meta, genlog.table_registry())
    out = out.groupBy("kind").count().collect()
    counts = {r["kind"]: r["count"] for r in out}
    assert counts.get("deadletter", 0) > 0
    assert counts.get("change", 0) < len(result.changes)
    meta = discover_stream_meta(df)
    full = decode_frames(spark, df, meta, genlog.table_registry())
    assert full.where(full.kind == "change").count() == len(result.changes)


def test_lww_latest_and_txn_summaries(spark, world):
    result, frames_dir = world
    frames = pipeline.read_frames(spark, frames_dir)
    changes = pipeline.decode_to_changes(spark, frames, genlog.table_registry())
    latest = lww_latest(changes)
    # one row per key, and its gtid is the max gtid among that key's changes
    per_key_max = {}
    for c in result.changes:
        key = ((c["after"] or c["before"])["repo"],
               (c["after"] or c["before"])["path"])
        cur = per_key_max.get(key, (-1, -1))
        per_key_max[key] = max(cur, (c["gtid_seq"], c["seq_in_txn"]))
    got = {(r["_k_repo"], r["_k_path"]): (r["gtid_seq"], r["seq_in_txn"])
           for r in latest.collect()}
    assert got == per_key_max

    summ = transaction_summaries(changes)
    row = summ.agg(F.sum("n_events").alias("n")).collect()[0]
    assert row["n"] == len(result.changes)


def test_batch_replay_with_schema_evolution(spark, tmp_path):
    """The accumulator-carried DDL side channel: a mid-stream ALTER TABLE
    ADD COLUMN must evolve the lake schema in-flight (Iceberg ALTER
    semantics) and the post-ALTER rows must land with the new column."""
    gen = genlog.CdcWorldGenerator(seed=11, n_repos=10, paths_per_repo=15,
                                   txns_per_file=30, evolve_at_txn=40)
    result = gen.generate(n_txns=100)
    frames_dir = str(tmp_path / "frames")
    genlog.write_frames_parquet(result, frames_dir)

    lake = LakeTable.create(spark, str(tmp_path / "lake_evo"),
                            columns=genlog.table_spec(False).col_names,
                            key_cols=list(genlog.KEY_COLS), n_buckets=4)
    frames = pipeline.read_frames(spark, frames_dir)
    stats = pipeline.replay_batch(spark, frames, lake,
                                  genlog.table_registry(), batch_id=0)
    assert stats["n_ddls"] == 1
    assert stats["n_changes"] == len(result.changes)
    assert "stars" in lake.meta["columns"]

    got = {(r["repo"], r["path"]): r.asDict() for r in lake.to_df().collect()}
    assert set(got) == set(result.final_state)
    for key, row in result.final_state.items():
        assert got[key]["content"] == row["content"], key
        assert got[key].get("stars") == row.get("stars"), key


def test_arrow_fold_equals_sql_fold(spark, world):
    result, frames_dir = world
    frames = pipeline.read_frames(spark, frames_dir)
    changes = pipeline.decode_to_changes(spark, frames, genlog.table_registry())

    def norm(df):
        return {tuple(r[k] for k in ("_k_repo", "_k_path")):
                (r["del"], r["full"], dict(r["m"] or {}), r["g"], r["s"],
                 r["n_events"])
                for r in df.collect()}

    want = norm(fold_changes(changes, engine="arrow"))
    assert want == norm(fold_changes(changes, engine="sql"))
    assert want == norm(fold_changes(changes, engine="columnar"))
    # tiny Arrow batches force cross-batch key-run carries in the
    # columnar fold's kernel
    before = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        assert want == norm(fold_changes(changes, engine="columnar"))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       before)


def test_mariadb_gtid_flavor_decodes(spark, tmp_path):
    """A MariaDB-flavored stream (GTID event 162, sequence+domain payload)
    decodes to the same committed change rows — reference parity with the
    mariadb binlog flavor (replication/binlog_event_mariadb.go)."""
    import struct as _struct

    from binlog_spark.wire import constants as C
    from binlog_spark.wire import events as E

    fmt = E.BinlogFormat()
    spec = genlog.table_spec()
    frames = []
    pos = 4

    def emit(etype, payload, ts=1700000000):
        nonlocal pos
        frame = bytearray(E.packetize(fmt, etype, 0, payload, timestamp=ts,
                                      server_id=1, log_position=pos))
        next_pos = pos + len(frame)
        _struct.pack_into("<I", frame, 13, next_pos & 0xFFFFFFFF)
        frames.append(("binlog.000000", pos, etype, bytes(frame)))
        pos = next_pos

    emit(C.E_FORMAT_DESCRIPTION, E.make_format_description(fmt))
    emit(C.E_GTID_MARIADB, E.make_gtid_mariadb(77, domain=3))
    emit(C.E_QUERY, E.make_query(genlog.DB, "BEGIN"))
    emit(C.E_TABLE_MAP, E.make_table_map(spec, genlog.TABLE_ID))
    row = {"repo": "org0/repo-0001", "path": "src/a.py", "commit": "c" * 40,
           "lang": "py", "content": "print('mariadb')"}
    emit(C.E_WRITE_ROWS_V2,
         E.make_rows_event(spec, genlog.TABLE_ID, C.E_WRITE_ROWS_V2,
                           [(None, row)]))
    emit(C.E_XID, E.make_xid(77))

    import pyarrow as pa
    import pyarrow.parquet as pq
    table = pa.table({
        "file": pa.array([f[0] for f in frames], pa.string()),
        "pos": pa.array([f[1] for f in frames], pa.int64()),
        "etype": pa.array([f[2] for f in frames], pa.int32()),
        "frame": pa.array([f[3] for f in frames], pa.binary()),
    })
    fdir = tmp_path / "maria_frames"
    fdir.mkdir()
    pq.write_table(table, str(fdir / "f.parquet"))

    df = pipeline.read_frames(spark, str(fdir))
    changes = pipeline.decode_to_changes(spark, df, genlog.table_registry())
    got = [r.asDict() for r in changes.collect()]
    assert len(got) == 1
    assert got[0]["gtid_seq"] == 77
    assert got[0]["op"] == "I"
    assert got[0]["after"]["content"] == "print('mariadb')"


def test_changes_to_json_sink(spark, world):
    import json as _json

    from binlog_spark.operators.transactions import changes_to_json

    result, frames_dir = world
    frames = pipeline.read_frames(spark, frames_dir)
    changes = pipeline.decode_to_changes(spark, frames, genlog.table_registry())
    docs = [_json.loads(r["json"]) for r in changes_to_json(changes).collect()]
    assert len(docs) == len(result.changes)
    ops = {d["op"] for d in docs}
    assert ops <= {"I", "U", "D"}
    ins = next(d for d in docs if d["op"] == "I")
    assert "after" in ins and "repo" in ins["after"]


def test_late_cross_batch_changes_do_not_regress_state(spark, world, tmp_path):
    """Cross-batch late data: a batch carrying only OLDER gtids than what
    the lake has applied must be a no-op per key — the row-level
    (gtid, seq) MERGE guard, i.e. the engine's answer to watermarks for
    CDC ordering (SURVEY §2.2)."""
    result, frames_dir = world
    lake = LakeTable.create(spark, str(tmp_path / "lake_late"),
                            columns=genlog.table_spec().col_names,
                            key_cols=list(genlog.KEY_COLS), n_buckets=4)
    frames = pipeline.read_frames(spark, frames_dir)
    pipeline.replay_batch(spark, frames, lake, genlog.table_registry(),
                          batch_id=0)
    state1 = sorted(tuple(r) for r in lake.to_df().collect())

    # replay only the FIRST HALF of the stream as a later batch: every
    # gtid in it is already applied → state must not move backwards
    changes = pipeline.decode_to_changes(spark, frames,
                                         genlog.table_registry())
    mid = result.changes[len(result.changes) // 2]["gtid_seq"]
    late = changes.where(F.col("gtid_seq") <= mid)
    folded = fold_changes(late, tuple(lake.meta["key"]))
    lake.merge_apply(folded, batch_id="late-batch", max_gtid=mid)
    state2 = sorted(tuple(r) for r in lake.to_df().collect())
    assert state1 == state2


def test_hot_key_chunked_fold_correct(spark):
    """Skew path: one pathological hot key with 20k minimal-image updates
    (plus interleaved I/D) folds identically through the two-phase chunked
    variant — the 'salted repartitioning before the merge-apply stage' of
    the north rule, exact because chunks are contiguous gtid ranges."""
    import random

    rng = random.Random(99)
    rows = []
    # hot key: insert, then 20k partial updates, a delete+reinsert mid-way
    rows.append((1, 0, "I", {"repo": "hot/r", "path": "p", "commit": "c0",
                             "lang": "py", "content": "v0"}))
    for g in range(2, 20002):
        if g == 9000:
            rows.append((g, 0, "D", None))
        elif g == 9001:
            rows.append((g, 0, "I", {"repo": "hot/r", "path": "p",
                                     "commit": "c9001", "lang": "go",
                                     "content": "reborn"}))
        else:
            rows.append((g, 0, "U", {"repo": "hot/r", "path": "p",
                                     "commit": f"c{g}",
                                     "content": f"v{g}"}))
    # a handful of cold keys
    for i in range(50):
        rows.append((30000 + i, 0, "I",
                     {"repo": f"cold/r{i}", "path": "p", "commit": "cc",
                      "lang": "rs", "content": f"cold{i}"}))

    df = spark.createDataFrame(
        [(g, g, s, "binlog.000000", g, g + 1, 0, op, "codehub",
          "repo_content",
          {"repo": (after or {}).get("repo", "hot/r"),
           "path": (after or {}).get("path", "p")} if op != "I" else None,
          after)
         for g, s, op, after in rows],
        "gtid_seq long, txn_id long, seq_in_txn int, file string, "
        "pos long, next_pos long, ts long, op string, db string, "
        "tbl string, before map<string,string>, after map<string,string>")

    def norm(d):
        return {tuple(r[k] for k in ("_k_repo", "_k_path")):
                (r["del"], r["full"], dict(r["m"] or {}), r["g"],
                 r["n_events"])
                for r in d.collect()}

    plain = norm(fold_changes(df, engine="arrow"))
    chunked = norm(fold_changes(df, chunk_size=512))
    assert plain == chunked
    hot = plain[("hot/r", "p")]
    assert hot[1] is True  # reinserted: full image
    assert hot[2]["content"] == "v20001"
    assert hot[2]["lang"] == "go"  # carried from the reinsert, not clobbered
    assert hot[3] == 20001
    assert hot[4] == 20001


def test_multi_table_stream_filters_to_target(spark, tmp_path):
    """A stream interleaving a second table's row events: the lake created
    with a (db, tbl) identity applies only its own table; the other
    table's changes still decode (for other consumers) and never leak
    into the repo-content state."""
    import struct as _struct

    from binlog_spark.wire import constants as C
    from binlog_spark.wire import events as E

    other = E.TableMapSpec(
        database="codehub", name="stars_log",
        columns=[("user", C.TYPE_VARCHAR, 255, False),
                 ("repo", C.TYPE_VARCHAR, 255, False),
                 ("n", C.TYPE_LONG, 0, False)])
    spec = genlog.table_spec()
    registry = dict(genlog.table_registry())
    registry[("codehub", "stars_log")] = [[("user", False), ("repo", False),
                                           ("n", False)]]
    fmt = E.BinlogFormat()
    frames, pos = [], 4

    def emit(etype, payload, ts=1700000000):
        nonlocal pos
        fr = bytearray(E.packetize(fmt, etype, 0, payload, timestamp=ts,
                                   server_id=1, log_position=pos))
        nxt = pos + len(fr)
        _struct.pack_into("<I", fr, 13, nxt & 0xFFFFFFFF)
        frames.append(("binlog.000000", pos, etype, bytes(fr)))
        pos = nxt

    emit(C.E_FORMAT_DESCRIPTION, E.make_format_description(fmt))
    emit(C.E_GTID, E.make_gtid(1))
    emit(C.E_QUERY, E.make_query("codehub", "BEGIN"))
    emit(C.E_TABLE_MAP, E.make_table_map(spec, genlog.TABLE_ID))
    emit(C.E_WRITE_ROWS_V2, E.make_rows_event(
        spec, genlog.TABLE_ID, C.E_WRITE_ROWS_V2,
        [(None, {"repo": "r1", "path": "p1", "commit": "c" * 40,
                 "lang": "py", "content": "keepme"})]))
    emit(C.E_TABLE_MAP, E.make_table_map(other, 9999))
    emit(C.E_WRITE_ROWS_V2, E.make_rows_event(
        other, 9999, C.E_WRITE_ROWS_V2,
        [(None, {"user": "alice", "repo": "r1", "n": "5"})]))
    emit(C.E_XID, E.make_xid(1))

    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pa.table({"file": pa.array([f[0] for f in frames]),
                  "pos": pa.array([f[1] for f in frames], pa.int64()),
                  "etype": pa.array([f[2] for f in frames], pa.int32()),
                  "frame": pa.array([f[3] for f in frames], pa.binary())})
    d = tmp_path / "mt_frames"
    d.mkdir()
    pq.write_table(t, str(d / "f.parquet"))

    fr = pipeline.read_frames(spark, str(d))
    # both tables decode
    changes = pipeline.decode_to_changes(spark, fr, registry)
    tbls = {r["tbl"] for r in changes.collect()}
    assert tbls == {"repo_content", "stars_log"}

    lake = LakeTable.create(spark, str(tmp_path / "lake_mt"),
                            columns=genlog.table_spec().col_names,
                            key_cols=list(genlog.KEY_COLS), n_buckets=2,
                            table=("codehub", "repo_content"))
    stats = pipeline.replay_batch(spark, fr, lake, registry, batch_id=0)
    assert stats["n_changes"] == 1  # only the repo_content row applied
    rows = [r.asDict() for r in lake.to_df().collect()]
    assert len(rows) == 1 and rows[0]["content"] == "keepme"
    assert "user" not in rows[0]


def _two_table_world():
    """Mixed repo_content + stars_log stream: 4 txns of inserts, a
    partial update, and a delete across both tables. Returns
    (frames, registry, expected_docs, expected_stars)."""
    import struct as _struct

    from binlog_spark.wire import constants as C
    from binlog_spark.wire import events as E

    other = E.TableMapSpec(
        database="codehub", name="stars_log",
        columns=[("user", C.TYPE_VARCHAR, 255, False),
                 ("repo", C.TYPE_VARCHAR, 255, False),
                 ("n", C.TYPE_LONG, 0, False)])
    spec = genlog.table_spec()
    registry = dict(genlog.table_registry())
    registry[("codehub", "stars_log")] = [[("user", False), ("repo", False),
                                          ("n", False)]]
    fmt = E.BinlogFormat()
    frames, pos, gtid = [], 4, 0

    def emit(etype, payload):
        nonlocal pos
        fr = bytearray(E.packetize(fmt, etype, 0, payload,
                                   timestamp=1700000000, server_id=1,
                                   log_position=pos))
        nxt = pos + len(fr)
        _struct.pack_into("<I", fr, 13, nxt & 0xFFFFFFFF)
        frames.append(("binlog.000000", pos, etype, bytes(fr)))
        pos = nxt

    def txn(*events):
        nonlocal gtid
        gtid += 1
        emit(C.E_GTID, E.make_gtid(gtid))
        emit(C.E_QUERY, E.make_query("codehub", "BEGIN"))
        for etype, spec_, tid, rows in events:
            emit(C.E_TABLE_MAP, E.make_table_map(spec_, tid))
            emit(etype, E.make_rows_event(spec_, tid, etype, rows))
        emit(C.E_XID, E.make_xid(gtid))

    doc = {"repo": "r1", "path": "p1", "commit": "c" * 40, "lang": "py",
           "content": "v1"}
    doc2 = {"repo": "r2", "path": "p2", "commit": "d" * 40, "lang": "go",
            "content": "gone"}
    emit(C.E_FORMAT_DESCRIPTION, E.make_format_description(fmt))
    txn((C.E_WRITE_ROWS_V2, spec, genlog.TABLE_ID, [(None, doc)]),
        (C.E_WRITE_ROWS_V2, other, 9999,
         [(None, {"user": "alice", "repo": "r1", "n": "5"})]))
    txn((C.E_WRITE_ROWS_V2, spec, genlog.TABLE_ID, [(None, doc2)]),
        (C.E_UPDATE_ROWS_V2, other, 9999,
         [({"user": "alice", "repo": "r1"}, {"n": "7"})]))
    txn((C.E_UPDATE_ROWS_V2, spec, genlog.TABLE_ID,
         [({"repo": "r1", "path": "p1"}, {"content": "v2"})]),
        (C.E_WRITE_ROWS_V2, other, 9999,
         [(None, {"user": "bob", "repo": "r2", "n": "1"})]))
    txn((C.E_DELETE_ROWS_V2, spec, genlog.TABLE_ID,
         [({"repo": "r2", "path": "p2"}, None)]))
    return (frames, registry, {("r1", "p1"): "v2"},
            {("alice", "r1"): "7", ("bob", "r2"): "1"})


def _write_frame_file(frames, path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"file": pa.array([f[0] for f in frames]),
                  "pos": pa.array([f[1] for f in frames], pa.int64()),
                  "etype": pa.array([f[2] for f in frames], pa.int32()),
                  "frame": pa.array([f[3] for f in frames], pa.binary())})
    pq.write_table(t, str(path))


def test_replay_batch_multi_fans_out_one_decode(spark, tmp_path):
    """Multi-table fan-out: ONE decode/assembly pass applies a mixed
    stream to several lake tables, each with its own key, exactly-once
    state, and final-state parity; re-applying the batch no-ops both."""
    frames, registry, want_docs, want_stars = _two_table_world()
    d = tmp_path / "fanout_frames"
    d.mkdir()
    _write_frame_file(frames, d / "f.parquet")
    fr = pipeline.read_frames(spark, str(d))

    lake_docs = LakeTable.create(
        spark, str(tmp_path / "lk_docs"),
        columns=genlog.table_spec().col_names,
        key_cols=list(genlog.KEY_COLS), n_buckets=2,
        table=("codehub", "repo_content"))
    lake_stars = LakeTable.create(
        spark, str(tmp_path / "lk_stars"),
        columns=["user", "repo", "n"], key_cols=["user", "repo"],
        n_buckets=2, table=("codehub", "stars_log"))

    stats = pipeline.replay_batch_multi(
        spark, fr, {("codehub", "repo_content"): lake_docs,
                    ("codehub", "stars_log"): lake_stars},
        registry, batch_id=0)
    assert stats[("codehub", "repo_content")]["n_changes"] == 4
    assert stats[("codehub", "stars_log")]["n_changes"] == 3

    docs = {(r["repo"], r["path"]): r["content"]
            for r in lake_docs.to_df().collect()}
    assert docs == want_docs  # r2/p2 deleted, r1 patched
    stars = {(r["user"], r["repo"]): r["n"]
             for r in lake_stars.to_df().collect()}
    assert stars == want_stars

    # exactly-once: re-applying the same batch no-ops BOTH lakes
    lake_docs2 = LakeTable(spark, str(tmp_path / "lk_docs"))
    lake_stars2 = LakeTable(spark, str(tmp_path / "lk_stars"))
    stats2 = pipeline.replay_batch_multi(
        spark, fr, {("codehub", "repo_content"): lake_docs2,
                    ("codehub", "stars_log"): lake_stars2},
        registry, batch_id=0)
    assert all(s["skipped"] for s in stats2.values())


def test_fanout_partial_crash_then_redelivery(spark, tmp_path):
    """Exactly-once under a crash BETWEEN per-table merges: the batch
    lands in lake A but not lake B (simulated by fanning out to A only),
    then the whole batch is re-delivered to both — A must no-op on its
    batch id while B catches up, and both end at parity."""
    frames, registry, want_docs, want_stars = _two_table_world()
    d = tmp_path / "crash_frames"
    d.mkdir()
    _write_frame_file(frames, d / "f.parquet")
    fr = pipeline.read_frames(spark, str(d))

    lake_docs = LakeTable.create(
        spark, str(tmp_path / "clk_docs"),
        columns=genlog.table_spec().col_names,
        key_cols=list(genlog.KEY_COLS), n_buckets=2,
        table=("codehub", "repo_content"))
    lake_stars = LakeTable.create(
        spark, str(tmp_path / "clk_stars"),
        columns=["user", "repo", "n"], key_cols=["user", "repo"],
        n_buckets=2, table=("codehub", "stars_log"))

    # "crash": only the docs merge committed before the process died
    pipeline.replay_batch_multi(
        spark, fr, {("codehub", "repo_content"): lake_docs},
        registry, batch_id=7)

    # re-delivery of the SAME batch to both tables
    stats = pipeline.replay_batch_multi(
        spark, fr,
        {("codehub", "repo_content"): LakeTable(spark,
                                                str(tmp_path / "clk_docs")),
         ("codehub", "stars_log"): LakeTable(spark,
                                             str(tmp_path / "clk_stars"))},
        registry, batch_id=7)
    assert stats[("codehub", "repo_content")]["skipped"]       # no-op
    assert not stats[("codehub", "stars_log")]["skipped"]      # catches up

    docs = {(r["repo"], r["path"]): r["content"]
            for r in LakeTable(spark, str(tmp_path / "clk_docs"))
            .to_df().collect()}
    stars = {(r["user"], r["repo"]): r["n"]
             for r in LakeTable(spark, str(tmp_path / "clk_stars"))
             .to_df().collect()}
    assert docs == want_docs
    assert stars == want_stars


def test_run_stream_multi_two_microbatches(spark, tmp_path):
    """Streaming fan-out: the mixed stream split across two microbatches
    (second batch's rows depend on the persisted TABLE_MAP cache for
    nothing — each txn re-sends its maps — but the FORMAT_DESCRIPTION
    arrives only in batch 1 and must carry over via the meta store)."""
    import os as _os
    import time as _time

    from binlog_spark.streaming.pipeline import run_stream_multi

    frames, registry, want_docs, want_stars = _two_table_world()
    # split between transactions: after the 2nd XID
    from binlog_spark.wire import constants as C
    xid_idx = [i for i, f in enumerate(frames) if f[2] == C.E_XID]
    cut = xid_idx[1] + 1
    d = tmp_path / "stream_fanout"
    d.mkdir()
    now = _time.time()
    _write_frame_file(frames[:cut], d / "f1.parquet")
    _os.utime(d / "f1.parquet", (now - 20, now - 20))
    _write_frame_file(frames[cut:], d / "f2.parquet")
    _os.utime(d / "f2.parquet", (now - 10, now - 10))

    lake_docs = LakeTable.create(
        spark, str(tmp_path / "slk_docs"),
        columns=genlog.table_spec().col_names,
        key_cols=list(genlog.KEY_COLS), n_buckets=2,
        table=("codehub", "repo_content"))
    lake_stars = LakeTable.create(
        spark, str(tmp_path / "slk_stars"),
        columns=["user", "repo", "n"], key_cols=["user", "repo"],
        n_buckets=2, table=("codehub", "stars_log"))

    q = run_stream_multi(
        spark, str(d),
        {("codehub", "repo_content"): str(tmp_path / "slk_docs"),
         ("codehub", "stars_log"): str(tmp_path / "slk_stars")},
        registry, checkpoint_dir=str(tmp_path / "sck"),
        max_files_per_trigger=1)
    q.awaitTermination()

    docs = {(r["repo"], r["path"]): r["content"]
            for r in LakeTable(spark, str(tmp_path / "slk_docs"))
            .to_df().collect()}
    stars = {(r["user"], r["repo"]): r["n"]
             for r in LakeTable(spark, str(tmp_path / "slk_stars"))
             .to_df().collect()}
    assert docs == want_docs
    assert stars == want_stars
    assert len(LakeTable(spark, str(tmp_path / "slk_docs"))
               .meta["applied_batches"]) >= 2


def test_type_widening_mid_stream(spark, tmp_path):
    """ALTER-driven type WIDENING (north rule: column add/type-widen):
    the TABLE_MAP's type vector changes INT→BIGINT mid-stream at the
    same column count. The width-keyed schema lookup binds the same name
    vector, cells decode through the new wire type, and the canonical
    byte-string model makes the widened values land losslessly —
    including one beyond int32 range."""
    import struct as _struct

    import pyarrow as pa
    import pyarrow.parquet as pq

    from binlog_spark.wire import constants as C
    from binlog_spark.wire import events as E

    cols_narrow = [("k", C.TYPE_VARCHAR, 255, False),
                   ("n", C.TYPE_LONG, 0, False)]
    cols_wide = [("k", C.TYPE_VARCHAR, 255, False),
                 ("n", C.TYPE_LONGLONG, 0, False)]
    narrow = E.TableMapSpec(database="db", name="m", columns=cols_narrow)
    wide = E.TableMapSpec(database="db", name="m", columns=cols_wide)
    registry = {("db", "m"): [[("k", False), ("n", False)]]}

    fmt = E.BinlogFormat()
    frames, pos, gtid = [], 4, 0

    def emit(etype, payload):
        nonlocal pos
        fr = bytearray(E.packetize(fmt, etype, 0, payload,
                                   timestamp=1700000000, server_id=1,
                                   log_position=pos))
        nxt = pos + len(fr)
        _struct.pack_into("<I", fr, 13, nxt & 0xFFFFFFFF)
        frames.append(("binlog.000000", pos, etype, bytes(fr)))
        pos = nxt

    def txn(spec_, etype, rows, ddl=None):
        nonlocal gtid
        gtid += 1
        emit(C.E_GTID, E.make_gtid(gtid))
        if ddl:
            emit(C.E_QUERY, E.make_query("db", ddl))
            return
        emit(C.E_QUERY, E.make_query("db", "BEGIN"))
        emit(C.E_TABLE_MAP, E.make_table_map(spec_, 77))
        emit(etype, E.make_rows_event(spec_, 77, etype, rows))
        emit(C.E_XID, E.make_xid(gtid))

    emit(C.E_FORMAT_DESCRIPTION, E.make_format_description(fmt))
    txn(narrow, C.E_WRITE_ROWS_V2, [(None, {"k": "a", "n": "41"})])
    # the widening ALTER arrives as a QUERY event (classified, logged,
    # not applied — same as the reference), then TABLE_MAP carries the
    # new type vector
    txn(None, None, None, ddl="ALTER TABLE m MODIFY COLUMN n BIGINT")
    txn(wide, C.E_WRITE_ROWS_V2,
        [(None, {"k": "b", "n": str(2**40 + 7)})])  # beyond int32
    txn(wide, C.E_UPDATE_ROWS_V2, [({"k": "a"}, {"n": "42"})])

    t = pa.table({"file": pa.array([f[0] for f in frames]),
                  "pos": pa.array([f[1] for f in frames], pa.int64()),
                  "etype": pa.array([f[2] for f in frames], pa.int32()),
                  "frame": pa.array([f[3] for f in frames], pa.binary())})
    d = tmp_path / "widen_frames"
    d.mkdir()
    pq.write_table(t, str(d / "f.parquet"))

    lake = LakeTable.create(spark, str(tmp_path / "lk_widen"),
                            columns=["k", "n"], key_cols=["k"],
                            n_buckets=2, table=("db", "m"))
    fr = pipeline.read_frames(spark, str(d))
    stats = pipeline.replay_batch(spark, fr, lake, registry, batch_id=0)
    assert stats["n_changes"] == 3
    got = {r["k"]: r["n"] for r in lake.to_df().collect()}
    assert got == {"a": "42", "b": str(2**40 + 7)}


def test_run_stream_multi_kill_and_resume(spark, tmp_path):
    """Fan-out streaming resume: the query terminates after the first
    file (a kill between microbatches), more stream arrives, and a new
    query on the SAME checkpoint resumes both lakes to parity without
    re-applying the first batch."""
    import os as _os
    import time as _time

    from binlog_spark.streaming.pipeline import run_stream_multi
    from binlog_spark.wire import constants as C

    frames, registry, want_docs, want_stars = _two_table_world()
    xid_idx = [i for i, f in enumerate(frames) if f[2] == C.E_XID]
    cut = xid_idx[1] + 1
    d = tmp_path / "resume_fanout"
    d.mkdir()
    now = _time.time()
    _write_frame_file(frames[:cut], d / "f1.parquet")
    _os.utime(d / "f1.parquet", (now - 20, now - 20))

    lakes = {("codehub", "repo_content"): str(tmp_path / "rlk_docs"),
             ("codehub", "stars_log"): str(tmp_path / "rlk_stars")}
    LakeTable.create(spark, lakes[("codehub", "repo_content")],
                     columns=genlog.table_spec().col_names,
                     key_cols=list(genlog.KEY_COLS), n_buckets=2,
                     table=("codehub", "repo_content"))
    LakeTable.create(spark, lakes[("codehub", "stars_log")],
                     columns=["user", "repo", "n"],
                     key_cols=["user", "repo"], n_buckets=2,
                     table=("codehub", "stars_log"))
    ckpt = str(tmp_path / "rck")

    # phase 1: only the first file exists — the query drains it and stops
    q = run_stream_multi(spark, str(d), lakes, registry, ckpt,
                         max_files_per_trigger=1)
    q.awaitTermination()
    mid_docs = LakeTable(spark, lakes[("codehub", "repo_content")])
    applied_mid = list(mid_docs.meta["applied_batches"])
    assert applied_mid  # at least one microbatch committed

    # the rest of the stream lands; resume from the same checkpoint
    _write_frame_file(frames[cut:], d / "f2.parquet")
    _os.utime(d / "f2.parquet", (now - 10, now - 10))
    q2 = run_stream_multi(spark, str(d), lakes, registry, ckpt,
                          max_files_per_trigger=1)
    q2.awaitTermination()

    docs = {(r["repo"], r["path"]): r["content"]
            for r in LakeTable(spark, lakes[("codehub", "repo_content")])
            .to_df().collect()}
    stars = {(r["user"], r["repo"]): r["n"]
             for r in LakeTable(spark, lakes[("codehub", "stars_log")])
             .to_df().collect()}
    assert docs == want_docs
    assert stars == want_stars
    final_docs = LakeTable(spark, lakes[("codehub", "repo_content")])
    # the first batch was not re-applied: its id appears exactly once
    assert final_docs.meta["applied_batches"].count(applied_mid[0]) == 1
    assert len(final_docs.meta["applied_batches"]) > len(applied_mid)


def test_vacuum_drops_superseded_versions(spark, world, tmp_path):
    result, frames_dir = world
    lake = LakeTable.create(spark, str(tmp_path / "lake_vac"),
                            columns=genlog.table_spec().col_names,
                            key_cols=list(genlog.KEY_COLS), n_buckets=4)
    frames = pipeline.read_frames(spark, frames_dir)
    # two applies (second is a differently-keyed replay → new version)
    pipeline.replay_batch(spark, frames, lake, genlog.table_registry(),
                          batch_id=0)
    before = sorted(tuple(r) for r in lake.to_df().collect())
    import os as _os
    data_dir = str(tmp_path / "lake_vac" / "data")
    n_before = len(_os.listdir(data_dir))
    pipeline.replay_batch(spark, frames, lake, genlog.table_registry(),
                          batch_id=1)
    stats = lake.vacuum()
    after = sorted(tuple(r) for r in lake.to_df().collect())
    assert after == before  # vacuum never changes visible state
    assert stats["removed_versions"] >= 1 or n_before == len(
        _os.listdir(data_dir))


class _DynamicMapper:
    """User-pluggable schema provider (MysqlTableMapper analogue): serves
    column names/signedness computed at stream time, no static registry.
    Must be picklable — it rides the broadcast to executors."""

    def __init__(self, registry):
        self._reg = registry  # stands in for a DESC-style backend

    def mysql_table(self, db, tbl, ncols):
        for cols in self._reg.get((db, tbl), []):
            if len(cols) == ncols:
                return cols
        return None

    def knows(self, db, tbl):
        return (db, tbl) in self._reg


def test_pluggable_table_mapper_resolves_at_stream_time(spark, world):
    """decode accepts any object with mysql_table(db, tbl, ncols) in place
    of the registry dict — the reference's pluggable MysqlTableMapper
    (row_streamer.go:19-21) — and produces identical change rows."""
    result, frames_dir = world
    frames = pipeline.read_frames(spark, frames_dir)
    mapper = _DynamicMapper(genlog.table_registry())
    changes = pipeline.decode_to_changes(spark, frames, mapper)
    got = [_norm_change(r.asDict()) for r in changes.collect()]
    want = [_norm_change(c) for c in result.changes]
    assert sorted(got) == sorted(want)


class _EmptyMapper:  # module-level: broadcast values use plain pickle
    def mysql_table(self, db, tbl, ncols):
        return None

    def knows(self, db, tbl):
        return False


class _WrongWidthMapper:
    def mysql_table(self, db, tbl, ncols):
        return None

    def knows(self, db, tbl):
        return True  # table known, width unservable


def test_unknown_table_and_width_mismatch_deadletter(spark, world):
    """Provider misses: unknown table vs known-table-wrong-width produce
    the two distinct dead-letter reasons (row_streamer.go:236-241)."""
    from binlog_spark.operators.decode import (decode_frames,
                                               discover_stream_meta)

    result, frames_dir = world
    frames = pipeline.read_frames(spark, frames_dir)
    meta = discover_stream_meta(frames)

    decoded = decode_frames(spark, frames, meta, _EmptyMapper())
    reasons = {r["reason"] for r in
               decoded.where(F.col("kind") == "deadletter").collect()}
    assert any("not in registry" in r for r in reasons)

    decoded2 = decode_frames(spark, frames, meta, _WrongWidthMapper())
    reasons2 = {r["reason"] for r in
                decoded2.where(F.col("kind") == "deadletter").collect()}
    assert "column count mismatch" in reasons2


def test_vacuum_expires_orphaned_snapshots(spark, world, tmp_path):
    """Vacuum prunes snapshot-log entries whose data versions it removes,
    so every advertised time-travel point stays readable and a vacuumed
    version raises the clear no-snapshot error (r1 advice: snapshots()
    used to keep advertising points whose read crashed on a missing
    parquet path)."""
    result, frames_dir = world
    lake = LakeTable.create(spark, str(tmp_path / "lake_vexp"),
                            columns=genlog.table_spec().col_names,
                            key_cols=list(genlog.KEY_COLS), n_buckets=1)
    all_frames = pipeline.read_frames(spark, frames_dir)
    files = sorted({c["file"] for c in result.changes})
    pipeline.replay_batch(spark, all_frames.where(F.col("file") == files[0]),
                          lake, genlog.table_registry(), batch_id=0)
    v1 = lake.meta["version"]
    # second batch rewrites the single bucket → v1 fully superseded
    pipeline.replay_batch(spark, all_frames.where(F.col("file") > files[0]),
                          lake, genlog.table_registry(), batch_id=1)
    assert any(s["version"] == v1 for s in lake.snapshots())

    stats = lake.vacuum()
    assert stats["removed_versions"] >= 1
    assert stats["expired_snapshots"] >= 1
    snaps = lake.snapshots()
    assert all(s["version"] != v1 for s in snaps)
    for s in snaps:  # everything still advertised is actually readable
        lake.to_df(at_version=s["version"]).count()
    with pytest.raises(ValueError, match="no snapshot"):
        lake.read(at_version=v1)


def test_resume_cursor_pushes_down_and_replays_suffix(spark, world, tmp_path):
    """P5 batch analogue: resume from (file, pos) — the predicate reaches
    the parquet scan, and replaying [start, end] onto a lake that already
    has [begin, start) reproduces the full final state."""
    from binlog_spark import plans

    result, frames_dir = world
    files = sorted({c["file"] for c in result.changes})
    cut_file = files[len(files) // 2]
    # resume tokens are transaction boundaries (the reference's
    # NextPosition, row_streamer.go:107-118): cut at a GTID event start
    from binlog_spark.wire import constants as C
    gtid_starts = [p for f, p, et, _ in result.frames
                   if f == cut_file and et == C.E_GTID]
    cut_pos = gtid_starts[len(gtid_starts) // 2]

    suffix = pipeline.read_frames_from(spark, frames_dir, cut_file, cut_pos)
    assert plans.has_pushed_filter(suffix, "file"), plans.physical_plan(suffix)

    # apply prefix then resume with the suffix
    prefix = pipeline.read_frames(spark, frames_dir).where(
        (F.col("file") < cut_file)
        | ((F.col("file") == cut_file) & (F.col("pos") < cut_pos)))
    lake = LakeTable.create(spark, str(tmp_path / "lake_res"),
                            columns=genlog.table_spec().col_names,
                            key_cols=list(genlog.KEY_COLS), n_buckets=4)
    pipeline.replay_batch(spark, prefix, lake, genlog.table_registry(),
                          batch_id=0)
    # FORMAT_DESCRIPTION of the cut file precedes the cut; re-union it so
    # the suffix is self-describing (a real dump re-sends it on connect)
    pipeline.replay_batch(spark, suffix, lake, genlog.table_registry(),
                          batch_id=1, stream_meta=None)

    got = {(r["repo"], r["path"]): r["content"]
           for r in lake.to_df().collect()}
    want = {k: v["content"] for k, v in result.final_state.items()}
    assert got == want


def test_time_travel_snapshots(spark, world, tmp_path):
    """Iceberg-snapshot analogue: every merge commit logs its bucket map;
    reading at an old version reproduces that batch's exact state."""
    result, frames_dir = world
    lake = LakeTable.create(spark, str(tmp_path / "lake_tt"),
                            columns=genlog.table_spec().col_names,
                            key_cols=list(genlog.KEY_COLS), n_buckets=4)
    all_frames = pipeline.read_frames(spark, frames_dir)
    files = sorted({c["file"] for c in result.changes})
    first = all_frames.where(F.col("file") == files[0])
    pipeline.replay_batch(spark, first, lake, genlog.table_registry(),
                          batch_id=0)
    v1 = lake.meta["version"]
    state_v1 = sorted(tuple(r) for r in lake.to_df().collect())

    rest = all_frames.where(F.col("file") > files[0])
    pipeline.replay_batch(spark, rest, lake, genlog.table_registry(),
                          batch_id=1)
    assert lake.meta["version"] > v1
    # current state differs, but the v1 snapshot is still readable
    assert sorted(tuple(r) for r in lake.to_df(at_version=v1).collect()) \
        == state_v1
    snaps = lake.snapshots()
    assert [s["version"] for s in snaps] == sorted(s["version"] for s in snaps)
    assert snaps[-1]["last_gtid"] == lake.meta["last_gtid"]


def test_foreign_table_ddl_does_not_evolve_lake(spark, tmp_path):
    """Multi-table stream: another table's ALTER must not add columns to
    this lake (review finding: apply_ddls used to ignore the statement's
    table token)."""
    lake = LakeTable.create(spark, str(tmp_path / "lake_fddl"),
                            columns=genlog.table_spec().col_names,
                            key_cols=list(genlog.KEY_COLS), n_buckets=2,
                            table=("codehub", "repo_content"))
    pipeline.apply_ddls(lake, [
        {"sql": "ALTER TABLE stars_log ADD COLUMN fork_count INT"},
        {"sql": "ALTER TABLE codehub.stars_log ADD forks INT"},
        {"sql": "ALTER TABLE `repo_content` ADD COLUMN stars INT"},
        {"sql": "ALTER TABLE codehub.repo_content ADD COLUMN watchers INT"},
    ])
    assert "fork_count" not in lake.meta["columns"]
    assert "forks" not in lake.meta["columns"]
    assert "stars" in lake.meta["columns"]       # bare own-table name
    assert "watchers" in lake.meta["columns"]    # db-qualified own table


def test_bucket_emptied_within_batch_stays_readable(spark, tmp_path):
    """Review finding: a changed bucket whose every key is inserted AND
    deleted within the batch produces no output rows — the manifest must
    not point at a never-written directory (read() used to crash)."""
    from binlog_spark.operators.lww import fold_changes as _fold

    lake = LakeTable.create(spark, str(tmp_path / "lake_phantom"),
                            columns=genlog.table_spec().col_names,
                            key_cols=list(genlog.KEY_COLS), n_buckets=2)
    base = {"repo": "r", "path": "p", "commit": "c", "lang": "py",
            "content": "x"}
    changes = spark.createDataFrame(
        [(1, 1, 0, "f", 4, 5, 0, "I", "codehub", "repo_content", None, base),
         (2, 2, 0, "f", 5, 6, 0, "D", "codehub", "repo_content",
          {"repo": "r", "path": "p"}, None)],
        "gtid_seq long, txn_id long, seq_in_txn int, file string, pos long, "
        "next_pos long, ts long, op string, db string, tbl string, "
        "before map<string,string>, after map<string,string>")
    stats = lake.merge_apply(_fold(changes), batch_id=0, max_gtid=2)
    assert not stats.get("skipped")
    # readable, and empty — no phantom directory in the manifest
    assert lake.to_df().count() == 0
    assert lake.read().count() == 0
