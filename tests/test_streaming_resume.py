"""Streaming apply: exactly-once, mid-replay kill/resume, schema evolution.

Resume contract mirrors the reference's
``SetStartBinlogPosition``/``NextPosition``
(`/root/reference/row_streamer.go:57-63,86,107-118`).
"""

import hashlib
import os

import pytest

from binlog_spark import genlog
from binlog_spark.operators.merge import LakeTable
from binlog_spark.streaming.pipeline import run_stream


@pytest.fixture(scope="module")
def evolved_world(tmp_path_factory):
    gen = genlog.CdcWorldGenerator(seed=11, n_repos=15, paths_per_repo=20,
                                   txns_per_file=25, evolve_at_txn=40)
    result = gen.generate(n_txns=100)
    frames_dir = str(tmp_path_factory.mktemp("frames_stream"))
    genlog.write_frames_parquet(result, frames_dir)
    return result, frames_dir


def _assert_parity(lake, result, evolved: bool):
    got = {(r["repo"], r["path"]): r.asDict() for r in lake.to_df().collect()}
    assert set(got) == set(result.final_state)
    for key, want in result.final_state.items():
        g = got[key]
        assert hashlib.sha256(g["content"].encode()).hexdigest() == \
            hashlib.sha256(want["content"].encode()).hexdigest()
        if evolved:
            assert g.get("stars") == want.get("stars"), key


def test_stream_full_replay_with_schema_evolution(spark, evolved_world, tmp_path):
    result, frames_dir = evolved_world
    lake_path = str(tmp_path / "lake")
    LakeTable.create(spark, lake_path, columns=genlog.table_spec().col_names,
                     key_cols=list(genlog.KEY_COLS), n_buckets=8)
    q = run_stream(spark, frames_dir, lake_path, genlog.table_registry(),
                   checkpoint_dir=str(tmp_path / "ckpt"),
                   max_files_per_trigger=1)
    q.awaitTermination()
    lake = LakeTable(spark, lake_path)
    assert "stars" in lake.meta["columns"]  # ALTER applied in-flight
    _assert_parity(lake, result, evolved=True)


def test_stream_kill_and_resume(spark, evolved_world, tmp_path):
    result, frames_dir = evolved_world
    lake_path = str(tmp_path / "lake2")
    ckpt = str(tmp_path / "ckpt2")
    LakeTable.create(spark, lake_path, columns=genlog.table_spec().col_names,
                     key_cols=list(genlog.KEY_COLS), n_buckets=4)

    # phase 1: process only part of the input, then stop mid-replay
    n_files = len([f for f in os.listdir(frames_dir) if f.endswith(".parquet")])
    assert n_files >= 3
    q = run_stream(spark, frames_dir, lake_path, genlog.table_registry(),
                   checkpoint_dir=ckpt, max_files_per_trigger=1)
    # let at least one microbatch commit, then kill
    while not LakeTable(spark, lake_path).meta["applied_batches"]:
        q.processAllAvailable() if False else None
        import time
        time.sleep(0.3)
        if not q.isActive:
            break
    q.stop()
    applied_mid = list(LakeTable(spark, lake_path).meta["applied_batches"])

    # phase 2: resume from the same checkpoint — must complete to parity
    q2 = run_stream(spark, frames_dir, lake_path, genlog.table_registry(),
                    checkpoint_dir=ckpt, max_files_per_trigger=1)
    q2.awaitTermination()
    lake = LakeTable(spark, lake_path)
    assert len(lake.meta["applied_batches"]) >= max(len(applied_mid), 1)
    _assert_parity(lake, result, evolved=True)
