"""Partition-spec rewrite (LakeTable.rebucket): the table keeps byte-exact
content, keeps time-travel, and keeps applying CDC batches correctly under
the new bucket layout."""

import hashlib
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlog_spark import genlog, pipeline  # noqa: E402
from binlog_spark.operators.merge import LakeTable  # noqa: E402


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    gen = genlog.CdcWorldGenerator(seed=11, n_repos=15, paths_per_repo=20,
                                   txns_per_file=40)
    result = gen.generate(n_txns=80)
    frames_dir = str(tmp_path_factory.mktemp("frames_rb"))
    genlog.write_frames_parquet(result, frames_dir)
    return result, frames_dir


def _state_sha(lake):
    return {(r["repo"], r["path"]):
            hashlib.sha256(r["content"].encode()).hexdigest()
            for r in lake.to_df().collect()}


def test_rebucket_preserves_state_and_stream(spark, world, tmp_path):
    result, frames_dir = world
    lake = LakeTable.create(spark, str(tmp_path / "lake_rb"),
                            columns=genlog.table_spec().col_names,
                            key_cols=list(genlog.KEY_COLS), n_buckets=4)
    frames = pipeline.read_frames(spark, frames_dir)
    f0 = frames.where(F.col("file") == "binlog.000000")
    f1 = frames.where(F.col("file") != "binlog.000000")
    assert f1.take(1), "world must span two binlog files"

    pipeline.replay_batch(spark, f0, lake, genlog.table_registry(),
                          batch_id=0)
    mid_state = _state_sha(lake)
    mid_version = lake.meta["version"]
    hwm_before = lake.meta["last_gtid"]

    info = lake.rebucket(16)
    assert info["n_buckets"] == 16
    assert lake.meta["n_buckets"] == 16
    # content byte-identical, watermark & batch log untouched
    assert _state_sha(lake) == mid_state
    assert lake.meta["last_gtid"] == hwm_before
    assert 0 in lake.meta["applied_batches"]
    # new layout really is 16-way (some buckets may be empty)
    assert all(int(v) == info["version"]
               for v in lake.meta["buckets"].values())
    assert len(lake.meta["buckets"]) <= 16

    # time-travel to the pre-rebucket snapshot still reads the old layout
    old = lake.to_df(at_version=mid_version)
    assert {(r["repo"], r["path"]) for r in old.collect()} == set(mid_state)

    # the CDC stream continues against the new spec
    pipeline.replay_batch(spark, f1, lake, genlog.table_registry(),
                          batch_id=1)
    got = _state_sha(lake)
    want = {(repo, path):
            hashlib.sha256(row["content"].encode()).hexdigest()
            for (repo, path), row in result.final_state.items()}
    assert got == want

    # vacuum expires the pre-rebucket versions; current reads survive
    lake.vacuum()
    assert _state_sha(lake) == want
