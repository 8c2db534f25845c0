"""Snapshot bootstrap + binlog catch-up (pipeline.bootstrap_from_snapshot):
initial load stamped at the snapshot GTID, catch-up replay starting from a
position BEFORE the snapshot (full overlap) converges to the generator's
ground-truth final state, overlap slices commit as no-ops, and the
bootstrap batch itself is exactly-once."""

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
    gen = genlog.CdcWorldGenerator(seed=23, n_repos=12, paths_per_repo=15,
                                   txns_per_file=50)
    result = gen.generate(n_txns=100)
    frames_dir = str(tmp_path_factory.mktemp("frames_bs"))
    genlog.write_frames_parquet(result, frames_dir)
    return result, frames_dir


def _sha_state(lake):
    return {(r["repo"], r["path"]):
            hashlib.sha256(r["content"].encode()).hexdigest()
            for r in lake.to_df().collect()}


def test_bootstrap_then_catchup_with_overlap(spark, world, tmp_path):
    result, frames_dir = world
    frames = pipeline.read_frames(spark, frames_dir)
    f0 = frames.where(F.col("file") == "binlog.000000")
    assert frames.where(F.col("file") != "binlog.000000").take(1)

    # ground truth "consistent dump at gtid G": replay the first file
    src = LakeTable.create(spark, str(tmp_path / "src"),
                           columns=genlog.table_spec().col_names,
                           key_cols=list(genlog.KEY_COLS), n_buckets=4)
    pipeline.replay_batch(spark, f0, src, genlog.table_registry(),
                          batch_id=0)
    snapshot_gtid = src.meta["last_gtid"]
    snapshot = src.to_df()

    lake = LakeTable.create(spark, str(tmp_path / "boot"),
                            columns=genlog.table_spec().col_names,
                            key_cols=list(genlog.KEY_COLS), n_buckets=4)
    stats = pipeline.bootstrap_from_snapshot(spark, snapshot, lake,
                                             snapshot_gtid)
    assert not stats["skipped"]
    assert lake.meta["last_gtid"] == snapshot_gtid
    assert _sha_state(lake) == _sha_state(src)

    # re-delivered bootstrap is a no-op (exactly-once by batch id)
    assert pipeline.bootstrap_from_snapshot(
        spark, snapshot, lake, snapshot_gtid)["skipped"]

    # bootstrap must be the FIRST batch
    with pytest.raises(ValueError):
        pipeline.bootstrap_from_snapshot(spark, snapshot, lake,
                                         snapshot_gtid, batch_id="again")

    # catch-up from the very beginning: the ENTIRE first file overlaps
    # the snapshot; the watermark guard must drop it wholesale, then the
    # tail applies normally
    pre_version = lake.meta["version"]
    overlap = pipeline.replay_batch(spark, f0, lake,
                                    genlog.table_registry(), batch_id=1)
    assert overlap["buckets_rewritten"] == 0, \
        "full-overlap slice must commit as a no-op"
    assert lake.meta["version"] == pre_version

    pipeline.replay_batch(spark, frames, lake, genlog.table_registry(),
                          batch_id=2)
    want = {(repo, path):
            hashlib.sha256(row["content"].encode()).hexdigest()
            for (repo, path), row in result.final_state.items()}
    assert _sha_state(lake) == want
