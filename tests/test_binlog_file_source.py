"""Raw binlog-file source (sources/binlog_file.py): files round-trip
byte-exactly through write→read, the splitter rejects corruption, and a
full replay from raw files converges to the generator's final state."""

import hashlib
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlog_spark import genlog, pipeline  # noqa: E402
from binlog_spark.operators.merge import LakeTable  # noqa: E402
from binlog_spark.sources import binlog_file  # noqa: E402


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    gen = genlog.CdcWorldGenerator(seed=31, n_repos=10, paths_per_repo=12,
                                   txns_per_file=40)
    result = gen.generate(n_txns=90)
    d = str(tmp_path_factory.mktemp("rawlogs"))
    binlog_file.write_binlog_files(result, d)
    return result, d


def test_frames_round_trip_byte_exact(spark, world):
    result, d = world
    got = {(r["file"], r["pos"]): (r["etype"], bytes(r["frame"]))
           for r in binlog_file.read_binlog_files(spark, d).collect()}
    want = {(f, p): (et, fr) for f, p, et, fr in result.frames}
    assert got == want


def test_splitter_rejects_corruption(world):
    _, d = world
    name = sorted(os.listdir(d))[0]
    with open(os.path.join(d, name), "rb") as f:
        buf = f.read()
    with pytest.raises(ValueError, match="magic"):
        binlog_file.split_binlog_blob(name, b"XXXX" + buf[4:])
    with pytest.raises(ValueError, match="truncated|bad event_length"):
        binlog_file.split_binlog_blob(name, buf[:-5])


def test_replay_from_raw_files_matches_generator(spark, world, tmp_path):
    result, d = world
    lake = LakeTable.create(spark, str(tmp_path / "lake_raw"),
                            columns=genlog.table_spec().col_names,
                            key_cols=list(genlog.KEY_COLS), n_buckets=4)
    frames = binlog_file.read_binlog_files(spark, d)
    pipeline.replay_batch(spark, frames, lake, genlog.table_registry(),
                          batch_id=0, record_lineage=False)
    got = {(r["repo"], r["path"]):
           hashlib.sha256(r["content"].encode()).hexdigest()
           for r in lake.to_df().collect()}
    want = {(repo, path):
            hashlib.sha256(row["content"].encode()).hexdigest()
            for (repo, path), row in result.final_state.items()}
    assert got == want
