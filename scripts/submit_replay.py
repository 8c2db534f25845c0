#!/usr/bin/env python
"""spark-submit entrypoint for the CDC replay job.

The north-rule deployment path: ship the package with --py-files and run
the same replay on a real cluster. Local-mode example (this sandbox):

    zip -qr /tmp/binlog_spark.zip binlog_spark
    spark-submit --master 'local[16]' --py-files /tmp/binlog_spark.zip \
        scripts/submit_replay.py --txns 4000 --workdir /dev/shm/submit_demo

Cluster shape (1000 executors): identical invocation with
--master yarn/k8s, the frames dir on object storage, and
spark.sql.shuffle.partitions sized to ~2-3x total cores; nothing in the
job is local-mode-specific (the lake manifest would move to an Iceberg
catalog — see operators/merge.py docstring).
"""

import argparse
import json
import os
import shutil
import sys
import time

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames-dir", help="existing frame parquet dir "
                    "(generated on the fly when omitted)")
    ap.add_argument("--txns", type=int, default=4000)
    ap.add_argument("--workdir", default="/tmp/binlog_submit")
    ap.add_argument("--n-buckets", type=int, default=32)
    args = ap.parse_args()

    # package is supplied via --py-files on a cluster; fall back to the
    # repo checkout for bare local runs
    try:
        from binlog_spark import genlog, pipeline
        from binlog_spark.operators.merge import LakeTable
    except ImportError:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from binlog_spark import genlog, pipeline
        from binlog_spark.operators.merge import LakeTable

    spark = (SparkSession.builder.appName("binlog-cdc-replay")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    os.makedirs(args.workdir, exist_ok=True)
    frames_dir = args.frames_dir
    result = None
    if frames_dir is None:
        gen = genlog.CdcWorldGenerator(seed=42, n_repos=200,
                                       paths_per_repo=80, txns_per_file=500)
        result = gen.generate(n_txns=args.txns)
        frames_dir = os.path.join(args.workdir, "frames")
        genlog.write_frames_parquet(result, frames_dir)

    lake_path = os.path.join(args.workdir, "lake")
    shutil.rmtree(lake_path, ignore_errors=True)
    LakeTable.create(spark, lake_path, columns=genlog.table_spec().col_names,
                     key_cols=list(genlog.KEY_COLS),
                     n_buckets=args.n_buckets)
    lake = LakeTable(spark, lake_path)

    frames = pipeline.read_frames(spark, frames_dir)
    t0 = time.perf_counter()
    stats = pipeline.replay_batch(spark, frames, lake,
                                  genlog.table_registry(), batch_id=0)
    dt = time.perf_counter() - t0

    out = {"seconds": round(dt, 2), "events_per_sec":
           round(stats["n_changes"] / dt, 1), **stats}
    if result is not None:
        expect = len(result.final_state)
        got = lake.to_df().count()
        out["final_rows"] = got
        out["final_rows_expected"] = expect
        assert got == expect, (got, expect)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
