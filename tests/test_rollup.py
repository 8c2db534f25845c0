"""Incremental rollup (continuous aggregate): batch-wise == one-shot,
exactly-once under re-delivery, bucket-pruned rewrites."""

import os

from pyspark.sql import functions as F

from binlog_spark.operators.rollup import RollupTable


def _events(spark, sf_dir):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return ev.withColumn(
        "hour", F.date_format(F.date_trunc("hour", "ts"),
                              "yyyy-MM-dd HH:mm:ss"))


def _oneshot(ev):
    return {tuple(r) for r in
            (ev.groupBy("hour", "event_type")
             .agg(F.count("*").alias("n"),
                  F.sum(F.col("value").cast("decimal(28,6)")).alias("s"),
                  F.min(F.col("value").cast("double")).alias("mn"),
                  F.max(F.col("value").cast("double")).alias("mx"))
             ).collect()}


def test_incremental_equals_oneshot_and_replay_noop(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    rt = RollupTable.create(spark, str(tmp_path / "ru"),
                            ["hour", "event_type"], n_buckets=4)
    batches = [ev.where(F.pmod("event_id", F.lit(3)) == i)
               .select("hour", "event_type", "value") for i in range(3)]
    for i, b in enumerate(batches):
        stats = rt.apply_batch(b, "value", batch_id=i)
        assert not stats["skipped"]

    # crash replay of batch 1: additive state must NOT double-count
    stats = rt.apply_batch(batches[1], "value", batch_id=1)
    assert stats["skipped"]

    got = {tuple(r) for r in rt.to_df().collect()}
    assert got == _oneshot(ev)


def test_rollup_rewrites_only_touched_buckets(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    rt = RollupTable.create(spark, str(tmp_path / "ru2"),
                            ["hour", "event_type"], n_buckets=64)
    rt.apply_batch(ev.select("hour", "event_type", "value"), "value",
                   batch_id=0)
    before = {(r["hour"], r["event_type"]): r["n_rows"]
              for r in rt.to_df().collect()}
    # a batch touching ONE group must rewrite far fewer than 64 buckets
    one_row = ev.orderBy("event_id").limit(1) \
        .select("hour", "event_type", "value")
    key = tuple(one_row.collect()[0])[:2]
    stats = rt.apply_batch(one_row, "value", batch_id=1)
    assert stats["buckets_rewritten"] == 1
    after = {(r["hour"], r["event_type"]): r["n_rows"]
             for r in rt.to_df().collect()}
    assert after[key] == before[key] + 1
    for k, n in before.items():  # untouched groups byte-identical
        if k != key:
            assert after[k] == n


def test_compaction_folds_deltas_and_preserves_values(spark, sf_dir,
                                                      tmp_path):
    """Merge-on-read layers fold back into the base at compact_every;
    values identical before/after, reads stop paying the merge groupBy."""
    ev = _events(spark, sf_dir)
    rt = RollupTable.create(spark, str(tmp_path / "ru3"),
                            ["hour", "event_type"], n_buckets=4,
                            compact_every=3)
    batches = [ev.where(F.pmod("event_id", F.lit(4)) == i)
               .select("hour", "event_type", "value") for i in range(4)]
    rt.apply_batch(batches[0], "value", batch_id=0)
    rt.apply_batch(batches[1], "value", batch_id=1)
    assert len(rt.meta["deltas"]) == 2
    rt.apply_batch(batches[2], "value", batch_id=2)  # triggers compaction
    assert rt.meta["deltas"] == []
    assert rt.meta["buckets"]  # base now holds the folded layers
    rt.apply_batch(batches[3], "value", batch_id=3)  # one fresh delta
    assert len(rt.meta["deltas"]) == 1
    got = {tuple(r) for r in rt.to_df().collect()}
    assert got == _oneshot(ev)
    # explicit compaction of the remaining layer: same values, no deltas
    rt.compact()
    assert rt.meta["deltas"] == []
    assert {tuple(r) for r in rt.to_df().collect()} == _oneshot(ev)
