"""Bucketed (co-located) join support.

At 100 TB the dominant cost of a repeated big-big equi-join is the
shuffle of both sides. Spark's bucketing removes it: write each table
``bucketBy(n, key)`` (+ ``sortBy`` for sort-merge readiness) and every
subsequent join on that key reads bucket i against bucket i directly —
no Exchange, no Sort, in ANY number of later jobs. This is the standard
layout for fact-to-fact joins that recur (the reference engine, being a
single-node stream parser, has no analogue; this is pure Spark-side
capability the lake layer needs).

The bucket count must match on both sides (or divide evenly with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) and
``spark.sql.sources.bucketing.enabled`` must stay on (default).
Plan-shape guarantee is machine-checked in tests/test_bucketing.py:
the bucketed join's physical plan contains ZERO Exchange operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, name: str, key: str,
                   buckets: int = 8) -> None:
    """Persist ``df`` as a bucketed+sorted managed table (parquet)."""
    (df.write.format("parquet").mode("overwrite")
     .bucketBy(buckets, key).sortBy(key).saveAsTable(name))


def bucketed_join(spark: SparkSession, left: str, right: str,
                  left_key: str, right_key: str) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys; with both
    sides bucketed and sorted this plans as a zero-shuffle, zero-sort
    sort-merge join."""
    lt, rt = spark.table(left), spark.table(right)
    return lt.join(rt, lt[left_key] == rt[right_key])
