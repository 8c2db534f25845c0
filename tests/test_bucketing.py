"""Bucketed co-located join: plan-shape + result parity.

Writes orders and lineitem bucketed by the join key into a scratch
database, then proves the join (a) produces exactly the rows of the
plain shuffled join and (b) plans with ZERO Exchange operators — the
layout that makes recurring fact-to-fact joins shuffle-free at 100 TB.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlog_spark import plans  # noqa: E402
from binlog_spark.operators import bucketing  # noqa: E402

DB = "bucketing_test"


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("warehouse"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB} LOCATION '{loc}'")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    bucketing.write_bucketed(orders, f"{DB}.orders_b", "o_orderkey")
    bucketing.write_bucketed(li, f"{DB}.lineitem_b", "l_orderkey")
    yield orders, li
    spark.sql(f"DROP DATABASE {DB} CASCADE")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketing.bucketed_join(
            spark, f"{DB}.orders_b", f"{DB}.lineitem_b",
            "o_orderkey", "l_orderkey")
        plan = plans.physical_plan(j)
        assert plans.count_shuffles(j) == 0, plan
        assert "SortMergeJoin" in plan, plan
        # bucket metadata reached the scan
        assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    orders, li = bucketed_tables
    j = bucketing.bucketed_join(
        spark, f"{DB}.orders_b", f"{DB}.lineitem_b",
        "o_orderkey", "l_orderkey")
    got = (j.groupBy("o_orderkey")
           .agg(F.count("*").alias("n"),
                F.round(F.sum(F.col("l_extendedprice")
                              .cast("decimal(18,2)")).cast("double"), 2)
                .alias("total")))
    want = (orders.join(li, orders.o_orderkey == li.l_orderkey)
            .groupBy("o_orderkey")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum(F.col("l_extendedprice")
                               .cast("decimal(18,2)")).cast("double"), 2)
                 .alias("total")))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
