"""Connected components (large-star/small-star) unit behavior."""

import pytest
from pyspark.sql import functions as F

from binlog_spark.operators import graph


def _labels(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = graph.connected_components(df, **kw)
    return {r.node: r.cluster for r in out.collect()}


def test_two_components_and_star_shape(spark):
    lab = _labels(spark, [(1, 2), (2, 3), (10, 11), (3, 1)])
    assert lab == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges_logarithmically(spark):
    # a 64-node path has diameter 63; the star algorithm must close it
    # well inside the 50-round guard (naive propagation would need ~63)
    chain = [(i, i + 1) for i in range(63)]
    lab = _labels(spark, chain, max_rounds=12)
    assert set(lab.values()) == {0}
    assert len(lab) == 64


def test_duplicate_reversed_and_self_edges(spark):
    lab = _labels(spark, [(5, 4), (4, 5), (4, 4), (5, 4), (7, 6)])
    assert lab == {4: 4, 5: 4, 6: 6, 7: 6}


def test_cluster_sizes(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (9, 8)], "src long, dst long")
    sized = graph.cluster_sizes(graph.connected_components(df))
    got = {(r.node, r.cluster, r.cluster_size) for r in sized.collect()}
    assert got == {(1, 1, 3), (2, 1, 3), (3, 1, 3), (8, 8, 2), (9, 8, 2)}


def test_max_rounds_guard(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(40)],
                               "src long, dst long")
    with pytest.raises(RuntimeError, match="no convergence"):
        graph.connected_components(df, max_rounds=1,
                                   local_finish_threshold=0)


def test_local_finisher_matches_distributed(spark):
    """The size-gated union-find finisher must produce EXACTLY the
    distributed rounds' labels, wherever the handoff happens."""
    import random

    rng = random.Random(11)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    df = spark.createDataFrame(edges, "src long, dst long")

    def labels(th):
        return {(r["node"], r["cluster"]) for r in
                graph.connected_components(
                    df, local_finish_threshold=th).collect()}

    want = labels(0)                      # fully distributed
    assert labels(1 << 17) == want        # finisher takes over at once
    assert labels(40) == want             # handoff after >=1 star round


def test_bfs_levels_keyed_matches_per_source_bfs(spark):
    # path 0-1-2-3-4 plus isolated pair 10-11; keyed run from sources
    # {0, 3, 10} must equal three independent bfs_levels sweeps
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)], "u long, v long")
    srcs = spark.createDataFrame(
        [(0, 0), (3, 3), (10, 10)], "skey long, node long")
    keyed = {(r.skey, r.node): r.level
             for r in graph.bfs_levels_keyed(edges, srcs, 8).collect()}
    for s in (0, 3, 10):
        one = spark.createDataFrame([(s,)], "node long")
        solo = {r.node: r.level
                for r in graph.bfs_levels(edges, one, 8).collect()}
        assert {n: l for (k, n), l in keyed.items() if k == s} == solo


def test_bfs_levels_keyed_round_cap(spark):
    # 6-node path, cap at 2 rounds: each source sees only radius 2
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "u long, v long")
    srcs = spark.createDataFrame([(0, 0)], "skey long, node long")
    out = {r.node: r.level
           for r in graph.bfs_levels_keyed(edges, srcs, 2).collect()}
    assert out == {0: 0, 1: 1, 2: 2}
