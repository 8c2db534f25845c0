"""Blocked (BLAS + exact-refine) k-means assignment == the loop kernel,
assignment for assignment and distance for distance — the r3 VERDICT #5
done-criterion (k=256), plus adversarial tie geometry and the semdedup
routing."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlog_spark.operators import similarity  # noqa: E402


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(vecs)],
        "vec_id long, embedding array<double>")


def _collect(df):
    return {r["vec_id"]: (r["cluster"], r["dist"]) for r in df.collect()}


def test_blocked_equals_loop_k256(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(3000, 24)).astype(np.float32)
    df = _df(spark, vecs)
    loop = _collect(similarity.kmeans_assign(df, k=256, method="loop"))
    blocked = _collect(similarity.kmeans_assign(df, k=256,
                                                method="blocked"))
    assert loop == blocked


def test_blocked_equals_loop_tie_geometry(spark):
    """Vectors equidistant to several centroids: the refine must keep the
    loop's smaller-j tie-break. Seed partition vec_id % k puts mirrored
    point pairs into symmetric centroids, forcing exact distance ties."""
    # 4 points per axis-symmetric pair → centroids mirror; midpoints tie
    base = np.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]])
    vecs = np.concatenate([np.tile(base, (8, 1)),
                           np.zeros((16, 2))])  # origin: ties everywhere
    df = _df(spark, vecs)
    loop = _collect(similarity.kmeans_assign(df, k=4, method="loop"))
    blocked = _collect(similarity.kmeans_assign(df, k=4, method="blocked"))
    assert loop == blocked


def test_auto_routes_by_k(spark):
    rng = np.random.default_rng(3)
    df = _df(spark, rng.normal(size=(200, 8)).astype(np.float32))
    # auto == loop at small k, auto == blocked above the threshold;
    # both equalities are vacuous unless the kernels themselves agree,
    # so assert against both named methods
    a_small = _collect(similarity.kmeans_assign(df, k=8, method="auto"))
    assert a_small == _collect(similarity.kmeans_assign(df, k=8,
                                                        method="loop"))
    a_big = _collect(similarity.kmeans_assign(df, k=100, method="auto"))
    assert a_big == _collect(similarity.kmeans_assign(df, k=100,
                                                      method="loop"))


def test_bad_method_rejected(spark):
    df = _df(spark, np.zeros((4, 2)))
    with pytest.raises(ValueError, match="method"):
        similarity.kmeans_assign(df, k=2, method="nope")
