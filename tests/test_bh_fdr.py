"""Unit checks for agg_bh_fdr_hourly's building blocks that need no
Spark session: the Abramowitz–Stegun erfc kernel both engines share,
and the integer-grid Benjamini–Hochberg step-up rule."""

import math

import duckdb

from binlog_spark.queries import _AS_A, _AS_P, _erfc_expr_sql


def _erfc_as(x: float) -> float:
    t = 1.0 / (1.0 + _AS_P * x)
    poly = sum(a * t ** (k + 1) for k, a in enumerate(_AS_A))
    return poly * math.exp(-x * x)


def test_as_erfc_accuracy():
    # A-S 7.1.26 promises |erf error| <= 1.5e-7 on x >= 0
    for i in range(0, 500):
        x = i / 100.0
        assert abs(_erfc_as(x) - math.erfc(x)) < 1.6e-7, x


def test_sql_erfc_matches_python_kernel():
    con = duckdb.connect()
    for i in range(0, 50):
        x = i / 10.0
        got = con.execute(
            f"SELECT {_erfc_expr_sql(repr(x))}").fetchone()[0]
        # identical literals + IEEE arithmetic: agreement far below the
        # 1e-9 quantization grid of the query
        assert abs(got - _erfc_as(x)) < 1e-12, x


def test_bh_integer_stepup_matches_float_rule():
    # pq*m*20 <= i*1e9  must reproduce  p_(i) <= i*0.05/m on the grid
    m = 120
    ps = [0.0001, 0.0004, 0.002, 0.01, 0.04, 0.2, 0.5, 0.9]
    pqs = [math.floor(p * 1e9) for p in ps]
    for i, (p, pq) in enumerate(zip(ps, pqs), start=1):
        int_hit = pq * m * 20 <= i * 1_000_000_000
        float_hit = (pq / 1e9) <= i * 0.05 / m
        assert int_hit == float_hit, (i, p)
