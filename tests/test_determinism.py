"""Round-4b determinism utilities: the fold-order helpers that make numpy
optimizer objectives bit-identical to their DuckDB oracle replays."""
import math

import duckdb
import numpy as np

from anofox_forecast_spark.functions.models import (
    _linfit, _seq_sum, _sq_err, _log_abs_sum)
from anofox_forecast_spark.operators.similarity import _kmeans_lite


def test_seq_sum_matches_duckdb_fold_order():
    rng = np.random.default_rng(11)
    v = rng.normal(0, 1e3, 5000)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT ? AS l", [v.tolist()])
    agg = con.execute("SELECT list_aggregate(l, 'sum') FROM t").fetchone()[0]
    assert _seq_sum(v) == agg  # bit-identical, not just close
    # np.sum's pairwise order genuinely differs on long mixed-sign input
    assert _seq_sum(v) != float(np.sum(v)) or len(v) < 16


def test_sq_err_skips_nans_sequentially():
    r = np.array([1.0, np.nan, -2.0, 3.0])
    assert _sq_err(r) == ((0.0 + 1.0) + 4.0) + 9.0


def test_linfit_matches_explicit_sums_formula():
    rng = np.random.default_rng(7)
    x = rng.normal(50, 20, 333)
    b1, b0 = _linfit(x)
    n = len(x)
    st = float(n * (n - 1) // 2)
    st2 = float((n - 1) * n * (2 * n - 1) // 6)
    t = np.arange(n, dtype=float)
    sv, stv = _seq_sum(x), _seq_sum(t * x)
    assert b1 == (n * stv - st * sv) / (n * st2 - st * st)
    assert b0 == (sv - b1 * st) / n
    # and it is a real least-squares fit (vs polyfit to 1e-9)
    pb1, pb0 = np.polyfit(t, x, 1)
    assert abs(b1 - pb1) < 1e-9 and abs(b0 - pb0) < 1e-6


def test_log_abs_sum_matches_duckdb_ln_fold():
    rng = np.random.default_rng(3)
    v = np.abs(rng.normal(10, 40, 2000)) + 1e-6
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT ? AS l", [v.tolist()])
    duck = con.execute(
        "SELECT list_aggregate(list_transform(l, x -> ln(abs(x))), 'sum') "
        "FROM t").fetchone()[0]
    assert _log_abs_sum(v) == duck  # glibc log on both sides


def test_kmeans_spread_init_is_deterministic_and_layout_free():
    rng = np.random.default_rng(5)
    X = rng.normal(0, 1, (200, 16))
    a = _kmeans_lite(X, 8)
    b = _kmeans_lite(X.copy(), 8)
    assert np.array_equal(a, b)
    # seeds are evenly-spaced rows of the input, so no RNG state is involved
    assert a.shape == (8, 16)
    c = _kmeans_lite(X, 8, init="random")
    assert c.shape == (8, 16)  # the seeded-PCG path still works


def test_kmeans_distance_sums_are_sequential():
    # one point, one centroid: distance must accumulate dims left-to-right
    X = np.array([[1e16, 1.0, -1e16, 3.0]])
    C0 = np.zeros((1, 4))
    d = np.cumsum((X[:, None, :] - C0[None, :, :]) ** 2, axis=2)[:, :, -1]
    s = 0.0
    for v in X[0]:
        s += v * v
    assert d[0, 0] == s
