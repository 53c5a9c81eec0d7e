"""Round-4 additions: NaN-vs-NULL parity between the SQL prep UDTFs and the
DataFrame ops, null-ds tolerance in ts_stats_by, ts_r2 SQL UDF identity."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def _pairs(df, cols):
    """Collected (None-preserving) value tuples sorted by (id, ds)."""
    rows = sorted(df.select(*cols).collect(), key=lambda r: (r[0], r[1]))
    return [tuple(r[c] for c in cols) for r in rows]


def _same(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b


def assert_rows_equal(got, want, msg=""):
    assert len(got) == len(want), f"{msg}: {len(got)} vs {len(want)} rows"
    for ga, wa in zip(got, want):
        assert len(ga) == len(wa) and all(_same(x, y) for x, y in zip(ga, wa)), \
            f"{msg}: {ga} vs {wa}"


@pytest.fixture()
def nan_df(spark):
    nan = float("nan")
    rows = [
        # id 10: NULL and NaN mixed — fills must touch only the NULL
        (10, 1, 1.0), (10, 2, nan), (10, 3, None), (10, 4, 4.0),
        # id 11: NaN-only — drop_zeros must KEEP (NaN != 0 in Spark)
        (11, 1, nan), (11, 2, nan),
        # id 12: {2.0, NaN} — two distinct values, drop_constant keeps
        (12, 1, 2.0), (12, 2, nan),
        # id 13: all-NaN — one distinct value, drop_constant drops
        (13, 1, nan), (13, 2, nan), (13, 3, nan),
        # id 14: gappy by NULL only if NaN is a value (1/4 nulls)
        (14, 1, None), (14, 2, nan), (14, 3, 1.0), (14, 4, 2.0),
    ]
    df = spark.createDataFrame(rows, "id int, ds int, y double")
    df.createOrReplaceTempView("nanppv")
    return df


def test_prep_udtfs_nan_vs_null_fills(spark, nan_df):
    from anofox_forecast_spark.functions.sql import register_all
    from anofox_forecast_spark.operators import prep as P
    register_all(spark)
    for sql, want_df in [
        ("ts_fill_nulls_const_by(TABLE(nanppv), 'id', 'ds', 'y', '7.5')",
         P.ts_fill_nulls_const_by(nan_df, "id", "ds", "y", 7.5)),
        ("ts_fill_nulls_forward_by(TABLE(nanppv), 'id', 'ds', 'y')",
         P.ts_fill_nulls_forward_by(nan_df, "id", "ds", "y")),
        ("ts_fill_nulls_backward_by(TABLE(nanppv), 'id', 'ds', 'y')",
         P.ts_fill_nulls_backward_by(nan_df, "id", "ds", "y")),
        ("ts_fill_nulls_mean_by(TABLE(nanppv), 'id', 'ds', 'y')",
         P.ts_fill_nulls_mean_by(nan_df, "id", "ds", "y")),
        ("ts_interpolate_by(TABLE(nanppv), 'id', 'ds', 'y')",
         P.ts_interpolate_by(nan_df, "id", "ds", "y")),
    ]:
        got = _pairs(spark.sql(f"SELECT id, ds, filled_value FROM {sql}"),
                     ["id", "ds", "filled_value"])
        want = _pairs(want_df, ["id", "ds", "filled_value"])
        assert_rows_equal(got, want, sql)
    # the NaN value itself must survive as NaN (not get filled, not go NULL)
    got = dict(((i, d), v) for i, d, v in _pairs(
        spark.sql("SELECT id, ds, filled_value FROM ts_fill_nulls_const_by("
                  "TABLE(nanppv), 'id', 'ds', 'y', '7.5')"),
        ["id", "ds", "filled_value"]))
    assert math.isnan(got[(10, 2)]) and got[(10, 3)] == 7.5


def test_prep_udtfs_nan_vs_null_drops_and_diff(spark, nan_df):
    from anofox_forecast_spark.functions.sql import register_all
    from anofox_forecast_spark.operators import prep as P
    register_all(spark)
    for sql, want_df in [
        ("ts_drop_constant_by(TABLE(nanppv), 'id', 'ds', 'y')",
         P.ts_drop_constant_by(nan_df, "id", "y")),
        ("ts_drop_gappy_by(TABLE(nanppv), 'id', 'ds', 'y', '0.3')",
         P.ts_drop_gappy_by(nan_df, "id", "y", 0.3)),
        ("ts_drop_zeros_by(TABLE(nanppv), 'id', 'ds', 'y')",
         P.ts_drop_zeros_by(nan_df, "id", "y")),
    ]:
        got = _pairs(spark.sql(f"SELECT id, ds FROM {sql}"), ["id", "ds"])
        want = _pairs(want_df, ["id", "ds"])
        assert_rows_equal(got, want, sql)
    # semantics spot checks (would fail under the old NaN==missing UDTF):
    kept = {r[0] for r in _pairs(spark.sql(
        "SELECT id, ds FROM ts_drop_zeros_by(TABLE(nanppv), 'id', 'ds', 'y')"),
        ["id", "ds"])}
    assert 11 in kept                      # NaN-only series kept
    kept = {r[0] for r in _pairs(spark.sql(
        "SELECT id, ds FROM ts_drop_constant_by(TABLE(nanppv), 'id', 'ds', "
        "'y')"), ["id", "ds"])}
    assert 12 in kept and 13 not in kept   # {2, NaN} kept, all-NaN dropped
    kept = {r[0] for r in _pairs(spark.sql(
        "SELECT id, ds FROM ts_drop_gappy_by(TABLE(nanppv), 'id', 'ds', 'y',"
        " '0.3')"), ["id", "ds"])}
    assert 14 in kept                      # 1/4 NULLs, NaN not a gap
    # diff: NULL operand -> NULL, NaN operand -> NaN
    got = _pairs(spark.sql("SELECT id, ds, diff_value FROM ts_diff_by("
                           "TABLE(nanppv), 'id', 'ds', 'y', '1')"),
                 ["id", "ds", "diff_value"])
    want = _pairs(P.ts_diff_by(nan_df, "id", "ds", "y", 1),
                  ["id", "ds", "diff_value"])
    assert_rows_equal(got, want, "ts_diff_by")
    d = dict(((i, ds), v) for i, ds, v in got)
    assert math.isnan(d[(10, 2)]) and d[(10, 3)] is None


def test_stats_by_tolerates_null_ds(spark):
    from anofox_forecast_spark.operators.stats import ts_stats_by
    rows = [(1, "2024-01-0%d" % d, float(d)) for d in range(1, 8)]
    rows.append((1, None, 99.0))
    df = spark.createDataFrame(rows, "id int, ds string, y double") \
              .select("id", F.col("ds").cast("timestamp").alias("ds"), "y")
    out = ts_stats_by(df, "id", "ds", "y", "1d").collect()
    assert len(out) == 1
    r = out[0]
    assert r["length"] == 8 and r["max"] == 99.0
    # gap stats derive from the 7 valid dates
    assert r["n_gaps"] == 0 and r["expected_length"] == 7


def test_ts_r2_sql_udf_identity(spark):
    # the one-pass sum-of-squares rewrite must agree with the DataFrame form
    from anofox_forecast_spark.functions import metrics as MM
    from anofox_forecast_spark.functions.sql import register_all
    register_all(spark)
    rows = [([1.0, 2.0, 3.0, 4.0], [1.1, 1.9, 3.2, 3.8]),
            ([5.0, 5.0, 5.0], [5.0, 4.0, 6.0]),      # constant actual -> NaN
            ([100.5, 101.5, 99.5, 100.0], [100.0, 101.0, 100.0, 100.2])]
    df = spark.createDataFrame(rows, "a array<double>, f array<double>")
    df.createOrReplaceTempView("r2v")
    sql_out = [r[0] for r in spark.sql(
        "SELECT ts_r2(a, f) FROM r2v").collect()]
    col_out = [r[0] for r in
               df.select(MM.ts_r2(F.col("a"), F.col("f"))).collect()]
    for s, c in zip(sql_out, col_out):
        if math.isnan(c):
            assert math.isnan(s)
        else:
            np.testing.assert_allclose(s, c, rtol=1e-9)


# ---------------------------------------------------------------------------
# True multiplicative-error ETS (round-4 VERDICT item 5)
# ---------------------------------------------------------------------------

def _mult_series(n=120, m=7, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    level = 100.0 * np.exp(0.004 * t)
    seas = 1.0 + 0.25 * np.sin(2 * np.pi * t / m)
    return level * seas * np.exp(rng.normal(0, 0.02, n))


def test_ets_m_spec_distinct_from_a_twin():
    from anofox_forecast_spark.functions import models as M
    y = _mult_series()
    rm = M.forecast(y, 7, "ETS", season_length=7, params={"model": "MAM"})
    ra = M.forecast(y, 7, "ETS", season_length=7, params={"model": "AAA"})
    assert rm.params["spec"] == "MAM" and ra.params["spec"] == "AAA"
    # genuinely different models now, not an alias
    assert not np.allclose(rm.point, ra.point)
    # relative-error intervals scale with the level
    w = np.asarray(rm.upper) - np.asarray(rm.lower)
    assert np.all(w > 0) and np.all(np.isfinite(rm.point))
    # MNN differs from its additive twin too
    r_mnn = M.forecast(y, 7, "ETS", params={"model": "MNN"})
    r_ann = M.forecast(y, 7, "ETS", params={"model": "ANN"})
    assert abs(r_mnn.point[0] - r_ann.point[0]) > 1e-9 or \
        not np.allclose(r_mnn.lower, r_ann.lower)


def test_ets_m_spec_requires_positive_series():
    from anofox_forecast_spark.functions import models as M
    y = np.array([5.0, 3.0, 0.0, 4.0, 6.0, 2.0, 1.0, 3.0])
    with pytest.raises(ValueError, match="positive"):
        M.forecast(y, 3, "ETS", params={"model": "MNN"})


def test_auto_ets_pool_includes_m_specs_on_positive_series():
    from anofox_forecast_spark.functions import models as M
    y = _mult_series()
    r = M.forecast(y, 7, "AutoETS", season_length=7)
    assert r.params["spec"] in {"ANN", "AAN", "AAdN", "ANA", "AAA", "AAdA",
                                "MNN", "MAN", "MNM", "MAM"}
    assert np.all(np.isfinite(r.point))
    # a non-positive series must never select an M spec
    y2 = np.concatenate([y[:60], [0.0], y[60:]])
    r2 = M.forecast(y2, 7, "AutoETS", season_length=7)
    assert not r2.params["spec"].startswith("M")


def test_ets_mam_beats_aaa_on_multiplicative_data():
    from anofox_forecast_spark.functions import models as M
    # strong multiplicative structure, long horizon: the M,*,M state space
    # should fit at least comparably in-sample
    y = _mult_series(n=150)
    train, test = y[:136], y[136:]
    pm = M.forecast(train, 14, "ETS", season_length=7,
                    params={"model": "MAM"}).point
    pa = M.forecast(train, 14, "ETS", season_length=7,
                    params={"model": "AAA"}).point
    mae_m = float(np.mean(np.abs(test - pm)))
    mae_a = float(np.mean(np.abs(test - pa)))
    assert mae_m <= mae_a * 1.5, (mae_m, mae_a)
