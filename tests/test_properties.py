"""Property tests for the invariants the reference asserts in its own suite
(SURVEY.md §5.1: parallel==serial, type preservation, fold non-overlap,
conformal coverage) plus numeric invariants of the model library.

Hypothesis drives the numpy layer (fast, thousands of cases); Spark-level
invariants use fixed panels (one case ≈ one Spark job)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from anofox_forecast_spark.frequency import parse_frequency
from anofox_forecast_spark.functions import models as M
from anofox_forecast_spark.sources import lineitem_panel
from tests.conftest import SF_DIR

# ---------------------------------------------------------------------------
# numpy layer (hypothesis)
# ---------------------------------------------------------------------------

series = st.lists(st.floats(min_value=-1e6, max_value=1e6,
                            allow_nan=False, allow_infinity=False),
                  min_size=10, max_size=200)


@given(series)
@settings(max_examples=200, deadline=None)
def test_deterministic_models_bound_point_by_interval(y):
    for model in ["Naive", "RandomWalkDrift", "SES", "Theta", "CrostonClassic"]:
        r = M.forecast(y, 5, model, params={"alpha": 0.3} if model == "SES" else {})
        assert len(r.point) == len(r.lower) == len(r.upper) == 5
        assert np.all(np.isfinite(r.point))
        assert np.all(r.lower <= r.point + 1e-9)
        assert np.all(r.point <= r.upper + 1e-9)


@given(series)
@settings(max_examples=100, deadline=None)
def test_forecast_deterministic_rerun(y):
    a = M.forecast(y, 7, "SESOptimized")
    b = M.forecast(y, 7, "SESOptimized")
    np.testing.assert_array_equal(a.point, b.point)
    np.testing.assert_array_equal(a.upper, b.upper)


@given(st.lists(st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
                min_size=3, max_size=100).filter(
                    lambda v: sum(1 for x in v if x == x) >= 3))
@settings(max_examples=200, deadline=None)
def test_interpolate_nulls_preserves_valid_and_kills_nan(y):
    arr = np.asarray(y, dtype=float)
    arr[::4] = np.nan  # punch holes
    if np.sum(np.isfinite(arr)) < 1:
        return
    out = M.interpolate_nulls(arr)
    assert not np.any(np.isnan(out))
    mask = np.isfinite(arr)
    np.testing.assert_array_equal(out[mask], arr[mask])


@given(st.integers(min_value=1, max_value=999),
       st.sampled_from(["s", "m", "h", "d", "w", "mo", "q", "y"]))
@settings(max_examples=200, deadline=None)
def test_frequency_grammar_total(n, unit):
    f = parse_frequency(f"{n}{unit}")
    assert f.n > 0
    assert f.kind in ("fixed", "month")
    if unit in ("mo", "q", "y"):
        assert f.kind == "month"


@given(st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False),
                min_size=5, max_size=300),
       st.floats(min_value=0.01, max_value=0.5))
@settings(max_examples=200, deadline=None)
def test_conformal_quantile_dominates_1_minus_alpha_coverage(res, alpha):
    """Finite-sample corrected quantile must cover ≥ (1-α) of the
    calibration residuals — the split-conformal guarantee."""
    r = np.abs(np.asarray(res))
    n = len(r)
    level = min(max(np.ceil((n + 1) * (1 - alpha)) / n, 0.0), 1.0)
    q = np.quantile(np.sort(r), level, method="linear")
    coverage = np.mean(r <= q + 1e-12)
    assert coverage >= 1 - alpha - 1e-9


# ---------------------------------------------------------------------------
# Spark layer (fixed panels)
# ---------------------------------------------------------------------------

def test_type_and_name_preservation(spark):
    """Ref ts_type_preservation.test: caller's group/date column names and
    types pass through every operator."""
    from anofox_forecast_spark.operators.forecast import ts_forecast_by
    from anofox_forecast_spark.operators.prep import ts_fill_gaps_by
    panel = (lineitem_panel(spark, SF_DIR)
             .withColumnRenamed("id", "store_key")
             .withColumnRenamed("ds", "sale_date")
             .withColumnRenamed("y", "qty")
             .withColumn("store_key", F.col("store_key").cast("int")))
    fc = ts_forecast_by(panel, "store_key", "sale_date", "qty", "Naive", 3, "1d")
    assert fc.schema["store_key"].dataType.simpleString() == "int"
    assert "sale_date" in fc.columns
    fg = ts_fill_gaps_by(panel, "store_key", "sale_date", "qty", "1d")
    assert set(fg.columns) == {"store_key", "sale_date", "qty"}
    assert fg.schema["store_key"].dataType.simpleString() == "int"


def test_cv_folds_no_overlap_and_order(spark):
    """Ref fold semantics: per (group, fold), every train position precedes
    every test position and the sets are disjoint."""
    from anofox_forecast_spark.operators.cv import ts_cv_folds_by
    folds = ts_cv_folds_by(lineitem_panel(spark, SF_DIR), "id", "ds", "y", 3, 7)
    agg = (folds.groupBy("id", "fold_id", "split")
           .agg(F.min("ds").alias("mn"), F.max("ds").alias("mx"),
                F.count(F.lit(1)).alias("n"))
           .groupBy("id", "fold_id")
           .pivot("split", ["train", "test"])
           .agg(F.first("mn").alias("mn"), F.first("mx").alias("mx"),
                F.first("n").alias("n")))
    bad = agg.filter(~(F.col("train_mx") < F.col("test_mn"))).count()
    assert bad == 0
    too_big = agg.filter(F.col("test_n") > 7).count()
    assert too_big == 0


def test_expanding_folds_nested(spark):
    """Expanding windows: fold k's train set is a superset of fold k-1's."""
    from anofox_forecast_spark.operators.cv import ts_cv_folds_by
    folds = ts_cv_folds_by(lineitem_panel(spark, SF_DIR), "id", "ds", "y", 3, 7)
    tr = (folds.filter(F.col("split") == "train")
          .groupBy("id", "fold_id").agg(F.count(F.lit(1)).alias("n"),
                                        F.min("ds").alias("mn")))
    w = tr.groupBy("id").agg(
        F.min(F.col("mn")).alias("global_mn"),
        F.count_distinct("mn").alias("n_starts"))
    # expanding → every fold starts at the same first timestamp
    assert w.filter(F.col("n_starts") != 1).count() == 0


def test_conformal_empirical_coverage_on_calibration(spark):
    """Coverage of split-conformal intervals on the calibration data itself
    must be ≥ 1-α (finite-sample guarantee)."""
    from anofox_forecast_spark.operators.conformal import (
        ts_conformal_by, ts_conformal_coverage_by)
    from pyspark.sql import Window
    panel = lineitem_panel(spark, SF_DIR)
    w = Window.partitionBy("id").orderBy("ds")
    fv = (panel.withColumn("forecast", F.lag("y", 7).over(w))
          .filter(F.col("forecast").isNotNull())
          .withColumnRenamed("y", "actual"))
    alpha = 0.2
    prof = ts_conformal_by(fv, "id", "actual", "forecast", "forecast",
                           {"alpha": alpha}).select("id", "conformity_score")
    j = fv.join(prof, "id") \
          .withColumn("lower", F.col("forecast") - F.col("conformity_score")) \
          .withColumn("upper", F.col("forecast") + F.col("conformity_score"))
    cov = ts_conformal_coverage_by(j, "id", "actual", "lower", "upper")
    low = cov.filter(F.col("coverage") < 1 - alpha - 1e-9).count()
    assert low == 0


def test_conformal_score_np_equals_sql_quantile(spark):
    """The streaming replica (conformal_score_np) and the Column fn
    (ts_conformal_quantile) are expression-identical — property-checked
    over random residual arrays of every small size."""
    import numpy as np
    from pyspark.sql import functions as F

    from anofox_forecast_spark.operators.conformal import (
        conformal_score_np,
        ts_conformal_quantile,
    )
    rng = np.random.default_rng(17)
    cases = [rng.normal(0, 5, n).tolist()
             for n in [1, 2, 3, 5, 8, 13, 50, 101]]
    for alpha in (0.05, 0.1, 0.25):
        df = spark.createDataFrame([(c,) for c in cases], "r array<double>")
        got = [r["q"] for r in df.select(
            ts_conformal_quantile(F.col("r"), alpha).alias("q")).collect()]
        want = [conformal_score_np(c, alpha) for c in cases]
        assert got == want, f"alpha={alpha}"


def test_cramer_sql_matches_numpy_solve(spark):
    """regression.cramer_sql: the shared Cramer text solves random
    well-conditioned normal systems to numpy accuracy, dims 2-5."""
    import numpy as np

    from anofox_forecast_spark.operators.regression import cramer_sql
    rng = np.random.default_rng(23)
    for dim in (2, 3, 4, 5):
        X = rng.normal(0, 1, (40, dim))
        A = X.T @ X + np.eye(dim)  # well-conditioned SPD
        b = rng.normal(0, 1, dim)
        cols, vals = [], {}
        amat = [[f"a_{r}_{c}" for c in range(dim)] for r in range(dim)]
        for r in range(dim):
            for c in range(dim):
                vals[f"a_{r}_{c}"] = float(A[r, c])
            vals[f"b_{r}"] = float(b[r])
        exprs = cramer_sql(amat, [f"b_{r}" for r in range(dim)])
        row = spark.createDataFrame([vals]).selectExpr(
            *[f"{e} AS x{i}" for i, e in enumerate(exprs)]).collect()[0]
        want = np.linalg.solve(A, b)
        got = np.array([row[f"x{i}"] for i in range(dim)])
        np.testing.assert_allclose(got, want, rtol=1e-8)
