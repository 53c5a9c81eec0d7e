"""Unit tests for the operators whose COVERAGE.md gate is `test`:
single-series forms, conformal learn/apply + asymmetric, calendar clamping,
feature subsets, peak timing, metrics array forms."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from anofox_forecast_spark.functions import models as M
from anofox_forecast_spark.functions.metrics import ts_mqloss
from anofox_forecast_spark.operators import (
    ts_conformal_apply_profile,
    ts_conformal_by,
    ts_conformal_learn_by,
    ts_estimate_backtest_memory,
    ts_features_by,
    ts_features_list,
    ts_forecast,
    ts_validate_timestamps_summary_by,
)
from anofox_forecast_spark.operators.detect import ts_analyze_peak_timing_by
from anofox_forecast_spark.operators.forecast import _add_months_clamped
from anofox_forecast_spark.sources import lineitem_panel
from tests.conftest import SF_DIR


def _panel(spark):
    return lineitem_panel(spark, SF_DIR)


def test_single_series_forecast_arrays(spark):
    one = _panel(spark).filter(F.col("id") == 1)
    row = ts_forecast(one, "ds", "y", "Naive", 5).first()
    assert len(row["point_forecasts"]) == 5
    assert len(row["lower"]) == 5 and len(row["upper"]) == 5
    assert row["model_name"] == "Naive"
    assert all(l <= p <= u for l, p, u in
               zip(row["lower"], row["point_forecasts"], row["upper"]))


def test_calendar_month_end_clamping():
    # Jan 31 + 1mo → Feb 28 (ref ts_forecast_native.cpp:683-715)
    assert _add_months_clamped(pd.Timestamp("2023-01-31"), 1) == \
        pd.Timestamp("2023-02-28")
    assert _add_months_clamped(pd.Timestamp("2024-01-31"), 1) == \
        pd.Timestamp("2024-02-29")  # leap year
    assert _add_months_clamped(pd.Timestamp("2023-01-31"), 2) == \
        pd.Timestamp("2023-03-31")
    assert _add_months_clamped(pd.Timestamp("2023-11-30"), 3) == \
        pd.Timestamp("2024-02-29")


def test_features_subset_and_list(spark):
    out = ts_features_by(_panel(spark), "id", "ds", "y",
                         features=["mean", "variance", "abs_energy"])
    assert set(out.columns) == {"id", "mean", "variance", "abs_energy"}
    with pytest.raises(ValueError, match="unknown features"):
        ts_features_by(_panel(spark), "id", "ds", "y", features=["nope"])
    names = ts_features_list(spark)
    assert names.count() >= 100


def test_conformal_learn_apply_roundtrip(spark):
    fv = (_panel(spark)
          .withColumn("forecast", F.col("y") + 2.0)
          .withColumnRenamed("y", "actual"))
    prof = ts_conformal_learn_by(fv, "id", "actual", "forecast",
                                 method="absolute", alphas=[0.1])
    assert set(prof.columns) == {"id", "method", "alphas", "scores",
                                 "n_residuals"}
    # |residual| is constant 2.0 → corrected quantile is exactly 2.0
    scores = [r["scores"][0] for r in prof.collect()]
    assert all(abs(s - 2.0) < 1e-9 for s in scores)
    applied = ts_conformal_apply_profile(
        fv.select("id", "forecast"), prof, "id", "forecast")
    row = applied.first()
    assert abs((row["forecast"] - row["lower"]) - 2.0) < 1e-9
    assert abs((row["upper"] - row["forecast"]) - 2.0) < 1e-9


def test_conformal_asymmetric(spark):
    fv = (_panel(spark)
          .withColumn("forecast", F.col("y") - 3.0)  # always under-forecast
          .withColumnRenamed("y", "actual"))
    out = ts_conformal_by(fv, "id", "actual", "forecast", "forecast",
                          {"alpha": 0.1, "method": "asymmetric"}).first()
    assert out["method"] == "asymmetric_conformal"
    # all residuals +3 → upper widens by 3, lower by 0
    assert abs((out["upper"][0] - out["point"][0]) - 3.0) < 1e-9
    assert abs(out["point"][0] - out["lower"][0]) < 1e-9


def test_peak_timing(spark):
    out = ts_analyze_peak_timing_by(_panel(spark), "id", "ds", "y", 7)
    row = out.first()
    assert row["timing_classification"] is not None
    assert out.count() == _panel(spark).select("id").distinct().count()


def test_validate_timestamps_summary(spark):
    out = ts_validate_timestamps_summary_by(
        _panel(spark), "id", "ds", ["1998-01-01", "1998-01-02"])
    row = out.first()
    assert row["n_groups"] > 0
    assert row["n_valid_groups"] + row["n_invalid_groups"] == row["n_groups"]


def test_estimate_backtest_memory():
    est = ts_estimate_backtest_memory(10_000, 100, 5, 7)
    assert est["bytes_per_group"] == 100 * 16 * 6
    assert est["total_bytes"] == est["bytes_per_group"] * 10_000


def test_mqloss_array_form(spark):
    df = spark.createDataFrame(
        [([10.0, 20.0], [[9.0, 19.0], [11.0, 21.0]], [0.1, 0.9])],
        "actual array<double>, forecasts array<array<double>>, quantiles array<double>")
    v = df.select(ts_mqloss(F.col("actual"), F.col("forecasts"),
                            F.col("quantiles")).alias("v")).first()["v"]
    assert v is not None and v >= 0.0 and math.isfinite(v)


def test_error_isolation_skips_failing_groups(spark):
    """Ref ts_forecast_native.cpp:666-672 + ts_forecast_error_isolation.test:
    per-group computation errors skip the group; invalid input hard-fails."""
    from anofox_forecast_spark.operators.forecast import ts_forecast_by
    good = _panel(spark).filter(F.col("id") < 3)
    # id=999 has 2 points only → fails the min-3 rule inside the UDF
    tiny = spark.createDataFrame(
        [(999, "1998-01-01", 1.0), (999, "1998-01-02", 2.0)],
        "id long, ds string, y double").withColumn("ds", F.col("ds").cast("timestamp"))
    out = ts_forecast_by(good.unionByName(tiny), "id", "ds", "y",
                         "SES", 5, "1d", {"alpha": 0.3})
    ids = {r["id"] for r in out.select("id").distinct().collect()}
    assert 999 not in ids and len(ids) == 3
    # invalid input (bad confidence_level) fails before any job
    with pytest.raises(ValueError):
        ts_forecast_by(good, "id", "ds", "y", "SES", 5, "1d",
                       {"confidence_level": 2.0})


def test_parallel_equals_serial(spark):
    """Ref ts_parallel_correctness.test: shuffle-partition count must not
    change results."""
    from anofox_forecast_spark.operators.forecast import ts_forecast_by
    panel = _panel(spark)
    a = ts_forecast_by(panel.repartition(16), "id", "ds", "y",
                       "SeasonalNaive", 7, "1d", {"seasonal_period": 7}) \
        .toPandas().sort_values(["id", "forecast_step"]).reset_index(drop=True)
    b = ts_forecast_by(panel.coalesce(1), "id", "ds", "y",
                       "SeasonalNaive", 7, "1d", {"seasonal_period": 7}) \
        .toPandas().sort_values(["id", "forecast_step"]).reset_index(drop=True)
    np.testing.assert_allclose(a["yhat"], b["yhat"])
    np.testing.assert_allclose(a["yhat_upper"], b["yhat_upper"])


def test_laplace_model_runs():
    y = np.sin(np.arange(60) / 3.0) * 5 + 20
    r = M.forecast(y, 7, "Laplace", season_length=7)
    assert len(r.point) == 7 and np.all(np.isfinite(r.point))
    assert r.model_name.startswith("Laplace")


def test_ets_spec_passthrough():
    y = np.sin(2 * np.pi * np.arange(84) / 7.0) * 5 + 50 + np.arange(84) * 0.1
    r = M.forecast(y, 7, "ETS", season_length=7, params={"model": "AAA"})
    assert len(r.point) == 7 and np.all(np.isfinite(r.point))
    with pytest.raises(ValueError):
        M.forecast(y, 7, "Naive", params={"model": "AAA"})  # ETS-only param
