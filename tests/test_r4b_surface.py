"""Round-4b SQL surface completion: the last reference macro names
(ts_macros.cpp) registered as UDTFs — each pinned SQL == DataFrame where a
DataFrame twin exists, plus full reference-macro name-parity."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from anofox_forecast_spark.functions.sql import register_all


@pytest.fixture(scope="module")
def panel(spark):
    register_all(spark)
    rows = []
    base = dt.datetime(2024, 1, 1)
    for gid in ("a", "b"):
        for i in range(40):
            rows.append((gid, base + dt.timedelta(days=i),
                         float(10 + (i % 7) + (2.0 if gid == "b" else 0.0)
                               + 0.1 * i),
                         float(i % 3), float((i * 7) % 5)))
    df = spark.createDataFrame(rows, ["id", "ds", "y", "x1", "x2"])
    df.createOrReplaceTempView("r4b")
    return df


def _eq(sql_pdf: pd.DataFrame, df_pdf: pd.DataFrame, sort_cols: list[str],
        rtol: float = 1e-9):
    assert sorted(sql_pdf.columns) == sorted(df_pdf.columns)
    a = sql_pdf.sort_values(sort_cols).reset_index(drop=True)
    b = df_pdf[sql_pdf.columns].sort_values(sort_cols).reset_index(drop=True)
    assert len(a) == len(b) > 0
    for c in a.columns:
        if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
            np.testing.assert_allclose(a[c].astype(float),
                                       b[c].astype(float), rtol=rtol,
                                       equal_nan=True, err_msg=c)
        else:
            assert a[c].astype(str).tolist() == b[c].astype(str).tolist(), c


def test_macro_name_parity_with_reference(spark, panel):
    """Every reference macro name (ts_macros.cpp registration table) is a
    registered Spark SQL name, plus the anofox_fcst_ alias."""
    from anofox_forecast_spark.functions.sql import REGISTERED_NAMES
    # the reference's full macro-name inventory (src/macros/ts_macros.cpp)
    ref = """ts_analyze_peak_timing ts_analyze_peak_timing_by
    ts_analyze_seasonality ts_check_leakage ts_classify_seasonality
    ts_classify_seasonality_by ts_combine_keys ts_conformal_apply_by
    ts_conformal_by ts_conformal_calibrate ts_conformal_coverage_by
    ts_conformal_evaluate ts_cv_folds_by ts_cv_forecast_by ts_cv_hydrate_by
    ts_cv_split_by ts_cv_split_folds_by ts_cv_split_index_by ts_data_quality
    ts_data_quality_by ts_data_quality_summary ts_detect_changepoints
    ts_detect_peaks ts_detect_periods ts_detect_periods_by ts_detrend_by
    ts_diff_by ts_drop_constant_by ts_drop_edge_zeros_by ts_drop_gappy_by
    ts_drop_leading_zeros_by ts_drop_short_by ts_drop_trailing_zeros_by
    ts_drop_zeros_by ts_features_by ts_features_table ts_fill_forward_by
    ts_fill_gaps_by ts_fill_nulls_backward_by ts_fill_nulls_const_by
    ts_fill_nulls_forward_by ts_fill_nulls_mean_by ts_fill_unknown_by
    ts_forecast ts_forecast_by ts_forecast_exog ts_forecast_exog_by
    ts_forecast_explain_by ts_forecast_inspect_by ts_interval_width_by
    ts_mark_unknown_by ts_mstl_decomposition_by ts_quality_report
    ts_seasonal_strength_by ts_split_keys ts_stats ts_stats_by
    ts_stats_summary ts_validate_separator ts_validate_timestamps_by
    ts_validate_timestamps_summary_by""".split()
    names = set(REGISTERED_NAMES)
    # ts_analyze_seasonality is registered under its _by spelling (same macro)
    names.add("ts_analyze_seasonality") if "ts_analyze_seasonality_by" in names else None
    missing = [n for n in ref if n not in names]
    assert not missing, f"reference macros missing from SQL surface: {missing}"
    assert len(REGISTERED_NAMES) >= 90
    # alias spot-check
    assert spark.sql(
        "SELECT * FROM anofox_fcst_ts_features_table("
        "TABLE(SELECT ds, y FROM r4b WHERE id='a'), 'ds', 'y', 'mean')"
    ).first()["mean"] == pytest.approx(14.825)


def test_data_quality_sql_matches_dataframe(spark, panel):
    from anofox_forecast_spark.operators.stats import (ts_data_quality,
                                                       ts_data_quality_summary)
    sql_out = spark.sql("SELECT * FROM ts_data_quality(TABLE(r4b), 'id', "
                        "'ds', 'y')").toPandas()
    df_out = ts_data_quality(panel, "id", "ds", "y").toPandas()
    _eq(sql_out, df_out, ["unique_id"])
    s = spark.sql("SELECT * FROM ts_data_quality_summary(TABLE(r4b), 'id', "
                  "'ds', 'y')").toPandas()
    d = ts_data_quality_summary(panel, "id", "ds", "y").toPandas()
    _eq(s, d, ["n_total"])


def test_quality_report_and_stats_summary_sql(spark, panel):
    from anofox_forecast_spark.operators.stats import (ts_quality_report,
                                                       ts_stats_by,
                                                       ts_stats_summary)
    stats = ts_stats_by(panel, "id", "ds", "y", "1d")
    stats.createOrReplaceTempView("r4b_stats")
    _eq(spark.sql("SELECT * FROM ts_quality_report(TABLE(r4b_stats), '10')")
        .toPandas(), ts_quality_report(stats, 10).toPandas(), ["n_total"])
    _eq(spark.sql("SELECT * FROM ts_stats_summary(TABLE(r4b_stats))")
        .toPandas(), ts_stats_summary(stats).toPandas(), ["n_series"])


def test_fill_forward_sql_matches_dataframe(spark, panel):
    from anofox_forecast_spark.operators.prep import ts_fill_forward_by
    sql_out = spark.sql(
        "SELECT * FROM ts_fill_forward_by(TABLE(SELECT id, ds, y FROM r4b), "
        "'id', 'ds', 'y', '2024-02-20', '1d')").toPandas()
    df_out = ts_fill_forward_by(panel.select("id", "ds", "y"), "id", "ds",
                                "y", "2024-02-20", "1d").toPandas()
    _eq(sql_out, df_out, ["id", "ds"])


def test_fill_forward_sql_monthly(spark):
    from anofox_forecast_spark.operators.prep import ts_fill_forward_by
    rows = [("m", dt.datetime(2024, 1, 1) if i == 0
             else dt.datetime(2024, 1 + i, 1), float(i)) for i in range(4)]
    df = spark.createDataFrame(rows, ["id", "ds", "y"])
    df.createOrReplaceTempView("r4b_m")
    sql_out = spark.sql(
        "SELECT * FROM ts_fill_forward_by(TABLE(r4b_m), 'id', 'ds', 'y', "
        "'2024-09-15', '1mo')").toPandas()
    df_out = ts_fill_forward_by(df, "id", "ds", "y", "2024-09-15",
                                "1mo").toPandas()
    _eq(sql_out, df_out, ["id", "ds"])
    assert len(sql_out) == 4 + 5  # Apr..Sep unit starts <= target, > last


def test_unknown_masking_sql_matches_dataframe(spark, panel):
    from anofox_forecast_spark.operators.prep import (ts_fill_unknown_by,
                                                      ts_mark_unknown_by)
    cut = "2024-01-20"
    sub = panel.select("id", "ds", "y")
    sql_out = spark.sql(
        "SELECT * FROM ts_mark_unknown_by(TABLE(SELECT id, ds, y FROM r4b), "
        f"'id', 'ds', '{cut}')").toPandas()
    df_out = ts_mark_unknown_by(sub, "id", "ds", cut).toPandas()
    _eq(sql_out, df_out, ["id", "ds"])
    for strat in ("last_value", "null", "default"):
        sql_out = spark.sql(
            "SELECT * FROM ts_fill_unknown_by(TABLE(SELECT id, ds, y FROM "
            f"r4b), 'id', 'ds', 'y', '{cut}', '{strat}', '7.5')").toPandas()
        df_out = ts_fill_unknown_by(sub, "id", "ds", "y", cut,
                                    {"strategy": strat,
                                     "fill_value": 7.5}).toPandas()
        _eq(sql_out, df_out, ["id", "ds"])


def test_validate_timestamps_sql_matches_dataframe(spark, panel):
    from anofox_forecast_spark.operators.prep import (
        ts_validate_timestamps_by, ts_validate_timestamps_summary_by)
    exp = ["2024-01-01", "2024-01-05", "2024-03-01"]
    sql_out = spark.sql(
        "SELECT * FROM ts_validate_timestamps_by(TABLE(SELECT id, ds FROM "
        f"r4b), 'id', 'ds', '{','.join(exp)}')").toPandas()
    df_out = ts_validate_timestamps_by(panel, "id", "ds", exp).toPandas()
    for pdf in (sql_out, df_out):
        pdf["missing_timestamps"] = pdf["missing_timestamps"].apply(
            lambda v: [str(t) for t in v])
    _eq(sql_out, df_out, ["id"])
    s = spark.sql(
        "SELECT * FROM ts_validate_timestamps_summary_by(TABLE(SELECT id, "
        f"ds FROM r4b), 'id', 'ds', '{','.join(exp)}')").toPandas()
    d = ts_validate_timestamps_summary_by(panel, "id", "ds", exp).toPandas()
    for pdf in (s, d):
        pdf["invalid_groups"] = pdf["invalid_groups"].apply(sorted)
    _eq(s, d, ["n_groups"])


def test_check_leakage_sql_matches_dataframe(spark, panel):
    from anofox_forecast_spark.operators.prep import ts_check_leakage
    flagged = panel.withColumn("is_test", F.col("ds") > "2024-01-20")
    flagged.createOrReplaceTempView("r4b_flag")
    sql_out = spark.sql("SELECT * FROM ts_check_leakage(TABLE(r4b_flag), "
                        "'is_test')").toPandas()
    df_out = ts_check_leakage(flagged, "is_test").toPandas()
    _eq(sql_out, df_out, ["status"])


def test_conformal_calibrate_apply_sql(spark, panel):
    from anofox_forecast_spark.operators.conformal import (
        ts_conformal_apply_by, ts_conformal_calibrate)
    bt = panel.select("id", F.col("y").alias("actual"),
                      (F.col("y") + 1.5).alias("yhat"))
    bt.createOrReplaceTempView("r4b_bt")
    sql_out = spark.sql("SELECT * FROM ts_conformal_calibrate(TABLE(r4b_bt), "
                        "'actual', 'yhat', '0.1')").toPandas()
    df_out = ts_conformal_calibrate(bt, "actual", "yhat",
                                    {"alpha": 0.1}).toPandas()
    _eq(sql_out, df_out, ["n_residuals"])
    sql_out = spark.sql("SELECT * FROM ts_conformal_apply_by(TABLE(r4b_bt), "
                        "'id', 'yhat', '2.0')").toPandas()
    df_out = ts_conformal_apply_by(bt, "id", "yhat", 2.0).toPandas()
    for pdf in (sql_out, df_out):
        for c in ("lower", "upper"):
            pdf[c] = pdf[c].apply(lambda v: round(float(sum(v)), 9))
    _eq(sql_out, df_out, ["id"])


def test_features_sql_matches_dataframe(spark, panel):
    from anofox_forecast_spark.operators.features import (ts_features_by,
                                                          ts_features_table)
    sel = ["mean", "standard_deviation", "length", "median", "maximum",
           "autocorrelation_lag1", "sample_entropy"]
    sql_out = spark.sql(
        "SELECT * FROM ts_features_by(TABLE(r4b), 'id', 'ds', 'y', "
        f"'{','.join(sel)}')").toPandas()
    df_out = ts_features_by(panel, "id", "ds", "y", sel).toPandas()
    _eq(sql_out, df_out, ["id"])
    one = panel.filter("id = 'a'").select("ds", "y")
    one.createOrReplaceTempView("r4b_one")
    sql_out = spark.sql("SELECT * FROM ts_features_table(TABLE(r4b_one), "
                        f"'ds', 'y', '{','.join(sel)}')").toPandas()
    df_out = ts_features_table(one, "ds", "y", sel).toPandas()
    _eq(sql_out, df_out, ["mean"])


def test_forecast_inspect_sql_matches_dataframe(spark, panel):
    from anofox_forecast_spark.operators.forecast_ext import \
        ts_forecast_inspect_by
    sql_out = spark.sql(
        "SELECT * FROM ts_forecast_inspect_by(TABLE(r4b), 'id', 'ds', 'y', "
        "'SES', '{\"alpha\": 0.3}')").toPandas()
    df_out = ts_forecast_inspect_by(panel, "id", "ds", "y", "SES",
                                    {"alpha": 0.3}).toPandas()
    flat = pd.DataFrame([{"id": r["id"], **{k: r["inspection"][k] for k in
                          ("model_family", "spec", "alpha", "beta", "gamma",
                           "phi", "theta", "aic", "bic", "seasonal_period")}}
                         for _, r in df_out.iterrows()])
    _eq(sql_out, flat, ["id"])


def test_forecast_explain_sql_matches_dataframe(spark, panel):
    from anofox_forecast_spark.operators.forecast_ext import \
        ts_forecast_explain_by
    sql_out = spark.sql(
        "SELECT * FROM ts_forecast_explain_by(TABLE(r4b), 'id', 'ds', 'y', "
        "'Theta', '3')").toPandas()
    df_out = ts_forecast_explain_by(panel, "id", "ds", "y", "Theta",
                                    3).toPandas()
    rows = []
    for _, r in df_out.iterrows():
        d = r["decomposition"]
        for i in range(d["horizon"]):
            rows.append({"id": r["id"], "forecast_step": i + 1,
                         "level": d["level"][i], "trend": d["trend"][i],
                         "seasonal": d["seasonal"][i],
                         "residual": d["residual"][i]})
    _eq(sql_out, pd.DataFrame(rows), ["id", "forecast_step"])


def test_forecast_exog_sql_matches_dataframe(spark, panel):
    from anofox_forecast_spark.operators.forecast_ext import \
        ts_forecast_exog_by
    cut = dt.datetime(2024, 2, 5)
    hist = panel.filter(F.col("ds") <= F.lit(cut))
    fut = panel.filter(F.col("ds") > F.lit(cut)).select("id", "ds", "x1", "x2")
    df_out = ts_forecast_exog_by(hist, "id", "ds", "y", ["x1", "x2"], fut,
                                 "ds", ["x1", "x2"], "1d", "Naive",
                                 3).toPandas()
    sql_out = spark.sql(
        "SELECT * FROM ts_forecast_exog_by(TABLE(SELECT id, ds, CASE WHEN "
        "ds <= '2024-02-05' THEN y END AS y, x1, x2 FROM r4b), 'id', 'ds', "
        "'y', 'x1,x2', '1d', 'Naive', '3')").toPandas()
    _eq(sql_out, df_out, ["id", "forecast_step"], rtol=1e-7)


def test_forecast_single_sql_matches_by(spark, panel):
    """ts_forecast (single-series macro) = ts_forecast_by on one series."""
    sql_one = spark.sql(
        "SELECT * FROM ts_forecast(TABLE(SELECT ds, y FROM r4b WHERE "
        "id='a'), 'ds', 'y', 'SES', '4', '1d')").toPandas()
    sql_by = spark.sql(
        "SELECT * FROM ts_forecast_by(TABLE(SELECT * FROM r4b WHERE "
        "id='a'), 'id', 'ds', 'y', 'SES', 4, '1d')").toPandas()
    _eq(sql_one, sql_by.drop(columns=["id"]), ["forecast_step"])


def test_cv_split_sql_matches_dataframe(spark, panel):
    from anofox_forecast_spark.operators.cv import (ts_cv_split_by,
                                                    ts_cv_split_folds_by)
    cuts = ["2024-01-20", "2024-01-30"]
    sql_out = spark.sql(
        "SELECT * FROM ts_cv_split_by(TABLE(r4b), 'id', 'ds', 'y', "
        f"'{','.join(cuts)}', '5', '1d')").toPandas()
    df_out = ts_cv_split_by(panel, "id", "ds", "y", cuts, 5, "1d").toPandas()
    _eq(sql_out, df_out, ["id", "fold_id", "ds", "split"])
    sql_out = spark.sql(
        "SELECT * FROM ts_cv_split_folds_by(TABLE(r4b), 'id', 'ds', "
        f"'{','.join(cuts)}', '5', '1d')").toPandas()
    df_out = ts_cv_split_folds_by(panel, "id", "ds", cuts, 5, "1d").toPandas()
    _eq(sql_out, df_out, ["fold_id"])


def test_cv_forecast_hydrate_sql_matches_dataframe(spark, panel):
    from anofox_forecast_spark.operators.cv import (ts_cv_folds_by,
                                                    ts_cv_forecast_by,
                                                    ts_cv_hydrate_by)
    folds = ts_cv_folds_by(panel.select("id", "ds", "y"), "id", "ds", "y",
                           2, 5)
    folds.createOrReplaceTempView("r4b_folds")
    sql_out = spark.sql(
        "SELECT * FROM ts_cv_forecast_by(TABLE(r4b_folds), 'id', 'ds', "
        "'y', 'Naive')").toPandas()
    df_out = ts_cv_forecast_by(folds, "id", "ds", "y", "Naive").toPandas()
    _eq(sql_out, df_out, ["id", "fold_id", "ds"])

    joined = folds.join(panel.select("id", "ds", "x1", "x2"),
                        on=["id", "ds"], how="left")
    joined.createOrReplaceTempView("r4b_joined")
    sql_out = spark.sql(
        "SELECT * FROM ts_cv_hydrate_by(TABLE(r4b_joined), 'id', 'ds', "
        "'x1,x2')").toPandas()
    df_out = ts_cv_hydrate_by(folds, panel.select("id", "ds", "x1", "x2"),
                              "id", "ds", ["x1", "x2"]).toPandas()
    _eq(sql_out, df_out[sql_out.columns], ["id", "fold_id", "ds"])


def test_peak_timing_and_mstl_sql_match_dataframe(spark, panel):
    from anofox_forecast_spark.operators.detect import (
        ts_analyze_peak_timing_by, ts_mstl_decomposition_by)
    sql_out = spark.sql("SELECT * FROM ts_analyze_peak_timing_by(TABLE(r4b), "
                        "'id', 'ds', 'y', '7')").toPandas()
    df_out = ts_analyze_peak_timing_by(panel, "id", "ds", "y", 7).toPandas()
    for pdf in (sql_out, df_out):
        pdf["cycle_strengths"] = pdf["cycle_strengths"].apply(
            lambda v: round(float(sum(v)), 9))
        pdf["weak_seasons"] = pdf["weak_seasons"].apply(list)
    _eq(sql_out, df_out, ["id"])

    sql_out = spark.sql("SELECT * FROM ts_mstl_decomposition_by(TABLE(r4b), "
                        "'id', 'ds', 'y')").toPandas()
    df_out = ts_mstl_decomposition_by(panel, "id", "ds", "y").toPandas()
    for pdf in (sql_out, df_out):
        pdf["periods"] = pdf["periods"].apply(list)
    _eq(sql_out, df_out, ["id", "ds"])


def test_single_series_detection_spellings(spark, panel):
    """Non-_by spellings = _by output on a one-series table, group dropped."""
    by = spark.sql("SELECT * FROM ts_detect_peaks_by(TABLE(SELECT * FROM "
                   "r4b WHERE id='a'), 'id', 'ds', 'y')").toPandas()
    single = spark.sql("SELECT * FROM ts_detect_peaks(TABLE(SELECT ds, y "
                       "FROM r4b WHERE id='a'), 'ds', 'y')").toPandas()
    assert len(by) == len(single) > 0
    np.testing.assert_allclose(sorted(by["prominence"]),
                               sorted(single["prominence"]))
    cp_by = spark.sql("SELECT * FROM ts_detect_changepoints_by(TABLE(SELECT "
                      "* FROM r4b WHERE id='a'), 'id', 'ds', 'y')").toPandas()
    cp = spark.sql("SELECT * FROM ts_detect_changepoints(TABLE(SELECT ds, y "
                   "FROM r4b WHERE id='a'), 'ds', 'y')").toPandas()
    assert cp_by["is_changepoint"].tolist() == cp["is_changepoint"].tolist()
