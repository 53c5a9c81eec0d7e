"""End-to-end regression backtest — the workflow the reference documents in
``examples/backtesting/synthetic_backtest_examples.sql``, Spark-first:

    panel -> ts_cv_split_by -> ts_prepare_regression_input_by
          -> ols_fit_predict_by (or ridge via {'l2': ...})
          -> ts_mae_by / ts_rmse_by on the test rows

Run: python examples/regression_backtest.py [sf_dir]
"""
from __future__ import annotations

import sys


def run(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from anofox_forecast_spark.functions.metrics import ts_mae_by
    from anofox_forecast_spark.operators import cv as CV
    from anofox_forecast_spark.operators.regression import ols_fit_predict_by
    from anofox_forecast_spark.sources import lineitem_panel

    panel = lineitem_panel(spark, sf_dir)
    # two calendar covariates stand in for business features
    src = panel.select(
        "id", "ds", "y",
        (F.dayofmonth("ds") % 7).cast("double").alias("dow_bucket"),
        F.month("ds").cast("double").alias("month"))

    # 1. explicit-cutoff CV folds (train <= cutoff, 7-step test window)
    cv = CV.ts_cv_split_by(panel, "id", "ds", "y",
                           ["1998-01-01", "1999-01-01"], 7, "1d")

    # 2. fit-predict adapter: target NULL-masked on test rows
    reg_input = CV.ts_prepare_regression_input_by(cv, src, "id", "ds", "y")

    # 3. per-fold OLS (swap in {"l2": 10.0} for ridge)
    pred = ols_fit_predict_by(reg_input, "fold_id",
                              ["group_col", "date_col"],
                              "masked_target", ["dow_bucket", "month"])

    # 4. score the held-out rows (masked_target NULL == test); ts_mae_by
    #    groups by every non-(date, actual, forecast) column, so project
    #    down to the fold key first
    test = (pred.filter(F.col("masked_target").isNull())
                .join(src.select(F.col("id").alias("group_col"),
                                 F.col("ds").alias("date_col"),
                                 F.col("y").alias("actual")),
                      ["group_col", "date_col"])
                .select("fold_id", "date_col", "actual", "yhat"))
    return ts_mae_by(test, "date_col", "actual", "yhat")


if __name__ == "__main__":
    # running as a script puts examples/ (not the repo root) on
    # sys.path — add the root so the package resolves
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from anofox_forecast_spark.session import get_spark
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="example-regression-backtest",
                      master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, sf).show()
    spark.stop()
