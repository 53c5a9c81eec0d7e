"""Forecast + conformal intervals — the core per-series workflow:

    panel -> ts_forecast_by (any of the 33 models)
          -> ts_conformal_by for calibrated intervals
          -> ts_detect_periods_by to sanity-check seasonality first

Run: python examples/forecast_conformal.py [sf_dir]
"""
from __future__ import annotations

import sys


def run(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from anofox_forecast_spark.operators.conformal import ts_conformal_by
    from anofox_forecast_spark.operators.detect import ts_detect_periods_by
    from anofox_forecast_spark.operators.forecast import ts_forecast_by
    from anofox_forecast_spark.sources import lineitem_panel

    panel = lineitem_panel(spark, sf_dir)

    # 1. detected seasonality (reference-default confidence filtering:
    #    weakly seasonal series come back as "no seasonality")
    periods = ts_detect_periods_by(panel, "id", "ds", "y", {"method": "auto"})

    # 2. point forecasts + model intervals
    fc = ts_forecast_by(panel, "id", "ds", "y", "AutoETS", 7, "1d",
                        {"seasonal_period": 7})

    # 3. conformal recalibration from in-sample residuals: a naive
    #    one-step backtest frame (actual vs lag-7 forecast) per series
    fv = panel.withColumn(
        "forecast", F.lag("y", 7).over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.partitionBy("id").orderBy("ds"))) \
        .filter(F.col("forecast").isNotNull()) \
        .withColumnRenamed("y", "actual")
    conf = ts_conformal_by(fv, "id", "actual", "forecast", "forecast",
                           {"alpha": 0.1})

    # 4. (r8) adaptive conformal on the same backtest frame: alpha_t
    #    tracks coverage errors online, so the intervals widen through
    #    regime shifts a fixed split-conformal score would under-cover
    from anofox_forecast_spark.operators.conformal import (
        ts_adaptive_conformal_by,
    )
    aci = ts_adaptive_conformal_by(fv, "id", "ds", "actual", "forecast",
                                   alpha=0.1, gamma=0.02)

    # 5. (r8) pre-modeling anomaly screen: rolling-MAD robust z flags the
    #    points that would poison a fit (the point is excluded from its
    #    own window, so a spike can't mask itself)
    from anofox_forecast_spark.operators.detect import ts_detect_anomalies_by
    anomalies = ts_detect_anomalies_by(panel, "id", "ds", "y",
                                       window=28, threshold=3.5)

    # 6. (r9c) forecasting in SCALED space — the global-model workflow:
    #    robust-scale each series (median/IQR survives the spikes the
    #    screen above flags), forecast the scaled panel, then map yhat
    #    back to original units with the SAME per-series stats. The
    #    stats frame is one row per series, so the join back onto the
    #    7-rows-per-series forecast is a broadcast.
    from anofox_forecast_spark.operators.prep import (ts_scale_by,
                                                      ts_unscale_by)
    scaled = ts_scale_by(panel, "id", "ds", "y", "robust")
    # one row per series, straight off the scaled frame — NOT a full-
    # shuffle distinct over every (id, ds) point (the stats are constant
    # within a series, so any first() per id is THE value)
    stats = scaled.groupBy("id").agg(
        F.first("scale_loc").alias("scale_loc"),
        F.first("scale_scale").alias("scale_scale"))
    fc_scaled = ts_forecast_by(
        scaled.filter(F.col("y_scaled").isNotNull())
              .select("id", "ds", F.col("y_scaled").alias("y")),
        "id", "ds", "y", "SES", 7, "1d", {"alpha": 0.3})
    fc_unscaled = ts_unscale_by(
        fc_scaled.join(F.broadcast(stats), "id"),
        ["yhat", "yhat_lower", "yhat_upper"]) \
        .drop("scale_loc", "scale_scale")

    return periods, fc, conf, aci, anomalies, fc_unscaled


if __name__ == "__main__":
    # running as a script puts examples/ (not the repo root) on
    # sys.path — add the root so the package resolves
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from anofox_forecast_spark.session import get_spark
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="example-forecast-conformal",
                      master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    periods, fc, conf, aci, anomalies, fc_unscaled = run(spark, sf)
    periods.select("id", "primary_period", "method").show(5)
    fc.show(5)
    conf.select("id", "conformity_score", "coverage").show(5)
    from pyspark.sql import functions as F
    aci.groupBy("id").agg(F.avg(F.col("covered").cast("double"))
                          .alias("empirical_coverage")).show(5)
    print("anomalous points:",
          anomalies.filter("is_anomaly").count())
    fc_unscaled.show(5)
    spark.stop()
