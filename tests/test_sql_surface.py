"""SQL-string surface: ts_forecast_by UDTF + scalar metric functions."""

from __future__ import annotations

from pyspark.sql import functions as F

from anofox_forecast_spark.functions.sql import register_all
from anofox_forecast_spark.sources import lineitem_panel
from tests.conftest import SF_DIR


def test_forecast_udtf_matches_dataframe_api(spark):
    register_all(spark)
    panel = lineitem_panel(spark, SF_DIR)
    panel.createOrReplaceTempView("sql_panel")
    sql_out = spark.sql(
        "SELECT * FROM ts_forecast_by(TABLE(sql_panel), 'id', 'ds', 'y', "
        "'Naive', 7, '1d')").toPandas()

    from anofox_forecast_spark.operators.forecast import ts_forecast_by
    df_out = ts_forecast_by(panel, "id", "ds", "y", "Naive", 7, "1d").toPandas()

    cols = ["id", "forecast_step", "yhat", "yhat_lower", "yhat_upper"]
    a = sql_out[cols].sort_values(["id", "forecast_step"]).reset_index(drop=True)
    b = df_out[cols].sort_values(["id", "forecast_step"]).reset_index(drop=True)
    assert len(a) == len(b) > 0
    import numpy as np
    for c in cols:
        np.testing.assert_allclose(a[c].astype(float), b[c].astype(float),
                                   rtol=1e-9, err_msg=c)


def test_scalar_metrics_sql(spark):
    register_all(spark)
    lineitem_panel(spark, SF_DIR).createOrReplaceTempView("sql_panel2")
    row = spark.sql(
        "SELECT ts_mae(collect_list(y), collect_list(y + 1.0)) AS mae, "
        "       ts_rmse(collect_list(y), collect_list(y + 1.0)) AS rmse, "
        "       ts_coverage(collect_list(y), collect_list(y - 1.0), "
        "                   collect_list(y + 1.0)) AS cov "
        "FROM sql_panel2").first()
    assert abs(row["mae"] - 1.0) < 1e-9
    assert abs(row["rmse"] - 1.0) < 1e-9
    assert row["cov"] == 1.0


def test_metrics_by_from_sql_grouped(spark):
    """The _by table form in SQL = GROUP BY + scalar metric over
    collect_list — same numbers as the DataFrame ts_mae_by."""
    register_all(spark)
    panel = lineitem_panel(spark, SF_DIR)
    panel.createOrReplaceTempView("sql_panel3")
    sql_out = spark.sql(
        "SELECT id, ts_mae(collect_list(y), collect_list(y * 1.1)) AS metric_value "
        "FROM sql_panel3 GROUP BY id").toPandas().set_index("id")

    from anofox_forecast_spark.functions.metrics import ts_mae_by
    fv = panel.withColumn("forecast", F.col("y") * 1.1) \
              .withColumnRenamed("y", "actual")
    df_out = ts_mae_by(fv, "ds", "actual", "forecast").toPandas().set_index("id")
    import numpy as np
    joined = sql_out.join(df_out, lsuffix="_sql")
    assert len(joined) == len(df_out) > 0
    np.testing.assert_allclose(joined["metric_value_sql"], joined["metric_value"],
                               rtol=1e-9)


def test_fill_gaps_udtf_matches_dataframe_api(spark):
    register_all(spark)
    panel = lineitem_panel(spark, SF_DIR)
    panel.createOrReplaceTempView("sql_panel4")
    sql_out = spark.sql(
        "SELECT * FROM ts_fill_gaps_by(TABLE(sql_panel4), 'id', 'ds', 'y', '1d')")
    from anofox_forecast_spark.operators.prep import ts_fill_gaps_by
    df_out = ts_fill_gaps_by(panel, "id", "ds", "y", "1d")
    assert sql_out.count() == df_out.count()
    a = sql_out.toPandas().sort_values(["id", "ds"]).reset_index(drop=True)
    b = df_out.select("id", "ds", "y").toPandas() \
              .sort_values(["id", "ds"]).reset_index(drop=True)
    assert (a["ds"] == b["ds"]).all()
    assert a["y"].isna().equals(b["y"].isna())


def test_cv_folds_udtf_matches_dataframe_api(spark):
    register_all(spark)
    panel = lineitem_panel(spark, SF_DIR)
    panel.createOrReplaceTempView("sql_panel5")
    sql_out = spark.sql(
        "SELECT * FROM ts_cv_folds_by(TABLE(sql_panel5), 'id', 'ds', 'y', 2, 7)")
    from anofox_forecast_spark.operators.cv import ts_cv_folds_by
    df_out = ts_cv_folds_by(panel, "id", "ds", "y", 2, 7)
    key = ["id", "ds", "fold_id", "split"]
    a = sql_out.select(*key).toPandas().sort_values(key).reset_index(drop=True)
    b = df_out.select(*key).toPandas().sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) > 0
    assert (a["split"] == b["split"]).all() and (a["fold_id"] == b["fold_id"]).all()


def test_stats_udtf_matches_dataframe_api(spark):
    register_all(spark)
    panel = lineitem_panel(spark, SF_DIR)
    panel.createOrReplaceTempView("sql_panel6")
    sql_out = spark.sql(
        "SELECT id, length, mean, std_dev, autocorr_lag1, n_gaps "
        "FROM ts_stats_by(TABLE(sql_panel6), 'id', 'ds', 'y', '1d')").toPandas()
    from anofox_forecast_spark.operators.stats import ts_stats_by
    df_out = ts_stats_by(panel, "id", "ds", "y", "1d") \
        .select("id", "length", "mean", "std_dev", "autocorr_lag1", "n_gaps") \
        .toPandas()
    import numpy as np
    a = sql_out.sort_values("id").reset_index(drop=True)
    b = df_out.sort_values("id").reset_index(drop=True)
    assert len(a) == len(b) > 0
    for c in ["length", "mean", "std_dev", "autocorr_lag1", "n_gaps"]:
        np.testing.assert_allclose(a[c].astype(float), b[c].astype(float),
                                   rtol=1e-9, err_msg=c)
