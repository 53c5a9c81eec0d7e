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
