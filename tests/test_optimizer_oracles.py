"""The SQL-replayed optimizers (golden-section + Nelder-Mead recursive
CTEs in ``__spark_entry__.oracle_sql()``) must keep matching the numpy
model library branch-for-branch. Spark-free: DuckDB runs the oracle,
numpy runs the model, straight per-series compare at sf0.001."""

from __future__ import annotations

import numpy as np
import pytest

duckdb = pytest.importorskip("duckdb")

from anofox_forecast_spark.functions import models as M  # noqa: E402
from tests.conftest import SF_DIR  # noqa: E402

HORIZON = 7

# driver key -> (model, params, season, truncate-to)
CASES = {
    "forecast_theta": ("Theta", {}, 0, None),
    "forecast_dynamic_theta": ("DynamicTheta", {}, 0, None),
    "forecast_ses_optimized": ("SESOptimized", {}, 0, None),
    "forecast_croston_optimized": ("CrostonOptimized", {}, 0, None),
    "forecast_adida": ("ADIDA", {}, 0, None),
    "forecast_imapa": ("IMAPA", {}, 0, None),
    "forecast_seasonal_es_optimized": (
        "SeasonalESOptimized", {"seasonal_period": 7}, 7, None),
    "forecast_holt": ("Holt", {}, 0, None),
    "forecast_optimized_theta": ("OptimizedTheta", {}, 0, None),
    "forecast_dynamic_optimized_theta": ("DynamicOptimizedTheta", {}, 0, None),
    "forecast_auto_theta": ("AutoTheta", {}, 0, None),
    "forecast_arima": ("ARIMA", {"p": 1, "d": 1, "q": 1}, 0, None),
    "forecast_holt_winters": (
        "HoltWinters", {"seasonal_period": 7}, 7, 144),
    "forecast_ets": ("ETS", {"model": "AAA", "seasonal_period": 7}, 7, 144),
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
              f"read_parquet('{SF_DIR}/lineitem.parquet')")
    return c


@pytest.fixture(scope="module")
def panel(con):
    return con.execute(
        "SELECT l_suppkey AS id, date_trunc('day', l_shipdate) AS ds, "
        "CAST(SUM(l_quantity) AS DOUBLE) AS y FROM lineitem "
        "GROUP BY 1, 2 ORDER BY id, ds").df()


@pytest.mark.parametrize("key", sorted(CASES))
def test_sql_optimizer_matches_numpy(con, panel, key):
    import __spark_entry__ as em
    model, params, season, trunc = CASES[key]
    sql = em.oracle_sql()[key]
    out = con.execute(sql).df()
    checked = 0
    for gid, g in panel.groupby("id"):
        y = g.sort_values("ds")["y"].to_numpy()
        if trunc:
            y = y[:trunc]
        if len(y) < 3:
            continue
        r = M.forecast(y, HORIZON, model, season_length=season, level=0.90,
                       params=dict(params))
        sub = out[out["id"] == gid].sort_values("forecast_step")
        assert len(sub) == HORIZON, f"{key}: missing rows for id {gid}"
        # oracle_sql() is round-pinned to the 4-decimal forecast quantum;
        # round the numpy side the same way. One-quantum tolerance absorbs
        # exact-boundary rounding; a branch divergence in the replayed
        # optimizer moves results by far more.
        np.testing.assert_allclose(sub["yhat"].to_numpy(),
                                   np.round(r.point, 4),
                                   atol=1.5e-4, rtol=0, err_msg=key)
        np.testing.assert_allclose(sub["yhat_lower"].to_numpy(),
                                   np.round(r.lower, 4),
                                   atol=1.5e-4, rtol=0, err_msg=key)
        checked += 1
    assert checked >= 3
