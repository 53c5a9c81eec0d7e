"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` — named (spark, sf_dir) -> DataFrame callables, one per
implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-ANSI-SQL equivalents over the pre-registered views
(region nation customer supplier part orders lineitem events documents
embeddings). Column names are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from anofox_forecast_spark.functions.models import norm_ppf
from anofox_forecast_spark.sources import (
    LINEITEM_PANEL_SQL,
    ORDERS_PANEL_SQL,
    lineitem_panel,
    orders_panel,
)

Z90 = norm_ppf(0.95)  # default confidence_level 0.90 → two-sided z

HORIZON = 7
SEASON = 7


# ---------------------------------------------------------------------------
# Spark queries
# ---------------------------------------------------------------------------

def _forecast_query(method: str, params: dict | None = None, horizon: int = HORIZON):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from anofox_forecast_spark.operators.forecast import ts_forecast_by
        panel = lineitem_panel(spark, sf_dir)
        return ts_forecast_by(panel, "id", "ds", "y", method, horizon, "1d",
                              params or {})
    return run


def _metric_query(metric: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from anofox_forecast_spark.functions import metrics as MX
        panel = lineitem_panel(spark, sf_dir)
        w = Window.partitionBy("id").orderBy("ds")
        fv = (panel
              .withColumn("forecast", F.lag("y", SEASON).over(w))
              .withColumn("baseline", F.lag("y", 1).over(w))
              .filter(F.col("forecast").isNotNull() & F.col("baseline").isNotNull())
              .withColumnRenamed("y", "actual")
              .select("id", "ds", "actual", "forecast", "baseline"))
        if metric == "mase":
            return MX.ts_mase_by(fv, "ds", "actual", "forecast", "baseline")
        if metric == "rmae":
            return MX.ts_rmae_by(fv, "ds", "actual", "forecast", "baseline")
        if metric == "coverage":
            iv = (fv.withColumn("lower", F.col("forecast") - 5.0)
                    .withColumn("upper", F.col("forecast") + 5.0)
                    .drop("forecast", "baseline"))
            return MX.ts_coverage_by(iv, "ds", "actual", "lower", "upper")
        if metric == "quantile_loss":
            return MX.ts_quantile_loss_by(fv.drop("baseline"), "ds", "actual",
                                          "forecast", 0.9)
        fn = getattr(MX, f"ts_{metric}_by")
        return fn(fv.drop("baseline"), "ds", "actual", "forecast")
    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: SeasonalNaive forecast over the lineitem panel at sf0.001."""
    return _forecast_query("SeasonalNaive", {"seasonal_period": SEASON}, 14)(
        spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "forecast_naive": _forecast_query("Naive"),
        "forecast_seasonal_naive": _forecast_query(
            "SeasonalNaive", {"seasonal_period": SEASON}),
        "forecast_sma": _forecast_query("SMA", {"window": 5}),
        "forecast_rwd": _forecast_query("RandomWalkDrift"),
        "forecast_swa": _forecast_query(
            "SeasonalWindowAverage", {"seasonal_period": SEASON, "window": 2}),
        # UDF-path models: rows-only smoke via queries(); oracle omitted where
        # the optimizer state is not SQL-expressible.
        "forecast_ses": _forecast_query("SES", {"alpha": 0.3}),
        "forecast_theta": _forecast_query("Theta"),
        "forecast_croston": _forecast_query("CrostonClassic"),
    }
    for metric in ["mae", "mse", "rmse", "mape", "smape", "r2", "bias",
                   "mase", "rmae", "coverage", "quantile_loss"]:
        q[f"metric_{metric}"] = _metric_query(metric)
    return q


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------

_PANEL = LINEITEM_PANEL_SQL

_FV = f"""
panel AS ({_PANEL}),
fv AS (
  SELECT id, ds, y AS actual,
         lag(y, {SEASON}) OVER (PARTITION BY id ORDER BY ds) AS forecast,
         lag(y, 1) OVER (PARTITION BY id ORDER BY ds) AS baseline
  FROM panel
  QUALIFY forecast IS NOT NULL AND baseline IS NOT NULL
)
"""

_EPS = "2.220446049250313e-16"


def _forecast_oracle_prefix(extra_w: str = "") -> str:
    return f"""
panel AS ({_PANEL}),
w AS (
  SELECT id, ds, CAST(y AS DOUBLE) AS y,
         row_number() OVER (PARTITION BY id ORDER BY ds) AS rn,
         row_number() OVER (PARTITION BY id ORDER BY ds DESC) AS rnd,
         CAST(y AS DOUBLE) - lag(CAST(y AS DOUBLE)) OVER (PARTITION BY id ORDER BY ds) AS dy
         {extra_w}
  FROM panel
)
"""


def _naive_oracle(h: int = HORIZON) -> str:
    return f"""
WITH {_forecast_oracle_prefix()},
agg AS (
  SELECT id, max(ds) AS max_ds, count(*) AS n,
         max_by(y, ds) AS last_y, coalesce(stddev_samp(dy), 0.0) AS sig
  FROM w GROUP BY id HAVING count(*) >= 3),
steps AS (
  SELECT id, max_ds, last_y, sig,
         unnest(generate_series(1, {h})) AS step
  FROM agg)
SELECT id, CAST(step AS INT) AS forecast_step,
       max_ds + INTERVAL (step * 86400) SECOND AS ds,
       last_y AS yhat,
       last_y - {Z90!r} * sig * sqrt(step) AS yhat_lower,
       last_y + {Z90!r} * sig * sqrt(step) AS yhat_upper,
       'Naive' AS model_name
FROM steps
"""


def _rwd_oracle(h: int = HORIZON) -> str:
    return f"""
WITH {_forecast_oracle_prefix()},
agg AS (
  SELECT id, max(ds) AS max_ds, count(*) AS n,
         max_by(y, ds) AS last_y, min_by(y, ds) AS first_y,
         coalesce(stddev_samp(dy), 0.0) AS sig
  FROM w GROUP BY id HAVING count(*) >= 3),
steps AS (
  SELECT id, max_ds, n, last_y, first_y, sig,
         unnest(generate_series(1, {h})) AS step
  FROM agg)
SELECT id, CAST(step AS INT) AS forecast_step,
       max_ds + INTERVAL (step * 86400) SECOND AS ds,
       last_y + (last_y - first_y) / (n - 1) * step AS yhat,
       last_y + (last_y - first_y) / (n - 1) * step
         - {Z90!r} * sig * sqrt(step) AS yhat_lower,
       last_y + (last_y - first_y) / (n - 1) * step
         + {Z90!r} * sig * sqrt(step) AS yhat_upper,
       'RandomWalkDrift' AS model_name
FROM steps
"""


def _snaive_oracle(h: int = HORIZON, m: int = SEASON) -> str:
    extra = (f", CAST(y AS DOUBLE) - lag(CAST(y AS DOUBLE), {m}) "
             f"OVER (PARTITION BY id ORDER BY ds) AS dym")
    return f"""
WITH {_forecast_oracle_prefix(extra)},
agg AS (
  SELECT id, max(ds) AS max_ds, count(*) AS n,
         coalesce(stddev_samp(dym), 0.0) AS sigm
  FROM w GROUP BY id HAVING count(*) >= 3),
steps AS (
  SELECT id, max_ds, sigm, unnest(generate_series(1, {h})) AS step
  FROM agg)
SELECT s.id, CAST(s.step AS INT) AS forecast_step,
       s.max_ds + INTERVAL (s.step * 86400) SECOND AS ds,
       w.y AS yhat,
       w.y - {Z90!r} * s.sigm * sqrt(floor((s.step - 1) / {m}) + 1) AS yhat_lower,
       w.y + {Z90!r} * s.sigm * sqrt(floor((s.step - 1) / {m}) + 1) AS yhat_upper,
       'SeasonalNaive' AS model_name
FROM steps s
JOIN w ON w.id = s.id AND w.rnd = {m} - ((s.step - 1) % {m})
"""


def _sma_oracle(h: int = HORIZON, window: int = 5) -> str:
    extra = (f", avg(CAST(y AS DOUBLE)) OVER (PARTITION BY id ORDER BY ds "
             f"ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING) AS smafit")
    return f"""
WITH {_forecast_oracle_prefix(extra)},
agg AS (
  SELECT id, max(ds) AS max_ds, count(*) AS n,
         avg(y) FILTER (WHERE rnd <= {window}) AS sma,
         coalesce(stddev_samp(y - smafit) FILTER (WHERE rn > {window}), 0.0) AS sig
  FROM w GROUP BY id HAVING count(*) >= 3),
steps AS (
  SELECT id, max_ds, sma, sig, unnest(generate_series(1, {h})) AS step
  FROM agg)
SELECT id, CAST(step AS INT) AS forecast_step,
       max_ds + INTERVAL (step * 86400) SECOND AS ds,
       sma AS yhat,
       sma - {Z90!r} * sig AS yhat_lower,
       sma + {Z90!r} * sig AS yhat_upper,
       'SMA' AS model_name
FROM steps
"""


def _swa_oracle(h: int = HORIZON, m: int = SEASON, window: int = 2) -> str:
    extra = (f", CAST(y AS DOUBLE) - lag(CAST(y AS DOUBLE), {m}) "
             f"OVER (PARTITION BY id ORDER BY ds) AS dym")
    return f"""
WITH {_forecast_oracle_prefix(extra)},
agg AS (
  SELECT id, max(ds) AS max_ds, count(*) AS n,
         coalesce(stddev_samp(dym), 0.0) AS sigm
  FROM w GROUP BY id HAVING count(*) >= 3),
tmpl AS (
  SELECT id, (rnd - 1) % {m} AS ph, avg(y) AS ty
  FROM w WHERE floor((rnd - 1) / {m}) < {window}
  GROUP BY id, (rnd - 1) % {m}),
steps AS (
  SELECT id, max_ds, sigm, unnest(generate_series(1, {h})) AS step
  FROM agg)
SELECT s.id, CAST(s.step AS INT) AS forecast_step,
       s.max_ds + INTERVAL (s.step * 86400) SECOND AS ds,
       t.ty AS yhat,
       t.ty - {Z90!r} * s.sigm * sqrt(floor((s.step - 1) / {m}) + 1) AS yhat_lower,
       t.ty + {Z90!r} * s.sigm * sqrt(floor((s.step - 1) / {m}) + 1) AS yhat_upper,
       'SeasonalWindowAverage' AS model_name
FROM steps s
JOIN tmpl t ON t.id = s.id AND t.ph = ({m} - 1 - ((s.step - 1) % {m})) % {m}
"""


_METRIC_EXPRS = {
    "mae": "avg(abs(actual - forecast))",
    "mse": "avg((actual - forecast) * (actual - forecast))",
    "rmse": "sqrt(avg((actual - forecast) * (actual - forecast)))",
    "bias": "avg(forecast - actual)",
    "mape": f"""CASE WHEN count(*) FILTER (WHERE abs(actual) > {_EPS}) = 0 THEN 'nan'::DOUBLE
         ELSE sum(CASE WHEN abs(actual) > {_EPS} THEN abs((actual - forecast)/actual) ELSE 0 END)
              / count(*) FILTER (WHERE abs(actual) > {_EPS}) * 100.0 END""",
    "smape": f"""CASE WHEN count(*) FILTER (WHERE abs(actual) + abs(forecast) > {_EPS}) = 0 THEN 'nan'::DOUBLE
         ELSE sum(CASE WHEN abs(actual) + abs(forecast) > {_EPS}
                  THEN 2.0*abs(actual - forecast)/(abs(actual)+abs(forecast)) ELSE 0 END)
              / count(*) FILTER (WHERE abs(actual) + abs(forecast) > {_EPS}) * 100.0 END""",
    "r2": f"""CASE WHEN abs(sum(actual*actual) - count(actual)*avg(actual)*avg(actual)) < {_EPS}
         THEN 'nan'::DOUBLE
         ELSE 1.0 - sum((actual-forecast)*(actual-forecast))
              / (sum(actual*actual) - count(actual)*avg(actual)*avg(actual)) END""",
    "mase": f"""CASE WHEN abs(avg(abs(actual - baseline))) < {_EPS} THEN 'nan'::DOUBLE
         ELSE avg(abs(actual - forecast)) / avg(abs(actual - baseline)) END""",
    "rmae": f"""CASE WHEN abs(avg(abs(actual - baseline))) < {_EPS} THEN 'nan'::DOUBLE
         ELSE avg(abs(actual - forecast)) / avg(abs(actual - baseline)) END""",
    "coverage": "avg(CASE WHEN actual >= forecast - 5.0 AND actual <= forecast + 5.0 THEN 1.0 ELSE 0.0 END)",
    "quantile_loss": """avg(CASE WHEN actual - forecast >= 0 THEN 0.9 * (actual - forecast)
         ELSE (0.9 - 1.0) * (actual - forecast) END)""",
}


def _metric_oracle(metric: str) -> str:
    return f"""
WITH {_FV}
SELECT id, {_METRIC_EXPRS[metric]} AS metric_value
FROM fv GROUP BY id
"""


def oracle_sql() -> dict[str, str]:
    o = {
        "forecast_naive": _naive_oracle(),
        "forecast_seasonal_naive": _snaive_oracle(),
        "forecast_sma": _sma_oracle(),
        "forecast_rwd": _rwd_oracle(),
        "forecast_swa": _swa_oracle(),
    }
    for metric in ["mae", "mse", "rmse", "mape", "smape", "r2", "bias",
                   "mase", "rmae", "coverage", "quantile_loss"]:
        o[f"metric_{metric}"] = _metric_oracle(metric)
    return o
