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


# --- prep / hierarchy / cv / stats queries ---------------------------------

CUTOFF = "1998-01-01"


def _zpanel(spark, sf_dir):
    """Deterministic panel with leading zeros (pre-1996 zeroed)."""
    from pyspark.sql import functions as F
    return lineitem_panel(spark, sf_dir).withColumn(
        "y", F.when(F.col("ds") < F.lit("1996-01-01").cast("timestamp"),
                    F.lit(0.0)).otherwise(F.col("y")))


def _gappy(spark, sf_dir):
    from anofox_forecast_spark.operators.prep import ts_fill_gaps_by
    return ts_fill_gaps_by(lineitem_panel(spark, sf_dir), "id", "ds", "y", "1d")


def _prep_queries():
    from anofox_forecast_spark.operators import prep

    def q_fill_gaps(spark, sf):
        return _gappy(spark, sf)

    def q_fill_forward(spark, sf):
        return prep.ts_fill_forward_by(lineitem_panel(spark, sf), "id", "ds", "y",
                                       "2002-12-31", "1d")

    def q_fill_nulls_forward(spark, sf):
        return prep.ts_fill_nulls_forward_by(_gappy(spark, sf), "id", "ds", "y")

    def q_fill_nulls_backward(spark, sf):
        return prep.ts_fill_nulls_backward_by(_gappy(spark, sf), "id", "ds", "y")

    def q_fill_nulls_const(spark, sf):
        return prep.ts_fill_nulls_const_by(_gappy(spark, sf), "id", "ds", "y", 0.0)

    def q_fill_nulls_mean(spark, sf):
        return prep.ts_fill_nulls_mean_by(_gappy(spark, sf), "id", "ds", "y")

    def q_diff(spark, sf):
        return prep.ts_diff_by(lineitem_panel(spark, sf), "id", "ds", "y", 1)

    def q_drop_short(spark, sf):
        return prep.ts_drop_short_by(lineitem_panel(spark, sf), "id", 540)

    def q_drop_constant(spark, sf):
        return prep.ts_drop_constant_by(lineitem_panel(spark, sf), "id", "y")

    def q_drop_zeros(spark, sf):
        return prep.ts_drop_zeros_by(_zpanel(spark, sf), "id", "y")

    def q_drop_gappy(spark, sf):
        return prep.ts_drop_gappy_by(_gappy(spark, sf), "id", "y", 0.8)

    def q_drop_leading_zeros(spark, sf):
        return prep.ts_drop_leading_zeros_by(_zpanel(spark, sf), "id", "ds", "y")

    def q_drop_trailing_zeros(spark, sf):
        return prep.ts_drop_trailing_zeros_by(_zpanel(spark, sf), "id", "ds", "y")

    def q_drop_edge_zeros(spark, sf):
        return prep.ts_drop_edge_zeros_by(_zpanel(spark, sf), "id", "ds", "y")

    def q_mark_unknown(spark, sf):
        return prep.ts_mark_unknown_by(lineitem_panel(spark, sf), "id", "ds", CUTOFF)

    def q_fill_unknown_last(spark, sf):
        return prep.ts_fill_unknown_by(lineitem_panel(spark, sf), "id", "ds", "y",
                                       CUTOFF, {"strategy": "last_value"})

    def q_fill_unknown_null(spark, sf):
        return prep.ts_fill_unknown_by(lineitem_panel(spark, sf), "id", "ds", "y",
                                       CUTOFF, {"strategy": "null"})

    def q_validate_timestamps(spark, sf):
        # missing_timestamps (array col) dropped for the oracle hash — array
        # encodings differ across engines; the scalar verdict columns carry
        # the semantics.
        return prep.ts_validate_timestamps_by(
            lineitem_panel(spark, sf), "id", "ds",
            ["1998-01-01", "1998-01-02", "1998-01-03"]).drop("missing_timestamps")

    return {
        "prep_fill_gaps": q_fill_gaps,
        "prep_fill_forward": q_fill_forward,
        "prep_fill_nulls_forward": q_fill_nulls_forward,
        "prep_fill_nulls_backward": q_fill_nulls_backward,
        "prep_fill_nulls_const": q_fill_nulls_const,
        "prep_fill_nulls_mean": q_fill_nulls_mean,
        "prep_diff": q_diff,
        "prep_drop_short": q_drop_short,
        "prep_drop_constant": q_drop_constant,
        "prep_drop_zeros": q_drop_zeros,
        "prep_drop_gappy": q_drop_gappy,
        "prep_drop_leading_zeros": q_drop_leading_zeros,
        "prep_drop_trailing_zeros": q_drop_trailing_zeros,
        "prep_drop_edge_zeros": q_drop_edge_zeros,
        "prep_mark_unknown": q_mark_unknown,
        "prep_fill_unknown_last": q_fill_unknown_last,
        "prep_fill_unknown_null": q_fill_unknown_null,
        "prep_validate_timestamps": q_validate_timestamps,
    }


def _hier_df(spark, sf_dir):
    from pyspark.sql import functions as F

    from anofox_forecast_spark.sources import load_table
    return load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"), F.col("l_linestatus").alias("ls"),
        F.date_trunc("day", "l_shipdate").alias("ds"),
        F.col("l_quantity").alias("y"))


def _hier_queries():
    from anofox_forecast_spark.operators import hierarchy as H

    def q_combine(spark, sf):
        return H.ts_combine_keys(_hier_df(spark, sf), ["rf", "ls"], "ds", "y")

    def q_aggregate(spark, sf):
        return H.ts_aggregate_hierarchy(_hier_df(spark, sf), ["rf", "ls"], "ds", "y")

    def q_split(spark, sf):
        return H.ts_split_keys(
            H.ts_combine_keys(_hier_df(spark, sf), ["rf", "ls"], "ds", "y"),
            "unique_id", "ds", "y", n_parts=2)

    def q_validate_sep(spark, sf):
        return H.ts_validate_separator(_hier_df(spark, sf), ["rf", "ls"]) \
                .drop("conflicting_values")

    return {
        "hier_combine_keys": q_combine,
        "hier_aggregate": q_aggregate,
        "hier_split_keys": q_split,
        "hier_validate_separator": q_validate_sep,
    }


def _cv_queries():
    from anofox_forecast_spark.operators import cv as CV

    def q_folds(spark, sf):
        return CV.ts_cv_folds_by(lineitem_panel(spark, sf), "id", "ds", "y", 2, 7)

    def q_folds_sliding(spark, sf):
        return CV.ts_cv_folds_by(lineitem_panel(spark, sf), "id", "ds", "y", 3, 7,
                                 {"window_type": "sliding", "min_train_size": 60,
                                  "gap": 2})

    def q_split(spark, sf):
        return CV.ts_cv_split_by(lineitem_panel(spark, sf), "id", "ds", "y",
                                 ["1998-01-01", "1999-01-01"], 7, "1d")

    def q_cv_forecast(spark, sf):
        folds = CV.ts_cv_folds_by(lineitem_panel(spark, sf), "id", "ds", "y", 2, 7)
        return CV.ts_cv_forecast_by(folds, "id", "ds", "y", "SESOptimized")

    def q_backtest(spark, sf):
        return CV.ts_backtest_auto_by(lineitem_panel(spark, sf), "id", "ds", "y",
                                      "Theta", 7, 2)

    return {
        "cv_folds": q_folds,
        "cv_folds_sliding": q_folds_sliding,
        "cv_split": q_split,
        "cv_forecast": q_cv_forecast,
        "cv_backtest": q_backtest,
    }


_STATS_SQL_COLS = [
    "length", "n_nulls", "n_zeros", "n_positive", "n_negative",
    "n_unique_values", "is_constant", "mean", "median", "q1", "q3", "iqr",
    "std_dev", "variance", "min", "max", "range", "sum", "coef_variation",
    "skewness", "kurtosis", "autocorr_lag1", "expected_length", "n_gaps",
]


def _stats_queries():
    from anofox_forecast_spark.operators import stats as S

    def q_stats_full(spark, sf):
        return S.ts_stats_by(lineitem_panel(spark, sf), "id", "ds", "y", "1d")

    def q_stats_sql(spark, sf):
        return S.ts_stats_by(lineitem_panel(spark, sf), "id", "ds", "y", "1d") \
                .select("id", *_STATS_SQL_COLS)

    def q_stats_summary(spark, sf):
        return S.ts_stats_summary(
            S.ts_stats_by(lineitem_panel(spark, sf), "id", "ds", "y", "1d"))

    def q_quality_report(spark, sf):
        return S.ts_quality_report(
            S.ts_stats_by(lineitem_panel(spark, sf), "id", "ds", "y", "1d"), 10)

    def q_data_quality(spark, sf):
        return S.ts_data_quality(lineitem_panel(spark, sf), "id", "ds", "y")

    def q_dq_summary(spark, sf):
        return S.ts_data_quality_summary(lineitem_panel(spark, sf), "id", "ds", "y")

    return {
        "stats_full": q_stats_full,
        "stats_sql": q_stats_sql,
        "stats_summary": q_stats_summary,
        "stats_quality_report": q_quality_report,
        "data_quality": q_data_quality,
        "data_quality_summary": q_dq_summary,
    }


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
    q.update(_prep_queries())
    q.update(_hier_queries())
    q.update(_cv_queries())
    q.update(_stats_queries())
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


# Shared oracle CTE fragments --------------------------------------------------

_ZPANEL = (f"panel AS ({_PANEL}), zpanel AS (SELECT id, ds, "
           f"CASE WHEN ds < TIMESTAMP '1996-01-01' THEN 0.0 ELSE y END AS y FROM panel)")

_GAPPY = f"""
panel AS ({_PANEL}),
gp AS (SELECT id, ds, y, lag(ds) OVER (PARTITION BY id ORDER BY ds) AS prev FROM panel),
gins AS (
  SELECT id, prev + INTERVAL (s * 86400) SECOND AS ds, CAST(NULL AS DOUBLE) AS y
  FROM (SELECT id, prev,
               unnest(generate_series(1,
                 CAST(floor(date_diff('second', prev, ds) / 86400.0) AS BIGINT) - 1)) AS s
        FROM gp WHERE prev IS NOT NULL)),
gappy AS (SELECT id, ds, y FROM panel UNION ALL SELECT id, ds, y FROM gins)
"""

_HIER = ("li AS (SELECT l_returnflag AS rf, l_linestatus AS ls, "
         "date_trunc('day', l_shipdate) AS ds, l_quantity AS y FROM lineitem)")


def _prep_oracles() -> dict[str, str]:
    o: dict[str, str] = {}
    o["prep_fill_gaps"] = f"WITH {_GAPPY} SELECT id, ds, y FROM gappy"
    o["prep_fill_forward"] = f"""
WITH panel AS ({_PANEL}),
agg AS (SELECT id, max(ds) AS last_ds FROM panel GROUP BY id),
ins AS (
  SELECT id, last_ds + INTERVAL (s * 86400) SECOND AS ds, CAST(NULL AS DOUBLE) AS y
  FROM (SELECT id, last_ds,
               unnest(generate_series(1,
                 CAST(floor(date_diff('second', last_ds, TIMESTAMP '2002-12-31') / 86400.0) AS BIGINT))) AS s
        FROM agg))
SELECT id, ds, y FROM panel UNION ALL SELECT id, ds, y FROM ins
"""
    o["prep_fill_nulls_forward"] = f"""
WITH {_GAPPY}
SELECT id, ds, y,
       coalesce(y, last_value(y IGNORE NULLS) OVER (
         PARTITION BY id ORDER BY ds
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS filled_value
FROM gappy
"""
    o["prep_fill_nulls_backward"] = f"""
WITH {_GAPPY}
SELECT id, ds, y,
       coalesce(y, first_value(y IGNORE NULLS) OVER (
         PARTITION BY id ORDER BY ds
         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS filled_value
FROM gappy
"""
    o["prep_fill_nulls_const"] = f"""
WITH {_GAPPY} SELECT id, ds, y, coalesce(y, 0.0) AS filled_value FROM gappy
"""
    o["prep_fill_nulls_mean"] = f"""
WITH {_GAPPY}
SELECT id, ds, y, coalesce(y, avg(y) OVER (PARTITION BY id)) AS filled_value FROM gappy
"""
    o["prep_diff"] = f"""
WITH panel AS ({_PANEL})
SELECT id, ds,
       y - lag(y, 1) OVER (PARTITION BY id ORDER BY ds) AS diff_value
FROM panel
"""
    o["prep_drop_short"] = f"""
WITH panel AS ({_PANEL})
SELECT id, ds, y FROM (
  SELECT id, ds, y, count(*) OVER (PARTITION BY id) AS n FROM panel) WHERE n >= 540
"""
    o["prep_drop_constant"] = f"""
WITH panel AS ({_PANEL})
SELECT id, ds, y FROM (
  SELECT id, ds, y, min(y) OVER (PARTITION BY id) AS mn,
         max(y) OVER (PARTITION BY id) AS mx FROM panel)
WHERE mn != mx OR mn IS NULL OR mx IS NULL
"""
    o["prep_drop_zeros"] = f"""
WITH {_ZPANEL}
SELECT id, ds, y FROM (
  SELECT id, ds, y,
         sum(CASE WHEN y != 0 AND y IS NOT NULL THEN 1 ELSE 0 END)
           OVER (PARTITION BY id) AS nz
  FROM zpanel) WHERE nz > 0
"""
    o["prep_drop_gappy"] = f"""
WITH {_GAPPY}
SELECT id, ds, y FROM (
  SELECT id, ds, y,
         CAST(sum(CASE WHEN y IS NULL THEN 1 ELSE 0 END) OVER (PARTITION BY id) AS DOUBLE)
           / count(*) OVER (PARTITION BY id) AS r
  FROM gappy) WHERE r <= 0.8
"""
    o["prep_drop_leading_zeros"] = f"""
WITH {_ZPANEL}
SELECT id, ds, y FROM (
  SELECT id, ds, y,
         min(CASE WHEN y != 0 AND y IS NOT NULL THEN ds END) OVER (PARTITION BY id) AS fnz
  FROM zpanel) WHERE ds >= fnz
"""
    o["prep_drop_trailing_zeros"] = f"""
WITH {_ZPANEL}
SELECT id, ds, y FROM (
  SELECT id, ds, y,
         max(CASE WHEN y != 0 AND y IS NOT NULL THEN ds END) OVER (PARTITION BY id) AS lnz
  FROM zpanel) WHERE ds <= lnz
"""
    o["prep_drop_edge_zeros"] = f"""
WITH {_ZPANEL}
SELECT id, ds, y FROM (
  SELECT id, ds, y,
         min(CASE WHEN y != 0 AND y IS NOT NULL THEN ds END) OVER (PARTITION BY id) AS fnz,
         max(CASE WHEN y != 0 AND y IS NOT NULL THEN ds END) OVER (PARTITION BY id) AS lnz
  FROM zpanel) WHERE ds >= fnz AND ds <= lnz
"""
    o["prep_mark_unknown"] = f"""
WITH panel AS ({_PANEL})
SELECT id, ds, y,
       date_trunc('second', ds::TIMESTAMP) > TIMESTAMP '{CUTOFF}' AS is_unknown,
       max(CASE WHEN date_trunc('second', ds::TIMESTAMP) <= TIMESTAMP '{CUTOFF}'
                THEN date_trunc('second', ds::TIMESTAMP) END)
         OVER (PARTITION BY id) AS last_known_date
FROM panel
"""
    o["prep_fill_unknown_last"] = f"""
WITH panel AS ({_PANEL})
SELECT id, date_trunc('second', ds::TIMESTAMP) AS ds,
       CASE WHEN date_trunc('second', ds::TIMESTAMP) <= TIMESTAMP '{CUTOFF}' THEN y
            ELSE last_value(CASE WHEN date_trunc('second', ds::TIMESTAMP) <= TIMESTAMP '{CUTOFF}'
                                 THEN y END IGNORE NULLS) OVER (
                   PARTITION BY id ORDER BY date_trunc('second', ds::TIMESTAMP)
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       END AS y
FROM panel
"""
    o["prep_fill_unknown_null"] = f"""
WITH panel AS ({_PANEL})
SELECT id, date_trunc('second', ds::TIMESTAMP) AS ds,
       CASE WHEN date_trunc('second', ds::TIMESTAMP) <= TIMESTAMP '{CUTOFF}' THEN y END AS y
FROM panel
"""
    o["prep_validate_timestamps"] = f"""
WITH panel AS ({_PANEL}),
src AS (SELECT DISTINCT id, date_trunc('second', ds::TIMESTAMP) AS dt FROM panel),
expected AS (SELECT date_trunc('second', x::TIMESTAMP) AS e
             FROM (VALUES ('1998-01-01'), ('1998-01-02'), ('1998-01-03')) t(x)),
all_exp AS (SELECT g.id, e.e FROM (SELECT DISTINCT id FROM src) g CROSS JOIN expected e),
v AS (SELECT a.id, a.e, s.dt IS NOT NULL AS found
      FROM all_exp a LEFT JOIN src s ON a.id = s.id AND a.e = s.dt)
SELECT id, bool_and(found) AS is_valid, count(*) AS n_expected,
       CAST(sum(CASE WHEN found THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
       CAST(sum(CASE WHEN NOT found THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
FROM v GROUP BY id
"""
    return o


def _hier_oracles() -> dict[str, str]:
    o: dict[str, str] = {}
    o["hier_combine_keys"] = f"""
WITH {_HIER} SELECT concat_ws('|', rf, ls) AS unique_id, ds, y FROM li
"""
    o["hier_aggregate"] = f"""
WITH {_HIER}
SELECT concat_ws('|',
         CASE WHEN GROUPING(rf) = 1 THEN 'AGGREGATED' ELSE rf END,
         CASE WHEN GROUPING(ls) = 1 THEN 'AGGREGATED' ELSE ls END) AS unique_id,
       ds, SUM(CAST(y AS DOUBLE)) AS y
FROM li GROUP BY ds, ROLLUP(rf, ls)
"""
    o["hier_split_keys"] = f"""
WITH {_HIER},
ck AS (SELECT concat_ws('|', rf, ls) AS unique_id, ds, y FROM li)
SELECT string_split(unique_id, '|')[1] AS id_part_1,
       string_split(unique_id, '|')[2] AS id_part_2, ds, y
FROM ck
"""
    o["hier_validate_separator"] = f"""
WITH {_HIER},
agg AS (SELECT CAST(sum(CASE WHEN contains(rf, '|') OR contains(ls, '|')
                             THEN 1 ELSE 0 END) AS INTEGER) AS n_conflicts FROM li)
SELECT '|' AS separator, n_conflicts = 0 AS is_valid, n_conflicts,
       CASE WHEN n_conflicts = 0 THEN 'Separator is safe to use'
            ELSE concat('Separator found in ', CAST(n_conflicts AS VARCHAR),
                        ' value(s); choose a different separator') END AS message
FROM agg
"""
    return o


def _cv_oracles() -> dict[str, str]:
    o: dict[str, str] = {}
    o["cv_folds"] = f"""
WITH panel AS ({_PANEL}),
w AS (SELECT id, ds, y, row_number() OVER (PARTITION BY id ORDER BY ds) - 1 AS pos,
             count(*) OVER (PARTITION BY id) AS n FROM panel),
spec AS (SELECT id, n, unnest(generate_series(0, 1)) AS fold_id
         FROM (SELECT DISTINCT id, n FROM w)),
b AS (SELECT id, fold_id, n, greatest(n - 14, 1) - 1 + fold_id * 7 AS train_end
      FROM spec),
bb AS (SELECT * FROM b WHERE train_end + 7 < n)
SELECT id, ds, y, fold_id, split FROM (
  SELECT w.id, w.ds, w.y, CAST(bb.fold_id AS BIGINT) AS fold_id,
         CASE WHEN w.pos <= bb.train_end THEN 'train'
              WHEN w.pos BETWEEN bb.train_end + 1 AND bb.train_end + 7 THEN 'test'
         END AS split
  FROM w JOIN bb ON w.id = bb.id)
WHERE split IS NOT NULL
"""
    o["cv_folds_sliding"] = f"""
WITH panel AS ({_PANEL}),
w AS (SELECT id, ds, y, row_number() OVER (PARTITION BY id ORDER BY ds) - 1 AS pos,
             count(*) OVER (PARTITION BY id) AS n FROM panel),
spec AS (SELECT id, n, unnest(generate_series(0, 2)) AS fold_id
         FROM (SELECT DISTINCT id, n FROM w)),
b AS (SELECT id, fold_id, n,
             greatest(n - 21, 1) - 1 + fold_id * 7 AS train_end FROM spec),
bb AS (SELECT *, greatest(train_end + 1 - 60, 0) AS train_start,
              train_end + 3 AS test_start, train_end + 9 AS test_end
       FROM b WHERE train_end + 9 < n AND train_end >= greatest(train_end + 1 - 60, 0))
SELECT id, ds, y, fold_id, split FROM (
  SELECT w.id, w.ds, w.y, CAST(bb.fold_id AS BIGINT) AS fold_id,
         CASE WHEN w.pos BETWEEN bb.train_start AND bb.train_end THEN 'train'
              WHEN w.pos BETWEEN bb.test_start AND bb.test_end THEN 'test'
         END AS split
  FROM w JOIN bb ON w.id = bb.id)
WHERE split IS NOT NULL
"""
    o["cv_split"] = f"""
WITH panel AS ({_PANEL})
SELECT id, ds, y, fold_id, split FROM (
  SELECT p.id, p.ds, p.y, CAST(f.fold_id AS BIGINT) AS fold_id,
         CASE WHEN p.ds::TIMESTAMP <= f.c THEN 'train'
              WHEN p.ds::TIMESTAMP >= f.c + INTERVAL 86400 SECOND
               AND p.ds::TIMESTAMP <= f.c + INTERVAL (7 * 86400) SECOND THEN 'test'
         END AS split
  FROM panel p
  CROSS JOIN (VALUES (0, TIMESTAMP '1998-01-01'),
                     (1, TIMESTAMP '1999-01-01')) f(fold_id, c))
WHERE split IS NOT NULL
"""
    return o


def _stats_oracles() -> dict[str, str]:
    eps = _EPS
    o: dict[str, str] = {}
    o["stats_sql"] = f"""
WITH panel AS ({_PANEL}),
m AS (SELECT id, avg(y) AS mu, count(*) AS nn FROM panel GROUP BY id),
j AS (SELECT p.id, p.ds, p.y, m.mu, m.nn,
             lag(p.y) OVER (PARTITION BY p.id ORDER BY p.ds) AS prev,
             lag(p.ds) OVER (PARTITION BY p.id ORDER BY p.ds) AS prev_ds
      FROM panel p JOIN m USING (id))
SELECT id,
  count(*) AS length,
  CAST(count(*) - count(y) AS BIGINT) AS n_nulls,
  CAST(count(*) FILTER (WHERE y = 0) AS BIGINT) AS n_zeros,
  CAST(count(*) FILTER (WHERE y > 0) AS BIGINT) AS n_positive,
  CAST(count(*) FILTER (WHERE y < 0) AS BIGINT) AS n_negative,
  CAST(count(DISTINCT y) AS BIGINT) AS n_unique_values,
  count(DISTINCT y) = 1 AS is_constant,
  avg(y) AS mean,
  quantile_cont(y, 0.5) AS median,
  quantile_cont(y, 0.25) AS q1,
  quantile_cont(y, 0.75) AS q3,
  quantile_cont(y, 0.75) - quantile_cont(y, 0.25) AS iqr,
  coalesce(stddev_samp(y), 0.0) AS std_dev,
  coalesce(var_samp(y), 0.0) AS variance,
  min(y) AS min, max(y) AS max, max(y) - min(y) AS range,
  CAST(sum(y) AS DOUBLE) AS sum,
  CASE WHEN abs(avg(y)) > {eps} THEN coalesce(stddev_samp(y), 0.0) / abs(avg(y))
       ELSE 'nan'::DOUBLE END AS coef_variation,
  CASE WHEN count(*) > 2 AND stddev_samp(y) > {eps}
       THEN (sum(pow(y - mu, 3)) / count(*)) / pow(stddev_samp(y), 3)
            * sqrt(count(*) * (count(*) - 1.0)) / (count(*) - 2.0)
       ELSE 'nan'::DOUBLE END AS skewness,
  CASE WHEN count(*) > 3 AND stddev_samp(y) > {eps}
       THEN (count(*) - 1.0) / ((count(*) - 2.0) * (count(*) - 3.0))
            * ((count(*) + 1.0)
               * ((sum(pow(y - mu, 4)) / count(*)) / pow(stddev_samp(y), 4) - 3.0) + 6.0)
       ELSE 'nan'::DOUBLE END AS kurtosis,
  CASE WHEN abs(sum(pow(y - mu, 2))) < {eps} THEN 0.0
       ELSE sum((y - mu) * (prev - mu)) FILTER (WHERE prev IS NOT NULL)
            / sum(pow(y - mu, 2)) END AS autocorr_lag1,
  CAST(date_diff('second', min(ds), max(ds)) // 86400 + 1 AS BIGINT) AS expected_length,
  CAST(count(*) FILTER (WHERE date_diff('second', prev_ds, ds) > 129600) AS BIGINT) AS n_gaps
FROM j GROUP BY id
"""
    o["stats_summary"] = f"""
WITH panel AS ({_PANEL}),
g AS (SELECT id, count(*) AS length,
             CAST(count(*) - count(y) AS BIGINT) AS n_nulls
      FROM panel GROUP BY id)
SELECT count(*) AS n_series, avg(length) AS avg_length,
       min(length) AS min_length, max(length) AS max_length,
       CAST(sum(n_nulls) AS BIGINT) AS total_nulls,
       CAST(0 AS BIGINT) AS total_nans
FROM g
"""
    o["stats_quality_report"] = f"""
WITH panel AS ({_PANEL}),
g AS (SELECT id, count(*) AS length,
             CAST(count(*) - count(y) AS BIGINT) AS n_nulls,
             count(DISTINCT y) AS nuq
      FROM panel GROUP BY id)
SELECT CAST(sum(CASE WHEN length >= 10 AND n_nulls = 0 AND nuq > 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_passed,
       CAST(0 AS BIGINT) AS n_nan_issues,
       CAST(sum(CASE WHEN n_nulls > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_issues,
       CAST(sum(CASE WHEN nuq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_constant,
       count(*) AS n_total
FROM g
"""
    return o


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
    o.update(_prep_oracles())
    o.update(_hier_oracles())
    o.update(_cv_oracles())
    o.update(_stats_oracles())
    return o
