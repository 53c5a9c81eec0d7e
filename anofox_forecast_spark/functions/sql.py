"""Spark SQL surface: ``ts_*`` functions callable from SQL strings.

The reference exposes everything as SQL table macros / scalar functions
(``src/macros/ts_macros.cpp:2131-2198`` registers ~70 table macros;
``src/anofox_forecast_extension.cpp:16-175`` the scalar/aggregate set). This
module recreates that surface on Spark:

- ``ts_forecast_by`` as a Python UDTF (Spark 3.5+ table-valued function with
  a TABLE argument): ``SELECT * FROM ts_forecast_by(TABLE(panel), 'id',
  'ds', 'y', 'Naive', 7, '1d')``. The UDTF's ``analyze`` requests
  partitioning by the group column and ordering by date, so Catalyst plans
  the same Exchange as the DataFrame path — each UDTF instance sees exactly
  one series.
- the 12 evaluation metrics as scalar SQL functions over DOUBLE arrays
  (``ts_mae(actual, forecast)`` etc.), mirroring the reference's scalar
  forms (``src/scalar_functions/metrics.cpp``).

The UDTF path is row-at-a-time Python — it is the *compatibility* surface.
The DataFrame API (``operators/``) is the performance path; the two share
the model library so results are identical.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult
from pyspark.sql.functions import OrderingColumn, PartitioningColumn, udtf

from . import models as M

_FORECAST_TAIL = [
    ("forecast_step", T.IntegerType()),
    ("yhat", T.DoubleType()),
    ("yhat_lower", T.DoubleType()),
    ("yhat_upper", T.DoubleType()),
    ("model_name", T.StringType()),
]


class ForecastUDTF:
    """``ts_forecast_by(TABLE(t), group_col, ds_col, y_col, method, horizon,
    frequency)`` — SQL form of the forecasting operator."""

    @staticmethod
    def analyze(table: AnalyzeArgument, group_col: AnalyzeArgument,
                ds_col: AnalyzeArgument, y_col: AnalyzeArgument,
                method: AnalyzeArgument, horizon: AnalyzeArgument,
                frequency: AnalyzeArgument) -> AnalyzeResult:
        schema = table.dataType
        g, d = group_col.value, ds_col.value
        out = T.StructType(
            [T.StructField(g, schema[g].dataType),
             T.StructField("forecast_step", T.IntegerType()),
             T.StructField(d, schema[d].dataType)]
            + [T.StructField(n, t) for n, t in _FORECAST_TAIL[1:]])
        return AnalyzeResult(
            schema=out,
            partitionBy=[PartitioningColumn(g)],
            orderBy=[OrderingColumn(d)],
        )

    def __init__(self):
        self._rows: list = []

    def eval(self, row, group_col, ds_col, y_col, method, horizon, frequency):
        self._args = (group_col, ds_col, y_col, method, int(horizon), frequency)
        self._rows.append(row)

    def terminate(self):
        if not self._rows:
            return
        from ..frequency import parse_frequency
        from ..operators.forecast import _future_dates_pd
        group_col, ds_col, y_col, method, h, frequency = self._args
        freq = parse_frequency(frequency)
        rows = self._rows
        g = rows[0][group_col]
        ds_vals = [r[ds_col] for r in rows]
        y_vals = [r[y_col] if r[y_col] is not None else math.nan for r in rows]
        try:
            r = M.forecast(y_vals, h, method, params={})
        except Exception:
            return  # error isolation: skip failing series
        is_int = isinstance(ds_vals[-1], int)
        future = _future_dates_pd(ds_vals[-1], h, freq, is_int)
        for i in range(h):
            yield (g, i + 1, future[i], float(r.point[i]), float(r.lower[i]),
                   float(r.upper[i]), r.model_name)


def _metric_impl(name: str):
    eps = 2.220446049250313e-16

    def mae(a, f):
        return sum(abs(x - y) for x, y in zip(a, f)) / len(a)

    def mse(a, f):
        return sum((x - y) ** 2 for x, y in zip(a, f)) / len(a)

    impls = {
        "ts_mae": mae,
        "ts_mse": mse,
        "ts_rmse": lambda a, f: math.sqrt(mse(a, f)),
        "ts_bias": lambda a, f: sum(y - x for x, y in zip(a, f)) / len(a),
        "ts_mape": lambda a, f: (
            sum(abs((x - y) / x) for x, y in zip(a, f) if abs(x) > eps)
            / max(sum(1 for x in a if abs(x) > eps), 1) * 100.0
            if any(abs(x) > eps for x in a) else math.nan),
        "ts_smape": lambda a, f: (
            sum(2.0 * abs(x - y) / (abs(x) + abs(y))
                for x, y in zip(a, f) if abs(x) + abs(y) > eps)
            / max(sum(1 for x, y in zip(a, f) if abs(x) + abs(y) > eps), 1)
            * 100.0
            if any(abs(x) + abs(y) > eps for x, y in zip(a, f)) else math.nan),
        # NaN (not a huge finite value) on a vanishing denominator — same
        # zero-denominator semantics as metrics.py:80,90 and the reference
        "ts_r2": lambda a, f: (
            1.0 - sum((x - y) ** 2 for x, y in zip(a, f))
            / sum((x - sum(a) / len(a)) ** 2 for x in a)
            if sum((x - sum(a) / len(a)) ** 2 for x in a) > eps else math.nan),
    }
    return impls[name]


def register_all(spark: SparkSession) -> None:
    """Register the SQL surface on a session. Idempotent."""
    spark.udtf.register("ts_forecast_by", udtf(ForecastUDTF))

    arr = T.ArrayType(T.DoubleType())
    for name in ["ts_mae", "ts_mse", "ts_rmse", "ts_mape", "ts_smape",
                 "ts_r2", "ts_bias"]:
        spark.udf.register(name, _metric_impl(name), T.DoubleType())

    def _mase(a, f, b):
        denom = _metric_impl("ts_mae")(a, b)
        if denom <= 2.220446049250313e-16:
            return math.nan  # matches metrics.py / reference NaN semantics
        return _metric_impl("ts_mae")(a, f) / denom

    spark.udf.register("ts_mase", _mase, T.DoubleType())
    spark.udf.register(
        "ts_coverage",
        lambda a, lo, up: (sum(1.0 for x, l, u in zip(a, lo, up)
                               if l <= x <= u) / len(a)),
        T.DoubleType())
    spark.udf.register(
        "ts_quantile_loss",
        lambda a, f, q: (sum(q * (x - y) if x >= y else (q - 1.0) * (x - y)
                             for x, y in zip(a, f)) / len(a)),
        T.DoubleType())
