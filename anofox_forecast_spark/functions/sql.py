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


class FillGapsUDTF:
    """``ts_fill_gaps_by(TABLE(t), group_col, ds_col, y_col, frequency)`` —
    SQL form of the gap-filling operator (ref macro ``ts_macros.cpp:176+``).
    Emits every grid timestamp between each series' min and max ds; missing
    points carry NULL y."""

    @staticmethod
    def analyze(table, group_col, ds_col, y_col, frequency):
        schema = table.dataType
        g, d, y = group_col.value, ds_col.value, y_col.value
        out = T.StructType([
            T.StructField(g, schema[g].dataType),
            T.StructField(d, schema[d].dataType),
            T.StructField(y, schema[y].dataType),
        ])
        return AnalyzeResult(schema=out, partitionBy=[PartitioningColumn(g)],
                             orderBy=[OrderingColumn(d)])

    def __init__(self):
        self._rows: list = []

    def eval(self, row, group_col, ds_col, y_col, frequency):
        self._args = (group_col, ds_col, y_col, frequency)
        self._rows.append(row)

    def terminate(self):
        if not self._rows:
            return
        from ..frequency import parse_frequency
        group_col, ds_col, y_col, frequency = self._args
        freq = parse_frequency(frequency)
        g = self._rows[0][group_col]
        have = {r[ds_col]: r[y_col] for r in self._rows}
        first, last = self._rows[0][ds_col], self._rows[-1][ds_col]
        if isinstance(first, int):
            step = freq.n if freq.kind == "int" else 1
            cur = first
            while cur <= last:
                yield (g, cur, have.get(cur))
                cur += step
            return
        import datetime as _dt
        if freq.kind == "month":
            from ..operators.forecast import _add_months_clamped
            import pandas as _pd
            cur = _pd.Timestamp(first)
            k = 0
            while cur.to_pydatetime() <= last:
                py = cur.to_pydatetime()
                yield (g, py, have.get(py))
                k += 1
                cur = _add_months_clamped(_pd.Timestamp(first), freq.n * k)
            return
        step = _dt.timedelta(seconds=freq.n)
        cur = first
        while cur <= last:
            yield (g, cur, have.get(cur))
            cur += step


class CvFoldsUDTF:
    """``ts_cv_folds_by(TABLE(t), group_col, ds_col, y_col, n_folds,
    horizon)`` — SQL form of the expanding-window fold generator (ref macro
    ``ts_macros.cpp:1364-1408``); same position-based boundaries as
    ``operators.cv._fold_spec``."""

    @staticmethod
    def analyze(table, group_col, ds_col, y_col, n_folds, horizon):
        schema = table.dataType
        g, d, y = group_col.value, ds_col.value, y_col.value
        out = T.StructType([
            T.StructField(g, schema[g].dataType),
            T.StructField(d, schema[d].dataType),
            T.StructField(y, schema[y].dataType),
            T.StructField("fold_id", T.LongType()),
            T.StructField("split", T.StringType()),
        ])
        return AnalyzeResult(schema=out, partitionBy=[PartitioningColumn(g)],
                             orderBy=[OrderingColumn(d)])

    def __init__(self):
        self._rows: list = []

    def eval(self, row, group_col, ds_col, y_col, n_folds, horizon):
        self._args = (group_col, ds_col, y_col, int(n_folds), int(horizon))
        self._rows.append(row)

    def terminate(self):
        if not self._rows:
            return
        group_col, ds_col, y_col, n_folds, h = self._args
        n = len(self._rows)
        init = max(n - h * n_folds, 1)
        for f in range(n_folds):
            train_end = init - 1 + f * h
            test_end = train_end + h
            if test_end >= n:
                continue
            for pos in range(0, train_end + 1):
                r = self._rows[pos]
                yield (r[group_col], r[ds_col], r[y_col], f, "train")
            for pos in range(train_end + 1, test_end + 1):
                r = self._rows[pos]
                yield (r[group_col], r[ds_col], r[y_col], f, "test")


class StatsUDTF:
    """``ts_stats_by(TABLE(t), group_col, ds_col, y_col, frequency)`` — SQL
    form of the 36-column statistics operator; delegates to the same
    ``compute_series_stats`` as the DataFrame path so the two surfaces
    cannot drift."""

    @staticmethod
    def analyze(table, group_col, ds_col, y_col, frequency):
        from ..operators.stats import STATS_FIELDS
        schema = table.dataType
        g = group_col.value
        out = T.StructType([T.StructField(g, schema[g].dataType)]
                           + [T.StructField(n, t) for n, t in STATS_FIELDS])
        return AnalyzeResult(schema=out, partitionBy=[PartitioningColumn(g)],
                             orderBy=[OrderingColumn(ds_col.value)])

    def __init__(self):
        self._rows: list = []

    def eval(self, row, group_col, ds_col, y_col, frequency):
        self._args = (group_col, ds_col, y_col, frequency)
        self._rows.append(row)

    def terminate(self):
        if not self._rows:
            return
        import numpy as np
        import pandas as pd

        from ..frequency import parse_frequency
        from ..operators.stats import STATS_FIELDS, compute_series_stats
        group_col, ds_col, y_col, frequency = self._args
        freq = parse_frequency(frequency) if frequency else None
        g = self._rows[0][group_col]
        y = np.array([math.nan if r[y_col] is None else float(r[y_col])
                      for r in self._rows])
        ds0 = self._rows[0][ds_col]
        if isinstance(ds0, int):
            dates = np.array([r[ds_col] for r in self._rows], dtype="int64")
        else:
            dates = (pd.to_datetime([r[ds_col] for r in self._rows])
                     .astype("int64").to_numpy() // 1000)
        st = compute_series_stats(y, dates, freq)

        def plain(v, typ):
            if v is None:
                return None
            if isinstance(typ, T.LongType):
                return int(v)
            if isinstance(typ, T.BooleanType):
                return bool(v)
            return float(v)

        yield tuple([g] + [plain(st[name], typ) for name, typ in STATS_FIELDS])


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
    spark.udtf.register("ts_fill_gaps_by", udtf(FillGapsUDTF))
    spark.udtf.register("ts_cv_folds_by", udtf(CvFoldsUDTF))
    spark.udtf.register("ts_stats_by", udtf(StatsUDTF))

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
