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
    frequency[, confidence_level[, params_json]])`` — SQL form of the
    forecasting operator. The two trailing arguments are optional, matching
    the reference macro's named parameters (``ts_macros.cpp``):
    ``confidence_level`` (default 0.90) and a JSON dict of model params
    (``{"window": 7, "seasonal_period": 12, ...}``)."""

    @staticmethod
    def analyze(table: AnalyzeArgument, group_col: AnalyzeArgument,
                ds_col: AnalyzeArgument, y_col: AnalyzeArgument,
                method: AnalyzeArgument, horizon: AnalyzeArgument,
                frequency: AnalyzeArgument,
                confidence_level: AnalyzeArgument | None = None,
                params_json: AnalyzeArgument | None = None) -> AnalyzeResult:
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

    def eval(self, row, group_col, ds_col, y_col, method, horizon, frequency,
             confidence_level=None, params_json=None):
        self._args = (group_col, ds_col, y_col, method, int(horizon),
                      frequency, confidence_level, params_json)
        self._rows.append(row)

    def terminate(self):
        if not self._rows:
            return
        import json

        from ..frequency import parse_frequency
        from ..operators.forecast import _future_dates_pd
        (group_col, ds_col, y_col, method, h, frequency, level,
         params_json) = self._args
        freq = parse_frequency(frequency)
        pars = dict(json.loads(params_json)) if params_json else {}
        season = int(pars.pop("seasonal_period", 0) or 0)
        rows = self._rows
        g = rows[0][group_col]
        ds_vals = [r[ds_col] for r in rows]
        y_vals = [r[y_col] if r[y_col] is not None else math.nan for r in rows]
        try:
            r = M.forecast(y_vals, h, method, season_length=season,
                           level=float(level) if level is not None else 0.90,
                           params=pars)
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


# ---------------------------------------------------------------------------
# Scalar metrics as Spark 4 SQL UDFs — pure Catalyst expressions (the same
# zip_with/aggregate/filter higher-order functions as the Column forms in
# metrics.py), so the SQL-string surface is JVM-side with no Python in the
# data path. Zero-denominator semantics = NaN, matching metrics.rs:120-135.
# ---------------------------------------------------------------------------

_EPS_SQL = "2.220446049250313e-16D"
_NAN_SQL = "CAST('NaN' AS DOUBLE)"

_SQL_SCALARS: list[tuple[str, str, str]] = [
    ("ts_arr_mean", "(a ARRAY<DOUBLE>) RETURNS DOUBLE",
     "aggregate(a, 0.0D, (acc, x) -> acc + x) / size(a)"),
    ("ts_mae", "(a ARRAY<DOUBLE>, f ARRAY<DOUBLE>) RETURNS DOUBLE",
     "ts_arr_mean(zip_with(a, f, (x, y) -> abs(x - y)))"),
    ("ts_mse", "(a ARRAY<DOUBLE>, f ARRAY<DOUBLE>) RETURNS DOUBLE",
     "ts_arr_mean(zip_with(a, f, (x, y) -> (x - y) * (x - y)))"),
    ("ts_rmse", "(a ARRAY<DOUBLE>, f ARRAY<DOUBLE>) RETURNS DOUBLE",
     "sqrt(ts_mse(a, f))"),
    ("ts_bias", "(a ARRAY<DOUBLE>, f ARRAY<DOUBLE>) RETURNS DOUBLE",
     "ts_arr_mean(zip_with(a, f, (x, y) -> y - x))"),
    ("ts_mape", "(a ARRAY<DOUBLE>, f ARRAY<DOUBLE>) RETURNS DOUBLE",
     f"""CASE WHEN size(filter(a, x -> abs(x) > {_EPS_SQL})) = 0
          THEN {_NAN_SQL}
          ELSE aggregate(
                 filter(zip_with(a, f, (x, y) -> struct(x AS a, y AS f)),
                        p -> abs(p.a) > {_EPS_SQL}),
                 0.0D, (acc, p) -> acc + abs((p.a - p.f) / p.a))
               / size(filter(a, x -> abs(x) > {_EPS_SQL})) * 100.0D END"""),
    ("ts_smape", "(a ARRAY<DOUBLE>, f ARRAY<DOUBLE>) RETURNS DOUBLE",
     f"""CASE WHEN size(filter(zip_with(a, f, (x, y) -> abs(x) + abs(y)),
                              s -> s > {_EPS_SQL})) = 0
          THEN {_NAN_SQL}
          ELSE aggregate(
                 filter(zip_with(a, f, (x, y) -> struct(x AS a, y AS f)),
                        p -> abs(p.a) + abs(p.f) > {_EPS_SQL}),
                 0.0D, (acc, p) -> acc + 2.0D * abs(p.a - p.f)
                                         / (abs(p.a) + abs(p.f)))
               / size(filter(zip_with(a, f, (x, y) -> abs(x) + abs(y)),
                             s -> s > {_EPS_SQL})) * 100.0D END"""),
    # a SQL UDF cannot bind intermediates and is not callable under lambda
    # scope, so ss_tot uses the one-pass identity sum(x^2) - sum(x)^2/n —
    # each aggregate() is a single O(n) fold (the centered form would
    # re-evaluate the mean aggregate for every element, O(n^2))
    ("ts_r2", "(a ARRAY<DOUBLE>, f ARRAY<DOUBLE>) RETURNS DOUBLE",
     f"""CASE WHEN abs(aggregate(a, 0.0D, (acc, x) -> acc + x * x)
                   - aggregate(a, 0.0D, (acc, x) -> acc + x)
                     * aggregate(a, 0.0D, (acc, x) -> acc + x) / size(a))
              < {_EPS_SQL}
          THEN {_NAN_SQL}
          ELSE 1.0D - aggregate(zip_with(a, f, (x, y) -> (x - y) * (x - y)),
                                0.0D, (acc, v) -> acc + v)
                      / (aggregate(a, 0.0D, (acc, x) -> acc + x * x)
                         - aggregate(a, 0.0D, (acc, x) -> acc + x)
                           * aggregate(a, 0.0D, (acc, x) -> acc + x) / size(a))
          END"""),
    ("ts_mase",
     "(a ARRAY<DOUBLE>, f ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE",
     f"CASE WHEN abs(ts_mae(a, b)) < {_EPS_SQL} THEN {_NAN_SQL} "
     "ELSE ts_mae(a, f) / ts_mae(a, b) END"),
    ("ts_rmae",
     "(a ARRAY<DOUBLE>, p1 ARRAY<DOUBLE>, p2 ARRAY<DOUBLE>) RETURNS DOUBLE",
     f"CASE WHEN abs(ts_mae(a, p2)) < {_EPS_SQL} THEN {_NAN_SQL} "
     "ELSE ts_mae(a, p1) / ts_mae(a, p2) END"),
    ("ts_quantile_loss",
     "(a ARRAY<DOUBLE>, f ARRAY<DOUBLE>, q DOUBLE) RETURNS DOUBLE",
     "ts_arr_mean(zip_with(a, f, (x, y) -> "
     "CASE WHEN x - y >= 0 THEN q * (x - y) ELSE (q - 1.0D) * (x - y) END))"),
    # NOTE: a SQL UDF cannot be invoked on lambda variables (the inlined
    # body fails to resolve), so the per-quantile pinball loss is written
    # out as nested higher-order functions here
    ("ts_mqloss",
     "(a ARRAY<DOUBLE>, fs ARRAY<ARRAY<DOUBLE>>, qs ARRAY<DOUBLE>) "
     "RETURNS DOUBLE",
     """aggregate(zip_with(fs, qs, (fc, q) ->
          aggregate(zip_with(a, fc, (x, y) ->
              CASE WHEN x - y >= 0 THEN q * (x - y)
                   ELSE (q - 1.0D) * (x - y) END),
            0.0D, (acc, v) -> acc + v) / size(a)),
        0.0D, (acc2, v2) -> acc2 + v2) / size(qs)"""),
    ("ts_coverage",
     "(a ARRAY<DOUBLE>, lo ARRAY<DOUBLE>, up ARRAY<DOUBLE>) RETURNS DOUBLE",
     f"""CASE WHEN size(a) = 0 THEN {_NAN_SQL}
          ELSE CAST(size(filter(
                 zip_with(zip_with(a, lo, (x, l) -> struct(x AS a, l AS l)),
                          up, (p, u) -> struct(p.a AS a, p.l AS l, u AS u)),
                 t -> t.a >= t.l AND t.a <= t.u)) AS DOUBLE) / size(a) END"""),
]


# ---------------------------------------------------------------------------
# Grouped (_by) metric UDTFs: ``SELECT * FROM ts_mae_by(TABLE(t), 'id',
# 'actual', 'forecast')`` -> (id, metric_value). Compatibility surface for
# the reference's registered _by macros (anofox_forecast_extension.cpp);
# the performance path is functions/metrics.py. tests/test_sql_surface.py
# pins SQL == DataFrame per metric so the two cannot drift.
# ---------------------------------------------------------------------------

_METRIC_EPS = 2.220446049250313e-16


def _metric_by_compute(metric: str, cols: list[list[float]], extra) -> float:
    import numpy as np
    a = np.asarray(cols[0], dtype=float)
    if metric in ("mae", "mse", "rmse", "bias", "mape", "smape", "r2",
                  "quantile_loss"):
        f = np.asarray(cols[1], dtype=float)
    if metric == "mae":
        return float(np.mean(np.abs(a - f)))
    if metric == "mse":
        return float(np.mean((a - f) ** 2))
    if metric == "rmse":
        return float(math.sqrt(np.mean((a - f) ** 2)))
    if metric == "bias":
        return float(np.mean(f - a))
    if metric == "mape":
        m = np.abs(a) > _METRIC_EPS
        return (float(np.mean(np.abs((a[m] - f[m]) / a[m])) * 100.0)
                if m.any() else math.nan)
    if metric == "smape":
        den = np.abs(a) + np.abs(f)
        m = den > _METRIC_EPS
        return (float(np.mean(2.0 * np.abs(a[m] - f[m]) / den[m]) * 100.0)
                if m.any() else math.nan)
    if metric == "r2":
        ss_tot = float(np.sum((a - a.mean()) ** 2))
        if abs(ss_tot) < _METRIC_EPS:
            return math.nan
        return 1.0 - float(np.sum((a - f) ** 2)) / ss_tot
    if metric == "quantile_loss":
        q = float(extra)
        err = a - f
        return float(np.mean(np.where(err >= 0, q * err, (q - 1.0) * err)))
    if metric in ("mase", "rmae"):
        f = np.asarray(cols[1], dtype=float)
        b = np.asarray(cols[2], dtype=float)
        denom = float(np.mean(np.abs(a - b)))
        if abs(denom) < _METRIC_EPS:
            return math.nan
        return float(np.mean(np.abs(a - f))) / denom
    if metric == "coverage":
        lo = np.asarray(cols[1], dtype=float)
        up = np.asarray(cols[2], dtype=float)
        return float(np.mean((a >= lo) & (a <= up)))
    if metric == "mqloss":
        qs = [float(x) for x in str(extra).split(",")]
        per_q = []
        for i, q in enumerate(qs):
            err = a - np.asarray(cols[1 + i], dtype=float)
            per_q.append(float(np.mean(np.where(err >= 0, q * err,
                                                (q - 1.0) * err))))
        return float(np.mean(per_q))
    raise ValueError(metric)


def _make_metric_by_udtf(metric: str, n_value_args: int, has_extra: bool):
    """Build a UDTF class for one grouped metric. Value-column arguments are
    comma-splittable (mqloss passes its forecast columns as 'c1,c2,...')."""

    class _MetricBy:
        @staticmethod
        def analyze(table: AnalyzeArgument, group_col: AnalyzeArgument,
                    *rest: AnalyzeArgument) -> AnalyzeResult:
            g = group_col.value
            out = T.StructType([
                T.StructField(g, table.dataType[g].dataType),
                T.StructField("metric_value", T.DoubleType()),
            ])
            return AnalyzeResult(schema=out,
                                 partitionBy=[PartitioningColumn(g)])

        def __init__(self):
            self._rows: list = []

        def eval(self, row, group_col, *rest):
            self._args = (group_col, *rest)
            self._rows.append(row)

        def terminate(self):
            if not self._rows:
                return
            group_col, *rest = self._args
            extra = rest[n_value_args] if has_extra else None
            col_names: list[str] = []
            for c in rest[:n_value_args]:
                col_names.extend(str(c).split(","))
            cols = [[r[c] for r in self._rows] for c in col_names]
            yield (self._rows[0][group_col],
                   _metric_by_compute(metric, cols, extra))

    return _MetricBy


_METRIC_BY_SPECS = {
    # name -> (metric key, n value-column args, takes trailing scalar arg)
    "ts_mae_by": ("mae", 2, False),
    "ts_mse_by": ("mse", 2, False),
    "ts_rmse_by": ("rmse", 2, False),
    "ts_mape_by": ("mape", 2, False),
    "ts_smape_by": ("smape", 2, False),
    "ts_r2_by": ("r2", 2, False),
    "ts_bias_by": ("bias", 2, False),
    "ts_mase_by": ("mase", 3, False),
    "ts_rmae_by": ("rmae", 3, False),
    "ts_coverage_by": ("coverage", 3, False),
    "ts_quantile_loss_by": ("quantile_loss", 2, True),
    "ts_mqloss_by": ("mqloss", 2, True),  # ('f1,f2,..' cols, 'q1,q2,..')
}


# ---------------------------------------------------------------------------
# Prep-family UDTFs: per-series transforms / filters callable from SQL.
# Semantics mirror operators/prep.py (tests pin SQL == DataFrame).
# ---------------------------------------------------------------------------

def _make_prep_udtf(op: str):
    filled_ops = {"fill_const", "fill_forward", "fill_backward", "fill_mean",
                  "interpolate"}

    class _Prep:
        @staticmethod
        def analyze(table: AnalyzeArgument, group_col: AnalyzeArgument,
                    ds_col: AnalyzeArgument, y_col: AnalyzeArgument,
                    *rest: AnalyzeArgument) -> AnalyzeResult:
            schema = table.dataType
            g, d, y = group_col.value, ds_col.value, y_col.value
            fields = [T.StructField(g, schema[g].dataType),
                      T.StructField(d, schema[d].dataType)]
            if op == "diff":
                fields.append(T.StructField("diff_value", T.DoubleType()))
            else:
                fields.append(T.StructField(y, schema[y].dataType))
                if op in filled_ops:
                    fields.append(T.StructField("filled_value",
                                                T.DoubleType()))
            return AnalyzeResult(schema=T.StructType(fields),
                                 partitionBy=[PartitioningColumn(g)],
                                 orderBy=[OrderingColumn(d)])

        def __init__(self):
            self._rows: list = []

        def eval(self, row, group_col, ds_col, y_col, *rest):
            self._args = (group_col, ds_col, y_col, *rest)
            self._rows.append(row)

        def terminate(self):
            if not self._rows:
                return
            import numpy as np
            group_col, ds_col, y_col, *rest = self._args
            rows = self._rows
            g = rows[0][group_col]
            # SQL NULL (None) is "missing"; a real NaN double is a VALUE —
            # exactly the DataFrame ops' semantics (prep.py uses
            # isNull/isNotNull, and Spark avg/min/max/!= treat NaN as a
            # value), so the two surfaces cannot disagree on NaN-bearing
            # series. y holds NaN for BOTH cases; isnull disambiguates.
            y = np.array([math.nan if r[y_col] is None else float(r[y_col])
                          for r in rows])
            isnull = np.array([r[y_col] is None for r in rows])
            notnull = ~isnull
            n = len(rows)

            if op == "diff":
                lag = int(rest[0]) if rest else 1
                for i, r in enumerate(rows):
                    if i < lag or isnull[i] or isnull[i - lag]:
                        v = None       # NULL arithmetic -> NULL
                    else:
                        v = float(y[i] - y[i - lag])  # NaN stays NaN
                    yield (g, r[ds_col], v)
                return
            if op.startswith("drop_"):
                if op == "drop_constant":
                    vv = y[notnull]
                    nn = vv[~np.isnan(vv)]
                    # keep iff >1 distinct non-null value under Spark
                    # equality (NaN == NaN, NaN != any number)
                    keep = (len(vv) == 0
                            or (len(nn) > 0 and len(nn) < len(vv))
                            or (len(nn) > 1 and bool((nn != nn[0]).any())))
                elif op == "drop_short":
                    keep = len(rows) >= int(rest[0])
                elif op == "drop_gappy":
                    keep = float(isnull.mean()) <= float(rest[0])
                else:  # drop_zeros — NaN != 0 is true in Spark, NaN counts
                    keep = bool(((y != 0) & notnull).any())
                if keep:
                    for r in rows:
                        yield (g, r[ds_col], r[y_col])
                return
            # fill family: passthrough + filled_value. fills[i] is None only
            # where the output is SQL NULL (unfillable null position).
            fills: list = [None] * n
            if op == "fill_const":
                c = float(rest[0])
                for i in range(n):
                    fills[i] = y[i] if notnull[i] else c
            elif op == "fill_forward":
                last = None
                for i in range(n):
                    if notnull[i]:
                        last = y[i]
                        fills[i] = y[i]
                    else:
                        fills[i] = last
            elif op == "fill_backward":
                nxt = None
                for i in range(n - 1, -1, -1):
                    if notnull[i]:
                        nxt = y[i]
                        fills[i] = y[i]
                    else:
                        fills[i] = nxt
            elif op == "fill_mean":
                m = float(np.mean(y[notnull])) if notnull.any() else None
                for i in range(n):
                    fills[i] = y[i] if notnull[i] else m
            else:  # interpolate — anchors are non-NULL values (NaN anchors
                # propagate NaN through the linear arithmetic, like SQL)
                if notnull.any():
                    idx = np.arange(n, dtype=float)
                    interp = np.interp(idx[isnull], idx[notnull], y[notnull])
                    it = iter(interp)
                    for i in range(n):
                        fills[i] = y[i] if notnull[i] else float(next(it))
            for i, r in enumerate(rows):
                fv = fills[i]
                yield (g, r[ds_col], r[y_col],
                       None if fv is None else float(fv))

    return _Prep


class DetectPeriodsUDTF:
    """``ts_detect_periods(TABLE(t), 'id', 'ds', 'y', 'fft')`` — SQL form of
    the period-detection operator; delegates to the same ``detect_periods``
    as the DataFrame path (operators/detect.py) so the two cannot drift."""

    @staticmethod
    def analyze(table, group_col, ds_col, y_col, method):
        g = group_col.value
        out = T.StructType([
            T.StructField(g, table.dataType[g].dataType),
            T.StructField("period", T.IntegerType()),
            T.StructField("confidence", T.DoubleType()),
            T.StructField("strength", T.DoubleType()),
            T.StructField("n_periods", T.IntegerType()),
            T.StructField("primary_period", T.IntegerType()),
            T.StructField("method", T.StringType()),
        ])
        return AnalyzeResult(schema=out, partitionBy=[PartitioningColumn(g)],
                             orderBy=[OrderingColumn(ds_col.value)])

    def __init__(self):
        self._rows: list = []

    def eval(self, row, group_col, ds_col, y_col, method):
        self._args = (group_col, ds_col, y_col, method)
        self._rows.append(row)

    def terminate(self):
        if not self._rows:
            return
        import numpy as np

        from ..operators.detect import detect_periods
        group_col, _ds, y_col, method = self._args
        g = self._rows[0][group_col]
        y = np.array([math.nan if r[y_col] is None else float(r[y_col])
                      for r in self._rows])
        res = detect_periods(y, str(method))
        for d in res["periods"] or [{"period": 0, "confidence": 0.0,
                                     "strength": 0.0}]:
            yield (g, d["period"], d["confidence"], d["strength"],
                   res["n_periods"], res["primary_period"], res["method"])


_PREP_UDTF_NAMES = {
    "ts_fill_nulls_const_by": "fill_const",
    "ts_fill_nulls_forward_by": "fill_forward",
    "ts_fill_nulls_backward_by": "fill_backward",
    "ts_fill_nulls_mean_by": "fill_mean",
    "ts_interpolate_by": "interpolate",
    "ts_diff_by": "diff",
    "ts_drop_constant_by": "drop_constant",
    "ts_drop_short_by": "drop_short",
    "ts_drop_gappy_by": "drop_gappy",
    "ts_drop_zeros_by": "drop_zeros",
}


def register_all(spark: SparkSession) -> None:
    """Register the SQL surface on a session. Idempotent.

    Mirrors the reference's registration list
    (src/anofox_forecast_extension.cpp:16-175): 5 table-operator UDTFs,
    12 grouped-metric UDTFs, 10 prep-family UDTFs, and 13 scalar metric
    functions (as JVM-side Spark 4 SQL UDFs, not Python)."""
    spark.udtf.register("ts_forecast_by", udtf(ForecastUDTF))
    spark.udtf.register("ts_fill_gaps_by", udtf(FillGapsUDTF))
    spark.udtf.register("ts_cv_folds_by", udtf(CvFoldsUDTF))
    spark.udtf.register("ts_stats_by", udtf(StatsUDTF))
    spark.udtf.register("ts_detect_periods", udtf(DetectPeriodsUDTF))
    for name, (metric, n_vals, extra) in _METRIC_BY_SPECS.items():
        spark.udtf.register(name,
                            udtf(_make_metric_by_udtf(metric, n_vals, extra)))
    for name, op in _PREP_UDTF_NAMES.items():
        spark.udtf.register(name, udtf(_make_prep_udtf(op)))
    for name, sig, body in _SQL_SCALARS:
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
                  f"RETURN {body}")
