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
            if op.startswith("drop_") and op.endswith("_zeros") \
                    and op != "drop_zeros":
                # edge-trimming family: ds >= first / <= last nonzero value
                # ((y != 0) & notnull — NaN counts as nonzero, prep.py:258+)
                nz = [i for i in range(n) if notnull[i] and y[i] != 0]
                if not nz:
                    return
                lo = nz[0] if op != "drop_trailing_zeros" else 0
                hi = nz[-1] if op != "drop_leading_zeros" else n - 1
                for r in rows[lo:hi + 1]:
                    yield (g, r[ds_col], r[y_col])
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
    "ts_drop_leading_zeros_by": "drop_leading_zeros",
    "ts_drop_trailing_zeros_by": "drop_trailing_zeros",
    "ts_drop_edge_zeros_by": "drop_edge_zeros",
}


# ---------------------------------------------------------------------------
# Round-4 surface expansion: detection / hierarchy / conformal / cv families
# as UDTFs, delegating to the SAME per-series functions as the DataFrame ops
# (operators/detect.py module-level primitives) so the surfaces cannot
# drift. Mirrors the reference's remaining macro table
# (src/macros/ts_macros.cpp) toward its ~70-name surface.
# ---------------------------------------------------------------------------

def _nan_y(rows, y_col):
    import numpy as np
    return np.array([math.nan if r[y_col] is None else float(r[y_col])
                     for r in rows])


def _make_series_udtf(out_fields, compute):
    """Grouped (partitionBy group, orderBy ds) UDTF factory. ``out_fields``
    is ``callable(table_type, ds_name) -> list[StructField]`` appended after
    the group column; ``compute(ds_vals, y, args) -> iterable of tuples``
    (the group value is prepended here). Scalar args arrive as strings."""

    class _S:
        @staticmethod
        def analyze(table: AnalyzeArgument, group_col: AnalyzeArgument,
                    ds_col: AnalyzeArgument, y_col: AnalyzeArgument,
                    *rest: AnalyzeArgument) -> AnalyzeResult:
            g = group_col.value
            fields = [T.StructField(g, table.dataType[g].dataType)]
            fields += out_fields(table.dataType, ds_col.value)
            return AnalyzeResult(schema=T.StructType(fields),
                                 partitionBy=[PartitioningColumn(g)],
                                 orderBy=[OrderingColumn(ds_col.value)])

        def __init__(self):
            self._rows: list = []

        def eval(self, row, group_col, ds_col, y_col, *rest):
            self._args = (group_col, ds_col, y_col, *rest)
            self._rows.append(row)

        def terminate(self):
            if not self._rows:
                return
            group_col, ds_col, y_col, *rest = self._args
            g = self._rows[0][group_col]
            ds = [r[ds_col] for r in self._rows]
            y = _nan_y(self._rows, y_col)
            for tup in compute(ds, y, [str(a) for a in rest]):
                yield (g, *tup)

    return _S


def _f(name, t):
    return T.StructField(name, t)


def _detection_udtfs():
    """name -> UDTF class for the §2.5 detection family."""
    import numpy as np

    D = T.DoubleType()

    def _passthrough(tt, ds):
        return [_f(ds, tt[ds].dataType)]

    def c_analyze(ds, y, args):
        from ..functions.models import detect_seasonality, interpolate_nulls
        from ..operators.detect import seasonal_strength
        yv = interpolate_nulls(y)
        p = detect_seasonality(yv)
        s = seasonal_strength(yv, p) if p > 1 else 0.0
        t = np.arange(len(yv), dtype=float)
        b1, b0 = np.polyfit(t, yv, 1) if len(yv) > 1 else (0.0, float(yv[0]))
        vy = float(np.var(yv))
        ts_ = min(max(1.0 - float(np.var(yv - (b0 + b1 * t))) / vy, 0.0), 1.0) \
            if vy > 0 else 0.0
        yield ([int(p)] if p > 1 else [], int(p) if p > 1 else 0,
               float(s), float(ts_))

    def c_classify(ds, y, args):
        from ..operators.detect import classify_seasonality
        r = classify_seasonality(y, int(args[0]))
        yield (r["classification"], r["additive_strength"],
               r["multiplicative_strength"])

    def c_strength(ds, y, args):
        from ..operators.detect import seasonal_strength
        method = args[1] if len(args) > 1 else "variance"
        yield (float(seasonal_strength(y, int(args[0]), method)),)

    def c_detrend(ds, y, args):
        from ..operators.detect import detrend
        method = args[0] if args else "linear"
        r = detrend(y, method, degree=int(args[1]) if len(args) > 1 else 2,
                    order=int(args[2]) if len(args) > 2 else 1)
        for i in range(len(y)):
            yield (ds[i], float(y[i]), float(r["trend"][i]),
                   float(r["detrended"][i]), r["method"])

    def c_decompose(ds, y, args):
        from ..operators.detect import decompose_seasonal
        method = args[1] if len(args) > 1 else "additive"
        try:
            r = decompose_seasonal(y, int(args[0]), method)
        except ValueError:
            return
        for i in range(len(y)):
            yield (ds[i], float(y[i]), float(r["trend"][i]),
                   float(r["seasonal"][i]), float(r["remainder"][i]))

    def c_peaks(ds, y, args):
        from ..operators.detect import find_peaks
        r = find_peaks(y, float(args[0]) if args else 0.0)
        for j in range(r["n_peaks"]):
            i = int(r["indices"][j])
            yield (ds[i], float(r["values"][j]), i,
                   float(r["prominences"][j]))

    def c_changepoints(ds, y, args):
        from ..operators.detect import pelt
        min_size = int(args[0]) if args else 2
        penalty = float(args[1]) if len(args) > 1 else None
        cps = set(pelt(y, penalty, min_size, "l2"))
        for i in range(len(y)):
            yield (ds[i], i in cps, 1.0 if i in cps else 0.0)

    def c_instantaneous(ds, y, args):
        from ..functions.models import interpolate_nulls
        from ..operators.detect import EPS, _hilbert_analytic
        yv = interpolate_nulls(y)
        n = len(yv)
        if n < 4:
            return
        analytic = _hilbert_analytic(yv - yv.mean())
        amp = np.abs(analytic)
        phase = np.unwrap(np.angle(analytic))
        freq = np.empty(n)
        freq[1:] = np.diff(phase) / (2.0 * np.pi)
        freq[0] = freq[1]
        for i in range(n):
            per = float(1.0 / abs(freq[i])) if abs(freq[i]) > EPS else None
            yield (ds[i], per, float(freq[i]), float(amp[i]))

    return {
        "ts_analyze_seasonality_by": _make_series_udtf(
            lambda tt, ds: [_f("detected_periods", T.ArrayType(T.IntegerType())),
                            _f("primary_period", T.IntegerType()),
                            _f("seasonal_strength", D),
                            _f("trend_strength", D)], c_analyze),
        "ts_classify_seasonality_by": _make_series_udtf(
            lambda tt, ds: [_f("classification", T.StringType()),
                            _f("additive_strength", D),
                            _f("multiplicative_strength", D)], c_classify),
        "ts_seasonal_strength_by": _make_series_udtf(
            lambda tt, ds: [_f("seasonal_strength", D)], c_strength),
        "ts_detrend_by": _make_series_udtf(
            lambda tt, ds: [_f(ds, tt[ds].dataType), _f("y", D),
                            _f("trend", D), _f("detrended", D),
                            _f("method", T.StringType())], c_detrend),
        "ts_decompose_seasonal_by": _make_series_udtf(
            lambda tt, ds: [_f(ds, tt[ds].dataType), _f("y", D),
                            _f("trend", D), _f("seasonal", D),
                            _f("remainder", D)], c_decompose),
        "ts_detect_peaks_by": _make_series_udtf(
            lambda tt, ds: [_f(ds, tt[ds].dataType), _f("y", D),
                            _f("peak_index", T.IntegerType()),
                            _f("prominence", D)], c_peaks),
        "ts_detect_changepoints_by": _make_series_udtf(
            lambda tt, ds: [_f(ds, tt[ds].dataType),
                            _f("is_changepoint", T.BooleanType()),
                            _f("changepoint_probability", D)], c_changepoints),
        "ts_instantaneous_period_by": _make_series_udtf(
            lambda tt, ds: [_f(ds, tt[ds].dataType), _f("period", D),
                            _f("frequency", D), _f("amplitude", D)],
            c_instantaneous),
    }


class CombineKeysUDTF:
    """``ts_combine_keys(TABLE(t), 'id1,id2', 'ds', 'y', '|')`` — concat id
    columns into unique_id with concat_ws NULL-skipping semantics (mirror of
    operators/hierarchy.ts_combine_keys)."""

    @staticmethod
    def analyze(table, id_cols, ds_col, y_col, sep):
        return AnalyzeResult(schema=T.StructType([
            _f("unique_id", T.StringType()),
            _f(ds_col.value, table.dataType[ds_col.value].dataType),
            _f(y_col.value, table.dataType[y_col.value].dataType)]))

    def eval(self, row, id_cols, ds_col, y_col, sep):
        parts = [row[c] for c in str(id_cols).split(",")]
        uid = str(sep).join(_fmt_key(v) for v in parts if v is not None)
        yield (uid, row[ds_col], row[y_col])


def _fmt_key(v) -> str:
    # Spark's CAST(x AS STRING) for the common key types
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


class SplitKeysUDTF:
    """``ts_split_keys(TABLE(t), 'unique_id', 'ds', 'y', '|', '2')`` —
    inverse of combine (mirror of hierarchy.ts_split_keys; n_parts must be
    given: UDTF schemas are fixed at analyze time)."""

    @staticmethod
    def analyze(table, uid_col, ds_col, y_col, sep, n_parts):
        n = int(n_parts.value)
        fields = [_f(f"id_part_{i + 1}", T.StringType()) for i in range(n)]
        fields += [_f(ds_col.value, table.dataType[ds_col.value].dataType),
                   _f(y_col.value, table.dataType[y_col.value].dataType)]
        return AnalyzeResult(schema=T.StructType(fields))

    def eval(self, row, uid_col, ds_col, y_col, sep, n_parts):
        n = int(n_parts)
        uid = row[uid_col]
        parts = ([] if uid is None else str(uid).split(str(sep)))[:n]
        parts += [None] * (n - len(parts))
        yield (*parts, row[ds_col], row[y_col])


class ValidateSeparatorUDTF:
    """``ts_validate_separator(TABLE(t), 'id1,id2', '|')`` — single row
    (mirror of hierarchy.ts_validate_separator)."""

    @staticmethod
    def analyze(table, id_cols, sep):
        return AnalyzeResult(schema=T.StructType([
            _f("separator", T.StringType()),
            _f("is_valid", T.BooleanType()),
            _f("n_conflicts", T.IntegerType()),
            _f("conflicting_values", T.ArrayType(T.StringType())),
            _f("message", T.StringType())]), withSinglePartition=True)

    def __init__(self):
        self._n = 0
        self._vals: list = []

    def eval(self, row, id_cols, sep):
        self._args = (str(id_cols).split(","), str(sep))
        cols, s = self._args
        if any(row[c] is not None and s in _fmt_key(row[c]) for c in cols):
            self._n += 1
            if len(self._vals) < 100:
                self._vals.append("=".join(
                    _fmt_key(row[c]) for c in cols if row[c] is not None))

    def terminate(self):
        s = self._args[1] if hasattr(self, "_args") else ""
        ok = self._n == 0
        msg = "Separator is safe to use" if ok else \
            (f"Separator found in {self._n} value(s); choose a different "
             "separator")
        yield (s, ok, self._n, self._vals, msg)


class AggregateHierarchyUDTF:
    """``ts_aggregate_hierarchy(TABLE(t), 'id1,id2', 'ds', 'y', '|',
    'AGGREGATED')`` — all prefix levels per date, values summed (mirror of
    hierarchy.ts_aggregate_hierarchy; partitioned by date so each task
    aggregates one date's rows)."""

    @staticmethod
    def analyze(table, id_cols, ds_col, y_col, sep, keyword):
        return AnalyzeResult(schema=T.StructType([
            _f("unique_id", T.StringType()),
            _f(ds_col.value, table.dataType[ds_col.value].dataType),
            _f(y_col.value, T.DoubleType())]),
            partitionBy=[PartitioningColumn(ds_col.value)])

    def __init__(self):
        self._rows: list = []

    def eval(self, row, id_cols, ds_col, y_col, sep, keyword):
        self._args = (str(id_cols).split(","), ds_col, y_col, str(sep),
                      str(keyword))
        self._rows.append(row)

    def terminate(self):
        if not self._rows:
            return
        cols, ds_col, y_col, sep, kw = self._args
        ds = self._rows[0][ds_col]
        sums: dict = {}
        for r in self._rows:
            yv = r[y_col]
            yv = float(yv) if yv is not None else None
            parts = [r[c] for c in cols]
            for k in range(len(cols), -1, -1):
                lead = [_fmt_key(v) for v in parts[:k] if v is not None]
                key = sep.join(lead + [kw] * (len(cols) - k))
                if key in sums:
                    if yv is not None:
                        sums[key] = (sums[key] or 0.0) + yv
                else:
                    sums[key] = yv
        for key, v in sums.items():
            yield (key, ds, v)


def _conformal_udtfs():
    import numpy as np

    D = T.DoubleType()

    def _corrected_quantile(arr: "np.ndarray", alpha: float) -> float:
        """Mirror of conformal.ts_conformal_quantile + _interp_quantile."""
        n = len(arr)
        if n == 0:
            return float("nan")
        if n == 1:
            return float(arr[0])
        level = min(max(math.ceil((n + 1) * (1.0 - alpha)) / n, 0.0), 1.0)
        idx = level * (n - 1)
        lo = int(math.floor(idx))
        frac = idx - lo
        hi = min(lo + 1, n - 1)
        return float(arr[lo] * (1.0 - frac) + arr[hi] * frac)

    class ConformalByUDTF:
        """``ts_conformal_by(TABLE(t), 'id', 'actual', 'forecast', 'point',
        '0.1')`` (mirror of conformal.ts_conformal_by, symmetric method)."""

        @staticmethod
        def analyze(table, group_col, actual, forecast, point, alpha):
            g = group_col.value
            return AnalyzeResult(schema=T.StructType([
                _f(g, table.dataType[g].dataType),
                _f("point", T.ArrayType(D)), _f("lower", T.ArrayType(D)),
                _f("upper", T.ArrayType(D)), _f("coverage", D),
                _f("conformity_score", D), _f("method", T.StringType())]),
                partitionBy=[PartitioningColumn(g)])

        def __init__(self):
            self._rows: list = []

        def eval(self, row, group_col, actual, forecast, point, alpha):
            self._args = (group_col, actual, forecast, point, float(alpha))
            self._rows.append(row)

        def terminate(self):
            if not self._rows:
                return
            group_col, ac, fc, pt, alpha = self._args
            g = self._rows[0][group_col]
            res = np.sort(np.abs(np.array(
                [float(r[ac]) - float(r[fc]) for r in self._rows
                 if r[ac] is not None and r[fc] is not None])))
            point = sorted(float(r[pt]) for r in self._rows
                           if r[pt] is not None)
            score = _corrected_quantile(res, alpha)
            yield (g, point, [p - score for p in point],
                   [p + score for p in point], 1.0 - alpha, score,
                   "split_conformal")

    class CoverageByUDTF:
        """``ts_conformal_coverage_by(TABLE(t), 'id', 'actual', 'lower',
        'upper')``."""

        @staticmethod
        def analyze(table, group_col, actual, lower, upper):
            g = group_col.value
            return AnalyzeResult(schema=T.StructType([
                _f(g, table.dataType[g].dataType), _f("coverage", D)]),
                partitionBy=[PartitioningColumn(g)])

        def __init__(self):
            self._rows: list = []

        def eval(self, row, group_col, actual, lower, upper):
            self._args = (group_col, actual, lower, upper)
            self._rows.append(row)

        def terminate(self):
            if not self._rows:
                return
            group_col, ac, lo, up = self._args
            g = self._rows[0][group_col]
            hits = [1.0 if (r[ac] is not None and r[lo] is not None
                            and r[up] is not None
                            and r[lo] <= r[ac] <= r[up]) else 0.0
                    for r in self._rows]
            yield (g, sum(hits) / len(hits) if hits else None)

    class IntervalWidthUDTF:
        """``ts_interval_width_by(TABLE(t), 'id', 'lower', 'upper')``."""

        @staticmethod
        def analyze(table, group_col, lower, upper):
            g = group_col.value
            return AnalyzeResult(schema=T.StructType([
                _f(g, table.dataType[g].dataType), _f("mean_width", D),
                _f("n_intervals", T.LongType())]),
                partitionBy=[PartitioningColumn(g)])

        def __init__(self):
            self._rows: list = []

        def eval(self, row, group_col, lower, upper):
            self._args = (group_col, lower, upper)
            self._rows.append(row)

        def terminate(self):
            if not self._rows:
                return
            group_col, lo, up = self._args
            g = self._rows[0][group_col]
            ws = [float(r[up]) - float(r[lo]) for r in self._rows
                  if r[lo] is not None and r[up] is not None]
            if ws:
                yield (g, sum(ws) / len(ws), len(ws))

    class ConformalEvaluateUDTF:
        """``ts_conformal_evaluate(TABLE(t), 'id', 'actual', 'lower',
        'upper', '0.1')`` — coverage, mean width, Winkler."""

        @staticmethod
        def analyze(table, group_col, actual, lower, upper, alpha):
            g = group_col.value
            return AnalyzeResult(schema=T.StructType([
                _f(g, table.dataType[g].dataType), _f("coverage", D),
                _f("mean_width", D), _f("winkler_score", D)]),
                partitionBy=[PartitioningColumn(g)])

        def __init__(self):
            self._rows: list = []

        def eval(self, row, group_col, actual, lower, upper, alpha):
            self._args = (group_col, actual, lower, upper, float(alpha))
            self._rows.append(row)

        def terminate(self):
            if not self._rows:
                return
            group_col, ac, lo, up, alpha = self._args
            g = self._rows[0][group_col]
            cov, wid, wink = [], [], []
            for r in self._rows:
                a, l_, u = r[ac], r[lo], r[up]
                if a is None or l_ is None or u is None:
                    continue
                w = u - l_
                cov.append(1.0 if l_ <= a <= u else 0.0)
                wid.append(w)
                pen = (2.0 / alpha) * (l_ - a) if a < l_ else \
                      ((2.0 / alpha) * (a - u) if a > u else 0.0)
                wink.append(w + pen)
            if cov:
                n = len(cov)
                yield (g, sum(cov) / n, sum(wid) / n, sum(wink) / n)

    return {
        "ts_conformal_by": ConformalByUDTF,
        "ts_conformal_coverage_by": CoverageByUDTF,
        "ts_interval_width_by": IntervalWidthUDTF,
        "ts_conformal_evaluate": ConformalEvaluateUDTF,
    }


def _cv_udtfs():
    D = T.DoubleType()

    class CvSplitIndexUDTF:
        """``ts_cv_split_index_by(TABLE(t), 'id', 'ds', 'y', '500,550',
        '7')`` — explicit position-index folds (mirror of
        cv.ts_cv_split_index_by)."""

        @staticmethod
        def analyze(table, group_col, ds_col, y_col, cutoffs, horizon):
            g = group_col.value
            return AnalyzeResult(schema=T.StructType([
                _f(g, table.dataType[g].dataType),
                _f(ds_col.value, table.dataType[ds_col.value].dataType),
                _f(y_col.value, table.dataType[y_col.value].dataType),
                _f("fold_id", T.LongType()), _f("split", T.StringType())]),
                partitionBy=[PartitioningColumn(g)],
                orderBy=[OrderingColumn(ds_col.value)])

        def __init__(self):
            self._rows: list = []

        def eval(self, row, group_col, ds_col, y_col, cutoffs, horizon):
            self._args = (group_col, ds_col, y_col,
                          [int(c) for c in str(cutoffs).split(",")],
                          int(horizon))
            self._rows.append(row)

        def terminate(self):
            if not self._rows:
                return
            group_col, ds_col, y_col, cutoffs, h = self._args
            g = self._rows[0][group_col]
            for fold_id, te in enumerate(cutoffs):
                for pos, r in enumerate(self._rows):
                    if pos <= te:
                        yield (g, r[ds_col], r[y_col], fold_id, "train")
                    elif pos <= te + h:
                        yield (g, r[ds_col], r[y_col], fold_id, "test")

    class BacktestAutoUDTF:
        """``ts_backtest_auto_by(TABLE(t), 'id', 'ds', 'y', 'Naive', '7',
        '2')`` — expanding-window folds + per-fold fit + error columns
        (mirror of cv.ts_backtest_auto_by; fold boundaries match
        cv.ts_cv_folds_by's auto layout)."""

        @staticmethod
        def analyze(table, group_col, ds_col, y_col, method, horizon,
                    n_folds):
            g = group_col.value
            return AnalyzeResult(schema=T.StructType([
                _f(g, table.dataType[g].dataType),
                _f("fold_id", T.LongType()),
                _f(ds_col.value, table.dataType[ds_col.value].dataType),
                _f("yhat", D), _f("actual", D), _f("error", D),
                _f("abs_error", D), _f("yhat_lower", D), _f("yhat_upper", D),
                _f("model_name", T.StringType())]),
                partitionBy=[PartitioningColumn(g)],
                orderBy=[OrderingColumn(ds_col.value)])

        def __init__(self):
            self._rows: list = []

        def eval(self, row, group_col, ds_col, y_col, method, horizon,
                 n_folds):
            self._args = (group_col, ds_col, y_col, str(method),
                          int(horizon), int(n_folds))
            self._rows.append(row)

        def terminate(self):
            if not self._rows:
                return
            import numpy as np

            from . import models as M
            group_col, ds_col, y_col, method, h, folds = self._args
            g = self._rows[0][group_col]
            y = _nan_y(self._rows, y_col)
            n = len(y)
            model = M.canonical_model(method)
            for fold_id in range(folds):
                train_end = max(n - folds * h, 1) - 1 + fold_id * h
                if train_end + h >= n or train_end < 0:
                    continue
                train = y[:train_end + 1]
                if np.isfinite(train).sum() < 3:
                    continue
                try:
                    r = M.forecast(train, h, model, season_length=0,
                                   level=0.90, params={})
                except Exception:
                    continue
                for s in range(1, h + 1):
                    row = self._rows[train_end + s]
                    actual = row[y_col]
                    yhat = float(r.point[s - 1])
                    err = None if actual is None else float(actual) - yhat
                    yield (g, fold_id, row[ds_col], yhat,
                           None if actual is None else float(actual), err,
                           None if err is None else abs(err),
                           float(r.lower[s - 1]), float(r.upper[s - 1]),
                           r.model_name)

    return {
        "ts_cv_split_index_by": CvSplitIndexUDTF,
        "ts_backtest_auto_by": BacktestAutoUDTF,
    }


#: every registered SQL name (populated by register_all's first run);
#: each also gets the reference's ``anofox_fcst_`` alias
#: (``ts_macros.cpp:2185-2197`` registers both spellings for every macro).
REGISTERED_NAMES: list = []


def register_all(spark: SparkSession) -> None:
    """Register the SQL surface on a session. Idempotent.

    Mirrors the reference's registration list
    (src/anofox_forecast_extension.cpp:16-175 and the macro table in
    src/macros/ts_macros.cpp): operator / detection / hierarchy / conformal
    / cv UDTFs, grouped-metric UDTFs, prep-family UDTFs, 13 scalar metric
    functions (JVM-side Spark 4 SQL UDFs, not Python), and the
    ``anofox_fcst_*`` alias for every name."""
    names: list = []

    def reg_udtf(name, cls):
        fn = udtf(cls)
        spark.udtf.register(name, fn)
        spark.udtf.register(f"anofox_fcst_{name}", fn)
        names.append(name)

    reg_udtf("ts_forecast_by", ForecastUDTF)
    reg_udtf("ts_fill_gaps_by", FillGapsUDTF)
    reg_udtf("ts_cv_folds_by", CvFoldsUDTF)
    reg_udtf("ts_stats_by", StatsUDTF)
    reg_udtf("ts_detect_periods", DetectPeriodsUDTF)
    reg_udtf("ts_detect_periods_by", DetectPeriodsUDTF)
    for name, (metric, n_vals, extra) in _METRIC_BY_SPECS.items():
        reg_udtf(name, _make_metric_by_udtf(metric, n_vals, extra))
    for name, op in _PREP_UDTF_NAMES.items():
        reg_udtf(name, _make_prep_udtf(op))
    for name, cls in _detection_udtfs().items():
        reg_udtf(name, cls)
    reg_udtf("ts_combine_keys", CombineKeysUDTF)
    reg_udtf("ts_split_keys", SplitKeysUDTF)
    reg_udtf("ts_validate_separator", ValidateSeparatorUDTF)
    reg_udtf("ts_aggregate_hierarchy", AggregateHierarchyUDTF)
    for name, cls in _conformal_udtfs().items():
        reg_udtf(name, cls)
    for name, cls in _cv_udtfs().items():
        reg_udtf(name, cls)
    for name, sig, body in _SQL_SCALARS:
        for nm in (name, f"anofox_fcst_{name}"):
            spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {nm}{sig} "
                      f"RETURN {body}")
        names.append(name)
    REGISTERED_NAMES[:] = names
