"""Generative property test for ts_detect_anomalies_by (rolling-MAD
Iglewicz-Hoaglin modified z-score) vs a scalar replay: the window is the
previous ``window`` ROWS (self excluded; NULLs inside the slice are
dropped by collect_list), medians are type-7 interpolated, MAD == 0
falls back to the (y != median) rule, and short history / NULL y yield
NULL z and NULL is_anomaly."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from anofox_forecast_spark.operators.detect import ts_detect_anomalies_by

SLOW = settings(max_examples=8, deadline=None,
                suppress_health_check=list(HealthCheck))

_vals = st.one_of(st.none(), st.just(0.0), st.integers(-9, 9).map(float),
                  st.floats(-1e3, 1e3, allow_nan=False, width=32)
                    .map(float))

_series = st.lists(_vals, min_size=1, max_size=20)
_panel = st.lists(_series, min_size=1, max_size=4)

_EDGES = [
    [5.0] * 10,                                  # constant -> MAD 0
    [5.0] * 8 + [50.0],                          # spike after constants
    [None] * 4 + [1.0, 2.0, 3.0],                # leading NULL history
    [1.0, None, 2.0, None, 3.0, 100.0],          # interleaved NULLs
    [1.0],                                       # single point
    [0.0, 1.0] * 6 + [0.5],                      # alternating
]


def _median(sorted_vals):
    n = len(sorted_vals)
    if n == 1:
        return sorted_vals[0]
    ix = 0.5 * (n - 1)
    lo = int(math.floor(ix))
    frac = ix - lo
    return (sorted_vals[lo] * (1.0 - frac)
            + sorted_vals[min(lo + 1, n - 1)] * frac)


@SLOW
@example(panel=_EDGES, window=5, min_obs=3)
@given(panel=_panel, window=st.sampled_from([1, 4, 28]),
       min_obs=st.sampled_from([1, 3]))
def test_rolling_mad_anomalies_match_replay(spark, panel, window, min_obs):
    if min_obs > window:
        min_obs = window
    rows = [(g, dt.date(2024, 1, 1) + dt.timedelta(days=i), v)
            for g, ys in enumerate(panel) for i, v in enumerate(ys)]
    df = spark.createDataFrame(rows, "g int, ds date, y double")
    got = {(r["g"], r["ds"]): r for r in ts_detect_anomalies_by(
        df, "g", "ds", "y", window=window, threshold=3.5,
        min_obs=min_obs).collect()}
    for g, ys in enumerate(panel):
        for i, v in enumerate(ys):
            hist = sorted(x for x in ys[max(0, i - window):i]
                          if x is not None)
            r = got[(g, dt.date(2024, 1, 1) + dt.timedelta(days=i))]
            if len(hist) < min_obs:
                assert r["rolling_median"] is None
                assert r["robust_z"] is None and r["is_anomaly"] is None
                continue
            med = _median(hist)
            mad = _median(sorted(abs(x - med) for x in hist))
            assert r["rolling_median"] == pytest.approx(med, rel=1e-12)
            assert r["rolling_mad"] == pytest.approx(mad, rel=1e-12,
                                                     abs=1e-15)
            if v is None:
                assert r["is_anomaly"] is None
            elif mad > 0:
                z = 0.6745 * (v - med) / mad
                assert r["robust_z"] == pytest.approx(z, rel=1e-9)
                assert r["is_anomaly"] == (abs(z) > 3.5)
            else:
                assert r["robust_z"] is None
                assert r["is_anomaly"] == (v != med)
