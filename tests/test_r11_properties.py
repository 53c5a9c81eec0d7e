"""Property tests for the six pure-Catalyst fold models (r10 physical
paths) against the numpy model library, generatively covering the
degenerate-edge class the Croston all-zero crash came from (r10 verdict
item #5): all-zero, single-nonzero, constant, leading/trailing NULLs,
horizon 1, m > n for SeasonalES — plus damped Holt.

Each hypothesis example generates a PANEL of series (one DataFrame, one
Spark query per model) so the Spark round trips amortize across series;
the oracle is a per-series ``models.forecast`` replay (the exact library
``ts_forecast`` rides). Agreement bar: 1e-9 relative — the fold models
are operation-identical to the numpy filters except Welford-vs-np.std
(~1e-12 rel), far inside it."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from anofox_forecast_spark.functions import models as M
from anofox_forecast_spark.operators.forecast import ts_forecast_by

SLOW = settings(max_examples=6, deadline=None,
                suppress_health_check=list(HealthCheck))

# value pool biased toward the degenerate shapes: zeros (intermittent
# models' branch points), a constant, small ints, NULLs, and literal
# NaN (missing-like on BOTH paths since the r11 review fix —
# interpolate_nulls_df masks isnan exactly like models.interpolate_nulls)
_vals = st.one_of(
    st.just(0.0), st.just(2.5), st.none(), st.just(float("nan")),
    st.integers(-50, 50).map(float),
    st.floats(min_value=-1e4, max_value=1e4, allow_nan=False,
              allow_infinity=False, width=32).map(float),
)

series_strategy = st.lists(_vals, min_size=1, max_size=24)
panel_strategy = st.lists(series_strategy, min_size=1, max_size=6)

# the named edge shapes from the verdict, always run (hypothesis
# @example pins them on top of the generative sweep)
_EDGES = [
    [0.0] * 8,                                   # all-zero
    [0.0, 0.0, 0.0, 5.0, 0.0, 0.0],              # single-nonzero
    [3.0] * 6,                                   # constant
    [None, None, 1.0, 2.0, 3.0],                 # leading NULLs
    [1.0, 2.0, 3.0, None, None],                 # trailing NULLs
    [None] * 5,                                  # all-NULL (skip expected)
    [1.0, 2.0],                                  # n < 3 (skip expected)
    [1.0, 5.0, 2.0, 8.0],                        # m > n for SeasonalES(7)
    [1.0, float("nan"), 3.0, float("nan"), 5.0],  # interior NaN
    [float("nan")] * 4,                          # all-NaN (skip expected)
    [float("nan"), None, 2.0, 4.0, None, 6.0],   # mixed NaN + NULL
]

FOLD_MODELS = [
    ("SES", {"alpha": 0.3}),
    ("CrostonClassic", {}),
    ("CrostonSBA", {}),
    ("TSB", {}),
    ("Holt", {"alpha": 0.4, "beta": 0.1}),
    ("Holt", {"alpha": 0.4, "beta": 0.1, "damped": True, "phi": 0.9}),
    ("SeasonalES", {"alpha": 0.3, "seasonal_period": 7}),
]


def _expected(ys, model, params, h):
    """Per-series numpy replay mirroring the _by path's error isolation:
    a series validate_series rejects contributes no rows."""
    y = np.array([np.nan if v is None else float(v) for v in ys])
    try:
        r = M.forecast(y, h, model, level=0.90, params=dict(params))
    except Exception:  # noqa: BLE001 — skip, like the UDF path
        return None
    return r


def _check_panel(spark, panel, model, params, h):
    rows = []
    for sid, ys in enumerate(panel):
        for i, v in enumerate(ys):
            rows.append((sid, dt.date(2024, 1, 1) + dt.timedelta(days=i),
                         None if v is None else float(v)))
    df = spark.createDataFrame(rows, "g int, ds date, y double")
    got = {}
    out = ts_forecast_by(df, "g", "ds", "y", method=model, horizon=h,
                         frequency="1d", params=dict(params))
    for r in out.collect():
        got.setdefault(r["g"], {})[r["forecast_step"]] = (
            r["yhat"], r["yhat_lower"], r["yhat_upper"])
    for sid, ys in enumerate(panel):
        ref = _expected(ys, model, params, h)
        if ref is None:
            assert sid not in got, (
                f"{model}: series {sid} {ys} should be skipped, "
                f"got {got.get(sid)}")
            continue
        assert sid in got and len(got[sid]) == h, (
            f"{model}: series {sid} {ys} missing forecast rows")
        for step in range(1, h + 1):
            exp = (ref.point[step - 1], ref.lower[step - 1],
                   ref.upper[step - 1])
            assert got[sid][step] == pytest.approx(exp, rel=1e-9,
                                                   abs=1e-9), (
                f"{model} {params}: series {sid} {ys} step {step}")


@SLOW
@example(panel=_EDGES, h=1)
@example(panel=_EDGES, h=7)
@given(panel=panel_strategy, h=st.integers(1, 8))
@pytest.mark.parametrize("model,params", FOLD_MODELS,
                         ids=lambda p: str(p)[:28])
def test_fold_models_match_numpy_on_degenerate_edges(
        spark, model, params, panel, h):
    _check_panel(spark, panel, model, params, h)
