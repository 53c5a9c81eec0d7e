"""r13 optimization guards: the C optimizer loops (functions/_cfilters.c)
must be BIT-IDENTICAL to the pure-Python closures they replace — same
forecasts, intervals, AIC/BIC, model selection, to the last bit — and the
loader must degrade gracefully when the library is unavailable.

These tests run the same model over the same series twice, once with the
compiled library and once with the Python fallback (by stubbing the
loader), and struct-pack every double for an exact compare.  No Spark.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from anofox_forecast_spark.functions import cfilters
from anofox_forecast_spark.functions import models as M

LIB = cfilters.get_lib()

pytestmark = pytest.mark.skipif(
    LIB is None, reason="cfilters unavailable (no gcc?) — Python path only")


def _pack(v):
    if v is None:
        return b"none"
    a = np.atleast_1d(np.asarray(v, dtype=float)).ravel()
    return struct.pack(f"<{a.size}d", *a)


def _snap(r):
    return (_pack(r.point), _pack(r.lower), _pack(r.upper), r.model_name,
            _pack(r.fitted) if r.fitted is not None else b"-",
            _pack(r.residuals) if r.residuals is not None else b"-",
            struct.pack("<d", r.aic) if r.aic == r.aic else b"nan",
            struct.pack("<d", r.bic) if r.bic == r.bic else b"nan")


def _forecast_both(y, model, season, params):
    """Run once on the C path, once on the Python fallback.  A model that
    rejects the series (e.g. M-error ETS on non-positive data) must
    reject it identically on both paths — returns (exc, exc) then."""
    assert cfilters.get_lib() is not None
    try:
        r_c = M.forecast(y.copy(), 7, model, season_length=season, level=0.9,
                         params=dict(params))
    except Exception as ex:  # noqa: BLE001
        r_c = (type(ex).__name__, str(ex))
    saved = (cfilters._lib, cfilters._tried)
    try:
        cfilters._lib, cfilters._tried = None, True
        assert cfilters.get_lib() is None
        try:
            r_py = M.forecast(y.copy(), 7, model, season_length=season,
                              level=0.9, params=dict(params))
        except Exception as ex:  # noqa: BLE001
            r_py = (type(ex).__name__, str(ex))
    finally:
        cfilters._lib, cfilters._tried = saved
    if isinstance(r_c, tuple) or isinstance(r_py, tuple):
        assert r_c == r_py, f"exception mismatch: {r_c} vs {r_py}"
    return r_c, r_py


MODELS = [
    ("SESOptimized", 0, {}),
    ("Holt", 0, {}),
    ("Holt", 0, {"damped": True}),
    ("HoltWinters", 7, {"seasonal_period": 7}),
    ("SeasonalES", 7, {"seasonal_period": 7}),
    ("SeasonalESOptimized", 7, {"seasonal_period": 7}),
    ("ETS", 7, {"model": "MAM", "seasonal_period": 7}),
    ("ETS", 7, {"model": "MAdM", "seasonal_period": 7}),
    ("ETS", 7, {"model": "MNN", "seasonal_period": 7}),
    ("ETS", 7, {"model": "MNA", "seasonal_period": 7}),
    ("ETS", 7, {"model": "AAdA", "seasonal_period": 7}),
    ("AutoETS", 7, {"seasonal_period": 7}),
    ("Theta", 7, {}),
    ("OptimizedTheta", 7, {}),
    ("DynamicTheta", 7, {}),
    ("DynamicOptimizedTheta", 7, {}),
    ("AutoTheta", 7, {}),
    ("ARIMA", 0, {"p": 2, "d": 1, "q": 2}),
    ("ARIMA", 0, {"p": 0, "d": 1, "q": 2}),
    ("AutoARIMA", 0, {}),
    ("CrostonOptimized", 0, {}),
    ("MSTL", 12, {"seasonal_period": 12}),
    ("AutoMSTL", 12, {}),
    ("MFLES", 12, {"seasonal_period": 12}),
    ("TBATS", 12, {"seasonal_period": 12}),
    ("AutoTBATS", 12, {}),
]


@pytest.mark.parametrize("model,season,params", MODELS)
def test_c_path_bit_equals_python_path(model, season, params):
    rng = np.random.RandomState(13)
    for kind in range(4):
        n = [24, 60, 144, 90][kind]
        y = 50 + 10 * np.sin(2 * np.pi * np.arange(n) / 7.0) + rng.randn(n)
        if kind == 1:
            y = y + np.linspace(0, 20, n)
        elif kind == 2:
            y = np.abs(y) + 1.0          # strictly positive (M-error pool)
        elif kind == 3:
            y = np.where(rng.rand(n) < 0.5, 0.0, np.abs(y))  # intermittent
        r_c, r_py = _forecast_both(np.asarray(y, dtype=float), model,
                                   season, params)
        if isinstance(r_c, tuple):
            continue  # both raised identically (asserted in the helper)
        assert _snap(r_c) == _snap(r_py), f"{model} kind={kind}"


def test_c_path_handles_nan_series_identically():
    # NaN observations exercise the NaN-skip/reseed branches of every loop
    rng = np.random.RandomState(7)
    y = 50 + rng.randn(80)
    y[[3, 10, 11, 40, 79]] = np.nan
    for model, season, params in [("SESOptimized", 0, {}), ("Holt", 0, {}),
                                  ("HoltWinters", 7, {"seasonal_period": 7}),
                                  ("SeasonalESOptimized", 7,
                                   {"seasonal_period": 7})]:
        # models.forecast interpolates NaN first; call the internals the
        # way _auto_ets does to hit the raw loops too
        r_c, r_py = _forecast_both(y, model, season, params)
        assert _snap(r_c) == _snap(r_py), model


def test_c_nelder_mead_trajectory_bit_equals_python():
    # the whole-optimizer C drivers (nm_*, golden_*) must land on the
    # SAME point as models.nelder_mead / golden_section running the
    # C objective per step — the trajectory, not just the optimum
    rng = np.random.RandomState(23)
    for trial in range(25):
        n = int(rng.randint(4, 150))
        y = np.ascontiguousarray(
            50 + rng.randn(n) * rng.uniform(0.1, 20)
            + np.linspace(0, rng.uniform(-10, 10), n))
        p = M._dp(y)
        # nm_holt vs Python NM over the C holt_sse objective
        out = np.empty(2)
        LIB.nm_holt(p, n, 1.0, M._dp(out))
        ref = M.nelder_mead(lambda x: LIB.holt_sse(p, n, x[0], x[1], 1.0),
                            [0.5, 0.1], bounds=[(0.01, 0.99), (0.01, 0.99)])
        assert struct.pack("<2d", *out) == struct.pack("<2d", *ref), trial
        # golden_ses vs Python golden over the C ses_sse objective
        a_c = LIB.golden_ses(p, n)
        a_py = M.golden_section(lambda a: LIB.ses_sse(p, n, a), 0.01, 0.99)
        assert struct.pack("<d", a_c) == struct.pack("<d", a_py), trial
        # nm_theta vs Python NM over the C theta_sse objective
        b1, b0 = M._linfit(y)
        out2 = np.empty(2)
        LIB.nm_theta(p, n, b0, b1, M._dp(out2))
        ref2 = M.nelder_mead(
            lambda x: LIB.theta_sse(p, n, b0, b1, x[0], x[1]),
            [2.0, 0.3], bounds=[(1.0, 5.0), (0.01, 0.99)])
        assert struct.pack("<2d", *out2) == struct.pack("<2d", *ref2), trial


def test_c_argsort_matches_python_sorted_on_ties():
    # ties in the simplex objective values exercise the stable-sort
    # replica: a constant objective must still land on the same point
    y = np.ascontiguousarray(np.zeros(16))
    p = M._dp(y)
    out = np.empty(2)
    LIB.nm_holt(p, 16, 1.0, M._dp(out))
    ref = M.nelder_mead(lambda x: LIB.holt_sse(p, 16, x[0], x[1], 1.0),
                        [0.5, 0.1], bounds=[(0.01, 0.99), (0.01, 0.99)])
    assert struct.pack("<2d", *out) == struct.pack("<2d", *ref)


def test_loader_fallback_is_silent():
    saved = (cfilters._lib, cfilters._tried)
    try:
        cfilters._lib, cfilters._tried = None, True
        assert cfilters.get_lib() is None
        # forecasting still works on the Python path
        y = np.arange(30, dtype=float) + 1
        r = M.forecast(y, 7, "HoltWinters", season_length=7, level=0.9,
                       params={"seasonal_period": 7})
        assert len(r.point) == 7
    finally:
        cfilters._lib, cfilters._tried = saved


def test_compile_is_content_addressed_and_reusable(tmp_path, monkeypatch):
    # a second loader pointed at the same source reuses the cached .so
    import importlib
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    monkeypatch.delenv("ANOFOX_NO_CFILTERS", raising=False)
    mod = importlib.reload(cfilters)
    try:
        lib1 = mod.get_lib()
        assert lib1 is not None
        path = mod._build_path(open(mod._C_SRC, "rb").read())
        assert path.startswith(str(tmp_path))
        import os
        assert os.path.exists(path)
    finally:
        importlib.reload(cfilters)
