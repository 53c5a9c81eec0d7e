"""Published-number model parity vs the reference's M4-Daily benchmark table
(`benchmark/README.md:23-59`, Anofox column).

The M4 Daily dataset is NOT shipped in this environment (no network, no
`datasetsforecast`), so the full comparison is gated on ``ANOFOX_M4_DIR``
pointing at a directory with ``train.parquet`` / ``test.parquet`` in Nixtla
long format (unique_id, ds, y). When present, every model in the published
table is fit with the same config the reference benchmark used
(`benchmark/configs/{baseline,ets}.py`: h=14, seasonality=7) and the mean
MASE is compared against the published column with a documented per-model
tolerance — tight for deterministic models (identical closed-form math),
loose for optimizer-driven ones (different optimizer stacks land in
different local minima).

The MASE replication follows `benchmark/src/common/evaluation.py` exactly:
per-series scale = mean |y_t - y_{t-7}| on train (seasonality 7 > 1), zero
scales -> inf, MASE = mean over series of (test MAE / scale).

The ungated test below pins the environment-independent implications of the
published table on synthetic M4-Daily-shaped panels, so SOME published-
structure evidence runs everywhere.
"""

import os

import numpy as np
import pytest

from anofox_forecast_spark.functions import models as M

H, SEASON = 14, 7

# benchmark/README.md:23-59, Anofox implementation column (MASE)
PUBLISHED_MASE = {
    "Naive": 1.153, "RandomWalkDrift": 1.147, "SMA": 1.290,
    "SeasonalNaive": 1.441, "SeasonalWindowAverage": 1.961,
    "AutoETS": 1.148, "HoltWinters": 1.152, "Holt": 1.196, "SES": 1.231,
    "SESOptimized": 1.160, "SeasonalES": 1.243, "SeasonalESOptimized": 1.203,
    "Theta": 1.227, "OptimizedTheta": 1.149, "DynamicTheta": 1.226,
    "DynamicOptimizedTheta": 1.155, "MFLES": 1.179, "MSTL": 1.302,
}
# deterministic closed-form models: identical math => tight bound;
# optimizer-driven: different optimizers/starting points => documented slack
TOL = {m: 0.02 for m in ["Naive", "RandomWalkDrift", "SMA", "SeasonalNaive",
                         "SeasonalWindowAverage", "SES", "SeasonalES"]}
TOL.update({m: 0.15 for m in PUBLISHED_MASE if m not in TOL})

SEASONAL_PARAM = {"SeasonalNaive", "SeasonalWindowAverage", "SeasonalES",
                  "SeasonalESOptimized", "HoltWinters", "AutoETS", "MFLES",
                  "MSTL"}

M4_DIR = os.environ.get("ANOFOX_M4_DIR", "/root/testdata/m4-daily")


def _mase(train_by_id: dict, test_by_id: dict, fcst_by_id: dict) -> float:
    vals = []
    for uid, yhat in fcst_by_id.items():
        tr, te = train_by_id[uid], test_by_id[uid]
        h = min(len(te), len(yhat))
        mae = float(np.mean(np.abs(te[:h] - yhat[:h])))
        d = np.abs(np.diff(tr, n=1)[SEASON - 1:]) if SEASON == 1 else \
            np.abs(tr[SEASON:] - tr[:-SEASON])
        scale = float(np.mean(d)) if len(d) else float("inf")
        if scale == 0.0:
            scale = float("inf")
        vals.append(mae / scale)
    return float(np.mean(vals))


def _run_model(name: str, train_by_id: dict) -> dict:
    out = {}
    for uid, y in train_by_id.items():
        season = SEASON if name in SEASONAL_PARAM else 0
        try:
            r = M.forecast(np.asarray(y, dtype=float), H,
                           M.canonical_model(name), season_length=season,
                           level=0.9, params={})
            out[uid] = np.asarray(r.point, dtype=float)
        except Exception:
            continue
    return out


@pytest.mark.skipif(not os.path.isdir(M4_DIR),
                    reason="M4 Daily dataset not available in this "
                           "environment (no network); set ANOFOX_M4_DIR to "
                           "run the published-number comparison")
@pytest.mark.parametrize("model", sorted(PUBLISHED_MASE))
def test_m4_daily_published_mase(model):
    import pandas as pd
    train = pd.read_parquet(os.path.join(M4_DIR, "train.parquet"))
    test = pd.read_parquet(os.path.join(M4_DIR, "test.parquet"))
    train_by_id = {k: g.sort_values("ds")["y"].to_numpy(dtype=float)
                   for k, g in train.groupby("unique_id")}
    test_by_id = {k: g.sort_values("ds")["y"].to_numpy(dtype=float)
                  for k, g in test.groupby("unique_id")}
    fc = _run_model(model, train_by_id)
    assert len(fc) >= 0.99 * len(train_by_id)
    got = _mase(train_by_id, test_by_id, fc)
    want = PUBLISHED_MASE[model]
    assert abs(got - want) <= TOL[model] * want, \
        f"{model}: MASE {got:.4f} vs published {want} (tol {TOL[model]:.0%})"


def _panel(n_series, n, seed, trend_rng=(0.0, 0.0), amp_rel=(0.0, 0.0),
           noise_rel=0.01):
    """M4-Daily-shaped fixtures (positive level, h=14 holdout)."""
    rng = np.random.default_rng(seed)
    train, test = {}, {}
    t = np.arange(n + H)
    for s in range(n_series):
        level = rng.uniform(200, 2000)
        trend = rng.uniform(*trend_rng)
        amp = rng.uniform(*amp_rel) * level
        phase = rng.integers(0, SEASON)
        y = (level + trend * t
             + amp * np.sin(2 * np.pi * (t + phase) / SEASON)
             + rng.normal(0, noise_rel * level, n + H))
        train[s], test[s] = y[:n], y[n:]
    return train, test


def _mase_table(models, train, test):
    mase = {}
    for m in models:
        fc = _run_model(m, train)
        assert len(fc) == len(train), m
        mase[m] = _mase(train, test, fc)
        assert np.isfinite(mase[m]) and 0 < mase[m] < 100, (m, mase[m])
    return mase


def test_m4_style_accuracy_structure_trending():
    """On clearly-trending panels (the dominant M4-Daily shape) the
    trend-aware models must beat the flat ones — the ordering the published
    table shows (RWD 1.147 < Naive 1.153; Holt-family near the top)."""
    train, test = _panel(50, 200, seed=7, trend_rng=(2.0, 8.0))
    mase = _mase_table(["Naive", "RandomWalkDrift", "SMA", "SES",
                        "SESOptimized", "Holt", "Theta"], train, test)
    assert mase["RandomWalkDrift"] < mase["Naive"]
    assert mase["Holt"] < mase["Naive"]
    assert mase["Theta"] < mase["Naive"]
    # optimizer lands in the same accuracy regime as its fixed twin (in-
    # sample SSE optimization is not an out-of-sample theorem, but a blown
    # optimizer shows up as a multiple, not a fraction)
    assert mase["SESOptimized"] <= mase["SES"] * 1.5


def test_m4_style_accuracy_structure_seasonal():
    """On clearly-seasonal panels the season-aware models must beat their
    season-blind twins (SeasonalNaive/SeasonalES/HoltWinters vs
    Naive/SES/Holt)."""
    train, test = _panel(50, 200, seed=11, amp_rel=(0.10, 0.25))
    mase = _mase_table(["Naive", "SeasonalNaive", "SeasonalWindowAverage",
                        "SES", "SeasonalES", "SeasonalESOptimized", "Holt",
                        "HoltWinters"], train, test)
    assert mase["SeasonalNaive"] < mase["Naive"]
    assert mase["SeasonalES"] < mase["SES"]
    assert mase["HoltWinters"] < mase["Holt"]
    assert mase["SeasonalESOptimized"] <= mase["SeasonalES"] * 1.5
