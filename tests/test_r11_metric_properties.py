"""Generative property suite for the 12-metric family vs direct numpy
replays of the reference semantics (``metrics.rs:46-360``), with the
zero-denominator skip rules (``metrics.rs:113-135``) exercised by a
zero-biased value pool and pinned edge examples:

- MAPE skips rows with ``|actual| <= eps`` and is NaN when every row is
  skipped; sMAPE skips ``|a|+|f| <= eps`` rows likewise;
- MASE / rMAE / R² are NaN when their denominator vanishes;
- coverage counts both bounds inclusively.

All 12 metrics for all generated pairs run in ONE Spark query per
hypothesis example (a row per array pair, metrics as columns), so the
sweep stays fast while every example checks 12 x N values."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from anofox_forecast_spark.functions import metrics as MT

SLOW = settings(max_examples=10, deadline=None,
                suppress_health_check=list(HealthCheck))

EPS = MT.EPS

_vals = st.one_of(st.just(0.0), st.integers(-9, 9).map(float),
                  st.floats(min_value=-1e4, max_value=1e4, allow_nan=False,
                            allow_infinity=False, width=32).map(float))


@st.composite
def _pair_sets(draw):
    """A list of (actual, forecast, baseline) triples, equal lengths."""
    out = []
    for _ in range(draw(st.integers(1, 6))):
        n = draw(st.integers(1, 12))
        a = [draw(_vals) for _ in range(n)]
        f = [draw(_vals) for _ in range(n)]
        b = [draw(_vals) for _ in range(n)]
        out.append((a, f, b))
    return out


_EDGES = [
    ([0.0, 0.0, 0.0], [1.0, 2.0, 3.0], [0.0, 0.0, 0.0]),  # MAPE all-skip,
    #                                     baseline == actual -> MASE NaN
    ([0.0, 0.0], [0.0, 0.0], [1.0, 1.0]),  # sMAPE all-skip
    ([5.0, 5.0, 5.0], [4.0, 6.0, 5.0], [5.0, 5.0, 5.0]),  # constant actual
    #                                     -> R2 NaN, MASE NaN
    ([2.0], [2.0], [2.0]),                 # n=1, exact forecast: rMAE NaN
    ([1.0, -1.0, 0.0], [1.0, -1.0, 0.0], [0.5, -0.5, 0.5]),  # exact match
]


def _replay(a, f, b):
    """Direct numpy re-derivation of metrics.rs semantics."""
    a, f, b = np.array(a), np.array(f), np.array(b)
    d = a - f
    out = {"mae": np.abs(d).mean(), "mse": (d * d).mean(),
           "rmse": math.sqrt((d * d).mean()), "bias": (f - a).mean()}
    m = np.abs(a) > EPS
    out["mape"] = (np.abs(d[m] / a[m]).mean() * 100.0) if m.any() else math.nan
    sm = (np.abs(a) + np.abs(f)) > EPS
    out["smape"] = ((2.0 * np.abs(d[sm]) / (np.abs(a[sm]) + np.abs(f[sm])))
                    .mean() * 100.0) if sm.any() else math.nan
    bmae = np.abs(a - b).mean()
    out["mase"] = math.nan if abs(bmae) < EPS else np.abs(d).mean() / bmae
    ss_tot = ((a - a.mean()) ** 2).sum()
    out["r2"] = (math.nan if abs(ss_tot) < EPS
                 else 1.0 - (d * d).sum() / ss_tot)
    m2 = np.abs(a - b).mean()
    out["rmae"] = math.nan if abs(m2) < EPS else np.abs(d).mean() / m2
    q = 0.8
    out["ql"] = np.where(d >= 0, q * d, (q - 1.0) * d).mean()
    lo, up = f - 1.0, f + 1.0
    out["coverage"] = ((a >= lo) & (a <= up)).mean()
    qs = [0.2, 0.8]
    out["mqloss"] = float(np.mean([
        np.where(d >= 0, qq * d, (qq - 1.0) * d).mean() for qq in qs]))
    return out


def _check(spark, triples):
    rows = [(i, a, f, b, [x - 1.0 for x in f], [x + 1.0 for x in f],
             [f, f]) for i, (a, f, b) in enumerate(triples)]
    df = spark.createDataFrame(
        rows, "i int, a array<double>, f array<double>, b array<double>, "
              "lo array<double>, up array<double>, ff array<array<double>>")
    got = df.select(
        "i",
        MT.ts_mae("a", "f").alias("mae"),
        MT.ts_mse("a", "f").alias("mse"),
        MT.ts_rmse("a", "f").alias("rmse"),
        MT.ts_bias("a", "f").alias("bias"),
        MT.ts_mape("a", "f").alias("mape"),
        MT.ts_smape("a", "f").alias("smape"),
        MT.ts_mase("a", "f", "b").alias("mase"),
        MT.ts_r2("a", "f").alias("r2"),
        MT.ts_rmae("a", "f", "b").alias("rmae"),
        MT.ts_quantile_loss("a", "f", 0.8).alias("ql"),
        MT.ts_coverage("a", "lo", "up").alias("coverage"),
        MT.ts_mqloss("a", "ff", F.array(F.lit(0.2), F.lit(0.8)))
          .alias("mqloss"),
    ).collect()
    for r in got:
        want = _replay(*triples[r["i"]])
        for k, w in want.items():
            g = r[k]
            if math.isnan(w):
                assert g is not None and math.isnan(g), (
                    f"{k} row {r['i']}: want NaN got {g!r} "
                    f"({triples[r['i']]})")
            else:
                assert g == pytest.approx(w, rel=1e-9, abs=1e-9), (
                    f"{k} row {r['i']} ({triples[r['i']]})")


@SLOW
@example(triples=_EDGES)
@given(triples=_pair_sets())
def test_all_twelve_metrics_match_numpy_replay(spark, triples):
    _check(spark, triples)
