"""Round-6 fidelity additions: reference-default period-confidence filtering
(``periods.rs:1488-1546``), true matrix-profile period (``periods.rs:1134-
1250``), faithful fractional-period SAZED (``periods.rs:1259-1330``), and
STL-decomposition candidate scoring (``periods.rs:952-1120``)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from anofox_forecast_spark.operators.detect import (
    DEFAULT_MIN_CONFIDENCE_ACF,
    DEFAULT_MIN_CONFIDENCE_FFT,
    _matrix_profile_period,
    _sazed,
    _stl_period,
    detect_periods,
    ts_detect_periods_by,
)


def _noise(n=200, seed=5):
    return np.asarray(np.random.default_rng(seed).normal(0.0, 1.0, n))


def test_default_thresholds_match_reference():
    # periods.rs:1363-1375
    assert DEFAULT_MIN_CONFIDENCE_ACF == 0.3
    assert DEFAULT_MIN_CONFIDENCE_FFT == 5.0


def test_weak_seasonality_returns_no_seasonality():
    """The reference SQL surface answers "no seasonality" on noise
    (ts_periods.cpp:95-163 -> periods.rs:1505-1516): empty periods,
    primary_period 0.0, method suffixed ' (no seasonality)'."""
    y = _noise()
    for method in ("acf", "auto", "stl", "matrix_profile"):
        out = detect_periods(y, method)
        assert out["periods"] == [], method
        assert out["n_periods"] == 0
        assert out["primary_period"] == 0.0
        assert out["method"] == f"{method} (no seasonality)"


def test_min_confidence_zero_disables_filter():
    y = _noise()
    out = detect_periods(y, "acf", min_confidence=0.0)
    # unfiltered: the best ACF local max is emitted even when weak
    assert out["n_periods"] >= 1
    assert out["method"] == "acf"
    # custom threshold: an impossible bar always yields the empty result
    out = detect_periods(y, "acf", min_confidence=2.0)
    assert out["periods"] == []
    assert out["method"] == "acf (no seasonality)"


def test_fft_confidence_is_peak_to_mean():
    t = np.arange(140, dtype=float)
    y = 5.0 + np.sin(2 * np.pi * t / 7)
    out = detect_periods(y, "fft")
    # a pure sine concentrates nearly all power in one of 70 bins: the
    # peak-to-mean ratio is ~n_bins, far above the 5.0 default threshold
    assert out["periods"][0]["confidence"] > 50.0
    assert out["primary_period"] == 7.0
    # the share-of-total convention (regression branch) stays on [0, 1]
    reg = detect_periods(y, "regression")
    assert 0.0 <= reg["periods"][0]["confidence"] <= 1.0


def test_sazed_fractional_period():
    t = np.arange(210, dtype=float)
    y = 20.0 + 5.0 * np.sin(2 * np.pi * t / 7)
    p, pw, snr = _sazed(y)
    # period = padded_len / k is fractional (f64 in the reference)
    assert p != int(p)
    assert abs(p - 7.0) < 0.1
    assert snr > 1.0 and pw > 0.0


def test_sazed_padded_len_is_next_pow2_of_4n():
    # n=210 -> 4n=840 -> 1024; detected period must be 1024/k for integer k
    t = np.arange(210, dtype=float)
    y = 1.0 + np.sin(2 * np.pi * t / 10)
    p, _, _ = _sazed(y)
    k = 1024.0 / p
    assert abs(k - round(k)) < 1e-9


def test_matrix_profile_reference_parameters():
    """m = clamp(n/10, 4, n/4), exclusion m/4, period from the motif-index
    spacing histogram (periods.rs:1134-1250)."""
    rng = np.random.default_rng(7)
    t = np.arange(300, dtype=float)
    y = 10.0 + 4.0 * np.sin(2 * np.pi * t / 25) + rng.normal(0, 0.4, 300)
    p, conf = _matrix_profile_period(y)
    # noisy periodic series: NN spacings concentrate on the true period
    assert p % 25.0 == 0.0 or abs(p - 25.0) <= 2.0
    assert 0.0 < conf <= 1.0
    # too-short series errors out in the reference (n < 32) -> NaN here
    p, conf = _matrix_profile_period(y[:20])
    assert np.isnan(p) and conf == 0.0


def test_stl_scores_with_decomposition():
    t = np.arange(210, dtype=float)
    y = 20.0 + 5.0 * np.sin(2 * np.pi * t / 7) + 0.05 * t
    p, s = _stl_period(y)
    assert p % 7.0 == 0.0
    assert s > 0.9
    # constant series: total_var < EPS -> (NaN, 0) like periods.rs:996-1006
    p, s = _stl_period(np.full(100, 3.25))
    assert np.isnan(p) and s == 0.0


def test_detect_periods_by_schema_is_double(spark):
    t = np.arange(96)
    pdf = pd.DataFrame({
        "id": ["a"] * 96,
        "ds": t,
        "y": 10.0 + 3.0 * np.sin(2 * np.pi * t / 12),
    })
    out = ts_detect_periods_by(spark.createDataFrame(pdf), "id", "ds", "y",
                               {"method": "fft"})
    types = dict((f.name, f.dataType.simpleString()) for f in out.schema)
    assert types["period"] == "double"
    assert types["primary_period"] == "double"
    assert types["matched_expected_period"] == "double"
    rows = out.toPandas()
    assert rows["period"].iloc[0] == 12.0


def test_detect_periods_by_min_confidence_param(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({
        "id": ["a"] * 128,
        "ds": np.arange(128),
        "y": rng.normal(0, 1, 128),
    })
    df = spark.createDataFrame(pdf)
    filtered = ts_detect_periods_by(df, "id", "ds", "y",
                                    {"method": "acf"}).toPandas()
    assert filtered["method"].iloc[0] == "acf (no seasonality)"
    assert filtered["n_periods"].iloc[0] == 0
    raw = ts_detect_periods_by(df, "id", "ds", "y",
                               {"method": "acf",
                                "min_confidence": 0.0}).toPandas()
    assert raw["method"].iloc[0] == "acf"
    assert raw["n_periods"].iloc[0] >= 1


def test_expected_period_tolerance_is_reference_default():
    """DEFAULT_TOLERANCE = 0.1: |p - e| / e <= 0.1 (periods.rs:1378-1380)."""
    t = np.arange(140, dtype=float)
    y = 5.0 + np.sin(2 * np.pi * t / 7)
    out = detect_periods(y, "acf", expected_periods=[7.5])
    d = out["periods"][0]
    assert d["matches_expected"] and d["matched_expected_period"] == 7.5
    out = detect_periods(y, "acf", expected_periods=[8.0])
    assert not out["periods"][0]["matches_expected"]


def test_mean_interval_width_scalar(spark):
    """ref conformal.cpp:1202-1244 / conformal.rs:459-465: mean of
    elementwise widths; NULL on length mismatch; NaN on empty."""
    from pyspark.sql import functions as F

    from anofox_forecast_spark.operators.conformal import (
        ts_mean_interval_width,
    )
    df = spark.createDataFrame(
        [([1.0, 2.0], [3.0, 5.0]), ([1.0], [2.0, 3.0]), ([], [])],
        "lo array<double>, up array<double>")
    rows = df.select(ts_mean_interval_width(F.col("lo"), F.col("up"))
                     .alias("w")).collect()
    assert rows[0]["w"] == 2.5
    assert rows[1]["w"] is None
    assert math.isnan(rows[2]["w"])


def test_estimate_period_acf_scalar(spark):
    """ref ts_periods.cpp:551-624: struct(period, frequency, power,
    confidence, method); NULL fields under 4 points."""
    from pyspark.sql import functions as F

    from anofox_forecast_spark.operators.detect import (
        ts_estimate_period_acf,
    )
    t = np.arange(140, dtype=float)
    y = (5.0 + np.sin(2 * np.pi * t / 7)).tolist()
    df = spark.createDataFrame([(y,), ([1.0, 2.0, 3.0],)],
                               "ys array<double>")
    rows = df.select(ts_estimate_period_acf(F.col("ys")).alias("r")) \
             .select("r.*").collect()
    assert rows[0]["period"] == 7.0
    assert rows[0]["frequency"] == pytest.approx(1.0 / 7.0)
    assert rows[0]["method"] == "acf"
    assert rows[0]["confidence"] > 0.3
    assert rows[1]["period"] is None and rows[1]["method"] is None


def test_estimate_period_fft_scalar(spark):
    """ref ts_periods.cpp ts_estimate_period_fft: raw top-bin estimate, no
    default-threshold filter; power = share, confidence = peak-to-mean."""
    from pyspark.sql import functions as F

    from anofox_forecast_spark.operators.detect import (
        ts_estimate_period_fft,
    )
    t = np.arange(140, dtype=float)
    y = (5.0 + np.sin(2 * np.pi * t / 7)).tolist()
    df = spark.createDataFrame([(y,), ([1.0, 2.0, 3.0],)],
                               "ys array<double>")
    rows = df.select(ts_estimate_period_fft(F.col("ys")).alias("r")) \
             .select("r.*").collect()
    assert rows[0]["period"] == 7.0
    assert rows[0]["confidence"] > 5.0  # strong peak clears the default bar
    assert 0.0 < rows[0]["power"] <= 1.0
    assert rows[1]["period"] is None


def test_sql_surface_r6_names(spark):
    """The r6 additions are callable from SQL: scalar
    ts_mean_interval_width (pure SQL UDF), the two period-estimator UDFs,
    and the regression-adapter UDTFs over a cv-to-source pre-join."""
    import datetime

    from anofox_forecast_spark.functions.sql import register_all
    register_all(spark)
    w = spark.sql("SELECT ts_mean_interval_width(array(1.0D, 2.0D), "
                  "array(3.0D, 5.0D)) AS w").collect()[0]["w"]
    assert w == 2.5
    rows = [([float(5 + math.sin(2 * math.pi * i / 7))
              for i in range(140)],)]
    spark.createDataFrame(rows, "ys array<double>") \
         .createOrReplaceTempView("r6_arrs")
    got = spark.sql("SELECT ts_estimate_period_acf(ys).period AS pa, "
                    "ts_estimate_period_fft(ys).period AS pf "
                    "FROM r6_arrs").collect()[0]
    assert got["pa"] == 7.0 and got["pf"] == 7.0
    data = []
    for i in range(40):
        split = "train" if i < 30 else ("test" if i < 37 else None)
        if split:
            data.append(("A", datetime.datetime(2024, 1, 1)
                         + datetime.timedelta(days=i),
                         10.0 + i, 20 + i % 10, 1, split))
    df = spark.createDataFrame(
        data, ["id", "ds", "y", "temp", "fold_id", "split"])
    df.createOrReplaceTempView("r6_prejoin")
    p = spark.sql("SELECT * FROM ts_prepare_regression_input_by("
                  "TABLE(r6_prejoin), 'id', 'ds', 'y')").toPandas()
    assert p[p.split == "test"].masked_target.isna().all()
    assert p[p.split == "train"].masked_target.notna().all()
    h = spark.sql("SELECT * FROM ts_hydrate_features_by("
                  "TABLE(r6_prejoin), 'id', 'ds', 'y')").toPandas()
    assert "_train_cutoff" in h.columns and "target_col" in h.columns
    assert (h._train_cutoff == h[h.split == "train"].date_col.max()).all()
