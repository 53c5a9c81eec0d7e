"""Regression-backtest adapters (ref test/sql/ts_hydrate_features.test and
ts_prepare_regression_input.test): CV fold assignments joined back onto a
full-width feature table, with target masking for fit-predict pipelines.
The assertions mirror the reference test files' observable contract."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from anofox_forecast_spark.operators import cv as CV


@pytest.fixture(scope="module")
def frames(spark):
    # 60 days x 2 series with two feature columns, as the reference setup
    rows = []
    for sid in ("A", "B"):
        for i in range(60):
            rows.append((
                sid,
                datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i),
                10.0 + (50.0 if sid == "A" else 0.0) + i,
                20 + i % 10,
                i % 7 == 0,
            ))
    src = spark.createDataFrame(
        rows, ["series_id", "date", "revenue", "temperature", "is_weekend"])
    cv = CV.ts_cv_split_by(src.select("series_id", "date", "revenue"),
                           "series_id", "date", "revenue",
                           ["2024-01-30", "2024-02-15"], 7, "1d")
    return src, cv


def test_prepare_regression_masks_test_target(frames):
    src, cv = frames
    out = CV.ts_prepare_regression_input_by(cv, src, "series_id", "date",
                                            "revenue").cache()
    pdf = out.toPandas()
    # test rows have NULL masked_target: 2 folds x 2 series x 7 horizon
    nulls = pdf[pdf.masked_target.isna()]
    assert set(nulls.split) == {"test"}
    assert len(nulls) == 28
    # train rows all carry the target
    assert pdf[pdf.split == "train"].masked_target.notna().all()
    # _is_test flag matches split on every row
    assert ((pdf._is_test == (pdf.split == "test")).all())
    # features preserved on all rows
    assert pdf.temperature.notna().all() and pdf.is_weekend.notna().all()
    # raw target preserved (the reference selects it back as `actual`)
    assert pdf.revenue.notna().all()
    # both folds, both series per fold-split
    g = pdf.groupby(["fold_id", "split"]).group_col.nunique()
    assert (g == 2).all() and pdf.fold_id.nunique() == 2


def test_hydrate_features_contract(frames):
    src, cv = frames
    out = CV.ts_hydrate_features_by(cv, src, "series_id", "date").cache()
    assert set(out.columns) == {"fold_id", "split", "group_col", "date_col",
                                "target_col", "_is_test", "_train_cutoff",
                                "temperature", "is_weekend"}
    pdf = out.toPandas()
    assert len(pdf) == cv.count()
    # _is_test only on test rows
    assert int(pdf[pdf.split == "train"]._is_test.sum()) == 0
    assert pdf[pdf.split == "test"]._is_test.all()
    # target hydrated from the cv frame, never masked here
    assert pdf.target_col.notna().all()
    # _train_cutoff is the fold's max train date
    for fid, grp in pdf.groupby("fold_id"):
        cut = grp[grp.split == "train"].date_col.max()
        assert (grp._train_cutoff == cut).all()
    # masking pattern works downstream exactly as the reference example
    masked = out.withColumn(
        "temp_masked",
        F.when(F.col("_is_test"), F.lit(None)).otherwise(F.col("temperature")))
    mp = masked.toPandas()
    assert mp[mp.split == "test"].temp_masked.isna().all()
    assert mp[mp.split == "train"].temp_masked.notna().all()


def test_hydrate_features_ambiguous_target_raises(frames, spark):
    src, cv = frames
    wide = cv.withColumn("extra", F.lit(1.0))
    with pytest.raises(ValueError, match="ambiguous"):
        CV.ts_hydrate_features_by(wide, src, "series_id", "date")
    # explicit target_col resolves the ambiguity
    out = CV.ts_hydrate_features_by(wide, src, "series_id", "date",
                                    {"target_col": "revenue"})
    assert out.count() > 0
