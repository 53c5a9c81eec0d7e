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


def test_ols_fit_predict_recovers_coefficients(spark):
    """Intercept + 2-feature OLS per group: matches numpy lstsq to 1e-9,
    NULL-target rows predicted but never trained on."""
    import datetime

    import numpy as np
    import pandas as pd

    from anofox_forecast_spark.operators.regression import ols_fit_predict_by
    rng = np.random.default_rng(3)
    rows = []
    for fold in (1, 2):
        for i in range(50):
            x1, x2 = float(i % 10), float((i * 3) % 7)
            y = 2.0 + 1.5 * x1 - 0.8 * x2 + float(rng.normal(0, 0.1))
            rows.append((fold, "A",
                         datetime.datetime(2024, 1, 1)
                         + datetime.timedelta(days=i),
                         None if i >= 40 else y, x1, x2, y))
    pdf = pd.DataFrame(rows, columns=["fold_id", "gid", "ds", "masked",
                                      "x1", "x2", "truth"])
    df = spark.createDataFrame(
        pdf[["fold_id", "gid", "ds", "masked", "x1", "x2"]])
    out = ols_fit_predict_by(df, "fold_id", ["gid", "ds"], "masked",
                             ["x1", "x2"]).toPandas()
    assert len(out) == 100 and out.yhat.notna().all()
    for fold in (1, 2):
        tr = pdf[(pdf.fold_id == fold) & pdf.masked.notna()]
        A = np.column_stack([np.ones(len(tr)), tr.x1, tr.x2])
        b, *_ = np.linalg.lstsq(A, tr.masked.astype(float), rcond=None)
        sub = out[out.fold_id == fold].sort_values("ds")
        want = b[0] + b[1] * pdf[pdf.fold_id == fold].sort_values("ds").x1.to_numpy() \
            + b[2] * pdf[pdf.fold_id == fold].sort_values("ds").x2.to_numpy()
        assert np.allclose(sub.yhat.to_numpy(), want, atol=1e-9)


def test_ols_fit_predict_singular_design_yields_null(spark):
    """Collinear features (x2 = 2*x1) make det(X'X) == 0 -> NULL yhat, no
    crash (the operator's singularity guard)."""
    import pandas as pd

    from anofox_forecast_spark.operators.regression import ols_fit_predict_by
    pdf = pd.DataFrame({
        "fold_id": [1] * 6, "ord": range(6),
        "y": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
        "x1": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
        "x2": [2.0, 4.0, 6.0, 8.0, 10.0, 12.0],
    })
    out = ols_fit_predict_by(spark.createDataFrame(pdf), "fold_id", ["ord"],
                             "y", ["x1", "x2"]).toPandas()
    assert out.yhat.isna().all()


def test_ols_fit_predict_sql_matches_dataframe(spark):
    """SQL UDTF == DataFrame op on the same reg input (rtol 1e-9)."""
    import datetime

    import numpy as np
    import pandas as pd

    from anofox_forecast_spark.functions.sql import register_all
    from anofox_forecast_spark.operators.regression import ols_fit_predict_by
    register_all(spark)
    rng = np.random.default_rng(9)
    rows = []
    for fold in (1, 2):
        for i in range(30):
            x1, x2 = float(i % 5), float((i * 7) % 11)
            y = 1.0 + 0.5 * x1 + 2.0 * x2 + float(rng.normal(0, 0.2))
            rows.append((fold, i,
                         None if i >= 25 else y, x1, x2))
    pdf = pd.DataFrame(rows, columns=["fold_id", "ord", "masked",
                                      "x1", "x2"])
    df = spark.createDataFrame(pdf)
    df.createOrReplaceTempView("reg_in")
    sql_out = spark.sql(
        "SELECT * FROM ols_fit_predict_by(TABLE(reg_in), 'fold_id', "
        "'ord', 'masked', 'x1,x2')").toPandas().sort_values(
        ["fold_id", "ord"]).reset_index(drop=True)
    df_out = ols_fit_predict_by(df, "fold_id", ["ord"], "masked",
                                ["x1", "x2"]).toPandas().sort_values(
        ["fold_id", "ord"]).reset_index(drop=True)
    np.testing.assert_allclose(sql_out.yhat, df_out.yhat, rtol=1e-9)


def test_ridge_shrinks_coefficients(spark):
    """params={'l2': λ} penalizes the non-intercept diagonal: slope
    magnitudes shrink monotonically with λ, intercept stays unpenalized."""
    import numpy as np
    import pandas as pd

    from anofox_forecast_spark.operators.regression import ols_fit_predict_by
    rng = np.random.default_rng(5)
    n = 60
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 1, n)
    y = 3.0 + 2.0 * x1 - 1.0 * x2 + rng.normal(0, 0.1, n)
    pdf = pd.DataFrame({"g": [1] * n, "ord": range(n), "y": y,
                        "x1": x1, "x2": x2})
    df = spark.createDataFrame(pdf)

    def slopes(l2):
        out = ols_fit_predict_by(df, "g", ["ord"], "y", ["x1", "x2"],
                                 {"l2": l2}).toPandas().sort_values("ord")
        # recover slopes from predictions at three probe rows via lstsq
        A = np.column_stack([np.ones(n), x1, x2])
        b, *_ = np.linalg.lstsq(A, out.yhat.to_numpy(), rcond=None)
        return b

    b0 = slopes(0.0)
    b10 = slopes(10.0)
    b100 = slopes(100.0)
    assert abs(b10[1]) < abs(b0[1]) and abs(b100[1]) < abs(b10[1])
    assert abs(b10[2]) < abs(b0[2]) and abs(b100[2]) < abs(b10[2])
