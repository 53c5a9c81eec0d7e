"""The examples/ scripts stay runnable — they double as user documentation
for the reference's documented workflows."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_regression_backtest_example(spark):
    from examples.regression_backtest import run
    out = run(spark, SF_DIR).toPandas()
    assert len(out) == 2 and out["metric_value"].notna().all()


def test_forecast_conformal_example(spark):
    from examples.forecast_conformal import run
    periods, fc, conf = run(spark, SF_DIR)
    assert periods.count() > 0
    assert fc.count() > 0
    assert conf.count() > 0


def test_llm_pipeline_example(spark):
    from examples.llm_data_pipeline import run
    kept, dup_groups, near, shortlist = run(spark, SF_DIR)
    assert kept.count() > 0
    assert dup_groups.count() >= 0
    assert near.count() >= 0
    assert shortlist.count() > 0
