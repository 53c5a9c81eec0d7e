"""Physical-plan guard-rails: the scale claims each operator family makes,
asserted mechanically (SURVEY.md §4 / README "Scale posture")."""

from __future__ import annotations

from pyspark.sql import functions as F

from anofox_forecast_spark import plans as P
from anofox_forecast_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs
from anofox_forecast_spark.operators.forecast import ts_forecast_by
from anofox_forecast_spark.operators.prep import ts_fill_gaps_by
from anofox_forecast_spark.sources import lineitem_panel, load_table
from tests.conftest import SF_DIR


def test_filter_pushdown_reaches_scan(spark):
    li = load_table(spark, SF_DIR, "lineitem").filter(F.col("l_suppkey") == 3) \
        .select("l_suppkey", "l_quantity")
    P.assert_filter_pushed(li, "l_suppkey")
    schemas = P.read_schemas(li)
    assert schemas and all("l_comment" not in s for s in schemas), \
        "column pruning failed: full row read for a 2-column projection"


def test_forecast_sql_path_shuffle_budget(spark):
    df = ts_forecast_by(lineitem_panel(spark, SF_DIR), "id", "ds", "y",
                        "SeasonalNaive", 7, "1d", {"seasonal_period": 7})
    # panel agg shuffle + series-key shuffle; anything more is regression
    P.assert_max_exchanges(df, 2)
    assert P.plan_report(df)["python_udf_nodes"] == 0, \
        "SQL fast path must not touch Python"


def test_forecast_udf_path_single_series_shuffle(spark):
    df = ts_forecast_by(lineitem_panel(spark, SF_DIR), "id", "ds", "y",
                        "SES", 7, "1d", {"alpha": 0.3})
    P.assert_max_exchanges(df, 2)
    assert P.plan_report(df)["python_udf_nodes"] == 1


def test_fill_gaps_no_extra_shuffle(spark):
    df = ts_fill_gaps_by(lineitem_panel(spark, SF_DIR), "id", "ds", "y", "1d")
    P.assert_max_exchanges(df, 2)
    P.assert_no_cartesian(df)


def test_dedup_never_cartesian(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    P.assert_no_cartesian(minhash_lsh_pairs(docs, "doc_id", "text",
                                            num_hashes=16, bands=4))
    P.assert_no_cartesian(simhash_pairs(docs, "doc_id", "text"))
