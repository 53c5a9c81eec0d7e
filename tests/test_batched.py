"""batched_grouped_map must be row-identical to groupBy().applyInPandas.

The risky part is the carry buffer: a group whose rows span adjacent Arrow
batches must be stitched back together before the per-group function sees
it. We force pathological batch sizes (smaller than a group, equal to a
group, 1-row) via spark.sql.execution.arrow.maxRecordsPerBatch and compare
against the grouped-map formulation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from anofox_forecast_spark.functions.batched import batched_grouped_map

SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
    T.StructField("first_y", T.DoubleType()),
    T.StructField("last_y", T.DoubleType()),
])


def _make_one_group():
    # defined via factory so cloudpickle serializes it by value (the test
    # module is not importable on Spark workers)
    def one_group(kt, pdf: pd.DataFrame):
        # order-sensitive on purpose: first/last prove rows arrive sorted by ds
        y = pdf["y"].to_numpy(dtype=float)
        return pd.DataFrame([{
            "id": kt[0], "n": len(pdf), "total": float(y.sum()),
            "first_y": float(y[0]), "last_y": float(y[-1]),
        }])
    return one_group


def _panel(spark, n_groups=13, n_rows=17):
    rows = [(f"g{g:03d}", i, float(g * 1000 + i))
            for g in range(n_groups) for i in range(n_rows)]
    return spark.createDataFrame(rows, "id string, ds long, y double")


@pytest.fixture()
def tiny_batches(spark):
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    yield spark
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


@pytest.mark.parametrize("batch_size", [1, 5, 17, 1000])
def test_batched_matches_grouped_map(tiny_batches, batch_size):
    spark = tiny_batches
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    df = _panel(spark)

    one_group = _make_one_group()
    got = batched_grouped_map(df, ["id"], "ds", SCHEMA, one_group).toPandas()
    want = (df.groupBy("id")
              .applyInPandas(lambda pdf: one_group((pdf["id"].iloc[0],),
                                                   pdf.sort_values("ds")), SCHEMA)
              .toPandas())

    got = got.sort_values("id").reset_index(drop=True)
    want = want.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert (got["n"] == 17).all()
    assert (got["first_y"] == got["id"].str[1:].astype(int) * 1000.0).all()


def test_batched_multi_key_and_skip(tiny_batches):
    spark = tiny_batches
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    rows = [(f"g{g}", f, i, float(i))
            for g in range(4) for f in range(3) for i in range(5)]
    df = spark.createDataFrame(rows, "id string, fold long, ds long, y double")
    schema = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("fold", T.LongType()),
        T.StructField("n", T.LongType()),
    ])

    def fn(kt, pdf):
        if kt[1] == 1:  # error-isolation path: skip fold 1 entirely
            return None
        return pd.DataFrame([{"id": kt[0], "fold": int(kt[1]), "n": len(pdf)}])

    got = batched_grouped_map(df, ["id", "fold"], "ds", schema, fn).toPandas()
    assert len(got) == 8  # 4 ids x folds {0, 2}
    assert set(got["fold"]) == {0, 2}
    assert (got["n"] == 5).all()


def test_batched_unsorted_input(tiny_batches):
    """Input row order must not matter — the path sorts within partitions."""
    spark = tiny_batches
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    rng = np.random.default_rng(7)
    rows = [(f"g{g}", i, float(i)) for g in range(5) for i in range(9)]
    order = rng.permutation(len(rows))
    df = spark.createDataFrame([rows[i] for i in order],
                               "id string, ds long, y double")
    got = batched_grouped_map(df, ["id"], "ds", SCHEMA,
                              _make_one_group()).toPandas()
    got = got.sort_values("id").reset_index(drop=True)
    assert (got["first_y"] == 0.0).all()
    assert (got["last_y"] == 8.0).all()
    assert (got["n"] == 9).all()


def test_batched_all_empty_columnar_yields_nothing(tiny_batches):
    """r14 (ADVICE): a tuple (columnar) return whose columns are ALL
    zero-length (e.g. horizon 0 for every series) must not emit an empty
    object-dtype DataFrame — the legacy path's len(r) guard skipped those,
    and an empty frame would lean on Arrow's null coercion vs the schema."""
    spark = tiny_batches
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    df = _panel(spark, n_groups=3, n_rows=5)

    def fn(kt, pdf):
        return ([], [], [], [], [])  # columnar, every column empty

    got = batched_grouped_map(df, ["id"], "ds", SCHEMA, fn)
    assert got.count() == 0
    # mixed: one group emits, the rest are empty tuples
    def fn2(kt, pdf):
        if kt[0] == "g001":
            return ([kt[0]], [len(pdf)], [1.0], [2.0], [3.0])
        return ([], [], [], [], [])

    got2 = batched_grouped_map(df, ["id"], "ds", SCHEMA, fn2).toPandas()
    assert list(got2["id"]) == ["g001"]
    assert list(got2["n"]) == [5]
