from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from anofox_forecast_spark.session import get_spark

import os

SF_DIR = os.environ.get("ANOFOX_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="anofox-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def compare_frames(spark_df, duck_df: pd.DataFrame, rtol=1e-6, atol=1e-9):
    """Driver-style compare: sort columns by name, sort rows, value-compare."""
    sp = spark_df.toPandas()
    assert sorted(sp.columns) == sorted(duck_df.columns), \
        f"schema mismatch: {sorted(sp.columns)} vs {sorted(duck_df.columns)}"
    cols = sorted(sp.columns)
    sp = sp[cols]
    du = duck_df[cols]
    assert len(sp) == len(du), f"row count {len(sp)} vs {len(du)}"
    sp = sp.sort_values(cols).reset_index(drop=True)
    du = du.sort_values(cols).reset_index(drop=True)
    for c in cols:
        a, b = sp[c], du[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            np.testing.assert_allclose(a.astype(float), b.astype(float),
                                       rtol=rtol, atol=atol, err_msg=f"column {c}")
        else:
            av = a.astype(str).to_numpy()
            bv = b.astype(str).to_numpy()
            assert (av == bv).all(), f"column {c}: {av[:5]} vs {bv[:5]}"
