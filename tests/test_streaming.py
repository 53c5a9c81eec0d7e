"""Structured Streaming surface smoke tests (availableNow over file source)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from anofox_forecast_spark import streaming as ST
from anofox_forecast_spark.sources import lineitem_panel
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def panel_dir(spark):
    tmp = tempfile.mkdtemp()
    d = os.path.join(tmp, "panel")
    lineitem_panel(spark, SF_DIR).write.parquet(d)
    yield d
    shutil.rmtree(tmp, ignore_errors=True)


def _run(writer, ckpt, name, timeout=180):
    q = (writer.option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(timeout)
    return q


def test_stream_panel_stats(spark, panel_dir):
    schema = spark.read.parquet(panel_dir).schema
    stream = ST.read_panel_stream(spark, panel_dir, schema)
    stats = ST.stream_panel_stats(stream, "7 days", watermark="1 day")
    ckpt = tempfile.mkdtemp()
    _run(stats.writeStream.format("memory").queryName("t_stats")
         .outputMode("append"), ckpt, "t_stats")
    n = spark.sql("select count(*) n from t_stats").first()["n"]
    assert n > 0
    cols = set(spark.table("t_stats").columns)
    assert {"id", "window_start", "window_end", "n", "mean", "std_dev"} <= cols
    shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_forecast_stateful(spark, panel_dir):
    schema = spark.read.parquet(panel_dir).schema
    stream = ST.read_panel_stream(spark, panel_dir, schema)
    fc = ST.stream_forecast(stream, "SES", 5)
    ckpt = tempfile.mkdtemp()
    _run(fc.writeStream.format("memory").queryName("t_fc")
         .outputMode("update"), ckpt, "t_fc")
    out = spark.table("t_fc")
    n_series = out.select("id").distinct().count()
    assert n_series > 0
    assert out.count() == n_series * 5
    shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_foreach_batch(spark, panel_dir):
    schema = spark.read.parquet(panel_dir).schema
    stream = ST.read_panel_stream(spark, panel_dir, schema)
    got = []
    w = ST.stream_forecast_foreach_batch(
        stream, lambda df, bid: got.append(df.count()), "Naive", 3)
    ckpt = tempfile.mkdtemp()
    _run(w, ckpt, "t_fb")
    assert sum(got) > 0
    shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_dedup_exact_drops_duplicates(spark, tmp_path):
    import pandas as pd

    from anofox_forecast_spark import streaming as ST
    from pyspark.sql import functions as F
    rows = [(1, "Hello  World", 1), (2, "hello world", 2),
            (3, "unique text", 3), (4, "HELLO WORLD", 50)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "minute"])
    src = str(tmp_path / "docs")
    spark.createDataFrame(pdf).write.parquet(src)
    batch = spark.read.parquet(src)
    stream = (spark.readStream.schema(batch.schema).parquet(src)
              .select("doc_id", "text",
                      F.timestamp_seconds(F.lit(1700000000)
                                          + F.col("minute") * 60).alias("ds")))
    out = ST.stream_dedup_exact(stream, "doc_id", "text", "ds", "1 hour")
    q = (out.writeStream.format("memory").queryName("dedup_t")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.table("dedup_t").toPandas()
    # three case/whitespace variants of "hello world" collapse to one row
    assert len(got) == 2
    assert set(got["fingerprint"].str.len()) == {32}


def test_stream_conformal_matches_batch_and_truncates(spark, tmp_path):
    """One availableNow trigger == batch ts_conformal_calibrate over the
    last state_rows residuals, using the identical quantile convention."""
    import numpy as np
    import pandas as pd

    from anofox_forecast_spark import streaming as ST
    from anofox_forecast_spark.operators.conformal import conformal_score_np
    rng = np.random.default_rng(11)
    n = 40
    rows = pd.DataFrame({
        "id": [1] * n,
        "ds": pd.date_range("2024-01-01", periods=n, freq="D"),
        "actual": rng.normal(10.0, 2.0, n),
        "forecast": np.full(n, 10.0),
    })
    src = str(tmp_path / "conf")
    spark.createDataFrame(rows).write.parquet(src)
    batch = spark.read.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = ST.stream_conformal(stream, alpha=0.1, state_rows=25)
    q = (out.writeStream.format("memory").queryName("conf_t")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.table("conf_t").toPandas()
    assert len(got) == 1
    # bounded state: only the LAST 25 residuals (in ds order) survive
    assert got["n_residuals"].iloc[0] == 25
    res = (rows.sort_values("ds")["actual"] - rows["forecast"]).to_numpy()[-25:]
    assert got["conformity_score"].iloc[0] == conformal_score_np(res, 0.1)
    assert got["coverage"].iloc[0] == 0.9


def test_stream_adaptive_conformal_matches_batch_bitwise(spark, tmp_path):
    """One availableNow trigger of the streaming ACI == the batch
    ts_adaptive_conformal_by fold, bit-for-bit, while the per-series
    history stays inside state_rows."""
    import numpy as np
    import pandas as pd

    from anofox_forecast_spark import streaming as ST
    from anofox_forecast_spark.operators.conformal import (
        ts_adaptive_conformal_by,
    )
    rng = np.random.default_rng(7)
    n, ids = 35, (1, 2)
    rows = pd.concat([pd.DataFrame({
        "id": [i] * n,
        "ds": pd.date_range("2024-01-01", periods=n, freq="D"),
        "actual": rng.normal(10.0, 2.0, n),
        "forecast": np.full(n, 10.0),
    }) for i in ids])
    src = str(tmp_path / "aci")
    spark.createDataFrame(rows).write.parquet(src)
    batch = spark.read.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = ST.stream_adaptive_conformal(stream, alpha=0.1, gamma=0.05,
                                       state_rows=512)
    q = (out.writeStream.format("memory").queryName("aci_t")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    got = (spark.table("aci_t").toPandas()
           .sort_values(["id", "ds"]).reset_index(drop=True))
    want = (ts_adaptive_conformal_by(batch, "id", "ds", "actual",
                                     "forecast", alpha=0.1, gamma=0.05)
            .toPandas().sort_values(["id", "ds"]).reset_index(drop=True))
    assert len(got) == len(want) == 2 * n
    for c in ("alpha_t", "q_t", "lower", "upper"):
        a = got[c].to_numpy(dtype=float)
        b = want[c].to_numpy(dtype=float)
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c
    assert got["covered"].astype(str).equals(want["covered"].astype(str))


def test_stream_adaptive_conformal_sliding_cap(spark, tmp_path):
    """Past state_rows the streaming variant slides its window (bounded
    state) — still emits one verdict per row and keeps alpha in range."""
    import numpy as np
    import pandas as pd

    from anofox_forecast_spark import streaming as ST
    rng = np.random.default_rng(3)
    n = 30
    rows = pd.DataFrame({
        "id": [1] * n,
        "ds": pd.date_range("2024-01-01", periods=n, freq="D"),
        "actual": rng.normal(0.0, 1.0, n),
        "forecast": np.zeros(n),
    })
    src = str(tmp_path / "aci2")
    spark.createDataFrame(rows).write.parquet(src)
    batch = spark.read.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = ST.stream_adaptive_conformal(stream, alpha=0.2, gamma=0.1,
                                       state_rows=5)
    q = (out.writeStream.format("memory").queryName("aci_s")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.table("aci_s").toPandas()
    assert len(got) == n
    assert got["alpha_t"].between(0.001, 0.999).all()
    assert got["q_t"].isna().sum() == 1        # only the first row


def test_stream_hll_registers_match_batch_across_batches(spark, tmp_path):
    """TWO micro-batches of a REAL stream (maxFilesPerTrigger=1 over two
    parquet files) accumulate registers whose final state equals the
    batch sketch over the union — merge-idempotence observed through the
    streaming state store, not assumed. Also pins bounded state: the
    register count never exceeds 2^p per group."""
    from pyspark.sql import functions as F
    from anofox_forecast_spark.operators.stats import (
        hll_estimate_from_registers, hll_merge_registers, hll_registers)

    src = str(tmp_path / "src")
    rows1 = [(i % 3, f"user_{i}") for i in range(300)]
    rows2 = [(i % 3, f"user_{i + 150}") for i in range(300)]  # overlap
    b1 = spark.createDataFrame(rows1, "grp int, key string")
    b2 = spark.createDataFrame(rows2, "grp int, key string")
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(b1.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    regs = ST.stream_hll_registers(stream, "key", ["grp"],
                                   precision_bits=8, seed="s9")
    name = "hll_stream_t"
    q = (regs.writeStream.format("memory").queryName(name)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = hll_merge_registers(spark.table(name))  # collapse per-batch emits

    whole = hll_registers(b1.unionByName(b2), "key", ["grp"],
                          precision_bits=8, seed="s9")
    a = sorted(got.collect(), key=lambda r: (r.grp, r.hll_bucket))
    b = sorted(whole.collect(), key=lambda r: (r.grp, r.hll_bucket))
    assert [tuple(r) for r in a] == [tuple(r) for r in b] and len(a) > 0
    per_group = got.groupBy("grp").count().collect()
    assert all(r["count"] <= 256 for r in per_group)  # 2^8 bound

    ea = hll_estimate_from_registers(got, ["grp"], 8).collect()
    eb = hll_estimate_from_registers(whole, ["grp"], 8).collect()
    assert sorted(map(tuple, ea)) == sorted(map(tuple, eb))
