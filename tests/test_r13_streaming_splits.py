"""Randomized micro-batch split properties for the streaming twins
(r12 judge directive #5).

The r9c-r12 stream==batch pins all use FIXED splits (one availableNow
trigger, or exactly two files). The load-bearing claim for every
streaming driver key is stronger: the final state must not depend on HOW
the harness happened to chunk the input into micro-batches. This suite
re-proves the invariants under seeded-random splits:

- ORDER-SENSITIVE twins (stream_forecast, stream_conformal,
  stream_adaptive_conformal) consume event-time-ordered streams, so the
  randomization is over CUT POINTS: the panel, sorted by (ds, id), is
  cut into K in [2, 4] contiguous chunks at random positions, one parquet
  file per chunk, replayed with maxFilesPerTrigger=1 (file order forced
  via mtime — FileStreamSource walks modification-time order). The final
  per-series emission must equal the single-trigger / batch result
  bit-for-bit, including state-cap truncation ACROSS batch boundaries.
- ORDER-INDEPENDENT twins (the sketch register streams: HLL, Bloom,
  Count-Min, bottom-k/KMV) get a fully random row partition (not even
  order-preserving): merged emissions must equal the batch sketch over
  the union, exactly.

Found-by-construction regressions this guards: a twin that truncates
only at the first trigger, merges chunk state in arrival order rather
than event order, or double-counts a register on re-emission would pass
the fixed pins and fail here.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from anofox_forecast_spark import streaming as ST


def _write_chunks(spark, src: str, chunks, schema: str) -> int:
    """Write each chunk as ONE parquet part file under ``src`` with
    strictly increasing mtimes (arbitrary past values — no sleeping), so
    ``maxFilesPerTrigger=1`` replays them as K ordered micro-batches."""
    import time
    os.makedirs(src, exist_ok=True)
    seen: set[str] = set()
    t0 = time.time() - 3600.0
    for i, ch in enumerate(chunks):
        spark.createDataFrame(ch, schema).coalesce(1) \
             .write.mode("append").parquet(src)
        parts = {p for p in os.listdir(src)
                 if p.startswith("part-") and p.endswith(".parquet")}
        new = parts - seen
        assert len(new) == 1, new
        p = new.pop()
        seen.add(p)
        os.utime(os.path.join(src, p), (t0 + 10.0 * i, t0 + 10.0 * i))
    return len(chunks)


def _cut(rows: list, rng: np.random.Generator) -> list[list]:
    """Cut ``rows`` into K in [2, 4] non-empty contiguous chunks."""
    k = int(rng.integers(2, 5))
    k = min(k, len(rows))
    cuts = sorted(rng.choice(np.arange(1, len(rows)), size=k - 1,
                             replace=False).tolist())
    bounds = [0] + cuts + [len(rows)]
    return [rows[a:b] for a, b in zip(bounds, bounds[1:])]


def _run_capture(out, ckpt: str):
    """availableNow run through foreachBatch, capturing (batch_id, pdf)
    per micro-batch so the FINAL emission per key is attributable."""
    captured = []

    def sink(bdf, bid):
        captured.append((bid, bdf.toPandas()))

    q = (out.writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(300)
    return captured


def _panel_rows(rng: np.random.Generator, ids=(1, 2, 3), lo=20, hi=50):
    rows = []
    for i in ids:
        n = int(rng.integers(lo, hi))
        ds = pd.date_range("2024-01-01", periods=n, freq="D")
        y = rng.normal(50.0, 5.0, n)
        rows += [(i, d.to_pydatetime(), float(v)) for d, v in zip(ds, y)]
    rows.sort(key=lambda r: (r[1], r[0]))   # global event-time order
    return rows


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_stream_forecast_random_splits(spark, tmp_path, seed):
    """Final per-series forecast after K random ordered micro-batches ==
    a direct model replay over the last ``state_rows`` observations —
    the truncation-across-triggers invariant, bitwise."""
    from anofox_forecast_spark.functions import models as M

    rng = np.random.default_rng(100 + seed)
    rows = _panel_rows(rng)
    chunks = _cut(rows, rng)
    src = str(tmp_path / "src")
    k = _write_chunks(spark, src, chunks, "id long, ds timestamp, y double")

    stream = (spark.readStream
              .schema("id long, ds timestamp, y double")
              .option("maxFilesPerTrigger", "1").parquet(src))
    h, cap = 5, 16
    out = ST.stream_forecast(stream, method="SES", horizon=h,
                             state_rows=cap)
    captured = _run_capture(out, str(tmp_path / "ckpt"))
    assert len(captured) == k               # one micro-batch per file

    # final emission per id = the one from the highest batch id
    last: dict[int, pd.DataFrame] = {}
    for bid, pdf in captured:
        for i, sub in pdf.groupby("id"):
            last[int(i)] = sub.sort_values("forecast_step")
    per_series: dict[int, list[float]] = {}
    for i, ds, v in rows:                    # rows are (ds, id)-sorted
        per_series.setdefault(i, []).append(v)
    for i, ys in per_series.items():
        tail = ys[-cap:]
        want = M.forecast(np.asarray(tail, dtype=float), h, "SES")
        got = last[i]
        assert got["n_obs"].iloc[0] == len(tail)
        assert np.array_equal(got["yhat"].to_numpy(dtype=float),
                              np.asarray(want.point, dtype=float)), i
        assert np.array_equal(got["yhat_lower"].to_numpy(dtype=float),
                              np.asarray(want.lower, dtype=float)), i
        assert np.array_equal(got["yhat_upper"].to_numpy(dtype=float),
                              np.asarray(want.upper, dtype=float)), i


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_stream_conformal_random_splits(spark, tmp_path, seed):
    """Final conformity score after K random ordered micro-batches ==
    conformal_score_np over the last ``state_rows`` residuals in event
    order — exact equality, any cut placement."""
    from anofox_forecast_spark.operators.conformal import conformal_score_np

    rng = np.random.default_rng(200 + seed)
    rows = []
    for i in (1, 2):
        n = int(rng.integers(25, 60))
        ds = pd.date_range("2024-01-01", periods=n, freq="D")
        act = rng.normal(10.0, 2.0, n)
        rows += [(i, d.to_pydatetime(), float(a), 10.0)
                 for d, a in zip(ds, act)]
    rows.sort(key=lambda r: (r[1], r[0]))
    chunks = _cut(rows, rng)
    src = str(tmp_path / "src")
    k = _write_chunks(spark, src, chunks,
                      "id long, ds timestamp, actual double, "
                      "forecast double")

    stream = (spark.readStream
              .schema("id long, ds timestamp, actual double, "
                      "forecast double")
              .option("maxFilesPerTrigger", "1").parquet(src))
    cap, alpha = 20, 0.1
    out = ST.stream_conformal(stream, alpha=alpha, state_rows=cap)
    captured = _run_capture(out, str(tmp_path / "ckpt"))
    assert len(captured) == k

    last: dict[int, pd.Series] = {}
    for bid, pdf in captured:
        for _, r in pdf.iterrows():
            last[int(r["id"])] = r
    res_by_id: dict[int, list[float]] = {}
    for i, ds, a, f in rows:
        res_by_id.setdefault(i, []).append(a - f)
    for i, res in res_by_id.items():
        tail = res[-cap:]
        r = last[i]
        assert r["n_residuals"] == len(tail)
        assert r["conformity_score"] == conformal_score_np(
            np.asarray(tail, dtype=float), alpha), i


@pytest.mark.parametrize("seed", [0, 1])
def test_stream_adaptive_conformal_random_splits(spark, tmp_path, seed):
    """The union of ACI emissions over K random ordered micro-batches ==
    the batch ts_adaptive_conformal_by fold, bit-for-bit (every input row
    is emitted exactly once, with the serial alpha walk unbroken across
    batch boundaries)."""
    from anofox_forecast_spark.operators.conformal import (
        ts_adaptive_conformal_by,
    )

    rng = np.random.default_rng(300 + seed)
    rows = []
    for i in (1, 2):
        n = int(rng.integers(25, 45))
        ds = pd.date_range("2024-01-01", periods=n, freq="D")
        act = rng.normal(10.0, 2.0, n)
        rows += [(i, d.to_pydatetime(), float(a), 10.0)
                 for d, a in zip(ds, act)]
    rows.sort(key=lambda r: (r[1], r[0]))
    chunks = _cut(rows, rng)
    src = str(tmp_path / "src")
    schema = ("id long, ds timestamp, actual double, forecast double")
    k = _write_chunks(spark, src, chunks, schema)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = ST.stream_adaptive_conformal(stream, alpha=0.1, gamma=0.05,
                                       state_rows=512)
    captured = _run_capture(out, str(tmp_path / "ckpt"))
    assert len(captured) == k
    got = (pd.concat([p for _, p in captured if len(p)])
           .sort_values(["id", "ds"]).reset_index(drop=True))

    batch = spark.createDataFrame(rows, schema)
    want = (ts_adaptive_conformal_by(batch, "id", "ds", "actual",
                                     "forecast", alpha=0.1, gamma=0.05)
            .toPandas().sort_values(["id", "ds"]).reset_index(drop=True))
    assert len(got) == len(want) == len(rows)
    for c in ("alpha_t", "q_t", "lower", "upper"):
        a = got[c].to_numpy(dtype=float)
        b = want[c].to_numpy(dtype=float)
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c
    assert (got["covered"].astype(str).to_numpy()
            == want["covered"].astype(str).to_numpy()).all()


def _random_partition(rows: list, rng: np.random.Generator) -> list[list]:
    """Fully random (order-destroying) partition into K in [2, 4]
    non-empty chunks — legal for the order-independent sketch twins."""
    k = int(rng.integers(2, 5))
    perm = rng.permutation(len(rows))
    assign = rng.integers(0, k, len(rows))
    # guarantee non-empty chunks
    for j in range(k):
        assign[perm[j]] = j
    return [[rows[int(p)] for p in np.flatnonzero(assign == j)]
            for j in range(k)]


def test_stream_hll_random_splits(spark, tmp_path):
    from anofox_forecast_spark.operators.stats import (
        hll_estimate_from_registers, hll_merge_registers, hll_registers)

    rng = np.random.default_rng(400)
    rows = [(i % 3, f"user_{int(v)}")
            for i, v in enumerate(rng.integers(0, 400, 600))]
    chunks = _random_partition(rows, rng)
    src = str(tmp_path / "src")
    _write_chunks(spark, src, chunks, "grp int, key string")

    stream = (spark.readStream.schema("grp int, key string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    regs = ST.stream_hll_registers(stream, "key", ["grp"],
                                   precision_bits=8, seed="r13")
    q = (regs.writeStream.format("memory").queryName("hll_r13")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = hll_merge_registers(spark.table("hll_r13"))
    whole = hll_registers(spark.createDataFrame(rows, "grp int, key string"),
                          "key", ["grp"], precision_bits=8, seed="r13")
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, whole.collect()))
    assert a == b and len(a) > 0
    ea = sorted(map(tuple,
                    hll_estimate_from_registers(got, ["grp"], 8).collect()))
    eb = sorted(map(tuple,
                    hll_estimate_from_registers(whole, ["grp"], 8).collect()))
    assert ea == eb


def test_stream_bloom_random_splits(spark, tmp_path):
    from anofox_forecast_spark.operators.stats import (
        bloom_merge_registers, bloom_registers)

    rng = np.random.default_rng(500)
    rows = [(f"k{int(v)}",) for v in rng.integers(0, 300, 500)]
    chunks = _random_partition(rows, rng)
    src = str(tmp_path / "src")
    _write_chunks(spark, src, chunks, "key string")

    stream = (spark.readStream.schema("key string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    regs = ST.stream_bloom_registers(stream, "key", m_bits=512, k=3,
                                     seed="r13")
    q = (regs.writeStream.format("memory").queryName("bloom_r13")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = bloom_merge_registers(spark.table("bloom_r13"))
    whole = bloom_registers(spark.createDataFrame(rows, "key string"),
                            "key", m_bits=512, k=3, seed="r13")
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, whole.collect()))


def test_stream_cm_random_splits(spark, tmp_path):
    from anofox_forecast_spark.operators.stats import (
        cm_collapse_emissions, cm_estimate, cm_registers)

    rng = np.random.default_rng(600)
    rows = [(f"k{int(v)}",) for v in rng.integers(0, 9, 400)]
    chunks = _random_partition(rows, rng)
    src = str(tmp_path / "src")
    _write_chunks(spark, src, chunks, "key string")

    stream = (spark.readStream.schema("key string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    regs = ST.stream_cm_registers(stream, "key", width=8, depth=2,
                                  seed="r13")
    q = (regs.writeStream.format("memory").queryName("cm_r13")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = cm_collapse_emissions(spark.table("cm_r13"))
    whole = cm_registers(spark.createDataFrame(rows, "key string"),
                         "key", width=8, depth=2, seed="r13")
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, whole.collect()))
    probe = spark.createDataFrame([(f"k{i}",) for i in range(9)],
                                  "key string")
    ea = sorted(map(tuple, cm_estimate(probe, got, "key", width=8,
                                       depth=2, seed="r13").collect()))
    eb = sorted(map(tuple, cm_estimate(probe, whole, "key", width=8,
                                       depth=2, seed="r13").collect()))
    assert ea == eb


def test_stream_bottomk_random_splits(spark, tmp_path):
    from anofox_forecast_spark.operators.stats import bottomk_sample

    rng = np.random.default_rng(700)
    rows = [("g", f"k{i}", float(v))
            for i, v in enumerate(rng.normal(0, 1, 300))]
    chunks = _random_partition(rows, rng)
    src = str(tmp_path / "src")
    _write_chunks(spark, src, chunks, "grp string, key string, v double")

    stream = (spark.readStream.schema("grp string, key string, v double")
              .option("maxFilesPerTrigger", "1").parquet(src))
    k = 16
    samp = ST.stream_bottomk_sample(stream, "key", "v", "grp", k=k,
                                    seed="r13")
    q = (samp.writeStream.format("memory").queryName("bk_r13")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(300)
    emitted = spark.table("bk_r13").distinct()
    final = {(r["key"], r["v"]) for r in bottomk_sample(
        emitted.select("grp", "key", "v"), "key", ["grp"], k,
        "r13").collect()}
    whole = {(r["key"], r["v"]) for r in bottomk_sample(
        spark.createDataFrame(rows, "grp string, key string, v double"),
        "key", ["grp"], k, "r13").collect()}
    assert final == whole and len(final) == k
