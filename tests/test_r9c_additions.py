"""Round-9c additions: per-series scaling / winsorization (prep) and DSIR
importance weights (pipeline) — numpy/pure-composition replays, NULL and
degenerate-group edges, repartition invariance, plan-shape guards."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from anofox_forecast_spark import plans as P
from anofox_forecast_spark.operators.pipeline import (dsir_weights, lm_score,
                                                      sample_weighted)
from anofox_forecast_spark.operators.prep import ts_scale_by, ts_winsorize_by
from anofox_forecast_spark.sources import lineitem_panel
from tests.conftest import SF_DIR

# one NULL, a single-row group, a constant group, and a normal group
_ROWS = [
    ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, None), ("a", 4, 40.0),
    ("a", 5, 15.0), ("b", 1, 7.0),
    ("c", 1, 5.0), ("c", 2, 5.0), ("c", 3, 5.0),
    ("d", 1, 1.0), ("d", 2, 2.0), ("d", 3, 3.0), ("d", 4, 100.0),
]


def _toy(spark):
    return spark.createDataFrame(_ROWS, "id string, ds int, y double")


def _ref_stats(vals, method):
    v = np.sort(np.array([x for x in vals if x is not None], float))
    n = len(v)
    if method == "zscore":
        loc = v.sum() / n
        scale = (np.sqrt(((v - loc) ** 2).sum() / (n - 1))
                 if n >= 2 else None)
    elif method == "minmax":
        loc, scale = v[0], v[-1] - v[0]
    else:
        loc = np.quantile(v, 0.5)
        scale = np.quantile(v, 0.75) - np.quantile(v, 0.25)
    return loc, scale


@pytest.mark.parametrize("method", ["zscore", "minmax", "robust"])
def test_scale_matches_numpy(spark, method):
    out = ts_scale_by(_toy(spark), "id", "ds", "y", method).collect()
    by_id = {}
    for gid in "abcd":
        by_id[gid] = _ref_stats(
            [y for g, _, y in _ROWS if g == gid], method)
    for r in out:
        loc, scale = by_id[r["id"]]
        assert r["scale_loc"] == pytest.approx(loc, rel=1e-12)
        if scale is None:
            assert r["scale_scale"] is None
        else:
            assert r["scale_scale"] == pytest.approx(scale, rel=1e-12)
        if r["y"] is None or not scale:
            # NULL input, constant series (scale 0), or single row
            assert r["y_scaled"] is None
        else:
            assert r["y_scaled"] == pytest.approx(
                (r["y"] - loc) / scale, rel=1e-12)


def test_scale_bad_method_raises_before_spark(spark):
    with pytest.raises(ValueError, match="unknown scaling method"):
        ts_scale_by(_toy(spark), "id", "ds", "y", "log")


def test_winsorize_matches_numpy(spark):
    out = ts_winsorize_by(_toy(spark), "id", "ds", "y", 0.25, 0.75).collect()
    for gid in "abcd":
        v = np.array([y for g, _, y in _ROWS if g == gid and y is not None],
                     float)
        lo, hi = np.quantile(v, 0.25), np.quantile(v, 0.75)
        for r in (x for x in out if x["id"] == gid):
            assert r["clip_lo"] == pytest.approx(lo, rel=1e-12)
            assert r["clip_hi"] == pytest.approx(hi, rel=1e-12)
            if r["y"] is None:
                assert r["y_winsorized"] is None
                assert r["was_clipped"] is False
            else:
                assert r["y_winsorized"] == pytest.approx(
                    min(max(r["y"], lo), hi), rel=1e-12)
                assert r["was_clipped"] == (r["y"] < lo or r["y"] > hi)


def test_winsorize_bad_bounds_raise(spark):
    with pytest.raises(ValueError, match="lower < upper"):
        ts_winsorize_by(_toy(spark), "id", "ds", "y", 0.9, 0.1)
    with pytest.raises(ValueError, match="lower < upper"):
        ts_winsorize_by(_toy(spark), "id", "ds", "y", -0.1, 0.5)


@pytest.mark.parametrize("method", ["zscore", "robust"])
def test_scale_invariant_under_repartition(spark, method):
    """The sorted-array fold makes the stats bit-stable on any input
    partitioning — the determinism claim the contract pin rides on."""
    pan = lineitem_panel(spark, SF_DIR)
    a = ts_scale_by(pan, "id", "ds", "y", method) \
        .orderBy("id", "ds").collect()
    b = ts_scale_by(pan.repartition(7, "ds"), "id", "ds", "y", method) \
        .orderBy("id", "ds").collect()
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        assert ra["scale_loc"] == rb["scale_loc"]          # bit-equal
        assert ra["scale_scale"] == rb["scale_scale"]
        assert ra["y_scaled"] == rb["y_scaled"]


def test_scale_plan_shape(spark):
    """One group shuffle for the stats + a BROADCAST join back — the
    stats frame must never trigger a second data-side exchange."""
    df = ts_scale_by(lineitem_panel(spark, SF_DIR), "id", "ds", "y",
                     "robust")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # source agg shuffle + stats groupBy shuffle (broadcast exchanges are
    # not data shuffles); anything more is a regression
    P.assert_max_exchanges(df, 2)


def test_dsir_equals_lm_score_composition(spark):
    """dsir_weights == the two documented lm_score legs joined: the op
    adds no arithmetic beyond n * (mean_t - mean_r)."""
    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat"),
         (1, "the dog sat on the log and barked at the cat"),
         (2, "qq zz xx"),        # all-unseen bigrams vs the target
         (3, "one"),             # < 2 words: NULL scores
         (4, "the cat sat on the mat again and again")],
        "doc_id long, text string")
    target = docs.filter(F.col("doc_id") % 2 == 0)
    got = {r["doc_id"]: r
           for r in dsir_weights(docs, "doc_id", "text", target).collect()}
    t = {r["doc_id"]: r for r in
         lm_score(docs, "doc_id", "text", train=target).collect()}
    r_ = {r["doc_id"]: r for r in
          lm_score(docs, "doc_id", "text").collect()}
    assert set(got) == {0, 1, 2, 3, 4}
    for i, row in got.items():
        assert row["n_bigrams"] == t[i]["n_bigrams"]
        assert row["logprob_target"] == t[i]["mean_logprob"]  # bit-equal
        assert row["logprob_raw"] == r_[i]["mean_logprob"]
        if row["n_bigrams"] == 0:
            assert row["log_weight"] is None
        else:
            assert row["log_weight"] == pytest.approx(
                row["n_bigrams"] * (row["logprob_target"]
                                    - row["logprob_raw"]), rel=1e-12)
    # the target-member doc must look more target-like than the
    # out-of-vocabulary doc
    assert got[0]["log_weight"] > got[2]["log_weight"]


def test_dsir_selection_composes_with_weighted_sampling(spark):
    """The DSIR selection step is sample_weighted over exp(log_weight):
    runs end-to-end and keeps the highest-weight docs more often than
    uniform would (deterministic given the seed)."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * (1 + i % 3)) for i in range(20)]
        + [(100 + i, "zz qq xx ww vv " * 2) for i in range(20)],
        "doc_id long, text string")
    target = docs.filter(F.col("doc_id") < 100)  # target = alpha-style docs
    w = dsir_weights(docs, "doc_id", "text", target) \
        .withColumn("w", F.exp(F.col("log_weight"))) \
        .filter(F.col("w").isNotNull())
    picked = sample_weighted(w, "doc_id", "w", k=10, seed="dsir").collect()
    assert len(picked) == 10
    # exp(log_weight) gaps here are astronomically in the target docs'
    # favor; all 10 picks must come from the target-like half
    assert all(r["doc_id"] < 100 for r in picked)


# --- online Welford z-score anomaly detection (batch + streaming twin) ---

def _welford_ref(rows, thr, mo):
    """Pure-Python replay of the online z-score walk (same op order)."""
    import math
    out = []
    n, mean, m2 = 0.0, 0.0, 0.0
    for ds, x in sorted(rows):
        std = math.sqrt(m2 / (n - 1.0)) if n >= 2.0 else None
        pm = mean if n >= 1.0 else None
        z = ((x - mean) / std
             if n >= mo and std is not None and std > 0 else None)
        out.append((ds, x, pm, std, z,
                    bool(z is not None and abs(z) > thr)))
        n1 = n + 1.0
        d = x - mean
        mean = mean + d / n1
        m2 = m2 + d * (x - mean)
        n = n1
    return out


def test_online_anomalies_match_python_replay(spark):
    from anofox_forecast_spark.operators.detect import (
        ts_detect_anomalies_online_by,
    )
    rng = np.random.default_rng(11)
    rows = []
    for gid in (1, 2):
        ys = rng.normal(50.0, 5.0, 60)
        ys[40] += 40.0                      # a planted spike
        rows += [(gid, int(t), float(y)) for t, y in enumerate(ys)]
    rows.append((1, 100, None))             # NULL y: excluded
    df = spark.createDataFrame(rows, "id long, ds int, y double")
    got = (ts_detect_anomalies_online_by(df, "id", "ds", "y", 3.0, 10)
           .orderBy("id", "ds").collect())
    by_id = {}
    for gid in (1, 2):
        by_id[gid] = _welford_ref(
            [(t, y) for g, t, y in rows if g == gid and y is not None],
            3.0, 10)
    assert len(got) == 120                  # NULL row dropped
    found_anomaly = False
    for gid in (1, 2):
        sub = [r for r in got if r["id"] == gid]
        for r, (ds, x, pm, std, z, an) in zip(sub, by_id[gid]):
            assert (r["ds"], r["y"]) == (ds, x)
            assert r["exp_mean"] == pm      # bit-equal (same op order)
            assert r["exp_std"] == std
            assert r["online_z"] == z
            assert r["is_anomaly"] == an
            found_anomaly |= an
    assert found_anomaly                    # the planted spike fires


def test_online_anomalies_probes_and_plan(spark):
    from anofox_forecast_spark.operators.detect import (
        ts_detect_anomalies_online_by,
    )
    pan = lineitem_panel(spark, SF_DIR)
    with pytest.raises(ValueError, match="z_threshold"):
        ts_detect_anomalies_online_by(pan, "id", "ds", "y", 0.0)
    with pytest.raises(ValueError, match="min_obs"):
        ts_detect_anomalies_online_by(pan, "id", "ds", "y", 3.0, 0)
    # one series-key shuffle on top of the panel's own aggregation
    P.assert_max_exchanges(
        ts_detect_anomalies_online_by(pan, "id", "ds", "y"), 2)


def test_stream_zscore_two_triggers_equal_batch(spark, tmp_path):
    """TWO real micro-batches (maxFilesPerTrigger=1 over two parquet
    files — FileStreamSource walks them in modification-time order, the
    early-ds file written first) carry the Welford state across the
    split and reproduce the batch fold bit-for-bit — the state really is
    the operator's whole memory."""
    import pandas as pd

    from anofox_forecast_spark import streaming as ST
    from anofox_forecast_spark.operators.detect import (
        ts_detect_anomalies_online_by,
    )
    rng = np.random.default_rng(23)
    n = 40
    mk = lambda lo, hi: pd.concat([pd.DataFrame({  # noqa: E731
        "id": [i] * (hi - lo),
        "ds": pd.date_range("2024-01-01", periods=n, freq="D")[lo:hi],
        "y": rng.normal(10.0, 2.0, hi - lo),
    }) for i in (1, 2)])
    part1, part2 = mk(0, 25), mk(25, n)
    src = str(tmp_path / "src")
    spark.createDataFrame(part1).coalesce(1).write.parquet(src)
    import time as _time
    _time.sleep(1.1)  # distinct mod-times -> deterministic file order
    spark.createDataFrame(part2).coalesce(1).write.mode("append") \
        .parquet(src)
    schema = spark.read.parquet(src).schema

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = ST.stream_zscore_anomaly(stream, z_threshold=2.0, min_obs=5)
    q = (out.writeStream.format("memory").queryName("zs_2t")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = (spark.table("zs_2t").toPandas().sort_values(["id", "ds"])
           .reset_index(drop=True))

    batch_src = spark.createDataFrame(pd.concat([part1, part2]))
    want = (ts_detect_anomalies_online_by(batch_src, "id", "ds", "y",
                                          2.0, 5)
            .toPandas().sort_values(["id", "ds"]).reset_index(drop=True))
    assert len(got) == len(want) == 2 * n
    for c in ("exp_mean", "exp_std", "online_z"):
        a = got[c].to_numpy(dtype=float)
        b = want[c].to_numpy(dtype=float)
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c
    assert got["is_anomaly"].astype(bool).equals(
        want["is_anomaly"].astype(bool))


def test_stream_zscore_probes(spark):
    from anofox_forecast_spark import streaming as ST
    df = spark.readStream.format("rate").load() \
        .selectExpr("value AS id", "timestamp AS ds",
                    "CAST(value AS DOUBLE) AS y")
    with pytest.raises(ValueError, match="z_threshold"):
        ST.stream_zscore_anomaly(df, z_threshold=-1.0)
    with pytest.raises(ValueError, match="min_obs"):
        ST.stream_zscore_anomaly(df, min_obs=0)


def test_unscale_roundtrips_scale(spark):
    """unscale(scale(panel)) recovers y to float round-trip accuracy
    for every method, and NULL loc/scale rows yield NULL."""
    from anofox_forecast_spark.operators.prep import ts_unscale_by
    for method in ("zscore", "minmax", "robust"):
        scaled = ts_scale_by(_toy(spark), "id", "ds", "y", method)
        back = ts_unscale_by(
            scaled.withColumn("y_roundtrip", F.col("y_scaled")),
            ["y_roundtrip"]).collect()
        for r in back:
            if r["y_scaled"] is None:     # NULL y / constant / 1-row
                assert r["y_roundtrip"] is None
            else:
                assert r["y_roundtrip"] == pytest.approx(r["y"],
                                                         rel=1e-12)
    with pytest.raises(ValueError, match="value_cols"):
        ts_unscale_by(_toy(spark), [])


def test_output_column_collisions_rejected(spark):
    """Inputs that already carry an op's output columns fail fast with a
    clear error instead of silently producing ambiguous references
    (same posture as salted_join's reserved-name guard)."""
    from anofox_forecast_spark.operators.prep import ts_winsorize_by
    df = _toy(spark).withColumn("y_scaled", F.lit(0.0))
    with pytest.raises(ValueError, match="output column"):
        ts_scale_by(df, "id", "ds", "y", "zscore")
    dfw = _toy(spark).withColumn("was_clipped", F.lit(True))
    with pytest.raises(ValueError, match="output column"):
        ts_winsorize_by(dfw, "id", "ds", "y")
    docs = spark.createDataFrame([(0, "a b")], "w1 long, text string")
    with pytest.raises(ValueError, match="id_col"):
        dsir_weights(docs, "w1", "text", docs)


def test_build_vocab_matches_python_replay(spark):
    from anofox_forecast_spark.operators.pipeline import build_vocab
    docs = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the dog sat on the mat"),
         (2, ""), (3, "THE Cat")],           # lowercased; empty doc
        "doc_id long, text string")
    got = {r["word"]: r for r in
           build_vocab(docs, "doc_id", "text").collect()}
    # python replay
    from collections import Counter, defaultdict
    occ, dof = Counter(), defaultdict(set)
    for i, t in [(0, "the cat sat"), (1, "the dog sat on the mat"),
                 (3, "the cat")]:
        for w_ in t.split():
            occ[w_] += 1
            dof[w_].add(i)
    order = sorted(occ, key=lambda w_: (-occ[w_], w_))
    tot = sum(occ.values())
    cum = 0
    for rk, w_ in enumerate(order, 1):
        cum += occ[w_]
        r = got[w_]
        assert (r["n_occurrences"], r["n_docs"], r["rank"]) == \
            (occ[w_], len(dof[w_]), rk)
        assert r["coverage"] == cum / tot          # exact-int division
    assert len(got) == len(order)
    # max_terms truncates after ranking; coverage keeps the full corpus
    top2 = build_vocab(docs, "doc_id", "text", max_terms=2).collect()
    assert sorted(r["rank"] for r in top2) == [1, 2]
    with pytest.raises(ValueError, match="max_terms"):
        build_vocab(docs, "doc_id", "text", max_terms=0)


def test_scale_keeps_null_group_rows(spark):
    """A NULL group key is a group like any other: the null-safe stats
    join keeps those rows (parity with the UDTF's NULL partition)."""
    from anofox_forecast_spark.operators.prep import ts_winsorize_by
    rows = _ROWS + [(None, 1, 2.0), (None, 2, 4.0)]
    df = spark.createDataFrame(rows, "id string, ds int, y double")
    out = ts_scale_by(df, "id", "ds", "y", "minmax").collect()
    assert len(out) == len(rows)
    nulls = [r for r in out if r["id"] is None]
    assert len(nulls) == 2
    assert {r["scale_loc"] for r in nulls} == {2.0}     # min of the group
    wz = ts_winsorize_by(df, "id", "ds", "y", 0.0, 1.0).collect()
    assert len(wz) == len(rows)
    assert sum(1 for r in wz if r["id"] is None) == 2


def test_dsir_empty_target_yields_null_weights(spark):
    """An empty target corpus is the degenerate V=0 model: NULL
    logprob_target/log_weight everywhere, no crash — and the SQL UDTF
    mirrors it instead of dividing by zero."""
    from anofox_forecast_spark.functions.sql import register_all
    docs = spark.createDataFrame(
        [(0, "a b c", False), (1, "b c d", False)],
        "doc_id long, text string, is_t boolean")
    out = dsir_weights(docs.select("doc_id", "text"), "doc_id", "text",
                       docs.filter("is_t").select("doc_id", "text")) \
        .collect()
    assert len(out) == 2
    assert all(r["logprob_target"] is None and r["log_weight"] is None
               and r["logprob_raw"] is not None for r in out)
    register_all(spark)
    docs.createOrReplaceTempView("dsir_empty_t")
    sql_out = spark.sql(
        "SELECT * FROM pipeline_dsir_weights(TABLE(dsir_empty_t), "
        "'doc_id', 'text', 'is_t')").collect()
    assert len(sql_out) == 2
    assert all(r["logprob_target"] is None and r["log_weight"] is None
               for r in sql_out)


@pytest.mark.parametrize("method", ["zscore", "minmax", "robust"])
def test_scale_all_null_y_group_yields_null_stats(spark, method):
    """An all-NULL-y series folds an EMPTY sorted array: under ANSI mode
    the unguarded zscore mean (sum/0) would raise DIVIDE_BY_ZERO and
    kill the job (r9 ADVICE medium). Contract: loc/scale/y_scaled all
    NULL for that group, other groups unaffected — parity with the
    TsScaleUDTF twin, which returns NULL stats for the same partition."""
    rows = _ROWS + [("e", 1, None), ("e", 2, None)]
    df = spark.createDataFrame(rows, "id string, ds int, y double")
    out = ts_scale_by(df, "id", "ds", "y", method).collect()
    assert len(out) == len(rows)
    e = [r for r in out if r["id"] == "e"]
    assert len(e) == 2
    assert all(r["scale_loc"] is None and r["scale_scale"] is None
               and r["y_scaled"] is None for r in e)
    # the sibling winsorize path shares the empty-array stats shape
    wz = [r for r in ts_winsorize_by(df, "id", "ds", "y").collect()
          if r["id"] == "e"]
    assert all(r["clip_lo"] is None and r["y_winsorized"] is None
               and r["was_clipped"] is False for r in wz)
    # SQL twin agrees on the same degenerate partition
    from anofox_forecast_spark.functions.sql import register_all
    register_all(spark)
    df.createOrReplaceTempView("scale_all_null_t")
    sql_e = [r for r in spark.sql(
        "SELECT * FROM ts_scale(TABLE(scale_all_null_t), "
        f"'id', 'ds', 'y', '{method}')").collect() if r["id"] == "e"]
    assert len(sql_e) == 2
    assert all(r["scale_loc"] is None and r["y_scaled"] is None
               for r in sql_e)


def test_online_anomalies_null_ds_twins_agree(spark):
    """Degenerate input — NULL ds with non-null y (r9 ADVICE low): the
    batch op's array_sort puts NULL-ds structs FIRST (NULL field
    smallest) then walks (ds, y); the UDTF twin used a raw tuple sort
    that raised TypeError on None-vs-timestamp. Both twins must now
    produce the batch op's walk on the same degenerate frame."""
    from anofox_forecast_spark.functions.sql import register_all
    from anofox_forecast_spark.operators.detect import (
        ts_detect_anomalies_online_by,
    )
    rows = [("a", None, 5.0), ("a", "2024-01-02", 1.0),
            ("a", "2024-01-01", 3.0), ("a", None, 2.0),
            ("b", "2024-01-01", 7.0), ("b", None, None)]
    df = spark.createDataFrame(rows, "id string, ds string, y double") \
        .select("id", F.col("ds").cast("timestamp").alias("ds"), "y")
    batch = ts_detect_anomalies_online_by(df, "id", "ds", "y", 3.0, 1)
    got = [tuple(r) for r in batch.collect()]
    register_all(spark)
    df.createOrReplaceTempView("zs_null_ds_t")
    sql_got = [tuple(r) for r in spark.sql(
        "SELECT * FROM ts_detect_anomalies_online(TABLE(zs_null_ds_t), "
        "'id', 'ds', 'y', 3.0D, 1)").collect()]
    assert sorted(got, key=str) == sorted(sql_got, key=str)
    # NULL-ds rows were scored (not dropped), and scored FIRST:
    a = [r for r in sorted(got, key=str) if r[0] == "a"]
    assert len(a) == 4
    null_first = [r for r in a if r[1] is None]
    assert len(null_first) == 2
    # the (None, 2.0) row leads the walk -> no prior prefix
    lead = min(null_first, key=lambda r: r[2])
    assert lead[3] is None and lead[5] is None
