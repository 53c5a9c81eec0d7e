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
