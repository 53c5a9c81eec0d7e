"""Round-8 additions: exact-substring duplicate spans (ExactSubstr, Lee
et al. 2022 re-expressed relationally) and the funnel/range-join guards.

Value parity vs DuckDB oracles is covered by the `pipeline_dup_spans` /
`pipeline_dup_span_stats` driver keys; these tests pin edge-case behavior
and the physical-plan scale claims."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anofox_forecast_spark import plans as P
from anofox_forecast_spark.operators import pipeline as PL


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_dup_spans_cross_doc_and_merge(spark):
    """A 3-gram shared by two docs marks both; overlapping duplicated
    windows merge into ONE maximal span with 1-based inclusive bounds."""
    df = _docs(spark, [
        (1, "a b c d e unique1 tail1"),       # "a b c d e" shared with 2
        (2, "prefix2 a b c d e tail2"),
        (3, "nothing shared here at all"),
    ])
    got = {(r.doc_id, r.span_start, r.span_end, r.span_tokens)
           for r in PL.dup_spans(df, "doc_id", "text", k=3).collect()}
    # doc 1: 3-gram starts 1,2,3 duplicated ("a b c","b c d","c d e") ->
    # one span [1,5]; doc 2: starts 2,3,4 -> span [2,6]
    assert got == {(1, 1, 5, 5), (2, 2, 6, 5)}


def test_dup_spans_within_doc_repeat_counts(spark):
    """Like the suffix-array method, a k-gram repeated WITHIN one doc is a
    duplicate (min_count counts occurrences, not distinct docs)."""
    df = _docs(spark, [(1, "x y z pad1 pad2 x y z"),
                       (2, "all fresh words here")])
    got = {(r.doc_id, r.span_start, r.span_end)
           for r in PL.dup_spans(df, "doc_id", "text", k=3).collect()}
    assert got == {(1, 1, 3), (1, 6, 8)}


def test_dup_spans_separate_islands(spark):
    """Two duplicated regions separated by a gap wider than k stay two
    spans."""
    df = _docs(spark, [
        (1, "a b c gap1 gap2 gap3 gap4 d e f"),
        (2, "a b c other1 other2 other3 other4 d e f"),
    ])
    got = sorted((r.doc_id, r.span_start, r.span_end, r.span_tokens)
                 for r in PL.dup_spans(df, "doc_id", "text", k=3).collect())
    assert got == [(1, 1, 3, 3), (1, 8, 10, 3),
                   (2, 1, 3, 3), (2, 8, 10, 3)]


def test_dup_span_stats_covers_all_docs(spark):
    df = _docs(spark, [
        (1, "a b c d e unique1 tail1"),       # 5 of 7 tokens duplicated
        (2, "prefix2 a b c d e tail2"),
        (3, "nothing shared here at all"),    # 0 of 5
        (4, ""),                              # empty text
    ])
    got = {r.doc_id: (r.n_tokens, r.dup_tokens, r.dup_token_frac)
           for r in PL.dup_span_stats(df, "doc_id", "text", k=3).collect()}
    assert got[1] == (7, 5, pytest.approx(5 / 7))
    assert got[2] == (7, 5, pytest.approx(5 / 7))
    assert got[3] == (5, 0, 0.0)
    assert got[4] == (0, 0, 0.0)


def test_dup_spans_param_validation(spark):
    df = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        PL.dup_spans(df, "doc_id", "text", k=0)
    with pytest.raises(ValueError):
        PL.dup_spans(df, "doc_id", "text", min_count=1)


def test_dup_spans_plan_shape(spark):
    """Count-only shuffle on the gram hash, semi-join back, one per-doc
    window — no cartesian product, no Python, and the gram TEXT never
    rides a shuffle (only its md5)."""
    df = _docs(spark, [(1, "a b c d e")])
    out = PL.dup_spans(df, "doc_id", "text", k=3)
    rep = P.plan_report(out)
    assert rep["cartesian_products"] == 0
    assert rep["python_udf_nodes"] == 0
    stats = PL.dup_span_stats(df, "doc_id", "text", k=3)
    rep2 = P.plan_report(stats)
    assert rep2["cartesian_products"] == 0 and rep2["python_udf_nodes"] == 0


# ---------------------------------------------------------------------------
# weighted sampling (Efraimidis-Spirakis)
# ---------------------------------------------------------------------------

def test_sample_weighted_favors_heavy_rows(spark):
    """With one row a million times heavier, it wins the k=1 draw for
    essentially any seed (u^(1/w) -> 1 as w -> inf)."""
    rows = [(i, 1e-3) for i in range(1, 50)] + [(99, 1e6)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    wins = 0
    for seed in ("a", "b", "c", "d", "e"):
        got = PL.sample_weighted(df, "doc_id", "w", k=1, seed=seed).collect()
        assert len(got) == 1
        wins += got[0].doc_id == 99
    assert wins == 5


def test_sample_weighted_deterministic_and_strata(spark):
    rows = [(i, "s" + str(i % 2), float(1 + i % 3)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, src string, w double")
    a = sorted((r.doc_id, r.src, r.sample_rank) for r in
               PL.sample_weighted(df, "doc_id", "w", 5,
                                  strata_col="src").collect())
    b = sorted((r.doc_id, r.src, r.sample_rank) for r in
               PL.sample_weighted(df.repartition(7), "doc_id", "w", 5,
                                  strata_col="src").collect())
    assert a == b and len(a) == 10           # 5 per stratum, any layout
    per = {}
    for _, src, _ in a:
        per[src] = per.get(src, 0) + 1
    assert per == {"s0": 5, "s1": 5}


def test_sample_weighted_excludes_bad_weights(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -4.0), (4, None), (5, 2.0)],
        "doc_id bigint, w double")
    got = {r.doc_id for r in
           PL.sample_weighted(df, "doc_id", "w", 10).collect()}
    assert got == {1, 5}
    with pytest.raises(ValueError):
        PL.sample_weighted(df, "doc_id", "w", 0)


# ---------------------------------------------------------------------------
# portable HLL distinct count
# ---------------------------------------------------------------------------

def test_hll_estimate_accuracy(spark):
    from anofox_forecast_spark.operators.stats import hll_count_distinct
    n = 5000
    df = spark.range(n).selectExpr("concat('key_', id) AS k")
    got = hll_count_distinct(df, "k", precision_bits=12).first()
    # 1.04/sqrt(4096) ~ 1.6% std error; 6% is > 3 sigma
    assert abs(got.hll_estimate - n) / n < 0.06
    assert 0 < got.n_buckets_used <= 4096


def test_hll_deterministic_on_any_partitioning(spark):
    from anofox_forecast_spark.operators.stats import hll_count_distinct
    df = spark.range(2000).selectExpr("concat('u', id) AS k",
                                      "id % 3 AS g")
    a = sorted((r.g, r.hll_estimate, r.n_buckets_used) for r in
               hll_count_distinct(df, "k", ["g"]).collect())
    b = sorted((r.g, r.hll_estimate, r.n_buckets_used) for r in
               hll_count_distinct(df.repartition(13), "k", ["g"]).collect())
    assert a == b and len(a) == 3            # bit-equal incl. the float


def test_hll_small_range_linear_counting_is_exact_regime(spark):
    """At tiny cardinality the linear-counting branch engages and lands
    within a couple of percent."""
    from anofox_forecast_spark.operators.stats import hll_count_distinct
    df = spark.range(50).selectExpr("concat('x', id) AS k")
    got = hll_count_distinct(df, "k", precision_bits=12).first()
    assert abs(got.hll_estimate - 50) < 3
    # duplicate keys don't move the sketch
    dup = spark.range(50).selectExpr("concat('x', id % 25) AS k")
    got2 = hll_count_distinct(dup, "k", precision_bits=12).first()
    assert abs(got2.hll_estimate - 25) < 3


def test_hll_param_validation_and_nulls(spark):
    from anofox_forecast_spark.operators.stats import hll_count_distinct
    df = spark.createDataFrame([("a",), (None,), ("a",)], "k string")
    got = hll_count_distinct(df, "k", precision_bits=8).first()
    assert got.n_buckets_used == 1           # nulls ignored, dups merge
    with pytest.raises(ValueError):
        hll_count_distinct(df, "k", precision_bits=10)


def test_hll_and_weighted_sampling_plan_shapes(spark):
    """HLL: count-free register shuffle only (2 exchanges: bucket-max +
    group pack); weighted sampling: one window per stratum, no Python."""
    from anofox_forecast_spark.operators.stats import hll_count_distinct
    df = spark.range(100).selectExpr("concat('u', id) AS k", "id % 2 AS g")
    out = hll_count_distinct(df, "k", ["g"])
    rep = P.plan_report(out)
    assert rep["cartesian_products"] == 0 and rep["python_udf_nodes"] == 0
    dfw = spark.range(100).selectExpr("id AS doc_id",
                                      "CAST(1 + id % 5 AS DOUBLE) AS w")
    outw = PL.sample_weighted(dfw, "doc_id", "w", 10)
    repw = P.plan_report(outw)
    assert repw["cartesian_products"] == 0 and repw["python_udf_nodes"] == 0


# ---------------------------------------------------------------------------
# skew_report
# ---------------------------------------------------------------------------

def test_skew_report_values(spark):
    from anofox_forecast_spark.operators.stats import skew_report
    # key 'a' x 6, 'b' x 2, 'c' x 1, 'd' x 1  -> counts [1,1,2,6]
    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)] + [("d",)]
    df = spark.createDataFrame(rows, "k string")
    r = skew_report(df, ["k"], top_k=2).first()
    assert (r.n_keys, r.n_rows, r.max_per_key) == (4, 10, 6)
    assert r.mean_per_key == pytest.approx(2.5)
    assert r.p50_per_key == pytest.approx(1.5)      # type-7 on [1,1,2,6]
    assert r.skew_ratio == pytest.approx(6 / 2.5)
    assert r.top_keys == ["a=6", "b=2"]


def test_skew_report_composite_key_and_validation(spark):
    from anofox_forecast_spark.operators.stats import skew_report
    df = spark.createDataFrame([(1, "x"), (1, "x"), (2, "y")],
                               "a bigint, b string")
    r = skew_report(df, ["a", "b"]).first()
    assert r.n_keys == 2 and r.top_keys[0] == "1|x=2"
    with pytest.raises(ValueError):
        skew_report(df, [])
    with pytest.raises(ValueError):
        skew_report(df, ["a"], top_k=0)


def test_skew_report_deterministic_and_plan(spark):
    from anofox_forecast_spark.operators.stats import skew_report
    df = spark.range(500).selectExpr("CAST(id % 37 AS STRING) AS k")
    a = skew_report(df, ["k"]).first()
    b = skew_report(df.repartition(11), ["k"]).first()
    assert a == b
    rep = P.plan_report(skew_report(df, ["k"]))
    assert rep["cartesian_products"] == 0 and rep["python_udf_nodes"] == 0


# ---------------------------------------------------------------------------
# remove_dup_spans (the apply step of dup_spans)
# ---------------------------------------------------------------------------

def test_remove_dup_spans_rewrites(spark):
    df = _docs(spark, [
        (1, "a b c d e unique1 tail1"),
        (2, "prefix2 a b c d e tail2"),
        (3, "all fresh words here"),
        (4, ""),
    ])
    got = {r.doc_id: (r.clean_text, r.n_tokens, r.n_removed_tokens)
           for r in PL.remove_dup_spans(df, "doc_id", "text", k=3).collect()}
    assert got[1] == ("unique1 tail1", 7, 5)
    assert got[2] == ("prefix2 tail2", 7, 5)
    assert got[3] == ("all fresh words here", 4, 0)
    assert got[4] == ("", 0, 0)


def test_remove_dup_spans_plan(spark):
    df = _docs(spark, [(1, "a b c")])
    out = PL.remove_dup_spans(df, "doc_id", "text", k=2)
    rep = P.plan_report(out)
    assert rep["cartesian_products"] == 0 and rep["python_udf_nodes"] == 0


# ---------------------------------------------------------------------------
# rolling-MAD anomaly detection
# ---------------------------------------------------------------------------

def test_anomaly_rolling_mad_flags_spike(spark):
    import datetime as dt
    from anofox_forecast_spark.operators.detect import ts_detect_anomalies_by
    base = dt.datetime(2024, 1, 1)
    ys = [10.0, 11.0, 10.0, 12.0, 11.0, 10.0, 11.0, 100.0, 11.0, 10.0]
    rows = [(1, base + dt.timedelta(days=i), y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "id bigint, ds timestamp, y double")
    got = {r.ds.day: (r.robust_z, r.is_anomaly) for r in
           ts_detect_anomalies_by(df, "id", "ds", "y", window=7,
                                  min_obs=5).collect()}
    # first 5 points: insufficient history -> NULLs
    for d in (1, 2, 3, 4, 5):
        assert got[d] == (None, None)
    assert got[8][1] is True          # the 100.0 spike
    assert got[9][1] is False         # back to normal (spike in window
                                      # but median/MAD are robust to it)
    assert abs(got[8][0]) > 3.5


def test_anomaly_zero_mad_and_nulls(spark):
    import datetime as dt
    from anofox_forecast_spark.operators.detect import ts_detect_anomalies_by
    base = dt.datetime(2024, 1, 1)
    ys = [5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 7.0, None]
    rows = [(1, base + dt.timedelta(days=i), y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "id bigint, ds timestamp, y double")
    got = {r.ds.day: (r.rolling_mad, r.robust_z, r.is_anomaly) for r in
           ts_detect_anomalies_by(df, "id", "ds", "y", window=6,
                                  min_obs=5).collect()}
    # day 6: constant window -> MAD 0, same value -> not anomalous
    assert got[6] == (0.0, None, False)
    # day 7: constant window, deviating value -> flagged via the MAD=0 rule
    assert got[7] == (0.0, None, True)
    # day 8: NULL value -> NULL verdict
    assert got[8][2] is None
    import pytest as _pt
    with _pt.raises(ValueError):
        ts_detect_anomalies_by(df, "id", "ds", "y", window=0)
    with _pt.raises(ValueError):
        ts_detect_anomalies_by(df, "id", "ds", "y", window=5, min_obs=9)


def test_anomaly_plan_single_window(spark):
    import datetime as dt
    from anofox_forecast_spark.operators.detect import ts_detect_anomalies_by
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0)], "id bigint, ds timestamp, y double")
    out = ts_detect_anomalies_by(df, "id", "ds", "y")
    P.assert_max_exchanges(out, 1)
    assert P.plan_report(out)["python_udf_nodes"] == 0


# ---------------------------------------------------------------------------
# adaptive conformal (ACI, Gibbs & Candes 2021)
# ---------------------------------------------------------------------------

def _aci_df(spark, ys_fc):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    rows = [(1, base + dt.timedelta(days=i), y, f)
            for i, (y, f) in enumerate(ys_fc)]
    return spark.createDataFrame(rows,
                                 "id bigint, ds timestamp, y double, fc double")


def test_aci_update_direction_and_clamp(spark):
    from anofox_forecast_spark.operators.conformal import (
        ts_adaptive_conformal_by,
    )
    # constant residual 0.2, then one big miss at the end
    data = [(10.0, 10.2)] * 9 + [(20.0, 10.2)]
    df = _aci_df(spark, data)
    got = sorted((r.ds.day, r.alpha_t, r.q_t, r.covered) for r in
                 ts_adaptive_conformal_by(df, "id", "ds", "y", "fc",
                                          alpha=0.1, gamma=0.05).collect())
    # t=1: no history -> NULL q, NULL covered, alpha unchanged at t=2
    assert got[0][1:] == (0.1, None, None)
    assert got[1][1] == 0.1
    # covered steps RAISE alpha by gamma*alpha each step
    assert got[2][1] == pytest.approx(0.105)
    assert got[9][3] is False                  # the miss
    # after a covered step alpha rose; after the final miss there is no
    # emitted step, but the q at the miss came from history of 0.2s
    assert got[9][2] == pytest.approx(0.2)


def test_aci_alpha_clamped(spark):
    from anofox_forecast_spark.operators.conformal import (
        ts_adaptive_conformal_by,
    )
    # every step covered with huge gamma -> alpha would run past 1
    data = [(10.0, 10.0)] * 30
    df = _aci_df(spark, data)
    got = [r.alpha_t for r in
           ts_adaptive_conformal_by(df, "id", "ds", "y", "fc",
                                    alpha=0.5, gamma=1.0).collect()]
    assert max(got) <= 0.999 and min(got) >= 0.001


def test_aci_validation_and_null_rows(spark):
    from anofox_forecast_spark.operators.conformal import (
        ts_adaptive_conformal_by,
    )
    df = _aci_df(spark, [(1.0, 1.0), (None, 2.0), (3.0, None), (4.0, 4.0)])
    out = ts_adaptive_conformal_by(df, "id", "ds", "y", "fc").collect()
    assert len(out) == 2                       # null rows excluded
    with pytest.raises(ValueError):
        ts_adaptive_conformal_by(df, "id", "ds", "y", "fc", alpha=1.5)
    with pytest.raises(ValueError):
        ts_adaptive_conformal_by(df, "id", "ds", "y", "fc", gamma=0.0)


def test_aci_plan_single_shuffle_no_python(spark):
    from anofox_forecast_spark.operators.conformal import (
        ts_adaptive_conformal_by,
    )
    df = _aci_df(spark, [(1.0, 1.0)])
    out = ts_adaptive_conformal_by(df, "id", "ds", "y", "fc")
    P.assert_max_exchanges(out, 1)
    assert P.plan_report(out)["python_udf_nodes"] == 0


def test_hll_incremental_merge_equals_whole_corpus(spark):
    """The incremental-ingest path: per-batch register tables merged via
    hll_merge_registers give the BIT-IDENTICAL estimate of sketching the
    whole corpus at once — any batch split, any order."""
    from anofox_forecast_spark.operators.stats import (
        hll_count_distinct,
        hll_estimate_from_registers,
        hll_merge_registers,
        hll_registers,
    )
    df = spark.range(3000).selectExpr("concat('k', id) AS k", "id % 2 AS g")
    whole = sorted((r.g, r.hll_estimate, r.n_buckets_used) for r in
                   hll_count_distinct(df, "k", ["g"]).collect())
    b1 = hll_registers(df.filter("id < 1000"), "k", ["g"])
    b2 = hll_registers(df.filter("id >= 1000 AND id < 2222"), "k", ["g"])
    b3 = hll_registers(df.filter("id >= 2222"), "k", ["g"])
    merged = hll_merge_registers(b3, b1, b2)      # order irrelevant
    inc = sorted((r.g, r.hll_estimate, r.n_buckets_used) for r in
                 hll_estimate_from_registers(merged, ["g"]).collect())
    assert inc == whole
    # overlapping batches (re-ingest) are idempotent too
    again = hll_merge_registers(merged, b2)
    inc2 = sorted((r.g, r.hll_estimate, r.n_buckets_used) for r in
                  hll_estimate_from_registers(again, ["g"]).collect())
    assert inc2 == whole
    import pytest as _pt
    with _pt.raises(ValueError):
        hll_merge_registers()


# ---------------------------------------------------------------------------
# text entropy
# ---------------------------------------------------------------------------

def test_text_entropy_values(spark):
    import math
    from anofox_forecast_spark.operators.text import text_entropy
    df = spark.createDataFrame(
        [(1, "aaaa"),              # one symbol -> 0 nats
         (2, "abab"),              # two equal symbols -> ln 2
         (3, "x y x y"),           # words: 2 distinct, equal -> ln 2
         (4, "")],
        "doc_id bigint, text string")
    got = {r.doc_id: (r.char_entropy, r.word_entropy,
                      r.n_distinct_chars, r.n_distinct_words)
           for r in text_entropy(df, "text").collect()}
    assert got[1][0] == pytest.approx(0.0)
    assert got[2][0] == pytest.approx(math.log(2))
    assert got[3][1] == pytest.approx(math.log(2))
    assert got[3][3] == 2
    assert got[4] == (0.0, 0.0, 0, 0)


def test_text_entropy_plan_no_shuffle(spark):
    from anofox_forecast_spark.operators.text import text_entropy
    df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    out = text_entropy(df, "text")
    P.assert_max_exchanges(out, 0)
    assert P.plan_report(out)["python_udf_nodes"] == 0
