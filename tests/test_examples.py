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
    periods, fc, conf, aci, anomalies, fc_unscaled = run(spark, SF_DIR)
    assert aci.count() > 0
    assert anomalies.count() > 0
    assert periods.count() > 0
    assert fc.count() > 0
    assert conf.count() > 0
    # scaled-space forecasts come back in original units with no NULL
    # yhat (every panel series has IQR > 0)
    rows = fc_unscaled.collect()
    assert len(rows) > 0
    assert all(r["yhat"] is not None for r in rows)


def test_llm_pipeline_example(spark):
    from examples.llm_data_pipeline import run
    (kept, dup_groups, near, shortlist, span_stats, rewritten, weighted,
     skew, card, enriched) = run(spark, SF_DIR)
    assert kept.count() > 0
    assert dup_groups.count() >= 0
    assert near.count() >= 0
    assert shortlist.count() > 0
    assert span_stats.count() > 0
    assert rewritten.count() > 0
    assert weighted.count() > 0
    assert skew.count() == 1
    assert card.count() > 0
    # salted enrichment == plain join row-for-row (the salt is physical)
    assert enriched.count() == 500


def test_llm_pipeline_incremental_hll(tmp_path, spark):
    """The persist/reload cycle: two batches' register tables written to
    parquet, merged at read time — the merged-sketch estimate equals the
    whole-corpus sketch EXACTLY (registers are per-bucket maxima; merge
    is associative/idempotent, so batch splitting is invisible)."""
    from examples.llm_data_pipeline import run_incremental_hll
    merged, whole = run_incremental_hll(spark, SF_DIR, str(tmp_path))
    a = merged.orderBy("lang").collect()
    b = whole.orderBy("lang").collect()
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        assert ra["lang"] == rb["lang"]
        assert ra["n_buckets_used"] == rb["n_buckets_used"]
        assert ra["hll_estimate"] == rb["hll_estimate"]


def test_llm_pipeline_incremental_bloom(tmp_path, spark):
    """The membership sibling: per-batch Bloom registers persisted to
    parquet, merged at read time — the probe verdicts equal the
    whole-corpus sketch exactly (OR is idempotent), and every corpus
    fingerprint probes True (no false negatives by construction)."""
    from examples.llm_data_pipeline import run_incremental_bloom
    merged, whole = run_incremental_bloom(spark, SF_DIR, str(tmp_path))
    a = {r["doc_id"]: r["bloom_maybe"] for r in merged.collect()}
    b = {r["doc_id"]: r["bloom_maybe"] for r in whole.collect()}
    assert a == b and len(a) > 0
    assert all(a.values())


def test_events_analytics_example(spark):
    from examples.events_analytics import run
    sessions, stats, enriched, concurrency, fun, ret, rollup = run(spark, SF_DIR)
    assert sessions.count() > 0
    assert stats.count() > 0
    assert enriched.count() > 0
    assert concurrency.count() > 0
    assert fun.count() > 0
    assert ret.count() > 0
    assert rollup.count() > 0


def test_corpus_build_example(spark):
    from examples.corpus_build import run
    (pii, quality, lm_kept, dsir, kb, gated, confirmed, cleaned, decon,
     tw, mixed, budgeted, packed, audit, sem) = run(spark, SF_DIR)
    assert pii.count() > 0
    assert quality.count() > 0
    assert lm_kept.count() > 0
    # DSIR audit: one weight row per LM-gate survivor; target members
    # exist, and scored docs carry a finite log_weight
    drows = dsir.collect()
    assert len(drows) == lm_kept.count()
    assert any(r["log_weight"] is not None for r in drows)
    assert kb.count() > 0
    assert cleaned.count() > 0
    # every bench doc that reached the gate is verbatim-contaminated by
    # construction (bench is a subset of the corpus) and the exact
    # confirm clears every Bloom false positive
    got = {r["doc_id"] for r in confirmed.collect()}
    reached = {r["doc_id"] for r in gated.collect()}
    from pyspark.sql import functions as F
    bench_ids = {r["doc_id"] for r in
                 spark.read.parquet(f"{SF_DIR}/documents.parquet")
                 .filter(F.col("doc_id") % 17 == 0).collect()}
    assert got == (bench_ids & reached) and len(got) > 0
    assert tw.count() > 0
    # temperature weights are a distribution over sources
    assert abs(sum(r.weight for r in tw.collect()) - 1.0) < 1e-9
    assert mixed.count() >= 0
    assert packed.count() >= 0
    assert audit.count() > 0
    assert sem.count() > 0
