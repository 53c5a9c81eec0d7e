"""LLM training-data pipeline over the documents/embeddings tables:

    documents -> text quality filter -> exact dedup -> MinHash-LSH near-dup
    embeddings -> PQ index build -> ADC similarity probe (shortlist)

Every stage is bucket-keyed or code-compressed — nothing materializes a
cross product, nothing holds more than bounded per-row state, which is
what lets the same pipeline run over a 100 TB crawl.

Run: python examples/llm_data_pipeline.py [sf_dir]
"""
from __future__ import annotations

import sys


def run(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from anofox_forecast_spark.operators.dedup import (
        exact_dup_groups,
        minhash_lsh_pairs,
    )
    from anofox_forecast_spark.operators.similarity import cosine_topk_pq
    from anofox_forecast_spark.operators.text import text_quality
    from anofox_forecast_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")

    # 1. quality scoring (pure JVM maps, pipelines with the scan)
    scored = text_quality(docs, "text")
    kept = scored.filter(F.col("quality_score") > 0.3)

    # 2. exact dedup groups (md5 fingerprint hash-groupBy, one shuffle)
    dup_groups = exact_dup_groups(docs, "doc_id", "text")

    # 3. near-dup candidates (MinHash band-bucket join, fixed-width
    #    signature payload — never all-pairs)
    near = minhash_lsh_pairs(docs.limit(500), "doc_id", "text",
                             num_hashes=32, bands=8)

    # 4. embedding similarity: PQ-compressed ADC shortlist
    embs = load_table(spark, sf_dir, "embeddings")
    q = list(embs.orderBy("vec_id").select("embedding").first()[0])
    shortlist = cosine_topk_pq(embs, "vec_id", "embedding", q, k=20,
                               m=4, n_codes=8)

    # 5. (r8) exact-substring repetition: measure duplicated-token mass,
    #    then rewrite documents with the duplicated spans removed
    #    (ExactSubstr conservative policy)
    from anofox_forecast_spark.operators.pipeline import (
        dup_span_stats,
        remove_dup_spans,
        sample_weighted,
    )
    span_stats = dup_span_stats(docs, "doc_id", "text", k=5)
    rewritten = remove_dup_spans(docs, "doc_id", "text", k=5)

    # 6. (r8) quality-proportional sampling: keep 50 docs per language,
    #    inclusion probability ~ quality score (deterministic on any
    #    partitioning — the same rows win on a 1000-executor cluster)
    weighted = sample_weighted(
        docs.join(scored.select("doc_id", "quality_score"), "doc_id"),
        "doc_id", "quality_score", k=50, strata_col="lang")

    # 7. (r8) pre-flight shuffle diagnostics + corpus cardinality sketch
    from anofox_forecast_spark.operators.stats import (
        hll_count_distinct,
        skew_report,
    )
    skew = skew_report(docs, ["source"], top_k=5)
    card = hll_count_distinct(docs, "text", ["lang"])

    # (r9b) the report's ACTION: when a join key's skew_ratio blows past
    # AQE's trigger, salt the big side — results pinned identical to the
    # plain join, the hot key spreads over salt_buckets reducers
    from anofox_forecast_spark.operators.stats import salted_join
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_source_docs"))
    enriched = salted_join(docs.select("doc_id", "source"), per_source,
                           ["source"], "inner", salt_buckets=8)

    return (kept, dup_groups, near, shortlist, span_stats, rewritten,
            weighted, skew, card, enriched)


def run_incremental_hll(spark, sf_dir: str, registers_dir: str):
    """(r9) The incremental-ingest cardinality story end-to-end: two
    simulated crawl batches each persist their CONSTANT-SIZE register
    table (<= 2^p rows per group, whatever the batch size) to parquet;
    read-time merges the persisted sketches and estimates — no re-scan of
    historical batches, ever. Returns (merged_estimate_df,
    whole_corpus_estimate_df); the two are identical by construction
    (registers are per-bucket maxima — max is associative/commutative/
    idempotent), which test_examples.py asserts."""
    from pyspark.sql import functions as F

    from anofox_forecast_spark.operators.stats import (
        hll_count_distinct,
        hll_estimate_from_registers,
        hll_merge_registers,
        hll_registers,
    )
    from anofox_forecast_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    batch1 = docs.filter(F.col("doc_id") % 2 == 0)   # "yesterday's crawl"
    batch2 = docs.filter(F.col("doc_id") % 2 == 1)   # "today's crawl"

    # ingest time: one register table per batch, persisted
    for i, b in ((1, batch1), (2, batch2)):
        hll_registers(b, "text", ["lang"], precision_bits=12) \
            .write.mode("overwrite").parquet(f"{registers_dir}/batch{i}")

    # read time: reload + merge + estimate — the historical batch's raw
    # rows are never touched again
    regs = [spark.read.parquet(f"{registers_dir}/batch{i}")
            for i in (1, 2)]
    merged = hll_estimate_from_registers(
        hll_merge_registers(*regs), ["lang"], precision_bits=12)
    whole = hll_count_distinct(docs, "text", ["lang"], precision_bits=12)
    return merged, whole


def run_incremental_bloom(spark, sf_dir: str, registers_dir: str):
    """(r9b) The membership sibling of :func:`run_incremental_hll`: each
    crawl batch persists its CONSTANT-SIZE Bloom register table; at
    ingest time the next batch reloads + merges the sketches and asks
    "have we EVER seen this fingerprint" with a zero-join probe — no
    re-scan of history. Bitwise OR is idempotent, so re-persisting an
    already-ingested batch cannot corrupt the sketch. Returns
    (merged_regs_probe_df, whole_corpus_probe_df); identical by
    construction, asserted in test_examples.py."""
    from pyspark.sql import functions as F

    from anofox_forecast_spark.operators.stats import (
        bloom_contains,
        bloom_merge_registers,
        bloom_registers,
    )
    from anofox_forecast_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("text")).alias("fp"))
    batch1 = docs.filter(F.col("doc_id") % 2 == 0)
    batch2 = docs.filter(F.col("doc_id") % 2 == 1)

    for i, b in ((1, batch1), (2, batch2)):
        bloom_registers(b, "fp", m_bits=8192, k=4) \
            .write.mode("overwrite").parquet(f"{registers_dir}/bloom{i}")

    regs = [spark.read.parquet(f"{registers_dir}/bloom{i}")
            for i in (1, 2)]
    merged = bloom_contains(docs, bloom_merge_registers(*regs), "fp",
                            m_bits=8192, k=4)
    whole = bloom_contains(docs, bloom_registers(docs, "fp", m_bits=8192,
                                                 k=4), "fp",
                           m_bits=8192, k=4)
    return merged, whole


if __name__ == "__main__":
    # running as a script puts examples/ (not the repo root) on
    # sys.path — add the root so the package resolves
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from anofox_forecast_spark.session import get_spark
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="example-llm-pipeline",
                      master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    (kept, dup_groups, near, shortlist, span_stats, rewritten, weighted,
     skew, card, enriched) = run(spark, sf)
    print("quality-kept docs:", kept.count())
    print("exact-dup groups:", dup_groups.count())
    print("near-dup candidate pairs:", near.count())
    shortlist.show(5)
    import pyspark.sql.functions as F
    print("duplicated-token mass:",
          span_stats.agg(F.sum("dup_tokens")).first()[0], "tokens")
    print("rewritten docs:", rewritten.filter("n_removed_tokens > 0").count())
    print("weighted sample size:", weighted.count())
    skew.show(truncate=False)
    card.show()
    import tempfile
    with tempfile.TemporaryDirectory(prefix="hll_regs_") as d:
        merged, whole = run_incremental_hll(spark, sf, d)
        print("incremental HLL (2 persisted batches, merged at read):")
        merged.orderBy("lang").show()
        print("whole-corpus sketch (must be identical):")
        whole.orderBy("lang").show()
    spark.stop()
