"""End-to-end pretraining-corpus build over the documents table — the
round-7 pipeline family composed the way a 100 TB crawl run would be:

    documents -> PII redaction (zero-shuffle regex map)
              -> Gopher quality gate -> LM-perplexity gate (CCNet;
                 threshold = the bottom-k SAMPLED corpus quantile)
              -> quality-aware exact dedup (keep the best copy)
              -> verbatim-decontamination BLOOM gate (zero-shuffle probe,
                 exact fingerprint confirm on the suspect set only)
              -> cross-doc line dedup (boilerplate)
              -> benchmark n-gram decontamination
              -> TEMPERATURE source mixing (UniMax n^alpha weights)
              -> per-source token budget -> sequence packing

plus BM25 keyword retrieval as the audit tool ("what's in this corpus
about X?"). No stage materializes a cross product; the only wide
operations are count-keyed shuffles, broadcast joins against tiny sides
(benchmark n-grams, per-source rates), and per-bucket window sorts.

Run: python examples/corpus_build.py [sf_dir]
"""
from __future__ import annotations

import sys


def run(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from anofox_forecast_spark.operators.pipeline import (
        decontaminate_ngrams,
        dedup_lines,
        gopher_stats,
        mix_sources,
        pack_chunked,
        token_budget_filter,
    )
    from anofox_forecast_spark.operators.search import bm25_topk
    from anofox_forecast_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")

    # 0. (r9b) PII scrub FIRST — redaction must precede anything that
    #    hashes, fingerprints, or packs text. A zero-shuffle narrow map
    #    (pure Catalyst regex), so it pipelines with the scan.
    from anofox_forecast_spark.operators.text import pii_redact

    pii = pii_redact(docs, "text")
    docs = pii.select("doc_id", "lang", "source", "n_chars",
                      F.col("text_redacted").alias("text"))

    # 1. Gopher repetition/quality gate (Rae et al. 2021 Table A1)
    quality = gopher_stats(docs, "doc_id", "text")
    survivors = docs.join(
        quality.filter(F.col("gopher_keep")).select("doc_id"), "doc_id")
    # materialize the gate output AND truncate the lineage: every later
    # stage re-reads it, and without the cut Catalyst re-optimizes the
    # whole accumulated plan tree on every downstream action (tens of
    # seconds of pure driver planning at 11 chained stages). At 100 TB
    # each gate writes parquet between stages — localCheckpoint is the
    # in-session equivalent.
    survivors = survivors.localCheckpoint()

    # 1b. (r9) CCNet-style LM gate: self-trained bigram perplexity, drop
    #     the worst decile (threshold = the corpus p10 from the bottom-k
    #     sampled-quantile sketch, deterministic on any cluster)
    from anofox_forecast_spark.operators.pipeline import lm_score

    lm = lm_score(survivors, "doc_id", "text").filter("n_bigrams > 0")
    # the threshold is a CORPUS-WIDE single-group quantile — exactly the
    # regime group_quantiles' docstring fences to a sketch at 100 TB; the
    # bottom-k sampled quantile is that sketch (k rows of state, the same
    # deterministic answer on any cluster)
    from anofox_forecast_spark.operators.stats import sampled_quantiles

    thr = sampled_quantiles(lm.withColumn("__g", F.lit(1)), "doc_id",
                            "mean_logprob", ["__g"], k=256, qs=(0.1,),
                            seed="lmthr")
    lm_kept = (lm.join(F.broadcast(thr.select(
                   F.col("q_0_1").alias("__thr"))))
                 .filter(F.col("mean_logprob") >= F.col("__thr")))
    survivors = survivors.join(lm_kept.select("doc_id"), "doc_id")

    # 1b2. (r9c) DSIR targeted selection (Xie et al. 2023): the gate
    #     above asks "is this document coherent?"; DSIR asks "does it
    #     look like the domain we're training FOR?". Target = the 'src1'
    #     source (stand-in for a curated high-quality corpus); each raw
    #     doc gets log w = log p_target - log p_raw under two bigram LMs,
    #     and selection is Gumbel top-k == weighted sampling over
    #     exp(log_weight / T). The target corpus only contributes LM
    #     count tables — never a corpus-sized join side — so a small
    #     curated target stays cheap against a 100 TB crawl. Here the
    #     weights are computed and logged as an audit column; the sampled
    #     cut is shown in __main__ (a real run would pick ONE of the
    #     quality gate or the DSIR cut per recipe).
    from anofox_forecast_spark.operators.pipeline import dsir_weights

    dsir_target = survivors.filter(F.col("source") == "src1")
    dsir = dsir_weights(survivors, "doc_id", "text", dsir_target)

    # 1c. (r9) quality-aware exact dedup: one survivor per normalized
    #     fingerprint, the LONGEST capture wins (ties -> smallest id)
    from anofox_forecast_spark.operators.dedup import exact_dedup_keep_best

    kb = exact_dedup_keep_best(
        survivors.withColumn("score", F.length("text").cast("double")),
        "doc_id", "text", "score")
    survivors = survivors.join(
        kb.select(F.col("keep_id").alias("doc_id")),
        "doc_id").localCheckpoint()

    # 2. (r9b) VERBATIM-contamination Bloom gate (BEFORE any text
    #    rewriting, while fingerprints still equal the benchmark's): the
    #    benchmark's doc fingerprints compress to a 4096-bit filter that
    #    rides the closure — the corpus probe is a ZERO-shuffle map (no
    #    join against the benchmark at all). Bloom has false positives,
    #    so suspects are CONFIRMED by an exact fingerprint semi-join that
    #    only the tiny suspect set pays for — the canonical
    #    cheap-gate-then-exact-check shape for 100 TB decontamination.
    from anofox_forecast_spark.operators.stats import (bloom_contains,
                                                       bloom_registers)
    from anofox_forecast_spark.operators.text import normalize_text

    bench = docs.filter(F.col("doc_id") % 17 == 0)
    fp = F.md5(normalize_text(F.col("text")))
    bench_fp = bench.select(fp.alias("fp"))
    b_regs = bloom_registers(bench_fp, "fp", m_bits=4096, k=4, seed="cb")
    gated = bloom_contains(survivors.withColumn("fp", fp), b_regs, "fp",
                           m_bits=4096, k=4, seed="cb")
    suspects = gated.filter(F.col("bloom_maybe"))
    confirmed = suspects.join(bench_fp.distinct(), "fp", "left_semi")
    verbatim_free = gated.join(confirmed.select("doc_id"), "doc_id",
                               "left_anti").drop("bloom_maybe", "fp")

    # 3. cross-doc line dedup (boilerplate removal; words stand in for
    #    lines on the single-line synthetic docs)
    lined = verbatim_free.select(
        "doc_id", "source", F.translate("text", " ", "\n").alias("text"))
    cleaned = (dedup_lines(lined, "doc_id", "text", min_docs=200)
               .join(lined.select("doc_id", "source"), "doc_id")
               .select("doc_id", "source",
                       F.translate("clean_text", "\n", " ").alias("text")))

    # 3b. near-duplicate decontamination (broadcast n-gram set) on what
    #     survives the verbatim gate and boilerplate removal
    decon = decontaminate_ngrams(cleaned, bench, "doc_id", "text",
                                 n=3, threshold=0.5)
    clean = cleaned.join(
        decon.filter(~F.col("contaminated")).select("doc_id"),
        "doc_id").localCheckpoint()

    # 4. (r9) TEMPERATURE source mixing: targets are the UniMax
    #    n^alpha weights computed from the corpus itself (alpha=0.3
    #    up-weights low-resource sources); the weight table is one row
    #    per source, so the collect is bounded by construction
    from anofox_forecast_spark.operators.pipeline import temperature_weights

    tw = temperature_weights(clean, "source", "text", alpha=0.3)
    targets = {r["source"]: r["weight"] for r in tw.collect()}
    mixed = (mix_sources(clean, "doc_id", "source", "text", targets)
             .filter(F.col("mix_keep")))

    # 5. per-source token budget (greedy fill in id order)
    kept = clean.join(mixed.select("doc_id"), "doc_id")
    budgeted = (token_budget_filter(kept, "doc_id", "text", 10_000,
                                    strata_col="source")
                .filter(F.col("budget_keep")))

    # 6. sequence packing into context windows
    packed = pack_chunked(kept.join(budgeted.select("doc_id"), "doc_id"),
                          "doc_id", "text", window_tokens=256, buckets=4)

    # audit: keyword retrieval over the final corpus
    audit = bm25_topk(kept, "doc_id", "text", ["spark", "join"], k=10)

    # 7. semantic dedup, learn-once production shape: centroids are
    #    learned ONCE (here: from the embeddings table's bounded sample;
    #    at 100 TB: on a 1-in-N sample of the first ingest batch), stored
    #    as plain lists next to the table, and every later ingest re-uses
    #    them via semdedup(..., centroids=stored) — assignment is then a
    #    single map pass (arrow GEMM), no per-batch relearning, and cell
    #    ids stay stable across batches so cross-batch duplicates land in
    #    the same cell.
    from anofox_forecast_spark.operators.similarity import ivf_build, semdedup

    emb = load_table(spark, sf_dir, "embeddings")
    _, stored_centroids = ivf_build(emb, "vec_id", "embedding",
                                    n_clusters=8, sample_limit=2000,
                                    repartition_by_cell=False)
    sem = semdedup(emb, "vec_id", "embedding", threshold=0.95,
                   centroids=stored_centroids, assign_mode="arrow")

    return (pii, quality, lm_kept, dsir, kb, gated, confirmed, cleaned,
            decon, tw, mixed, budgeted, packed, audit, sem)


if __name__ == "__main__":
    # running as a script puts examples/ (not the repo root) on
    # sys.path — add the root so the package resolves
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from anofox_forecast_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="corpus-build")
    spark.sparkContext.setLogLevel("ERROR")
    (pii, quality, lm_kept, dsir, kb, gated, confirmed, cleaned, decon,
     tw, mixed, budgeted, packed, audit, sem) = run(spark, sf)
    print("pii redactions:", pii.agg({"n_pii": "sum"}).first()[0])
    print("gopher keep:", quality.filter("gopher_keep").count(),
          "/", quality.count())
    print("LM gate keep:", lm_kept.count(), "| keep-best survivors:",
          kb.count())
    # DSIR selection cut: keep the 100 most target-like survivors
    from pyspark.sql import functions as F
    from anofox_forecast_spark.operators.pipeline import sample_weighted
    dsel = sample_weighted(
        dsir.withColumn("w", F.exp("log_weight")).filter("w IS NOT NULL"),
        "doc_id", "w", k=100, seed="dsir")
    mean_lw = dsir.agg(F.avg("log_weight")).first()[0]
    print("DSIR selected:", dsel.count(), "of", dsir.count(),
          "| mean log_weight:",
          round(mean_lw, 4) if mean_lw is not None else None)
    tw.orderBy("source").show(5)
    print("verbatim-contaminated out:", confirmed.count(),
          "| near-dup contaminated out:",
          decon.filter("contaminated").count())
    print("mixed in:", mixed.count(), "| budget keep:", budgeted.count(),
          "| packed chunks:", packed.agg({"n_chunks": "sum"}).first()[0])
    print("semdedup keep:", sem.filter("semdedup_keep").count(),
          "/", sem.count())
    audit.show(10, truncate=60)
