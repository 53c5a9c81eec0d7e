"""Round-7 additions: the training-data pipeline family
(operators/pipeline.py) — Gopher/C4 quality signals, n-gram
decontamination, deterministic sampling, and sequence packing.

Value parity vs the DuckDB oracles is covered by test_entry_oracle.py (the
pipeline_* keys); these tests pin the behavioral edge cases and the
physical-plan scale claims SCALE.md makes for the family."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from anofox_forecast_spark import plans as P
from anofox_forecast_spark.operators import pipeline as PL
from anofox_forecast_spark.sources import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


# ---------------------------------------------------------------------------
# behavioral pins on crafted rows
# ---------------------------------------------------------------------------

def test_gopher_repetition_signals(spark):
    rows = [
        # heavy 2-gram repetition: "a b" x 6
        (1, "a b a b a b a b a b a b"),
        # duplicated lines
        (2, "first line\nsecond line\nfirst line"),
        # clean text, nothing repeats
        (3, "one two three four five six seven eight nine ten"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           PL.gopher_stats(df, "doc_id", "text").collect()}
    # doc 1: top 2-gram "a b" occurs 6 times (non-overlapping pairs counted
    # over all 11 positions -> "a b" appears 6, "b a" 5); chars = 6*3/23
    assert out[1]["top_2gram_char_frac"] == pytest.approx(6 * 3 / 23)
    assert out[1]["dup_5gram_char_frac"] > 0.9  # everything repeats
    assert not out[1]["gopher_keep"]
    # doc 2: beyond-the-first convention — "first line" appears twice, so
    # ONE of three lines is a duplicate (the first occurrence is not)
    assert out[2]["dup_line_frac"] == pytest.approx(1 / 3)
    assert out[2]["dup_line_char_frac"] == pytest.approx(
        1 * len("first line") / len(rows[1][1]))
    # doc 3: no repetition anywhere
    assert out[3]["top_2gram_char_frac"] == 0.0
    assert out[3]["dup_10gram_char_frac"] == 0.0
    # doc 4: empty text -> all-zero signals, filtered by min_words
    assert out[4]["n_words"] == 0 and not out[4]["gopher_keep"]


def test_c4_signals(spark):
    rows = [
        (1, "Good doc. Three sentences! Right?"),
        (2, "function() { return 1; }"),
        (3, "no terminal punctuation here"),
    ]
    out = {r["doc_id"]: r for r in
           PL.c4_stats(spark.createDataFrame(rows, ["doc_id", "text"]),
                       "doc_id", "text").collect()}
    assert out[1]["n_sentences"] == 3 and out[1]["ends_terminal_punct"]
    assert out[1]["c4_keep"]
    assert out[2]["has_curly_brace"] and not out[2]["c4_keep"]
    assert not out[3]["ends_terminal_punct"] and not out[3]["c4_keep"]


def test_decontaminate_self_is_fully_contaminated(spark):
    rows = [(1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = df.filter("doc_id = 1")
    out = {r["doc_id"]: r for r in
           PL.decontaminate_ngrams(df, bench, "doc_id", "text", n=3).collect()}
    assert out[1]["contamination_frac"] == 1.0 and out[1]["contaminated"]
    assert out[2]["n_matched"] == 0 and not out[2]["contaminated"]


def test_sample_by_hash_matches_reference_md5(spark):
    """The kept set is exactly {k : int(md5('s:'k)[:8], 16) / 2^32 < rate} —
    independent of partitioning (the portability claim)."""
    df = spark.range(0, 500).withColumnRenamed("id", "k")
    rate, seed = 0.3, "t7"
    got = {r["k"] for r in PL.sample_by_hash(df, "k", rate, seed).collect()}
    exp = {k for k in range(500)
           if int(hashlib.md5(f"{seed}:{k}".encode()).hexdigest()[:8], 16)
           / 2**32 < rate}
    assert got == exp
    repart = {r["k"] for r in
              PL.sample_by_hash(df.repartition(13), "k", rate, seed).collect()}
    assert repart == exp


def test_sample_stratified_exact_quota(spark, docs):
    out = PL.sample_stratified(docs, "lang", "doc_id", 4, "t7")
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {lg: min(4, n) for lg, n in sizes.items()}


def test_pack_chunked_offsets_are_contiguous(spark, docs):
    out = PL.pack_chunked(docs, "doc_id", "text", window_tokens=128,
                          buckets=4).collect()
    by_bucket: dict[int, list] = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert set(by_bucket) == {0, 1, 2, 3}
    for rows in by_bucket.values():
        rows.sort(key=lambda r: r["token_offset"])
        cum = 0
        for r in rows:
            assert r["token_offset"] == cum, "stream must be gapless"
            assert r["start_chunk"] == cum // 128
            if r["n_tokens"] > 0:
                assert r["end_chunk"] == (cum + r["n_tokens"] - 1) // 128
                assert r["n_chunks"] == r["end_chunk"] - r["start_chunk"] + 1
            cum += r["n_tokens"]


# ---------------------------------------------------------------------------
# physical-plan scale guards (SCALE.md "pipeline" family)
# ---------------------------------------------------------------------------

def test_c4_and_sampling_fuse_into_scan(spark, docs):
    """Narrow maps: no shuffle, no Python — they pipeline with the scan."""
    for df in (PL.c4_stats(docs, "doc_id", "text"),
               PL.sample_by_hash(docs, "doc_id", 0.25, "s"),):
        P.assert_max_exchanges(df, 0)
        assert P.plan_report(df)["python_udf_nodes"] == 0


def test_gopher_shuffle_budget(spark, docs):
    """Line/word stats fuse into the scan; the n-gram frequency stats pay
    (id, n, gram) + id count-only shuffles, then the per-doc join — and
    nothing crosses into Python."""
    df = PL.gopher_stats(docs, "doc_id", "text")
    P.assert_no_cartesian(df)
    assert P.plan_report(df)["python_udf_nodes"] == 0


def test_decontaminate_broadcasts_benchmark(spark, docs):
    """The corpus side must never shuffle its text: the benchmark n-gram
    set is broadcast into the join."""
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    df = PL.decontaminate_ngrams(docs, bench, "doc_id", "text", n=3)
    plan = P.physical_plan(df)
    assert "BroadcastHashJoin" in plan
    P.assert_no_cartesian(df)


def test_pack_chunked_single_shuffle(spark, docs):
    """One hash-partition window per bucket — the whole packing is a single
    exchange keyed by bucket."""
    df = PL.pack_chunked(docs, "doc_id", "text")
    P.assert_max_exchanges(df, 1)
    assert P.plan_report(df)["python_udf_nodes"] == 0


# ---------------------------------------------------------------------------
# duplicate-cluster resolution (dedup.dup_clusters)
# ---------------------------------------------------------------------------

def test_dup_clusters_transitive_closure(spark):
    """A chain a-b-c-...-g is ONE cluster even though most pairs were never
    emitted; disjoint components keep separate labels."""
    from anofox_forecast_spark.operators.dedup import dup_clusters
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7),
         (10, 11), (20, 21), (21, 22)],
        "id_a bigint, id_b bigint")
    got = {r["id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
           for r in dup_clusters(pairs).collect()}
    assert {i: got[i][0] for i in got} == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 7: 1,
        10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    assert got[1] == (1, 7, True) and got[7] == (1, 7, False)
    assert [i for i, v in got.items() if v[2]] == [1, 10, 20]


def test_dup_clusters_nonconvergence_raises(spark):
    """max_iter too small for the chain's diameter must raise, not return
    partial (under-merged) components."""
    import pytest as _pt
    from anofox_forecast_spark.operators.dedup import dup_clusters
    chain = [(i, i + 1) for i in range(1, 40)]
    pairs = spark.createDataFrame(chain, "id_a bigint, id_b bigint")
    with _pt.raises(RuntimeError, match="did not converge"):
        dup_clusters(pairs, max_iter=1).collect()
    # ...and with enough rounds the same chain is one component
    got = {r["id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert set(got.values()) == {1}


def test_resolve_duplicates_vs_single_round_prune(spark):
    """Cluster resolution keeps exactly one doc per component; docs in no
    pair are untouched."""
    from anofox_forecast_spark.operators.dedup import resolve_duplicates
    pairs = spark.createDataFrame([(5, 3), (3, 9)], "id_a bigint, id_b bigint")
    docs = spark.createDataFrame([(i,) for i in (3, 5, 9, 42)],
                                 "doc_id bigint")
    kept = sorted(r["doc_id"] for r in
                  resolve_duplicates(docs, "doc_id", pairs).collect())
    assert kept == [3, 42]  # canonical = min id of {3,5,9}; 42 singleton


def test_minhash_bucket_cap_drops_hot_buckets(spark):
    """max_bucket_size: a 12-copy exact-dup pileup (one hot bucket per
    band) is dropped at cap 10, while a 2-doc near-dup pair survives."""
    from anofox_forecast_spark.operators.dedup import minhash_lsh_pairs
    hot = [(i, "identical text for every copy here") for i in range(12)]
    pair = [(100, "a quite different document about spark windows"),
            (101, "a quite different document about spark window")]
    df = spark.createDataFrame(hot + pair, "doc_id bigint, text string")
    got = minhash_lsh_pairs(df, "doc_id", "text", num_hashes=32, bands=8,
                            threshold=0.4, max_bucket_size=10).collect()
    ids = {i for r in got for i in (r.id_a, r.id_b)}
    assert ids == {100, 101}
    # uncapped: the pileup's 66 pairs all appear
    full = minhash_lsh_pairs(df, "doc_id", "text", num_hashes=32, bands=8,
                             threshold=0.4).count()
    assert full == 66 + 1
