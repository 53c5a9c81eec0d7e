"""Round-9 additions: the ExactSubstr leave-one-copy policy
(``keep_first=True`` on the dup-span family) pinned against a
single-process Python reference, plus the r9 guard/validation fixes.

Value parity vs DuckDB is covered by the
``pipeline_remove_dup_spans_keep_first`` driver key; these tests pin the
semantics on handcrafted corpora where the expected answer is derivable
by hand or by an independent in-memory replay."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from anofox_forecast_spark.operators import pipeline as PL


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _py_words(s: str) -> list[str]:
    t = s.strip(" ")
    return re.split(r"\s+", t.lower(), flags=re.ASCII) if t else []


def _py_keep_first_spans(rows, k, min_count=2):
    """Independent single-process replay of dup_spans(keep_first=True):
    gram occurrence lists -> drop each duplicated gram's (id, pos)-argmin
    -> mark remaining windows -> merge islands with the gap > k rule."""
    occ: dict[tuple, list] = {}
    for doc_id, text in rows:
        ws = _py_words(text)
        for p in range(len(ws) - k + 1):
            occ.setdefault(tuple(ws[p:p + k]), []).append((doc_id, p + 1))
    marked: dict[int, set] = {}
    for g, ps in occ.items():
        if len(ps) >= min_count:
            for doc_id, pos in sorted(ps)[1:]:
                marked.setdefault(doc_id, set()).add(pos)
    spans = set()
    for doc_id, poss in marked.items():
        run = []
        for p in sorted(poss):
            if run and p - run[-1] > k:
                spans.add((doc_id, run[0], run[-1] + k - 1))
                run = []
            run.append(p)
        if run:
            spans.add((doc_id, run[0], run[-1] + k - 1))
    return spans


def test_keep_first_identical_docs(spark):
    """Two identical documents: drop-all guts BOTH; keep_first leaves the
    smaller doc_id (every gram's canonical occurrence) untouched."""
    txt = "alpha beta gamma delta epsilon zeta"
    df = _docs(spark, [(1, txt), (2, txt), (3, "all fresh words here now")])
    drop_all = PL.remove_dup_spans(df, "doc_id", "text", k=3).collect()
    keep = PL.remove_dup_spans(df, "doc_id", "text", k=3,
                               keep_first=True).collect()
    da = {r.doc_id: r for r in drop_all}
    kf = {r.doc_id: r for r in keep}
    assert da[1].clean_text == "" and da[2].clean_text == ""
    assert kf[1].clean_text == txt.lower() and kf[1].n_removed_tokens == 0
    assert kf[2].clean_text == "" and kf[2].n_removed_tokens == 6
    assert kf[3].n_removed_tokens == 0


def test_keep_first_canonical_is_id_pos_argmin(spark):
    """The canonical copy is the LEXICOGRAPHIC (id, pos) argmin — within
    one doc the earliest occurrence survives, later repeats go."""
    # "x y z" occurs at doc1 pos1, doc1 pos5, doc2 pos2 -> canonical is
    # (1, 1); the other two occurrences are marked
    df = _docs(spark, [(1, "x y z pad x y z"), (2, "lead x y z")])
    got = {(r.doc_id, r.span_start, r.span_end)
           for r in PL.dup_spans(df, "doc_id", "text", k=3,
                                 keep_first=True).collect()}
    assert got == {(1, 5, 7), (2, 2, 4)}


def test_keep_first_matches_python_reference(spark):
    """Property-style pin on a corpus with overlapping repeats, in-doc
    repeats, and cross-doc sharing: Spark == the independent replay."""
    rows = [
        (10, "a b c d e f a b c d"),
        (11, "z z z z z z z z"),
        (12, "a b c d tail one two three"),
        (13, "one two three a b c d e f"),
        (14, "totally unique sentence with no repeats anywhere"),
    ]
    for k in (2, 3, 4):
        exp = _py_keep_first_spans(rows, k)
        got = {(r.doc_id, r.span_start, r.span_end)
               for r in PL.dup_spans(_docs(spark, rows), "doc_id", "text",
                                     k=k, keep_first=True).collect()}
        assert got == exp, f"k={k}"


def test_keep_first_subset_of_drop_all(spark):
    """keep_first marks a subset of drop-all's positions, and every
    duplicated gram keeps >= 1 unmarked occurrence (the guarantee)."""
    rows = [(i, t) for i, t in enumerate([
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox sat still",
        "a different the quick brown fox jumps again",
    ])]
    df = _docs(spark, rows)
    k = 4
    stats_all = {r.doc_id: r.dup_tokens for r in
                 PL.dup_span_stats(df, "doc_id", "text", k=k).collect()}
    stats_kf = {r.doc_id: r.dup_tokens for r in
                PL.dup_span_stats(df, "doc_id", "text", k=k,
                                  keep_first=True).collect()}
    assert sum(stats_kf.values()) < sum(stats_all.values())
    for d in stats_kf:
        assert stats_kf[d] <= stats_all[d]


def test_stream_state_rows_validation(spark):
    """state_rows < 1 is rejected up front (r8 ADVICE: state_rows=0 made
    res[-0:] keep the ENTIRE history — unbounded state)."""
    from anofox_forecast_spark import streaming as S
    dummy = spark.readStream.format("rate").load()
    for fn, kw in [
            (S.stream_forecast, {}),
            (S.stream_conformal, {}),
            (S.stream_adaptive_conformal, {})]:
        with pytest.raises(ValueError, match="state_rows"):
            fn(dummy, state_rows=0, **kw)


def test_time_rollup_udtf_bigint_ts(spark):
    """events_time_rollup SQL form accepts BIGINT epoch-seconds ts (the
    sibling UDTFs' _py_us convention): buckets come back as timestamps,
    matching the DataFrame op's date_trunc over an implicit cast."""
    from anofox_forecast_spark.functions.sql import register_all
    register_all(spark)
    spark.createDataFrame(
        [(86400 + 3600, 1.0), (86400 + 7200, 2.0), (2 * 86400, 3.0)],
        "ts bigint, v double").createOrReplaceTempView("t_rollup_int")
    rows = spark.sql(
        "SELECT * FROM events_time_rollup(TABLE(t_rollup_int), "
        "'ts', 'v', '[\"day\"]')").collect()
    got = {(str(r.bucket), r.n, r.value_sum) for r in rows}
    assert got == {("1970-01-02 00:00:00", 2, 3.0),
                   ("1970-01-03 00:00:00", 1, 3.0)}


def test_lm_score_hand_computed(spark):
    """Add-1 bigram LM on a 2-doc corpus small enough to compute by hand:
    vocab {a,b,c} (V=3), bigrams: (a,b)x2, (b,a)x1, (b,c)x1."""
    import math
    df = spark.createDataFrame([(1, "a b a b"), (2, "b c"), (3, "a")],
                               "doc_id bigint, text string")
    got = {r.doc_id: r for r in
           PL.lm_score(df, "doc_id", "text", k=1.0).collect()}
    # corpus counts: C(a)=3, C(b)=3, C(c)=1; C(a,b)=2, C(b,a)=1, C(b,c)=1
    p_ab = (2 + 1.0) / (3 + 1.0 * 3)     # 0.5
    p_ba = (1 + 1.0) / (3 + 1.0 * 3)     # 1/3
    p_bc = (1 + 1.0) / (3 + 1.0 * 3)     # 1/3
    m1 = (math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3.0
    m2 = math.log(p_bc) / 1.0
    assert got[1].n_bigrams == 3 and got[2].n_bigrams == 1
    assert abs(got[1].mean_logprob - m1) < 1e-12
    assert abs(got[2].mean_logprob - m2) < 1e-12
    assert abs(got[1].perplexity - math.exp(-m1)) < 1e-12
    # a 1-word doc has no bigrams: NULL score, not a crash
    assert got[3].n_bigrams == 0 and got[3].mean_logprob is None


def test_lm_score_ranks_gibberish_below_text(spark):
    """The CCNet property: repeated natural phrasing scores higher
    (mean_logprob closer to 0) than never-repeated token soup."""
    common = "the quick brown fox jumps over the lazy dog"
    rows = [(i, common) for i in range(10)]
    rows.append((99, "zq xv jk wp mn bf gh tr ld cs"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.mean_logprob
           for r in PL.lm_score(df, "doc_id", "text").collect()}
    assert got[0] > got[99]


def test_lm_score_train_corpus_split(spark):
    """Counts come from `train` when given: a doc scored against a
    foreign corpus gets the unseen-bigram floor ln(k/(C1+kV))."""
    import math
    train = spark.createDataFrame([(1, "a b a b")],
                                  "doc_id bigint, text string")
    score = spark.createDataFrame([(9, "c d")],
                                  "doc_id bigint, text string")
    r = PL.lm_score(score, "doc_id", "text", k=1.0, train=train).first()
    # V=2 ({a,b}); c,d unseen: C(c,d)=0, C(c)=0
    exp = math.log((0 + 1.0) / (0 + 1.0 * 2))
    assert r.n_bigrams == 1 and abs(r.mean_logprob - exp) < 1e-12
    with pytest.raises(ValueError, match="k"):
        PL.lm_score(score, "doc_id", "text", k=0.0)


def test_exact_dedup_keep_best(spark):
    """Argmax score per fingerprint, ties to the smaller id; singletons
    report dup_count 1."""
    from anofox_forecast_spark.operators.dedup import exact_dedup_keep_best
    df = spark.createDataFrame(
        [(1, "Hello  World", 0.4),     # same normalized text as 2, 3
         (2, "hello world", 0.9),      # highest score -> keeper
         (3, "HELLO WORLD  ", 0.9),    # tie with 2 -> id 2 wins
         (4, "something else", 0.1)],
        "doc_id bigint, text string, score double")
    got = {r.keep_id: r for r in
           exact_dedup_keep_best(df, "doc_id", "text", "score").collect()}
    assert set(got) == {2, 4}
    assert got[2].dup_count == 3 and got[2].keep_score == 0.9
    assert got[4].dup_count == 1 and got[4].keep_score == 0.1


def test_exact_dedup_keep_best_null_scores(spark):
    """NULL scores rank WORST (not first, despite Spark's null-first
    struct order); an all-NULL group reports keep_score NULL."""
    from anofox_forecast_spark.operators.dedup import exact_dedup_keep_best
    df = spark.createDataFrame(
        [(1, "same text", None), (2, "same  text", 0.2),
         (5, "only nulls", None), (6, "only  nulls", None)],
        "doc_id bigint, text string, score double")
    got = {r.keep_id: r for r in
           exact_dedup_keep_best(df, "doc_id", "text", "score").collect()}
    assert set(got) == {2, 5}
    assert got[2].keep_score == 0.2          # scored member beats NULL
    assert got[5].keep_score is None and got[5].dup_count == 2


def test_temperature_weights_properties(spark):
    """alpha=1 reproduces natural shares; alpha=0 is uniform over
    non-empty sources; 0<alpha<1 up-weights the tail (up_ratio > 1 for
    below-average sources); weights sum to 1; empty sources weigh 0."""
    rows = ([(i, "big", "w " * 100) for i in range(50)]
            + [(100 + i, "small", "w " * 10) for i in range(5)]
            + [(200, "empty", "")])
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    for alpha in (0.0, 0.3, 1.0):
        got = {r.source: r for r in
               PL.temperature_weights(df, "source", "text",
                                      alpha=alpha).collect()}
        assert got["empty"].weight == 0.0 and got["empty"].n_tokens == 0
        total = sum(r.weight for r in got.values())
        assert abs(total - 1.0) < 1e-12
        if alpha == 1.0:
            for s in ("big", "small"):
                assert abs(got[s].weight - got[s].natural_share) < 1e-12
        if alpha == 0.0:
            assert abs(got["big"].weight - got["small"].weight) < 1e-12
        if alpha == 0.3:
            assert got["small"].up_ratio > 1.0 > got["big"].up_ratio
    with pytest.raises(ValueError, match="alpha"):
        PL.temperature_weights(df, "source", "text", alpha=-0.1)


def test_temperature_weights_feed_mix_sources(spark):
    """The composition the docstring promises: weights flow straight
    into mix_sources targets and produce a deterministic mixture."""
    rows = ([(i, "a", "tok " * 40) for i in range(40)]
            + [(100 + i, "b", "tok " * 10) for i in range(10)])
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    w = {r.source: r.weight for r in
         PL.temperature_weights(df, "source", "text", 0.3).collect()}
    mixed = PL.mix_sources(df, "doc_id", "source", "text", targets=w)
    kept = mixed.filter("mix_keep").groupBy("source").count().collect()
    assert {r.source for r in kept} == {"a", "b"}
