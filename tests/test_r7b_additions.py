"""Round-7 additions, part 2: SemDeDup (cluster-then-compare semantic
dedup), corpus-wide line dedup (CCNet-style boilerplate removal), and BM25
keyword search.

Value parity vs the DuckDB oracles is covered by test_entry_oracle.py
(the `semdedup`, `pipeline_dedup_lines`, `search_bm25` keys); these tests
pin behavioral edge cases and the physical-plan scale claims."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from anofox_forecast_spark import plans as P
from anofox_forecast_spark.operators import pipeline as PL
from anofox_forecast_spark.operators import search as SR
from anofox_forecast_spark.operators import similarity as SIM


# ---------------------------------------------------------------------------
# semdedup
# ---------------------------------------------------------------------------

def test_semdedup_within_cell_only(spark):
    """Two identical vectors in the same cell are a dup pair; an identical
    vector forced into a different cell by stored centroids is missed —
    the documented SemDeDup recall tradeoff."""
    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.0]),   # cell 0 dups
            (3, [0.0, 1.0]), (4, [0.0, 1.0]),   # cell 1 dups
            (5, [0.71, 0.71])]                   # alone in its neighborhood
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cents = [[1.0, 0.0], [0.0, 1.0]]
    pairs = SIM.semdedup_pairs(df, "vec_id", "embedding", threshold=0.99,
                               centroids=cents).collect()
    assert sorted((r.id_a, r.id_b) for r in pairs) == [(1, 2), (3, 4)]
    keep = {r.vec_id: r.semdedup_keep
            for r in SIM.semdedup(df, "vec_id", "embedding", threshold=0.99,
                                  centroids=cents).collect()}
    assert keep == {1: True, 2: False, 3: True, 4: False, 5: True}


def test_semdedup_no_cross_product_plan(spark):
    """The comparison join is keyed on __cell — never a cartesian product."""
    df = spark.createDataFrame([(i, [float(i), 1.0]) for i in range(20)],
                               "vec_id bigint, embedding array<double>")
    out = SIM.semdedup_pairs(df, "vec_id", "embedding", threshold=0.9,
                             centroids=[[1.0, 0.0], [0.0, 1.0]])
    rep = P.plan_report(out)
    assert rep["cartesian_products"] == 0
    assert rep["python_udf_nodes"] == 0


# ---------------------------------------------------------------------------
# dedup_lines
# ---------------------------------------------------------------------------

def test_dedup_lines_removes_cross_doc_boilerplate(spark):
    rows = [
        (1, "unique prose one\ncookie banner\nmore prose"),
        (2, "cookie banner\ndifferent text here"),
        (3, "totally original\n\nlast line"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in
           PL.dedup_lines(df, "doc_id", "text").collect()}
    assert got[1].clean_text == "unique prose one\nmore prose"
    assert (got[1].n_lines, got[1].n_removed_lines) == (3, 1)
    assert got[2].clean_text == "different text here"
    # blank lines are never counted as duplicates and never removed
    assert got[3].clean_text == "totally original\n\nlast line"
    assert got[3].n_removed_lines == 0


def test_dedup_lines_all_removed_and_custom_sep(spark):
    rows = [(1, "same | same"), (2, "same | other")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in
           PL.dedup_lines(df, "doc_id", "text", sep=" | ").collect()}
    # "same" occurs in both docs -> removed everywhere; doc 1 empties out
    assert got[1].clean_text == "" and got[1].n_removed_lines == 2
    assert got[2].clean_text == "other"


def test_dedup_lines_plan_shape(spark):
    df = spark.createDataFrame([(1, "a\nb")], "doc_id bigint, text string")
    out = PL.dedup_lines(df, "doc_id", "text")
    rep = P.plan_report(out)
    assert rep["cartesian_products"] == 0
    assert rep["python_udf_nodes"] == 0


# ---------------------------------------------------------------------------
# bm25
# ---------------------------------------------------------------------------

def _bm25_ref(docs, terms, k1=1.2, b=0.75):
    """Plain-python BM25 for the fixture."""
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, _ in docs:
        s = 0.0
        for t in terms:
            dfreq = sum(1 for v in toks.values() if t in v)
            tf = toks[i].count(t)
            idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
            s += idf * (tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks[i]) / avgdl)))
        out[i] = s
    return out


def test_bm25_matches_closed_form(spark):
    docs = [(1, "spark join window join"),
            (2, "hash table scan"),
            (3, "spark spark spark filter"),
            (4, "window sort merge join window")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r.doc_id: r.score
           for r in SR.bm25_score(df, "doc_id", "text",
                                  ["spark", "join"]).collect()}
    ref = _bm25_ref(docs, ["spark", "join"])
    for i in ref:
        assert got[i] == pytest.approx(ref[i], rel=1e-12)
    top = SR.bm25_topk(df, "doc_id", "text", ["spark", "join"], k=2).collect()
    ranked = sorted(ref, key=lambda i: (-ref[i], i))[:2]
    assert [r.doc_id for r in top] == ranked


def test_bm25_single_pass_plan(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "b c")],
                               "doc_id bigint, text string")
    out = SR.bm25_topk(df, "doc_id", "text", ["a", "b"], k=1)
    rep = P.plan_report(out)
    assert rep["python_udf_nodes"] == 0
    # corpus stats reduce to one single-row aggregate broadcast back:
    # the only exchanges are the stats agg + the TakeOrdered singletons
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_bm25_rejects_empty_query(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        SR.bm25_score(df, "doc_id", "text", [])


# ---------------------------------------------------------------------------
# mix_sources / token_budget_filter
# ---------------------------------------------------------------------------

def test_mix_sources_rates(spark):
    """Binding source keeps rate 1.0; others downsample toward the target
    token mixture; untargeted sources get rate 0."""
    rows = [(1, "a", "w " * 10), (2, "a", "w " * 10),   # a: 20 tokens
            (3, "b", "w " * 5),                          # b: 5 tokens
            (4, "c", "w " * 5)]                          # c: untargeted
    df = spark.createDataFrame(rows, "doc_id bigint, src string, text string")
    out = PL.mix_sources(df, "doc_id", "src", "text",
                         {"a": 0.5, "b": 0.5}).collect()
    rates = {r.source: r.keep_rate for r in out}
    # ratios: a = .5/20, b = .5/5 -> b binds at 1.0, a keeps 1/4
    assert rates["b"] == pytest.approx(1.0)
    assert rates["a"] == pytest.approx(0.25)
    assert rates["c"] == 0.0
    assert all((not r.mix_keep) for r in out if r.source == "c")


def test_mix_sources_rejects_empty_targets(spark):
    df = spark.createDataFrame([(1, "a", "x")],
                               "doc_id bigint, src string, text string")
    with pytest.raises(ValueError):
        PL.mix_sources(df, "doc_id", "src", "text", {})


def test_token_budget_greedy_fill(spark):
    rows = [(1, "s", "w w w"), (2, "s", "w w"), (3, "s", "w w w w"),
            (4, "t", "w")]
    df = spark.createDataFrame(rows, "doc_id bigint, src string, text string")
    # per-stratum, id order: s takes 3 then 2 (before=3 < 4) then stops
    got = {r.doc_id: (r.tokens_before, r.budget_keep)
           for r in PL.token_budget_filter(df, "doc_id", "text", 4,
                                           strata_col="src").collect()}
    assert got[1] == (0, True) and got[2] == (3, True)
    assert got[3] == (5, False) and got[4] == (0, True)


def test_token_budget_order_col(spark):
    rows = [(1, 1.0, "w w"), (2, 9.0, "w w")]
    df = spark.createDataFrame(rows, "doc_id bigint, q double, text string")
    got = {r.doc_id: r.budget_keep
           for r in PL.token_budget_filter(df, "doc_id", "text", 2,
                                           order_col="q").collect()}
    # quality-desc: doc 2 fills the budget first
    assert got == {2: True, 1: False}


# ---------------------------------------------------------------------------
# top_terms / tfidf_top_terms
# ---------------------------------------------------------------------------

def test_top_terms_per_group(spark):
    df = spark.createDataFrame(
        [(1, "a", "x x y z"), (2, "a", "x w"), (3, "b", "q q r")],
        "doc_id bigint, src string, text string")
    got = {(r.src, r.rank): (r.term, r.term_count)
           for r in SR.top_terms(df, "src", "text", k=2).collect()}
    assert got[("a", 1)] == ("x", 3)
    # ties (y, z, w all count 1) break to the smaller term
    assert got[("a", 2)] == ("w", 1)
    assert got[("b", 1)] == ("q", 2) and got[("b", 2)] == ("r", 1)


def test_tfidf_ranks_distinctive_terms_first(spark):
    import math
    df = spark.createDataFrame(
        [(1, "common rare rare"), (2, "common other"), (3, "common thing")],
        "doc_id bigint, text string")
    got = {r.rank: (r.term, r.tf, r.tfidf)
           for r in SR.tfidf_top_terms(df, "doc_id", "text", k=2).collect()
           if r.doc_id == 1}
    # 'rare': tf=2, df=1 beats 'common': tf=1, df=3
    assert got[1][0] == "rare" and got[2][0] == "common"
    assert got[1][2] == pytest.approx(2 * (math.log(4 / 2) + 1), rel=1e-12)
    assert got[2][2] == pytest.approx(1 * (math.log(4 / 4) + 1), rel=1e-12)


def test_term_analytics_plan_shapes(spark):
    df = spark.createDataFrame([(1, "a", "x")],
                               "doc_id bigint, src string, text string")
    for out in (SR.top_terms(df, "src", "text"),
                SR.tfidf_top_terms(df, "doc_id", "text")):
        rep = P.plan_report(out)
        assert rep["cartesian_products"] == 0
        assert rep["python_udf_nodes"] == 0


def test_semdedup_arrow_assignment_matches_expr(spark):
    """The Arrow matmul assignment (large-k scale path) agrees with the
    oracle-replayable expression argmin on well-separated cells."""
    rows = [(i, [1.0 + 0.01 * i, 0.0]) for i in range(5)] + \
           [(10 + i, [0.0, 1.0 + 0.01 * i]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cents = [[1.0, 0.0], [0.0, 1.0]]
    a = {r.vec_id: r.semdedup_keep for r in SIM.semdedup(
        df, "vec_id", "embedding", 0.99, centroids=cents).collect()}
    b = {r.vec_id: r.semdedup_keep for r in SIM.semdedup(
        df, "vec_id", "embedding", 0.99, centroids=cents,
        assign_mode="arrow").collect()}
    assert a == b and a[0] is True and not all(a.values())


def test_semdedup_learn_once_stored_centroids_bit_exact(spark):
    """The production learn-once path: centroids learned by one ivf_build
    call, stored as plain lists, and passed back via ``centroids=`` must
    reproduce the inline-learned semdedup verdicts EXACTLY — same cells,
    same pairs, same keeps — so a 100 TB ingest can learn on its first
    batch and reuse forever (SCALE.md recipe; examples/corpus_build.py
    stage 7)."""
    rows = ([(i, [1.0, 0.001 * i]) for i in range(6)]
            + [(20 + i, [0.0, 1.0 + 0.001 * i]) for i in range(6)])
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    # learn once
    _, stored = SIM.ivf_build(df, "vec_id", "embedding", n_clusters=2,
                              sample_limit=100, repartition_by_cell=False)
    assert (isinstance(stored, list)
            and all(isinstance(x, float) for row in stored for x in row))
    inline = sorted(tuple(r) for r in SIM.semdedup(
        df, "vec_id", "embedding", 0.999, n_clusters=2,
        sample_limit=100).collect())
    reused = sorted(tuple(r) for r in SIM.semdedup(
        df, "vec_id", "embedding", 0.999, centroids=stored).collect())
    reused_arrow = sorted(tuple(r) for r in SIM.semdedup(
        df, "vec_id", "embedding", 0.999, centroids=stored,
        assign_mode="arrow").collect())
    assert inline == reused == reused_arrow
    # round-trip through JSON (how centroids would be stored on disk)
    import json
    rt = json.loads(json.dumps(stored))
    reused_rt = sorted(tuple(r) for r in SIM.semdedup(
        df, "vec_id", "embedding", 0.999, centroids=rt).collect())
    assert reused_rt == inline
