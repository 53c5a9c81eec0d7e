"""Generative property suite for the search bloc (BM25 / per-group top
terms / tf-idf keywords) and the regression adapters (exact-mode OLS and
ridge normal-equation folds) of the r8 driver cohort, vs pure-Python /
numpy replays.

Replayed semantics:

- BM25: Lucene ``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf (non-negative),
  ``tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))`` saturation, lowercased
  whitespace words; zero-length docs contribute dl=0.
- top_terms: count per (group, term); rank ties to the smaller term.
- tfidf: sklearn smoothed ``ln((1+N)/(1+df)) + 1`` on in-doc counts.
- OLS/ridge (exact mode): intercept + k features via the normal
  equations, ridge penalty on the non-intercept diagonal only; groups
  with a singular design (det == 0) or fewer trainable rows than
  coefficients yield NULL yhat; NULL-y rows never train but ARE
  predicted. Integer-valued inputs keep the normal-equation sums exact
  in float64 so singularity is a crisp det==0 on both sides."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from anofox_forecast_spark.operators import search as S
from anofox_forecast_spark.operators.regression import ols_fit_predict_by

SLOW = settings(max_examples=8, deadline=None,
                suppress_health_check=list(HealthCheck))

_WORDS = ["spark", "join", "window", "scan", "the"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=16) \
         .map(" ".join)
_docs = st.lists(_doc, min_size=1, max_size=8)

_DOC_EDGES = ["", "spark", "spark spark spark", "the the scan",
              "spark join window scan the", "join join window"]


@SLOW
@pytest.mark.parametrize("b", [0.75, 1.0])
@example(docs=_DOC_EDGES)
@given(docs=_docs)
def test_bm25_matches_replay(spark, docs, b):
    # b=1.0 is the r12 advisor's edge: a zero-length doc then has
    # denominator tf + k1*(1-b+b*norm) == 0 when tf == 0, so the score
    # term must short-circuit to 0 rather than evaluate 0/0 (NULL under
    # default Spark, an error under ANSI).
    terms, k1 = ["spark", "join", "window"], 1.2
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id int, text string")
    got = {r["doc_id"]: r["score"] for r in S.bm25_score(
        df, "doc_id", "text", terms, k1=k1, b=b).collect()}
    toks = [d.lower().split() for d in docs]
    n = len(docs)
    avgdl = sum(len(t) for t in toks) / n
    for i, ws in enumerate(toks):
        score = 0.0
        for t in terms:
            tf = ws.count(t)
            if tf == 0:
                # tf==0 always contributes 0; skipping also avoids the
                # 0/0 denominator at b=1 with dl==0 (same guard as the
                # operator)
                continue
            dfreq = sum(1 for other in toks if t in other)
            idf = math.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5))
            # all-empty corpus: the length norm's limit is 0 (see the
            # operator's avgdl guard, an r12 property-suite find)
            norm = len(ws) / avgdl if avgdl > 0 else 0.0
            denom = tf + k1 * (1.0 - b + b * norm)
            score += idf * (tf * (k1 + 1.0) / denom)
        assert got[i] is not None, i
        assert got[i] == pytest.approx(score, rel=1e-9, abs=1e-12), i


@SLOW
@example(docs=_DOC_EDGES)
@given(docs=_docs)
def test_top_terms_and_tfidf(spark, docs):
    rows = [(i, i % 2, d) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, grp int, text string")
    k = 3
    got = {}
    for r in S.top_terms(df, "grp", "text", k=k).collect():
        got.setdefault(r["grp"], []).append(
            (r["rank"], r["term"], r["term_count"]))
    counts: dict[int, dict] = {}
    for i, g, d in rows:
        for w in d.lower().split():
            counts.setdefault(g, {})
            counts[g][w] = counts[g].get(w, 0) + 1
    for g, cnt in counts.items():
        order = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        assert sorted(got.get(g, [])) == [
            (r + 1, t, c) for r, (t, c) in enumerate(order)], g
    assert set(got) == {g for g, c in counts.items() if c}
    # tf-idf keywords
    got2 = {}
    for r in S.tfidf_top_terms(df, "doc_id", "text", k=k).collect():
        got2.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["tf"], r["tfidf"]))
    n = len(docs)
    dfreq: dict[str, int] = {}
    per_doc = []
    for i, _, d in rows:
        c: dict[str, int] = {}
        for w in d.lower().split():
            c[w] = c.get(w, 0) + 1
        per_doc.append(c)
        for w in c:
            dfreq[w] = dfreq.get(w, 0) + 1
    for i, c in enumerate(per_doc):
        scored = sorted(
            ((tf * (math.log((1.0 + n) / (1.0 + dfreq[t])) + 1.0), t, tf)
             for t, tf in c.items()),
            key=lambda x: (-x[0], x[1]))[:k]
        want = [(r + 1, t, tf, pytest.approx(s, rel=1e-9))
                for r, (s, t, tf) in enumerate(scored)]
        assert sorted(got2.get(i, [])) == want, i


@st.composite
def _panels(draw):
    """Groups of (sub, y, x1[, x2]) rows — integer-valued, some NULL y,
    occasional constant-x (singular) groups."""
    out = []
    for _ in range(draw(st.integers(1, 4))):
        n = draw(st.integers(1, 10))
        singular = draw(st.booleans())
        rows = []
        for i in range(n):
            x1 = 3 if singular else draw(st.integers(-5, 5))
            y = draw(st.one_of(st.none(), st.integers(-20, 20)))
            rows.append((i % 3, y, x1))
        out.append(rows)
    return out


@SLOW
@example(panels=[[(0, 1, 1), (0, 2, 2), (1, 4, 3)],      # clean fit
                 [(0, 1, 3), (0, 2, 3), (1, 5, 3)],      # singular (const x)
                 [(0, None, 1), (0, None, 2)],           # nothing trainable
                 [(0, 7, 2)]],                           # fewer rows than k+1
         l2=0.0)
@example(panels=[[(0, 1, 1), (0, 2, 2), (1, 4, 3), (2, 0, -1)]], l2=0.5)
@given(panels=_panels(), l2=st.sampled_from([0.0, 0.5]))
def test_ols_ridge_exact_fold_matches_numpy(spark, panels, l2):
    rows = [(g, sub, i, None if y is None else float(y), float(x1))
            for g, panel in enumerate(panels)
            for i, (sub, y, x1) in enumerate(panel)]
    df = spark.createDataFrame(rows, "g int, sub int, i int, y double,"
                                     " x1 double")
    got = {(r["g"], r["i"]): r["yhat"] for r in ols_fit_predict_by(
        df, "g", ["sub", "i"], "y", ["x1"],
        params={"l2": l2, "exact": True}).collect()}
    for g, panel in enumerate(panels):
        train = [(float(y), float(x1)) for _, y, x1 in panel
                 if y is not None]
        coefs = None
        if len(train) >= 2:
            X = np.array([[1.0, x] for _, x in train])
            Y = np.array([y for y, _ in train])
            A = X.T @ X
            A[1, 1] += l2                      # intercept unpenalized
            if abs(np.linalg.det(A)) > 1e-9:
                coefs = np.linalg.solve(A, X.T @ Y)
        for i, (_, _, x1) in enumerate(panel):
            want = (None if coefs is None
                    else coefs[0] + coefs[1] * float(x1))
            gotv = got[(g, i)]
            if want is None:
                assert gotv is None, f"g{g} i{i}: expected NULL, {gotv}"
            else:
                assert gotv == pytest.approx(want, rel=1e-6, abs=1e-6), \
                    f"g{g} i{i}"
