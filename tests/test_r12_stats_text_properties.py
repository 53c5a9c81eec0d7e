"""Generative property tests for group_quantiles (numpy type-7
agreement, NULL handling) and text_entropy (Shannon entropy in nats over
sorted distinct symbols) — the remaining r8-cohort surfaces without a
generative suite."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from anofox_forecast_spark.operators.stats import group_quantiles
from anofox_forecast_spark.operators.text import text_entropy

SLOW = settings(max_examples=8, deadline=None,
                suppress_health_check=list(HealthCheck))

_vals = st.one_of(st.none(), st.just(0.0), st.integers(-9, 9).map(float),
                  st.floats(-1e4, 1e4, allow_nan=False, width=32)
                    .map(float))


@SLOW
@example(groups=[[1.0], [None], [3.0, 1.0, 2.0, None], [5.0] * 6])
@given(groups=st.lists(st.lists(_vals, min_size=1, max_size=15),
                       min_size=1, max_size=4))
def test_group_quantiles_type7_matches_numpy(spark, groups):
    qs = (0.0, 0.25, 0.5, 0.9, 1.0)
    rows = [(g, v) for g, vals in enumerate(groups) for v in vals]
    df = spark.createDataFrame(rows, "g int, v double")
    got = {r["g"]: r for r in group_quantiles(df, ["g"], "v",
                                              qs=qs).collect()}
    for g, vals in enumerate(groups):
        clean = [v for v in vals if v is not None]
        r = got[g]
        assert r["n"] == len(clean)
        for q in qs:
            label = f"q_{str(q).replace('.', '_')}"
            if not clean:
                assert r[label] is None or (isinstance(r[label], float)
                                            and math.isnan(r[label])), g
            else:
                want = float(np.quantile(np.array(clean), q,
                                         method="linear"))
                assert r[label] == pytest.approx(want, rel=1e-12,
                                                 abs=1e-12), (g, q)


_texts = st.lists(st.text(alphabet="ab x", min_size=0, max_size=24),
                  min_size=1, max_size=6)

_TEXT_EDGES = ["", " ", "aaaa", "ab ab ab", "abcdabcd", "a b a b",
               "   x   "]


@SLOW
@example(texts=_TEXT_EDGES)
@given(texts=_texts)
def test_text_entropy_matches_replay(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id int, text string")
    got = {r["doc_id"]: r for r in text_entropy(df, "text").collect()}

    def h(symbols):
        n = len(symbols)
        if n == 0:
            return 0.0, 0
        uniq = sorted(set(symbols))
        acc = 0.0
        for u in uniq:
            p = symbols.count(u) / n
            acc += p * math.log(p)
        return -acc + 0.0, len(uniq)

    for i, t in enumerate(texts):
        chars = list(t)
        words = t.lower().split()
        ce, nc = h(chars)
        we, nw = h(words)
        r = got[i]
        assert r["char_entropy"] == pytest.approx(ce, rel=1e-9,
                                                  abs=1e-12), i
        assert r["word_entropy"] == pytest.approx(we, rel=1e-9,
                                                  abs=1e-12), i
        assert (r["n_distinct_chars"], r["n_distinct_words"]) == (nc, nw)
