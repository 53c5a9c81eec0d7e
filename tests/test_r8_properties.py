"""Property tests for the round-8 operators: dup_spans vs an exhaustive
single-process suffix-scan reference, weighted sampling vs a direct
Efraimidis-Spirakis computation, and the HLL sketch vs a pure-Python
replay of the identical algorithm (so any Spark-side expression slip is a
mismatch, not an accuracy question)."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(max_examples=8, deadline=None,
                suppress_health_check=list(HealthCheck))

WORDS = ["alpha", "beta", "gamma", "delta", "eps"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12),
    min_size=1, max_size=8)


def _ref_dup_spans(docs, k):
    """Single-process ExactSubstr reference: count every k-gram, mark
    covered positions, merge into maximal [start, end] spans (1-based)."""
    from collections import Counter
    grams = Counter()
    for ws in docs:
        for i in range(len(ws) - k + 1):
            grams[tuple(ws[i:i + k])] += 1
    spans = []
    for d, ws in enumerate(docs, start=1):
        covered = set()
        for i in range(len(ws) - k + 1):
            if grams[tuple(ws[i:i + k])] >= 2:
                covered.update(range(i + 1, i + k + 1))
        for p in sorted(covered):
            if spans and spans[-1][0] == d and spans[-1][2] == p - 1:
                spans[-1][2] = p
            else:
                spans.append([d, p, p])
    return {(d, a, b, b - a + 1) for d, a, b in spans}


@SLOW
@given(docs_strategy, st.integers(2, 4))
def test_dup_spans_matches_reference(spark, docs, k):
    from anofox_forecast_spark.operators.pipeline import dup_spans
    rows = [(i + 1, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {(r.doc_id, r.span_start, r.span_end, r.span_tokens)
           for r in dup_spans(df, "doc_id", "text", k=k).collect()}
    assert got == _ref_dup_spans(docs, k)


# ---------------------------------------------------------------------------
# weighted sampling vs direct Efraimidis-Spirakis
# ---------------------------------------------------------------------------

def _md5_uniform(seed, key):
    h = hashlib.md5(f"{seed}:{key}".encode()).hexdigest()
    return int(h[:8], 16) / 4294967296.0


weights_strategy = st.lists(
    st.floats(min_value=0.01, max_value=100.0,
              allow_nan=False, allow_infinity=False),
    min_size=1, max_size=25)


@SLOW
@given(weights_strategy, st.integers(1, 5))
def test_sample_weighted_matches_reference(spark, weights, k):
    from anofox_forecast_spark.operators.pipeline import sample_weighted
    rows = [(i + 1, float(w)) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    got = sorted((r.doc_id, r.sample_rank) for r in
                 sample_weighted(df, "doc_id", "w", k, seed="p8").collect())
    scored = sorted(
        ((-(_md5_uniform("p8", i) ** (1.0 / w)), i) for i, w in rows))
    want = sorted((i, rank + 1)
                  for rank, (_, i) in enumerate(scored[:k]))
    assert got == want


# ---------------------------------------------------------------------------
# HLL vs a pure-Python replay of the identical algorithm
# ---------------------------------------------------------------------------

def _ref_hll(keys, p, seed):
    m = 1 << p
    nib = p // 4
    regs = {}
    for kx in keys:
        if kx is None:
            continue
        h = hashlib.md5(f"{seed}:{kx}".encode()).hexdigest()
        b = int(h[:nib], 16)
        s = h[nib:nib + 15]
        stripped = s.lstrip("0")
        if not stripped:
            rho = 61
        else:
            z = len(s) - len(stripped)
            c = stripped[0]
            lz = {"1": 3, "2": 2, "3": 2, "4": 1, "5": 1,
                  "6": 1, "7": 1}.get(c, 0)
            rho = 4 * z + lz + 1
        regs[b] = max(regs.get(b, 0), rho)
    ssum = 0.0
    for b in sorted(regs):
        ssum = ssum + 2.0 ** (-regs[b])
    zeros = float(m - len(regs))
    # canonical Flajolet bias correction: 0.673 only for m=16; the
    # closed form 0.7213/(1+1.079/m) for m>=128 (ADVICE r8: the old
    # pinned literals 0.718213/0.722572 carried a +0.2% transcription
    # bias; operator, oracle, and test replay moved together)
    alpha = 0.673 if m == 16 else 0.7213 / (1 + 1.079 / m)
    raw = (alpha * m * m) / (ssum + zeros)
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros), len(regs)
    return raw, len(regs)


keys_strategy = st.lists(st.integers(0, 100000), min_size=1, max_size=60)


@SLOW
@given(keys_strategy, st.sampled_from([4, 8, 12]))
def test_hll_matches_python_replay_bitwise(spark, keys, p):
    from anofox_forecast_spark.operators.stats import hll_count_distinct
    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    got = hll_count_distinct(df, "k", precision_bits=p, seed="hp").first()
    want_est, want_used = _ref_hll(keys, p, "hp")
    assert got.n_buckets_used == want_used
    # the register fold is bit-equal (same order, exact powers of two);
    # the linear-counting branch's ln() may differ by 1 ulp between the
    # JVM and CPython libm — exactly why the CONTRACT pins 4 decimals.
    # 1e-12 relative is ~4 orders tighter than the pin and admits only
    # that last-ulp difference.
    assert math.isclose(got.hll_estimate, want_est, rel_tol=1e-12)


# ---------------------------------------------------------------------------
# ACI vs a pure-Python replay
# ---------------------------------------------------------------------------

def _ref_aci(rows, alpha, gamma):
    """Single-process ACI replay (same corrected quantile, same literal
    increments as the Spark fold)."""
    from anofox_forecast_spark.operators.conformal import conformal_score_np
    inc_miss = gamma * (alpha - 1.0)
    inc_cov = gamma * (alpha - 0.0)
    a, res, out = alpha, [], []
    for ds, act, fc in sorted(rows):
        if res:
            q = conformal_score_np(res, a)
            cov = (fc - q) <= act <= (fc + q)
            out.append((ds, a, q, cov))
            a = min(max(a + (inc_miss if not cov else inc_cov),
                        0.001), 0.999)
        else:
            out.append((ds, a, None, None))
        res.append(abs(act - fc))
    return out


series_strategy = st.lists(
    st.tuples(st.floats(-50, 50, allow_nan=False),
              st.floats(-50, 50, allow_nan=False)),
    min_size=1, max_size=20)


@SLOW
@given(series_strategy,
       st.floats(0.05, 0.5), st.floats(0.01, 0.2))
def test_aci_matches_python_replay(spark, pairs, alpha, gamma):
    import datetime as dt
    from anofox_forecast_spark.operators.conformal import (
        ts_adaptive_conformal_by,
    )
    base = dt.datetime(2024, 1, 1)
    rows = [(base + dt.timedelta(days=i), float(a), float(f))
            for i, (a, f) in enumerate(pairs)]
    df = spark.createDataFrame([(1, *r) for r in rows],
                               "id bigint, ds timestamp, y double, fc double")
    got = sorted((r.ds, r.alpha_t, r.q_t, r.covered) for r in
                 ts_adaptive_conformal_by(df, "id", "ds", "y", "fc",
                                          alpha=alpha,
                                          gamma=gamma).collect())
    want = [(ds, a, q, c) for ds, a, q, c in _ref_aci(rows, alpha, gamma)]
    assert len(got) == len(want)
    for (ds_g, a_g, q_g, c_g), (ds_w, a_w, q_w, c_w) in zip(got, want):
        assert ds_g == ds_w and c_g == c_w
        assert a_g == a_w                      # bit-equal alpha walk
        assert (q_g is None) == (q_w is None)
        if q_g is not None:
            assert q_g == q_w                  # bit-equal quantile
