"""Generative property suite for the pipeline bloc of the r8 driver
cohort vs pure-Python replays — dedup_lines, the deterministic sampling
trio, token_budget_filter, pack_chunked, and the ExactSubstr dup-span
family (spans / stats / remove, both drop-all and keep-first).

Replayed semantics (each independent of the operator code):

- md5 uniform: first 8 hex digits of ``md5(seed || ':' || key)`` /
  2^32 — the portable-hash convention every sampler shares.
- dedup_lines: blank units never counted nor removed; a unit is
  boilerplate when its TRIMMED text occurs in >= min_docs DISTINCT docs.
- sample_weighted: Efraimidis-Spirakis u^(1/w) descending, ties by key;
  NULL / non-positive weights excluded.
- token_budget: greedy fill — keep while the running total BEFORE the
  doc is under budget (so the budget overshoots by at most one doc).
- pack_chunked: bucket = first 4 md5 hex of ``seed+"b" || ':' || id``
  mod buckets; per-bucket order (u, id); half-open token intervals and
  the inclusive chunk range they span.
- dup_spans: any word-k-gram occurring >= min_count times corpus-wide
  (within-doc repeats count) marks its k positions; islands merge when
  gaps <= k; keep_first leaves each gram's (id, pos) argmin unmarked.

Text is ASCII words from a tiny vocabulary (so Java ``\\s+`` and Python
``str.split`` agree) with forced repetition so duplicated grams and
boilerplate lines actually occur."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from anofox_forecast_spark.operators import pipeline as P

SLOW = settings(max_examples=8, deadline=None,
                suppress_health_check=list(HealthCheck))

_WORDS = ["alpha", "beta", "gamma", "delta", "x"]


def _u(key, seed: str) -> float:
    h = hashlib.md5(f"{seed}:{key}".encode()).hexdigest()
    return int(h[:8], 16) / 4294967296.0


_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=20) \
         .map(" ".join)
_docs = st.lists(_doc, min_size=1, max_size=8)

_DOC_EDGES = ["", "   ", "alpha", "alpha alpha alpha alpha alpha",
              "alpha beta gamma alpha beta gamma",
              "x alpha beta x alpha beta x"]


@SLOW
@example(docs=_DOC_EDGES, min_docs=2)
@given(docs=st.lists(st.lists(st.sampled_from(
    ["nav bar", "footer", "", "  ", "unique line %d"]),
    min_size=0, max_size=6), min_size=1, max_size=6)
    .map(lambda ds: ["\n".join(line if "%" not in line else line % (i * 10 + j)
                               for j, line in enumerate(d))
                     for i, d in enumerate(ds)]),
       min_docs=st.sampled_from([2, 3]))
def test_dedup_lines_matches_replay(spark, docs, min_docs):
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id int, text string")
    got = {r["doc_id"]: r for r in P.dedup_lines(
        df, "doc_id", "text", min_docs=min_docs).collect()}
    # corpus counts: distinct docs per trimmed non-blank line
    seen: dict[str, set] = {}
    for i, d in enumerate(docs):
        for line in d.split("\n"):
            if line.strip():
                seen.setdefault(line.strip(), set()).add(i)
    boiler = {ln for ln, ids in seen.items() if len(ids) >= min_docs}
    for i, d in enumerate(docs):
        lines = d.split("\n")
        kept = [ln for ln in lines
                if not ln.strip() or ln.strip() not in boiler]
        r = got[i]
        assert r["n_lines"] == len(lines)
        assert r["clean_text"] == "\n".join(kept), f"doc {i}"
        assert r["n_removed_lines"] == len(lines) - len(kept)


@SLOW
@example(keys=list(range(20)), rate=0.5, k=3)
@given(keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=30,
                     unique=True),
       rate=st.sampled_from([0.0, 0.3, 1.0]),
       k=st.sampled_from([1, 4]))
def test_deterministic_sampling_trio(spark, keys, rate, k):
    rows = [(kk, kk % 3, float(kk % 5) + 0.5) for kk in keys]
    df = spark.createDataFrame(rows, "key bigint, s int, w double")
    # hash filter
    got = sorted(r["key"] for r in P.sample_by_hash(
        df, "key", rate, seed="s0").collect())
    exp = sorted(kk for kk in keys if _u(kk, "s0") < rate)
    assert got == exp
    # stratified exactly-min(k, |stratum|)
    gs = {}
    for r in P.sample_stratified(df, "s", "key", k, seed="s0").collect():
        gs.setdefault(r["s"], []).append((r["sample_rank"], r["key"]))
    strata = {}
    for kk in keys:
        strata.setdefault(kk % 3, []).append(kk)
    for s, ks in strata.items():
        order = sorted(ks, key=lambda kk: (_u(kk, "s0"), kk))[:k]
        assert sorted(gs.get(s, [])) == [(i + 1, kk)
                                         for i, kk in enumerate(order)], s
    # weighted: u^(1/w) descending, ties by key
    gw = sorted((r["sample_rank"], r["key"]) for r in P.sample_weighted(
        df, "key", "w", k, seed="sw").collect())
    scored = sorted(((-(_u(kk, "sw") ** (1.0 / (float(kk % 5) + 0.5))), kk)
                     for kk in keys))
    assert gw == [(i + 1, kk) for i, (_, kk) in enumerate(scored[:k])]


@SLOW
@example(docs=_DOC_EDGES, budget=5)
@given(docs=_docs, budget=st.sampled_from([0, 3, 10, 100]))
def test_token_budget_greedy_fill(spark, docs, budget):
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id int, text string")
    got = {r["doc_id"]: r for r in P.token_budget_filter(
        df, "doc_id", "text", budget).collect()}
    run = 0
    for i, d in enumerate(docs):          # order_col=None -> id ascending
        n = len(d.split())
        r = got[i]
        assert r["n_tokens"] == n
        assert r["tokens_before"] == run
        assert r["budget_keep"] == (run < budget)
        run += n


@SLOW
@example(docs=_DOC_EDGES, window=4, buckets=2)
@given(docs=_docs, window=st.sampled_from([1, 4, 64]),
       buckets=st.sampled_from([1, 3]))
def test_pack_chunked_intervals(spark, docs, window, buckets):
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id int, text string")
    got = {r["doc_id"]: r for r in P.pack_chunked(
        df, "doc_id", "text", window_tokens=window, buckets=buckets,
        seed="pk").collect()}
    per_bucket: dict[int, list] = {}
    for i, d in enumerate(docs):
        h = hashlib.md5(f"pkb:{i}".encode()).hexdigest()
        b = int(h[:4], 16) % buckets
        per_bucket.setdefault(b, []).append((_u(i, "pk"), i, len(d.split())))
    for b, members in per_bucket.items():
        off = 0
        for _, i, n in sorted(members):
            r = got[i]
            assert (r["bucket"], r["n_tokens"], r["token_offset"]) \
                == (b, n, off), f"doc {i}"
            sc = off // window
            ec = (off + n - 1) // window if n > 0 else sc
            assert (r["start_chunk"], r["end_chunk"]) == (sc, ec)
            assert r["n_chunks"] == (ec - sc + 1 if n > 0 else 0)
            off += n


def _span_replay(docs, k, min_count, keep_first):
    """ExactSubstr replay: gram counts -> marked positions -> islands."""
    grams: dict[str, list] = {}
    for i, d in enumerate(docs):
        ws = d.lower().split()
        for p in range(len(ws) - k + 1):
            g = " ".join(ws[p:p + k])
            grams.setdefault(g, []).append((i, p + 1))
    marked: dict[int, set] = {}
    for g, occ in grams.items():
        if len(occ) < min_count:
            continue
        skip = min(occ) if keep_first else None
        for o in occ:
            if o == skip:
                continue
            marked.setdefault(o[0], set()).add(o[1])
    spans: dict[int, list] = {}
    for i, poss in marked.items():
        out, cur = [], None
        for p in sorted(poss):
            if cur is None or p - cur[1] > k:
                cur = [p, p]
                out.append(cur)
            else:
                cur[1] = p
        spans[i] = [(a, b + k - 1) for a, b in out]
    return spans


@SLOW
@example(docs=_DOC_EDGES, k=2, keep_first=False)
@example(docs=_DOC_EDGES, k=2, keep_first=True)
@example(docs=_DOC_EDGES, k=1, keep_first=True)
@given(docs=_docs, k=st.sampled_from([1, 2, 3]), keep_first=st.booleans())
def test_dup_spans_family_matches_replay(spark, docs, k, keep_first):
    # k=1 (single duplicated words) is legal and exercises the island
    # merge hardest; min_count stays at the operator's floor of 2
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id int, text string")
    exp = _span_replay(docs, k, 2, keep_first)
    got: dict[int, list] = {}
    for r in P.dup_spans(df, "doc_id", "text", k=k, min_count=2,
                         keep_first=keep_first).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"]))
        assert r["span_tokens"] == r["span_end"] - r["span_start"] + 1
    assert {i: sorted(v) for i, v in got.items()} \
        == {i: sorted(v) for i, v in exp.items() if v}
    # stats roll-up: every doc appears; dup_tokens = covered positions
    st_got = {r["doc_id"]: r for r in P.dup_span_stats(
        df, "doc_id", "text", k=k, min_count=2,
        keep_first=keep_first).collect()}
    for i, d in enumerate(docs):
        n = len(d.split())
        covered = set()
        for a, b in exp.get(i, []):
            covered.update(range(a, b + 1))
        r = st_got[i]
        assert r["n_tokens"] == n
        assert r["dup_tokens"] == len(covered)
        assert r["dup_token_frac"] == pytest.approx(
            len(covered) / n if n else 0.0)
    # remove: survivors re-joined lowercased in order
    rm = {r["doc_id"]: r for r in P.remove_dup_spans(
        df, "doc_id", "text", k=k, min_count=2,
        keep_first=keep_first).collect()}
    for i, d in enumerate(docs):
        ws = d.lower().split()
        covered = set()
        for a, b in exp.get(i, []):
            covered.update(range(a, b + 1))
        kept = [w for p, w in enumerate(ws, start=1) if p not in covered]
        r = rm[i]
        assert r["clean_text"] == " ".join(kept), f"doc {i}"
        assert r["n_removed_tokens"] == len(ws) - len(kept)
