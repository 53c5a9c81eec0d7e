"""Property tests for the round-7 operators: each distributed
implementation is pitted against an exhaustive single-process reference
on randomized inputs (hypothesis drives the input generation; one Spark
job per drawn case, so cases are few but adversarially shrunk)."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(max_examples=8, deadline=None,
                suppress_health_check=list(HealthCheck))

EPOCH = dt.datetime(2024, 1, 1)


# ---------------------------------------------------------------------------
# dup_clusters vs union-find
# ---------------------------------------------------------------------------

edges_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
        lambda t: t[0] != t[1]),
    min_size=1, max_size=40)


def _union_find(edges):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict = {}
    for x in list(parent):
        comp[x] = find(x)
    # normalize: component label = min member
    groups: dict = {}
    for x, r in comp.items():
        groups.setdefault(r, set()).add(x)
    out = {}
    for members in groups.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


@SLOW
@given(edges_strategy)
def test_dup_clusters_matches_union_find(spark, edges):
    from anofox_forecast_spark.operators.dedup import dup_clusters
    pairs = spark.createDataFrame([(int(a), int(b)) for a, b in edges],
                                  "id_a bigint, id_b bigint")
    got = {r.id: r.cluster_id for r in dup_clusters(pairs).collect()}
    assert got == _union_find(edges)


# ---------------------------------------------------------------------------
# asof_join vs brute force
# ---------------------------------------------------------------------------

ts_list = st.lists(st.integers(0, 5000), min_size=1, max_size=25)


@SLOW
@given(left=ts_list, right=ts_list)
def test_asof_join_matches_bruteforce(spark, left, right):
    from anofox_forecast_spark.operators.events import asof_join
    # unique right timestamps (duplicate (key, ts) ordering is documented
    # as caller-deduped)
    right = sorted(set(right))
    lrows = [(i, 1, EPOCH + dt.timedelta(seconds=s))
             for i, s in enumerate(left)]
    rrows = [(1, EPOCH + dt.timedelta(seconds=s), float(s))
             for s in right]
    l = spark.createDataFrame(lrows, "eid bigint, k bigint, ts timestamp")
    r = spark.createDataFrame(rrows, "k bigint, ts timestamp, v double")
    got = {row.eid: row.v
           for row in asof_join(l, r, "k", "ts", ["v"]).collect()}
    for i, s in enumerate(left):
        expect = max((x for x in right if x <= s), default=None)
        assert got[i] == (float(expect) if expect is not None else None)


# ---------------------------------------------------------------------------
# sessionize vs linear scan
# ---------------------------------------------------------------------------

@SLOW
@given(st.lists(st.integers(0, 20000), min_size=1, max_size=30,
                unique=True), st.integers(1, 1000))
def test_sessionize_matches_linear_scan(spark, stamps, gap):
    from anofox_forecast_spark.operators.events import sessionize
    rows = [(1, EPOCH + dt.timedelta(seconds=s)) for s in stamps]
    df = spark.createDataFrame(rows, "k bigint, ts timestamp")
    got = {r.ts: r.session_seq
           for r in sessionize(df, "k", "ts", float(gap)).collect()}
    seq, prev = 0, None
    for s in sorted(stamps):
        if prev is None or s - prev > gap:
            seq += 1
        prev = s
        assert got[EPOCH + dt.timedelta(seconds=s)] == seq


# ---------------------------------------------------------------------------
# range_join_points vs brute force
# ---------------------------------------------------------------------------

@SLOW
@given(points=st.lists(st.integers(0, 2000), min_size=1, max_size=15),
       ivals=st.lists(st.tuples(st.integers(0, 2000), st.integers(0, 500)),
                      min_size=1, max_size=10),
       bucket=st.integers(1, 600))
def test_range_join_matches_bruteforce(spark, points, ivals, bucket):
    from anofox_forecast_spark.operators.events import range_join_points
    prows = [(i, EPOCH + dt.timedelta(seconds=s))
             for i, s in enumerate(points)]
    irows = [(j, EPOCH + dt.timedelta(seconds=a),
              EPOCH + dt.timedelta(seconds=a + w))
             for j, (a, w) in enumerate(ivals)]
    p = spark.createDataFrame(prows, "pid bigint, ts timestamp")
    iv = spark.createDataFrame(irows, "iid bigint, s timestamp, e timestamp")
    got = sorted((r.pid, r.iid) for r in range_join_points(
        p, iv, "ts", "s", "e", float(bucket)).collect())
    expect = sorted((i, j) for i, s in enumerate(points)
                    for j, (a, w) in enumerate(ivals) if a <= s <= a + w)
    assert got == expect


# ---------------------------------------------------------------------------
# funnel vs linear reference
# ---------------------------------------------------------------------------

@SLOW
@given(st.lists(st.tuples(st.integers(0, 3000),
                          st.sampled_from(["a", "b", "c", "x"])),
                min_size=1, max_size=25, unique_by=lambda t: t[0]),
       st.one_of(st.none(), st.integers(1, 2000)))
def test_funnel_matches_linear_reference(spark, events, within):
    from anofox_forecast_spark.operators.events import funnel
    rows = [(1, EPOCH + dt.timedelta(seconds=s), t) for s, t in events]
    df = spark.createDataFrame(rows, "uid bigint, ts timestamp, et string")
    steps = ["a", "b", "c"]
    got = {r.uid: r.steps_completed
           for r in funnel(df, "uid", "ts", "et", steps,
                           within_seconds=within).collect()}
    # linear greedy reference
    times = []
    for s, t in sorted(e for e in events if e[1] in steps):
        n = len(times)
        if (n < 3 and t == steps[n]
                and (n == 0 or s > times[-1])
                and (n == 0 or within is None or s - times[0] <= within)):
            times.append(s)
    if any(t in steps for _, t in events):
        assert got[1] == len(times)
    else:
        assert 1 not in got


# ---------------------------------------------------------------------------
# retention vs dict reference
# ---------------------------------------------------------------------------

@SLOW
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 40)),
                min_size=1, max_size=30))
def test_retention_matches_reference(spark, pairs):
    """pairs = (key, day-offset); week cohorts computed by hand."""
    from anofox_forecast_spark.operators.events import retention
    rows = [(k, EPOCH + dt.timedelta(days=d)) for k, d in pairs]
    df = spark.createDataFrame(rows, "uid bigint, ts timestamp")
    got = {(str(r.cohort), r.period): (r.n_active, r.cohort_size)
           for r in retention(df, "uid", "ts", "week").collect()}
    # reference: EPOCH (2024-01-01) is a Monday, so week = day // 7
    weeks = {}
    for k, d in pairs:
        weeks.setdefault(k, set()).add(d // 7)
    first = {k: min(ws) for k, ws in weeks.items()}
    ref = {}
    for k, ws in weeks.items():
        for w in ws:
            key = (str(EPOCH + dt.timedelta(weeks=first[k])), w - first[k])
            ref[key] = ref.get(key, 0) + 1
    sizes = {}
    for k, f in first.items():
        c = str(EPOCH + dt.timedelta(weeks=f))
        sizes[c] = sizes.get(c, 0) + 1
    assert {kk: v[0] for kk, v in got.items()} == ref
    for (c, _), (_, size) in got.items():
        assert size == sizes[c]
