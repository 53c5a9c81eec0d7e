"""Generative property suite for the events family vs pure-Python
replays — the r8 driver cohort's largest bloc (sessionize / session
stats / funnel / retention / transitions / asof / range / overlap /
rollup), mirroring what r11 did for the metrics and r12 for the
conformal family.

Semantics pinned (each replayed independently of the operator code):

- sessionize: a gap of EXACTLY ``gap_seconds`` stays in-session
  (strictly-greater starts a new one); integer-microsecond arithmetic.
- session_stats: ``value_sum`` folds in (ts, order) sorted order.
- funnel: first-touch greedy — step 1 anchors at the earliest step-1
  event, later steps match their earliest event STRICTLY after the
  previous match, ``within_seconds`` bounds from the anchor,
  ``max_events_per_key`` keeps the EARLIEST events in (ts, type) order.
- retention: cohort = trunc of first event; activity deduped per
  (key, bucket); period 0 rate is 1.0.
- asof_join backward/forward, inclusive equality, tolerance drop,
  left-join NULLs.
- range/overlap joins: inclusive bounds, malformed intervals dropped,
  exactly-once pairing regardless of bucket width.
- transitions: lead pairs, row-normalized probabilities.
- time_rollup: per-grain bucket aggregates from ONE pass.

Timestamps are integer epoch seconds rendered as naive datetimes under
the session factory's UTC timezone, so the replay can stay in integer
arithmetic end to end."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from anofox_forecast_spark.operators import events as E

SLOW = settings(max_examples=8, deadline=None,
                suppress_health_check=list(HealthCheck))

_EPOCH = dt.datetime(1970, 1, 1)


def _ts(s: int) -> dt.datetime:
    return _EPOCH + dt.timedelta(seconds=int(s))


# second-resolution offsets, deliberately clustered so gap boundaries,
# ties, and empty sessions all occur
_times = st.lists(st.integers(0, 40_000), min_size=1, max_size=16)


@st.composite
def _streams(draw):
    """{key: sorted list of (ts_seconds, type)} with duplicate ts."""
    out = {}
    for k in range(draw(st.integers(1, 4))):
        ts = sorted(draw(_times))
        out[k] = [(t, draw(st.sampled_from("abcd"))) for t in ts]
    return out


_GAP_EDGES = {0: [(0, "a"), (600, "b"), (1200, "a"), (1201, "c")],
              1: [(0, "a")], 2: [(5, "a"), (5, "b"), (5 + 600, "c")]}


@SLOW
@example(streams=_GAP_EDGES, gap=600)
@given(streams=_streams(), gap=st.sampled_from([1, 600, 7200]))
def test_sessionize_and_session_stats(spark, streams, gap):
    # a per-key event INDEX is the tie-breaker (duplicate timestamps are
    # generated on purpose; (k, i) is the unique row identity)
    rows = [(k, _ts(t), i, float(t % 7) - 3.0)
            for k, evs in streams.items()
            for i, (t, _) in enumerate(sorted(evs))]
    df = spark.createDataFrame(
        rows, "k int, ts timestamp, i int, v double")
    got = {(r["k"], r["i"]): (r["session_seq"], r["is_session_start"])
           for r in E.sessionize(df, "k", "ts", gap_seconds=gap,
                                 order_cols=["i"]).collect()}
    stats = {(r["k"], r["session_seq"]): r
             for r in E.session_stats(df, "k", "ts", value_col="v",
                                      gap_seconds=gap,
                                      order_cols=["i"]).collect()}
    for k, evs in streams.items():
        evs = sorted(evs)
        seq, prev = 0, None
        sess = {}
        for i, (t, _) in enumerate(evs):
            new = prev is None or (t - prev) > gap
            if new:
                seq += 1
            prev = t
            assert got[(k, i)] == (seq, new), f"k{k} i{i} t{t}"
            sess.setdefault(seq, []).append(t)
        for s, members in sess.items():
            r = stats[(k, s)]
            assert r["n_events"] == len(members)
            assert r["ts_start"] == _ts(members[0])
            assert r["ts_end"] == _ts(members[-1])
            assert r["duration_seconds"] == pytest.approx(
                members[-1] - members[0])
            acc = 0.0
            for t in members:
                acc += float(t % 7) - 3.0
            assert r["value_sum"] == pytest.approx(acc, rel=1e-12)


def _funnel_replay(evs, steps, within, cap):
    evs = sorted(evs)[: cap if cap else len(evs)]
    t = []
    for us, ty in evs:
        n = len(t)
        if n >= len(steps) or ty != steps[n]:
            continue
        if n > 0 and not (us > t[n - 1]):
            continue
        if within is not None and n > 0 and us - t[0] > within:
            continue
        t.append(us)
    return t


@SLOW
@example(streams=_GAP_EDGES, within=None, cap=None)
@example(streams=_GAP_EDGES, within=1200, cap=None)
@example(streams=_GAP_EDGES, within=None, cap=2)
@given(streams=_streams(), within=st.sampled_from([None, 10, 5000]),
       cap=st.sampled_from([None, 1, 3]))
def test_funnel_greedy_first_touch(spark, streams, within, cap):
    steps = ["a", "b", "c"]
    rows = [(k, _ts(t), ty) for k, evs in streams.items() for t, ty in evs]
    df = spark.createDataFrame(rows, "k int, ts timestamp, ty string")
    got = {r["k"]: r for r in E.funnel(
        df, "k", "ts", "ty", steps, within_seconds=within,
        max_events_per_key=cap).collect()}
    for k, evs in streams.items():
        pruned = [(t * 1_000_000, ty) for t, ty in evs if ty in steps]
        if not pruned:
            assert k not in got
            continue
        t = _funnel_replay(pruned, steps,
                           None if within is None else within * 1_000_000,
                           cap)
        r = got[k]
        assert r["steps_completed"] == len(t), f"k{k}"
        assert r["converted"] == (len(t) == len(steps))
        for i in range(len(steps)):
            want = _ts(t[i] // 1_000_000) if i < len(t) else None
            assert r[f"step_{i + 1}_ts"] == want, f"k{k} step{i + 1}"


@SLOW
@example(streams=_GAP_EDGES)
@given(streams=_streams())
def test_retention_day_grain(spark, streams):
    rows = [(k, _ts(t)) for k, evs in streams.items() for t, _ in evs]
    df = spark.createDataFrame(rows, "k int, ts timestamp")
    got = {(r["cohort"], r["period"]): r
           for r in E.retention(df, "k", "ts",
                                cohort_grain="day").collect()}
    day = 86_400
    first = {k: min(t for t, _ in evs) // day * day
             for k, evs in streams.items()}
    cells = {(first[k], (t // day * day - first[k]) // day)
             for k, evs in streams.items() for t, _ in evs}
    sizes = {}
    for k, c in first.items():
        sizes[c] = sizes.get(c, 0) + 1
    exp = {}
    for c, p in cells:
        exp.setdefault((c, p), set())
    for k, evs in streams.items():
        for t, _ in evs:
            exp[(first[k], (t // day * day - first[k]) // day)].add(k)
    assert set(got) == {(_ts(c), p) for c, p in exp}
    for (c, p), keys in exp.items():
        r = got[(_ts(c), p)]
        assert r["n_active"] == len(keys)
        assert r["cohort_size"] == sizes[c]
        assert r["retention_rate"] == pytest.approx(len(keys) / sizes[c])
        if p == 0:
            assert r["n_active"] == r["cohort_size"]


@SLOW
@example(streams=_GAP_EDGES)
@given(streams=_streams())
def test_event_transitions(spark, streams):
    rows = [(k, _ts(t), ty, i)
            for k, evs in streams.items()
            for i, (t, ty) in enumerate(sorted(evs))]
    df = spark.createDataFrame(rows, "k int, ts timestamp, ty string, i int")
    got = {(r["from_type"], r["to_type"]): r
           for r in E.event_transitions(df, "k", "ts", "ty",
                                        order_cols=["i"]).collect()}
    exp = {}
    for k, evs in streams.items():
        evs = sorted(evs)
        for (a, b) in zip(evs, evs[1:]):
            exp[(a[1], b[1])] = exp.get((a[1], b[1]), 0) + 1
    tot = {}
    for (a, _), n in exp.items():
        tot[a] = tot.get(a, 0) + n
    assert set(got) == set(exp)
    for pair, n in exp.items():
        assert got[pair]["n_transitions"] == n
        assert got[pair]["probability"] == pytest.approx(n / tot[pair[0]])


@st.composite
def _intervals(draw, n_max=8):
    out = []
    for i in range(draw(st.integers(1, n_max))):
        s = draw(st.integers(0, 20_000))
        # include malformed (end < start) and zero-length intervals
        e = s + draw(st.integers(-400, 8_000))
        out.append((i, s, e))
    return out


@SLOW
@example(pts=[0, 100, 3600, 7200], ivs=[(0, 0, 3600), (1, 3600, 3599),
                                        (2, 100, 100)],
         bucket=3600)
@given(pts=st.lists(st.integers(0, 30_000), min_size=1, max_size=10),
       ivs=_intervals(), bucket=st.sampled_from([60, 3600, 86_400]))
def test_range_join_points_inclusive_exactly_once(spark, pts, ivs, bucket):
    p = spark.createDataFrame([(i, _ts(t)) for i, t in enumerate(pts)],
                              "pid int, pts timestamp")
    iv = spark.createDataFrame([(i, _ts(s), _ts(e)) for i, s, e in ivs],
                               "iid int, s timestamp, e timestamp")
    got = sorted((r["pid"], r["iid"]) for r in E.range_join_points(
        p, iv, "pts", "s", "e", bucket_seconds=bucket).collect())
    exp = sorted((pi, ii) for pi, t in enumerate(pts)
                 for ii, s, e in ivs if s <= t <= e)
    assert got == exp


@SLOW
@example(livs=[(0, 0, 3600)], rivs=[(0, 3600, 7200), (1, 3601, 9999)],
         bucket=3600)
@given(livs=_intervals(6), rivs=_intervals(6),
       bucket=st.sampled_from([60, 3600, 86_400]))
def test_interval_overlap_join_exactly_once(spark, livs, rivs, bucket):
    l = spark.createDataFrame([(i, _ts(s), _ts(e)) for i, s, e in livs],
                              "lid int, ls timestamp, le timestamp")
    r = spark.createDataFrame([(i, _ts(s), _ts(e)) for i, s, e in rivs],
                              "rid int, rs timestamp, re timestamp")
    got = sorted((x["lid"], x["rid"]) for x in E.interval_overlap_join(
        l, r, "ls", "le", "rs", "re", bucket_seconds=bucket).collect())
    exp = sorted((li, ri)
                 for li, ls, le in livs if le >= ls
                 for ri, rs, re in rivs if re >= rs
                 if ls <= re and rs <= le)
    assert got == exp


@SLOW
@example(lts={0: [0, 100, 200]}, rts={0: [(0, 1.0), (100, 2.0)]},
         direction="backward", tol=None)
@example(lts={0: [50]}, rts={0: [(0, 1.0), (100, 2.0)]},
         direction="forward", tol=10)
@given(lts=st.dictionaries(st.integers(0, 2),
                           st.lists(st.integers(0, 5000), min_size=1,
                                    max_size=8), min_size=1, max_size=3),
       rts=st.dictionaries(st.integers(0, 2),
                           st.lists(st.tuples(st.integers(0, 5000),
                                              st.floats(-5, 5, width=32)),
                                    min_size=1, max_size=8,
                                    unique_by=lambda p: p[0]),
                           min_size=1, max_size=3),
       direction=st.sampled_from(["backward", "forward"]),
       tol=st.sampled_from([None, 0, 300]))
def test_asof_join_matches_bruteforce(spark, lts, rts, direction, tol):
    lrows = [(k, _ts(t), i) for k, ts in lts.items()
             for i, t in enumerate(ts)]
    rrows = [(k, _ts(t), float(v)) for k, pairs in rts.items()
             for t, v in pairs]
    l = spark.createDataFrame(lrows, "k int, ts timestamp, lid int")
    r = spark.createDataFrame(rrows, "k int, ts timestamp, v double")
    got = {(x["k"], x["lid"]): (x["v"], x["matched_ts"])
           for x in E.asof_join(l, r, "k", "ts", ["v"],
                                tolerance_seconds=tol,
                                direction=direction).collect()}
    assert len(got) == len(lrows)
    for k, ts in lts.items():
        cands = sorted(rts.get(k, []))
        for i, t in enumerate(ts):
            if direction == "backward":
                ok = [(rt, v) for rt, v in cands if rt <= t]
                best = max(ok) if ok else None
            else:
                ok = [(rt, v) for rt, v in cands if rt >= t]
                best = min(ok) if ok else None
            if best is not None and tol is not None \
                    and abs(best[0] - t) > tol:
                best = None
            if best is None:
                assert got[(k, i)] == (None, None), f"k{k} lid{i}"
            else:
                assert got[(k, i)] == (
                    pytest.approx(best[1]), _ts(best[0])), f"k{k} lid{i}"


@SLOW
@example(streams=_GAP_EDGES)
@given(streams=_streams())
def test_time_rollup_single_pass_grains(spark, streams):
    rows = [(k, _ts(t), float(t % 11)) for k, evs in streams.items()
            for t, _ in evs]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    got = {(r["granularity"], r["bucket"]): r
           for r in E.time_rollup(df, "ts", "v",
                                  granularities=("hour", "day")).collect()}
    exp = {}
    for k, evs in streams.items():
        for t, _ in evs:
            for g, width in (("hour", 3600), ("day", 86_400)):
                b = t // width * width
                cell = exp.setdefault((g, b), [])
                cell.append(float(t % 11))
    assert set(got) == {(g, _ts(b)) for g, b in exp}
    for (g, b), vals in exp.items():
        r = got[(g, _ts(b))]
        assert r["n"] == len(vals)
        assert r["value_sum"] == pytest.approx(sum(vals), rel=1e-12)
        assert r["value_min"] == min(vals) and r["value_max"] == max(vals)
