"""Round-7 additions, part 3: event-stream analytics — gap-based
sessionization, session aggregates, and the as-of join.

Value parity vs DuckDB (including its native ASOF JOIN) is covered by
test_entry_oracle.py (`events_sessionize`, `events_session_stats`,
`events_asof_join`); these tests pin edge semantics and plan shapes."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from anofox_forecast_spark import plans as P
from anofox_forecast_spark.operators import events as EV


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


# ---------------------------------------------------------------------------
# sessionize
# ---------------------------------------------------------------------------

def test_sessionize_gap_semantics(spark):
    """New session strictly AFTER the gap; an exact-gap event stays."""
    rows = [(1, _ts(0)), (1, _ts(10)),          # gap 600s == gap -> same
            (1, _ts(20, 1)),                    # 601s  -> new session
            (2, _ts(0))]                        # other key independent
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    got = {(r.user_id, r.ts.minute): (r.session_seq, r.is_session_start)
           for r in EV.sessionize(df, "user_id", "ts", 600).collect()}
    assert got[(1, 0)] == (1, True)
    assert got[(1, 10)] == (1, False)
    assert got[(1, 20)] == (2, True)
    assert got[(2, 0)] == (1, True)


def test_session_stats_values_and_duration(spark):
    rows = [(1, _ts(0), 1.5), (1, _ts(5), 2.25), (1, _ts(40), 10.0)]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    got = {r.session_seq: r for r in
           EV.session_stats(df, "user_id", "ts", "value", 600).collect()}
    assert got[1].n_events == 2 and got[1].value_sum == 3.75
    assert got[1].duration_seconds == 300.0
    assert got[2].n_events == 1 and got[2].value_sum == 10.0
    assert got[2].duration_seconds == 0.0


def test_sessionize_single_sort_plan(spark):
    """lag + running sum share one partitioning/sort — one exchange."""
    df = spark.createDataFrame([(1, _ts(0))], "user_id bigint, ts timestamp")
    out = EV.sessionize(df, "user_id", "ts", 600)
    P.assert_max_exchanges(out, 1)
    assert P.plan_report(out)["python_udf_nodes"] == 0


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------

def test_asof_join_matches_most_recent(spark):
    left = spark.createDataFrame(
        [(10, 1, _ts(5)), (11, 1, _ts(20)), (12, 1, _ts(1)), (13, 2, _ts(5))],
        "event_id bigint, user_id bigint, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(2), 100.0), (1, _ts(5), 200.0), (1, _ts(30), 300.0)],
        "user_id bigint, ts timestamp, state double")
    got = {r.event_id: (r.state, r.matched_ts)
           for r in EV.asof_join(left, right, "user_id", "ts",
                                 ["state"]).collect()}
    assert got[10] == (200.0, _ts(5))       # equal ts matches (inclusive)
    assert got[11] == (200.0, _ts(5))       # most recent at-or-before
    assert got[12] == (None, None)          # nothing before -> left join null
    assert got[13] == (None, None)          # key with no right rows


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([(10, 1, _ts(30))],
                                 "event_id bigint, user_id bigint, ts timestamp")
    right = spark.createDataFrame([(1, _ts(0), 5.0)],
                                  "user_id bigint, ts timestamp, state double")
    fresh = EV.asof_join(left, right, "user_id", "ts", ["state"],
                         tolerance_seconds=3600).collect()[0]
    assert fresh.state == 5.0
    stale = EV.asof_join(left, right, "user_id", "ts", ["state"],
                         tolerance_seconds=60).collect()[0]
    assert stale.state is None and stale.matched_ts is None


def test_asof_join_rejects_column_clash(spark):
    left = spark.createDataFrame([(1, _ts(0), 1.0)],
                                 "user_id bigint, ts timestamp, state double")
    with pytest.raises(ValueError):
        EV.asof_join(left, left, "user_id", "ts", ["state"])


def test_asof_join_one_shuffle_no_range_product(spark):
    left = spark.createDataFrame([(10, 1, _ts(5))],
                                 "event_id bigint, user_id bigint, ts timestamp")
    right = spark.createDataFrame([(1, _ts(2), 1.0)],
                                  "user_id bigint, ts timestamp, state double")
    out = EV.asof_join(left, right, "user_id", "ts", ["state"])
    rep = P.plan_report(out)
    assert rep["cartesian_products"] == 0
    assert rep["python_udf_nodes"] == 0
    # union-and-window: the only wide exchange is the per-key sort
    P.assert_max_exchanges(out, 1)


# ---------------------------------------------------------------------------
# range_join_points
# ---------------------------------------------------------------------------

def test_range_join_inclusive_bounds_and_multibucket(spark):
    """Bounds are inclusive; an interval spanning many buckets still pairs
    with each contained point exactly once."""
    pts = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(30)), (3, _ts(59)), (4, _ts(59, 1))],
        "pid bigint, ts timestamp")
    iv = spark.createDataFrame([(100, _ts(0), _ts(59))],
                               "iid bigint, s timestamp, e timestamp")
    got = sorted(r.pid for r in EV.range_join_points(
        pts, iv, "ts", "s", "e", bucket_seconds=60).collect())
    assert got == [1, 2, 3]                      # 59:01 outside; both ends in
    # exactly once per pair despite the 60 exploded buckets
    assert len(got) == len(set(got))


def test_range_join_key_and_clash(spark):
    pts = spark.createDataFrame([(1, 7, _ts(10))],
                                "pid bigint, user_id bigint, ts timestamp")
    iv = spark.createDataFrame(
        [(7, _ts(0), _ts(20)), (8, _ts(0), _ts(20))],
        "user_id bigint, s timestamp, e timestamp")
    keyed = EV.range_join_points(pts, iv, "ts", "s", "e", 600,
                                 key_col="user_id").collect()
    assert len(keyed) == 1 and keyed[0].user_id == 7
    import pytest as _pt
    with _pt.raises(ValueError):
        EV.range_join_points(pts, iv.withColumnRenamed("s", "ts"),
                             "ts", "ts", "e", 600)


def test_range_join_malformed_interval_dropped(spark):
    """end < start is corrupt data: it can never satisfy the residual, and
    must be dropped BEFORE the explode (no descending bucket list)."""
    pts = spark.createDataFrame([(1, _ts(10))], "pid bigint, ts timestamp")
    iv = spark.createDataFrame(
        [(100, _ts(0), _ts(20)),        # well-formed, contains the point
         (101, _ts(50), _ts(0))],       # malformed: end < start
        "iid bigint, s timestamp, e timestamp")
    got = [r.iid for r in EV.range_join_points(
        pts, iv, "ts", "s", "e", bucket_seconds=60).collect()]
    assert got == [100]
    # overlap join: same guard on both sides
    left = spark.createDataFrame([(1, _ts(0), _ts(30))],
                                 "lid bigint, ls timestamp, le timestamp")
    right = spark.createDataFrame(
        [(2, _ts(10), _ts(20)), (3, _ts(25), _ts(5))],
        "rid bigint, rs timestamp, re timestamp")
    pairs = [(x.lid, x.rid) for x in EV.interval_overlap_join(
        left, right, "ls", "le", "rs", "re", 60).collect()]
    assert pairs == [(1, 2)]


def test_range_join_no_cross_product_plan(spark):
    pts = spark.createDataFrame([(1, _ts(0))], "pid bigint, ts timestamp")
    iv = spark.createDataFrame([(2, _ts(0), _ts(1))],
                               "iid bigint, s timestamp, e timestamp")
    out = EV.range_join_points(pts, iv, "ts", "s", "e", 3600)
    rep = P.plan_report(out)
    assert rep["cartesian_products"] == 0
    assert rep["python_udf_nodes"] == 0


# ---------------------------------------------------------------------------
# streaming sessionize (batch-mode pin of the session_window convention)
# ---------------------------------------------------------------------------

def test_session_window_gap_convention(spark):
    """session_window merges an event exactly `gap` after the last (new
    session only at delta > gap) — the same convention as the batch
    events.sessionize and the rule the streaming_sessionize oracle
    replays with `delta > gap`."""
    df = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(10)),        # exactly gap -> merges
         (1, _ts(20, 1)),                  # gap + 1s -> new session
         (1, _ts(25))],
        "id bigint, ds timestamp")
    got = (df.groupBy("id", F.session_window("ds", "10 minutes"))
             .agg(F.count(F.lit(1)).alias("n"))
             .select("session_window.start", "n")
             .orderBy("start").collect())
    assert [(r.start.minute, r.n) for r in got] == [(0, 2), (20, 2)]


# ---------------------------------------------------------------------------
# time_rollup
# ---------------------------------------------------------------------------

def test_time_rollup_multi_grain_single_pass(spark):
    rows = [(1, dt.datetime(2024, 1, 1, 0, 10), 1.0),
            (1, dt.datetime(2024, 1, 1, 0, 50), 2.0),
            (1, dt.datetime(2024, 1, 1, 5, 0), 4.0),
            (2, dt.datetime(2024, 1, 2, 0, 0), 8.0)]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    got = {(r.granularity, str(r.bucket)): (r.n, r.value_sum)
           for r in EV.time_rollup(df, "ts", "value",
                                   ("hour", "day")).collect()}
    assert got[("hour", "2024-01-01 00:00:00")] == (2, 3.0)
    assert got[("hour", "2024-01-01 05:00:00")] == (1, 4.0)
    assert got[("day", "2024-01-01 00:00:00")] == (3, 7.0)
    assert got[("day", "2024-01-02 00:00:00")] == (1, 8.0)
    # single scan: explode + ONE aggregate -> exactly one exchange
    out = EV.time_rollup(df, "ts", "value", ("hour", "day", "week"))
    P.assert_max_exchanges(out, 1)
    assert P.plan_report(out)["python_udf_nodes"] == 0


def test_time_rollup_rejects_unknown_grain(spark):
    df = spark.createDataFrame([(1, _ts(0), 1.0)],
                               "user_id bigint, ts timestamp, value double")
    with pytest.raises(ValueError):
        EV.time_rollup(df, "ts", "value", ("fortnight",))


def test_asof_join_forward_direction(spark):
    left = spark.createDataFrame(
        [(10, 1, _ts(5)), (11, 1, _ts(31))],
        "event_id bigint, user_id bigint, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(5), 1.0), (1, _ts(30), 2.0)],
        "user_id bigint, ts timestamp, state double")
    got = {r.event_id: (r.state, r.matched_ts)
           for r in EV.asof_join(left, right, "user_id", "ts", ["state"],
                                 direction="forward").collect()}
    assert got[10] == (1.0, _ts(5))      # equal ts matches (inclusive)
    assert got[11] == (None, None)       # nothing at-or-after
    tol = {r.event_id: r.state
           for r in EV.asof_join(left, right, "user_id", "ts", ["state"],
                                 direction="forward",
                                 tolerance_seconds=60).collect()}
    assert tol[10] == 1.0
    import pytest as _pt
    with _pt.raises(ValueError):
        EV.asof_join(left, right, "user_id", "ts", ["state"],
                     direction="nearest")


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------

def test_funnel_greedy_first_touch(spark):
    rows = [
        (1, _ts(0), "signup"), (1, _ts(1), "click"), (1, _ts(2), "buy"),
        (2, _ts(0), "click"), (2, _ts(1), "signup"), (2, _ts(2), "click"),
        (3, _ts(0), "signup"),
        (4, _ts(0), "other"),
    ]
    df = spark.createDataFrame(rows, "uid bigint, ts timestamp, et string")
    got = {r.uid: (r.steps_completed, r.converted, r.step_3_ts)
           for r in EV.funnel(df, "uid", "ts", "et",
                              ["signup", "click", "buy"]).collect()}
    assert got[1] == (3, True, _ts(2))
    # user 2: click BEFORE signup doesn't count; click after does; no buy
    assert got[2] == (2, False, None)
    assert got[3] == (1, False, None)
    assert 4 not in got  # no funnel-type events at all


def test_funnel_within_window(spark):
    rows = [(1, _ts(0), "a"), (1, _ts(30), "b"),
            (2, _ts(0), "a"), (2, _ts(5), "b")]
    df = spark.createDataFrame(rows, "uid bigint, ts timestamp, et string")
    got = {r.uid: r.steps_completed
           for r in EV.funnel(df, "uid", "ts", "et", ["a", "b"],
                              within_seconds=600).collect()}
    assert got == {1: 1, 2: 2}   # 30 min > 10 min window for user 1


def test_funnel_single_shuffle(spark):
    df = spark.createDataFrame([(1, _ts(0), "a")],
                               "uid bigint, ts timestamp, et string")
    out = EV.funnel(df, "uid", "ts", "et", ["a", "b"])
    P.assert_max_exchanges(out, 1)
    assert P.plan_report(out)["python_udf_nodes"] == 0
    import pytest as _pt
    with _pt.raises(ValueError):
        EV.funnel(df, "uid", "ts", "et", [])


def test_funnel_max_events_per_key(spark):
    # user 1's 'b' sits beyond the cap of 2 earliest events -> dropped;
    # user 2 completes inside the cap. The guard keeps the EARLIEST rows.
    rows = [(1, _ts(0), "a"), (1, _ts(1), "a"), (1, _ts(2), "b"),
            (2, _ts(0), "a"), (2, _ts(1), "b"), (2, _ts(2), "a")]
    df = spark.createDataFrame(rows, "uid bigint, ts timestamp, et string")
    got = {r.uid: r.steps_completed
           for r in EV.funnel(df, "uid", "ts", "et", ["a", "b"],
                              max_events_per_key=2).collect()}
    assert got == {1: 1, 2: 2}
    # uncapped, user 1 converts too
    got2 = {r.uid: r.steps_completed
            for r in EV.funnel(df, "uid", "ts", "et", ["a", "b"]).collect()}
    assert got2 == {1: 2, 2: 2}
    import pytest as _pt
    with _pt.raises(ValueError):
        EV.funnel(df, "uid", "ts", "et", ["a"], max_events_per_key=0)


def test_funnel_cap_plan_shape(spark):
    # the cap adds ONE row_number window partitioned on the funnel key;
    # it shares the key's hash partitioning with the groupBy, so the
    # whole capped funnel still runs on a single exchange
    df = spark.createDataFrame([(1, _ts(0), "a")],
                               "uid bigint, ts timestamp, et string")
    out = EV.funnel(df, "uid", "ts", "et", ["a", "b"],
                    max_events_per_key=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "row_number" in plan and "uid" in plan, \
        "cap window missing from physical plan"
    P.assert_max_exchanges(out, 1)
    assert P.plan_report(out)["python_udf_nodes"] == 0


# ---------------------------------------------------------------------------
# retention
# ---------------------------------------------------------------------------

def test_retention_cohort_matrix(spark):
    d0, d1, d2 = (dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 8),
                  dt.datetime(2024, 1, 15))
    rows = [(1, d0), (1, d1), (1, d2),        # cohort w0, active w0 w1 w2
            (2, d0), (2, d2),                 # cohort w0, active w0 w2
            (3, d1)]                          # cohort w1, active w1 only
    df = spark.createDataFrame(rows, "uid bigint, ts timestamp")
    got = {(str(r.cohort), r.period): (r.n_active, r.cohort_size,
                                       r.retention_rate)
           for r in EV.retention(df, "uid", "ts", "week").collect()}
    w0, w1 = "2024-01-01 00:00:00", "2024-01-08 00:00:00"
    assert got[(w0, 0)] == (2, 2, 1.0)
    assert got[(w0, 1)] == (1, 2, 0.5)
    assert got[(w0, 2)] == (2, 2, 1.0)
    assert got[(w1, 0)] == (1, 1, 1.0)
    assert (w1, 1) not in got


def test_retention_month_grain_and_cap(spark):
    rows = [(1, dt.datetime(2024, 1, 5)), (1, dt.datetime(2024, 4, 20))]
    df = spark.createDataFrame(rows, "uid bigint, ts timestamp")
    got = {r.period for r in EV.retention(df, "uid", "ts", "month").collect()}
    assert got == {0, 3}
    capped = {r.period
              for r in EV.retention(df, "uid", "ts", "month",
                                    max_periods=2).collect()}
    assert capped == {0}
    import pytest as _pt
    with _pt.raises(ValueError):
        EV.retention(df, "uid", "ts", "fortnight")


# ---------------------------------------------------------------------------
# interval_overlap_join / event_transitions
# ---------------------------------------------------------------------------

def test_interval_overlap_exactly_once(spark):
    """Overlapping pairs appear exactly once even when both intervals span
    many buckets; touching endpoints (inclusive) match; disjoint don't."""
    l = spark.createDataFrame(
        [(1, _ts(0), _ts(30)), (2, _ts(40), _ts(45))],
        "lid bigint, ls timestamp, le timestamp")
    r = spark.createDataFrame(
        [(10, _ts(30), _ts(50)),   # touches 1 at minute 30; overlaps 2
         (11, _ts(31), _ts(39))],  # disjoint from both
        "rid bigint, rs timestamp, re timestamp")
    got = sorted((x.lid, x.rid) for x in EV.interval_overlap_join(
        l, r, "ls", "le", "rs", "re", bucket_seconds=60).collect())
    assert got == [(1, 10), (2, 10)]


def test_interval_overlap_keyed_and_plan(spark):
    l = spark.createDataFrame([(1, 7, _ts(0), _ts(10))],
                              "lid bigint, k bigint, ls timestamp, le timestamp")
    r = spark.createDataFrame(
        [(7, _ts(5), _ts(15)), (8, _ts(5), _ts(15))],
        "k bigint, rs timestamp, re timestamp")
    got = EV.interval_overlap_join(l, r, "ls", "le", "rs", "re", 600,
                                   key_col="k").collect()
    assert len(got) == 1 and got[0].k == 7
    rep = P.plan_report(EV.interval_overlap_join(
        l, r.withColumnRenamed("k", "k2"), "ls", "le", "rs", "re", 600))
    assert rep["cartesian_products"] == 0
    import pytest as _pt
    with _pt.raises(ValueError):   # un-keyed shared column is a clash
        EV.interval_overlap_join(l, r, "ls", "le", "rs", "re", 600)


def test_event_transitions_matrix(spark):
    rows = [(1, _ts(0), "a"), (1, _ts(1), "b"), (1, _ts(2), "a"),
            (2, _ts(0), "a"), (2, _ts(1), "b"), (2, _ts(2), "b")]
    df = spark.createDataFrame(rows, "uid bigint, ts timestamp, et string")
    got = {(r.from_type, r.to_type): (r.n_transitions, r.probability)
           for r in EV.event_transitions(df, "uid", "ts", "et").collect()}
    assert got[("a", "b")] == (2, 1.0)
    assert got[("b", "a")] == (1, 0.5)
    assert got[("b", "b")] == (1, 0.5)
    # no cross-key transition (1's last 'a' never pairs with 2's first 'a')
    assert ("a", "a") not in got


def test_retention_and_transitions_plan_shapes(spark):
    df = spark.createDataFrame([(1, _ts(0), "a", 1.0)],
                               "uid bigint, ts timestamp, et string, v double")
    ret = EV.retention(df, "uid", "ts", "week")
    rep = P.plan_report(ret)
    assert rep["cartesian_products"] == 0
    assert rep["python_udf_nodes"] == 0
    tr = EV.event_transitions(df, "uid", "ts", "et")
    rep = P.plan_report(tr)
    assert rep["cartesian_products"] == 0
    assert rep["python_udf_nodes"] == 0


def test_group_quantiles_type7(spark):
    import numpy as np
    vals = [3.0, 1.0, 4.0, 1.5, 9.0, 2.6, 5.0]
    rows = [("g", v) for v in vals] + [("h", 7.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    from anofox_forecast_spark.operators.stats import group_quantiles
    got = {r.k: r for r in group_quantiles(df, ["k"], "v",
                                           (0.25, 0.5, 0.9)).collect()}
    for q, col in ((0.25, "q_0_25"), (0.5, "q_0_5"), (0.9, "q_0_9")):
        assert got["g"][col] == pytest.approx(
            float(np.quantile(vals, q)), rel=1e-12)
    assert got["h"].q_0_5 == 7.0 and got["h"].n == 1
