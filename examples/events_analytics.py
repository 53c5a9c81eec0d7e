"""Event-stream analytics over the events table:

    events -> gap sessionization -> session stats
           -> as-of join (each purchase picks up the latest signup state)
           -> range join (purchases x the sessions containing them)
           -> funnel (signup -> click -> purchase, first-touch, 7-day)
           -> weekly cohort retention
           -> hour/day/week time rollup

Every stage is one shuffle on the session/join key — the as-of join is
the union-and-window encoding (no range product), the range join is the
binned equi-join — so the identical pipeline runs over a 100 TB event
stream; the streaming twin of stage 1 is
``streaming.stream_sessionize`` (native ``session_window``).

Run: python examples/events_analytics.py [sf_dir]
"""
from __future__ import annotations

import sys


def run(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from anofox_forecast_spark.operators.events import (
        asof_join,
        funnel,
        range_join_points,
        retention,
        session_stats,
        sessionize,
        time_rollup,
    )
    from anofox_forecast_spark.sources import events_table

    ev = events_table(spark, sf_dir)

    # 1. gap-based sessions (lag + running sum, one window sort)
    sessions = sessionize(ev, "user_id", "ts", gap_seconds=3600,
                          order_cols=["event_id"])

    # 2. per-session aggregates (deterministic ordered value fold)
    stats = session_stats(ev, "user_id", "ts", "value", 3600,
                          order_cols=["event_id"])

    # 3. as-of join: each purchase joined to the user's latest signup
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select("event_id", "user_id", "ts", "value"))
    signups = (ev.filter(F.col("event_type") == "signup")
                 .select("user_id", "ts", F.col("value").alias("signup_value")))
    enriched = asof_join(purchases, signups, "user_id", "ts",
                         ["signup_value"], tolerance_seconds=7 * 86400)

    # 4. range join: concurrent sessions (any user) at each purchase instant
    intervals = stats.select(F.col("user_id").alias("session_user"),
                             "session_seq", "ts_start", "ts_end")
    concurrency = (range_join_points(purchases, intervals, "ts",
                                     "ts_start", "ts_end",
                                     bucket_seconds=3600)
                   .groupBy("event_id")
                   .agg(F.count(F.lit(1)).alias("concurrent_sessions")))

    # 5. funnel, retention, rollup — the classic event-analytics trio
    fun = funnel(ev, "user_id", "ts", "event_type",
                 ["signup", "click", "purchase"], within_seconds=7 * 86400)
    ret = retention(ev, "user_id", "ts", "week")
    rollup = time_rollup(ev, "ts", "value", ("hour", "day", "week"),
                         key_cols=["event_type"])

    return sessions, stats, enriched, concurrency, fun, ret, rollup


if __name__ == "__main__":
    # running as a script puts examples/ (not the repo root) on
    # sys.path — add the root so the package resolves
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from anofox_forecast_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="events-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    sessions, stats, enriched, concurrency, fun, ret, rollup = run(spark, sf)
    print("sessions:", sessions.count(), "| session stats:", stats.count())
    enriched.show(5, truncate=False)
    concurrency.orderBy("concurrent_sessions", ascending=False).show(5)
    print("converted:", fun.filter("converted").count(), "/", fun.count())
    ret.orderBy("cohort", "period").show(10)
    rollup.groupBy("granularity").count().show()
