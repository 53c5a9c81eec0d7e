"""10x scale soak for the round-7 operator families (same protocol as
tools/soak10x.py): run each operator on the FULL tables at sf0.1 and at
the 10x copy (/tmp/scale10x-sf1.0, from tools/gen10x.py) in one session
with cluster-posture config (AQE on, shuffle 32). The 10x copy holds 10
key-offset copies of every row, so dedup/semdedup see a realistic
crawl-shaped duplicate structure (every document exists 10 times).

Unlike the driver keys (which pin small filters for oracle cost), every
call here takes the whole table — the scaling axis is the data."""
import time
import sys

sys.path.insert(0, "/root/repo")

SCALES = {"sf0.1": "/root/testdata/sf0.1", "10x": "/tmp/scale10x-sf1.0"}

from pyspark.sql import functions as F

from anofox_forecast_spark.session import get_spark
from anofox_forecast_spark.operators import dedup as DD
from anofox_forecast_spark.operators import events as EV
from anofox_forecast_spark.operators import pipeline as PL
from anofox_forecast_spark.operators import search as SR
from anofox_forecast_spark.operators import similarity as SIM
from anofox_forecast_spark.sources import events_table

spark = get_spark(app_name="anofox-soak10x-r7", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def run_suite(d):
    docs = spark.read.parquet(f"{d}/documents.parquet")
    embs = spark.read.parquet(f"{d}/embeddings.parquet")
    ev = events_table(spark, d)
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select("event_id", "user_id", "ts", "value"))
    signups = (ev.filter(F.col("event_type") == "signup")
                 .select("user_id", "ts", F.col("value").alias("sv")))

    def sess_intervals():
        return (EV.session_stats(ev, "user_id", "ts", None, 3600.0,
                                 order_cols=["event_id"])
                .select(F.col("user_id").alias("su"), "session_seq",
                        "ts_start", "ts_end"))

    suite = {
        # production order: exact dedup FIRST (collapses the 10 exact
        # copies per doc), then LSH with the hot-bucket cap on survivors.
        # Without this the 10x exact-dup structure blows candidates up
        # x100 (measured: >30 min vs seconds) - the lesson the soak
        # exists to surface.
        "dedup_clusters": lambda: DD.dup_clusters(
            DD.minhash_lsh_pairs(
                DD.dedup_exact(docs, "doc_id", "text")
                  .select("doc_id", "text"),
                "doc_id", "text", num_hashes=32, bands=8, threshold=0.4,
                max_bucket_size=50)),
        # SemDeDup's k grows with the corpus (paper: k ~ n/10k) so the
        # per-cell pair count - the quadratic term - stays constant and
        # total cost scales linearly
        # k grows with the corpus (SemDeDup: k ~ n/10k) so the per-cell
        # quadratic term stays constant; at large k the assignment flips
        # to the Arrow matmul path (the expr argmin is rows x k x dim)
        "semdedup": lambda: SIM.semdedup(
            embs, "vec_id", "embedding", threshold=0.3,
            n_clusters=max(16, embs.count() // 125),
            assign_mode="arrow"),
        "pipeline_dedup_lines": lambda: PL.dedup_lines(
            docs.select("doc_id",
                        F.translate("text", " ", "\n").alias("text")),
            "doc_id", "text", min_docs=docs.count() // 5),
        "pipeline_mix_sources": lambda: PL.mix_sources(
            docs, "doc_id", "source", "text",
            {f"src{i}": 0.05 for i in range(20)}),
        "pipeline_token_budget": lambda: PL.token_budget_filter(
            docs, "doc_id", "text", 100_000, strata_col="source"),
        "search_bm25": lambda: SR.bm25_score(
            docs, "doc_id", "text", ["spark", "join", "window"]),
        "search_top_terms": lambda: SR.top_terms(docs, "source", "text", 10),
        "search_tfidf": lambda: SR.tfidf_top_terms(docs, "doc_id", "text", 5),
        "events_sessionize": lambda: EV.sessionize(
            ev, "user_id", "ts", 3600.0, order_cols=["event_id"]),
        "events_session_stats": lambda: EV.session_stats(
            ev, "user_id", "ts", "value", 3600.0, order_cols=["event_id"]),
        "events_asof_join": lambda: EV.asof_join(
            purchases, signups, "user_id", "ts", ["sv"]),
        "events_range_join": lambda: EV.range_join_points(
            purchases, sess_intervals(), "ts", "ts_start", "ts_end",
            3600.0).groupBy().count(),
        "events_time_rollup": lambda: EV.time_rollup(
            ev, "ts", "value", ("hour", "day", "week"),
            key_cols=["event_type"]),
    }
    t = {}
    for name, fn in suite.items():
        best = -1.0
        try:
            for _ in range(2):
                t0 = time.time()
                fn().write.format("noop").mode("overwrite").save()
                el = round(time.time() - t0, 2)
                best = el if best < 0 else min(best, el)
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED: {e}", file=sys.stderr)
        t[name] = best
        print(f"  {name}: {best}", flush=True)
    return t


out = {}
for label, d in SCALES.items():
    print(label, flush=True)
    out[label] = run_suite(d)

print("\nquery, sf0.1, 10x, ratio")
for name in out["sf0.1"]:
    a, b = out["sf0.1"][name], out["10x"].get(name, -1)
    r = round(b / a, 1) if a > 0 and b > 0 else "-"
    print(f"{name}, {a}, {b}, {r}")
spark.stop()
