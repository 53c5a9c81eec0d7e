"""10x scale soak for the round-8 operators (same protocol as
tools/soak10x_r7.py): full-table calls at sf0.1 and at the 10x copy
(/tmp/scale10x-sf1.0 from tools/gen10x.py — 10 key-offset copies of each
row, so dup_spans sees every document's k-grams 10x duplicated, the
realistic crawl shape). Cluster posture: AQE on, shuffle 32."""
import sys
import time

sys.path.insert(0, "/root/repo")

SCALES = {"sf0.1": "/root/testdata/sf0.1", "10x": "/tmp/scale10x-sf1.0"}

from pyspark.sql import functions as F  # noqa: E402

from anofox_forecast_spark.session import get_spark  # noqa: E402
from anofox_forecast_spark.operators import pipeline as PL  # noqa: E402
from anofox_forecast_spark.operators.stats import (  # noqa: E402
    hll_count_distinct,
    skew_report,
)
from anofox_forecast_spark.operators.events import funnel  # noqa: E402
from anofox_forecast_spark.sources import events_table  # noqa: E402

spark = get_spark(app_name="anofox-soak10x-r8", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def run_suite(d):
    docs = spark.read.parquet(f"{d}/documents.parquet")
    ev = events_table(spark, d)
    suite = {
        "dup_spans(k=5)": lambda: PL.dup_spans(
            docs, "doc_id", "text", k=5),
        "dup_span_stats(k=5)": lambda: PL.dup_span_stats(
            docs, "doc_id", "text", k=5),
        "remove_dup_spans(k=5)": lambda: PL.remove_dup_spans(
            docs, "doc_id", "text", k=5),
        "sample_weighted(k=100/lang)": lambda: PL.sample_weighted(
            docs.withColumn("w", F.length("text").cast("double")),
            "doc_id", "w", 100, strata_col="lang"),
        "hll_distinct(p=12, by lang)": lambda: hll_count_distinct(
            docs, "text", ["lang"], precision_bits=12),
        "skew_report(user_id)": lambda: skew_report(
            ev, ["user_id"], top_k=10),
        "funnel(capped 50)": lambda: funnel(
            ev, "user_id", "ts", "event_type",
            ["signup", "click", "purchase"], within_seconds=604800.0,
            max_events_per_key=50),
    }
    out = {}
    for name, fn in suite.items():
        t0 = time.time()
        n = None
        try:
            df = fn()
            df.write.format("noop").mode("overwrite").save()
            n = df.count()
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: FAILED {type(e).__name__}: {e}", flush=True)
            out[name] = (-1.0, -1)
            continue
        el = round(time.time() - t0, 1)
        out[name] = (el, n)
        print(f"  {name}: {el} s, {n} rows", flush=True)
    return out


results = {}
for label, d in SCALES.items():
    print(f"== {label} ({d})", flush=True)
    results[label] = run_suite(d)

print("\n| op | sf0.1 (s) | 10x (s) | ratio | rows sf0.1 -> 10x |")
print("|---|---|---|---|---|")
for name in results["sf0.1"]:
    a, na = results["sf0.1"][name]
    b, nb = results["10x"].get(name, (-1.0, -1))
    ratio = round(b / a, 1) if a > 0 and b > 0 else "-"
    print(f"| {name} | {a} | {b} | {ratio} | {na} -> {nb} |")
