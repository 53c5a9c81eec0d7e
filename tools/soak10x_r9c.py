"""10x scale soak for the r9c operators (same protocol as
tools/soak10x_r9b.py): full-table calls at sf0.1 and at the 10x copy
(/tmp/scale10x-sf1.0 from tools/gen10x.py — 10x the SERIES/DOC count,
per-series length unchanged, exact cross-copy doc dups).

Claims under test: ts_scale_by/ts_winsorize_by are one group shuffle +
a broadcast stats join (cost ~linear in rows, per-group state = the
series), and dsir_weights is two lm_score passes whose LM count tables
grow with the DISTINCT vocab, not the corpus (10x exact copies leave
the bigram tables nearly unchanged — build cost should scale with the
scoring join, not 10x the LM fit). Cluster posture: AQE on, shuffle 32."""
import sys
import time

sys.path.insert(0, "/root/repo")

SCALES = {"sf0.1": "/root/testdata/sf0.1", "10x": "/tmp/scale10x-sf1.0"}

from pyspark.sql import functions as F  # noqa: E402

from anofox_forecast_spark.session import get_spark  # noqa: E402
from anofox_forecast_spark.operators.detect import (  # noqa: E402
    ts_detect_anomalies_online_by,
)
from anofox_forecast_spark.operators.pipeline import dsir_weights  # noqa: E402
from anofox_forecast_spark.operators.prep import (  # noqa: E402
    ts_scale_by,
    ts_winsorize_by,
)
from anofox_forecast_spark.sources import lineitem_panel  # noqa: E402

spark = get_spark(app_name="anofox-soak10x-r9c", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def run_suite(d):
    pan = lineitem_panel(spark, d)
    docs = spark.read.parquet(f"{d}/documents.parquet")
    target = docs.filter(F.col("doc_id") % 5 == 0)

    suite = {
        "ts_scale_by(robust)": lambda: ts_scale_by(pan, "id", "ds", "y",
                                                   "robust"),
        "ts_scale_by(zscore)": lambda: ts_scale_by(pan, "id", "ds", "y",
                                                   "zscore"),
        "ts_winsorize_by(5/95)": lambda: ts_winsorize_by(
            pan, "id", "ds", "y", 0.05, 0.95),
        "dsir_weights(docs)": lambda: dsir_weights(docs, "doc_id", "text",
                                                   target),
        "anomalies_online(2.5/30)": lambda: ts_detect_anomalies_online_by(
            pan, "id", "ds", "y", 2.5, 30),
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
