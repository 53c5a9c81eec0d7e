"""10x scale soak for the r9b operators (same protocol as
tools/soak10x_r8.py): full-table calls at sf0.1 and at the 10x copy
(/tmp/scale10x-sf1.0 from tools/gen10x.py). The sketch family's claim is
bounded state + ~linear build cost + scale-free probe cost; pii_redact's
claim is a pure scan-speed map. Cluster posture: AQE on, shuffle 32."""
import sys
import time

sys.path.insert(0, "/root/repo")

SCALES = {"sf0.1": "/root/testdata/sf0.1", "10x": "/tmp/scale10x-sf1.0"}

from pyspark.sql import functions as F  # noqa: E402

from anofox_forecast_spark.session import get_spark  # noqa: E402
from anofox_forecast_spark.operators.stats import (  # noqa: E402
    bloom_contains,
    bloom_registers,
    cm_estimate,
    cm_registers,
    sampled_quantiles,
)
from anofox_forecast_spark.operators.text import pii_redact  # noqa: E402
from anofox_forecast_spark.sources import events_table  # noqa: E402

spark = get_spark(app_name="anofox-soak10x-r9b", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def run_suite(d):
    docs = spark.read.parquet(f"{d}/documents.parquet")
    ev = events_table(spark, d).filter(F.col("user_id").isNotNull())
    li = (spark.read.parquet(f"{d}/lineitem.parquet")
          .select("l_returnflag", "l_extendedprice",
                  F.concat_ws("-", F.col("l_orderkey").cast("string"),
                              F.col("l_linenumber").cast("string"))
                  .alias("k")))
    keys = docs.select("doc_id", F.col("doc_id").cast("string")
                       .alias("key"))

    def bloom_build_probe():
        regs = bloom_registers(keys.filter(F.col("doc_id") % 17 == 0),
                               "key", m_bits=4096, k=4, seed="sk")
        return bloom_contains(keys, regs, "key", m_bits=4096, k=4,
                              seed="sk")

    def cm_build_probe():
        regs = cm_registers(ev, "user_id", width=512, depth=3, seed="sk")
        exact = ev.groupBy("user_id").agg(F.count(F.lit(1))
                                          .alias("n_exact"))
        return cm_estimate(exact, regs, "user_id", width=512, depth=3,
                           seed="sk")

    suite = {
        "pii_redact(docs)": lambda: pii_redact(docs, "text"),
        "bloom build+probe(m=4096)": bloom_build_probe,
        "cm build+probe(512x3)": cm_build_probe,
        "sampled_quantiles(k=256)": lambda: sampled_quantiles(
            li, "k", "l_extendedprice", ["l_returnflag"], k=256,
            seed="sk"),
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
