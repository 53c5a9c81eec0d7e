"""10x GROUP-CARDINALITY soak for the heavy forecast UDF path (r8 judge
item #7): the r6-r8 soaks covered pipeline/events/dedup; this one drives
`batched_grouped_map` (functions/batched.py) — the Arrow-batched
mapInPandas path every heavy model rides — at 10x the series count
(l_suppkey offsets in /tmp/scale10x-sf1.0, per-series length unchanged,
so the scaling axis is exactly group cardinality and the carry-buffer
stitching frequency).

Two checks:
1. wall-clock scaling sf0.1 -> 10x for Theta + HoltWinters (expect
   ~linear: per-series work is constant, groups are embarrassingly
   parallel after the one repartition);
2. carry-correctness: the 10x Theta run re-executed with
   spark.sql.execution.arrow.maxRecordsPerBatch=500 (vs default 10000) —
   hundreds of times more batch boundaries, so the trailing-run
   carry/stitch logic fires constantly — must produce IDENTICAL rows.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from anofox_forecast_spark.session import get_spark  # noqa: E402
from anofox_forecast_spark.operators.forecast import ts_forecast_by  # noqa: E402
from anofox_forecast_spark.sources import lineitem_panel  # noqa: E402

SCALES = {"sf0.1": "/root/testdata/sf0.1", "10x": "/tmp/scale10x-sf1.0"}

spark = get_spark(app_name="anofox-soak10x-r9", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def run(d, model, params):
    panel = lineitem_panel(spark, d)
    t0 = time.time()
    df = ts_forecast_by(panel, "id", "ds", "y", model, 7, "1d",
                        params=params)
    df.write.format("noop").mode("overwrite").save()
    el = time.time() - t0
    return el, df


print("== wall-clock scaling (series count 10x, length unchanged) ==",
      flush=True)
results = {}
for model, params in (("Theta", None),
                      ("HoltWinters", {"seasonal_period": 7})):
    for tag, d in SCALES.items():
        # warm-up once per (model, scale) so JIT/worker-pool spin-up
        # doesn't pollute the ratio
        run(d, model, params)
        el, df = run(d, model, params)
        nseries = lineitem_panel(spark, d).select("id").distinct().count()
        results[(model, tag)] = (el, nseries)
        print(f"  {model:12s} {tag:6s}: {el:7.2f}s  ({nseries} series)",
              flush=True)
    r = results[(model, "10x")][0] / results[(model, "sf0.1")][0]
    print(f"  {model}: 10x series -> {r:.2f}x wall", flush=True)

print("== carry-correctness: tiny Arrow batches == big batches ==",
      flush=True)
_, big = run(SCALES["10x"], "Theta", None)
big_pdf = (big.select("id", "forecast_step", "yhat")
           .toPandas().sort_values(["id", "forecast_step"])
           .reset_index(drop=True))
spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "500")
try:
    _, small = run(SCALES["10x"], "Theta", None)
    small_pdf = (small.select("id", "forecast_step", "yhat")
                 .toPandas().sort_values(["id", "forecast_step"])
                 .reset_index(drop=True))
finally:
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
assert len(big_pdf) == len(small_pdf) > 0, \
    (len(big_pdf), len(small_pdf))
assert (big_pdf["id"].to_numpy() == small_pdf["id"].to_numpy()).all()
assert (big_pdf["yhat"].to_numpy() == small_pdf["yhat"].to_numpy()).all(), \
    "carry-buffer stitching changed values"
print(f"  OK: {len(big_pdf)} rows bit-identical at 500-row Arrow batches",
      flush=True)
spark.stop()
