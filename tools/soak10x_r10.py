"""10x scale soak for the six r10 pure-Catalyst fold models (SES,
CrostonClassic, CrostonSBA, TSB, fixed-parameter Holt, SeasonalES) —
the evidence the r10 verdict flagged as missing (watch-list #2).

Claim under test: each model is ONE group shuffle feeding a JVM
``aggregate`` fold whose per-series state is the ds-sorted value array —
O(series length) per group, independent of series COUNT. So the soak
scales BOTH axes:

- **10x series count** (/tmp/scale10x-sf1.0 from tools/gen10x.py: 10
  key-offset exact copies, per-series length unchanged) — wall should
  scale ~linearly and per-task memory not at all.
- **10x series length** (synthesized in-process: each sf0.1 series
  unioned with 9 time-shifted copies of itself -> ~5,300-point series,
  same 1,000 groups) — the ``__ys`` agg-state bound is exercised
  directly; reference memory story ``ts_forecast_native.cpp:35-42``.

Invariance pins at soak scale (bit-equality, not timing):

- copy-invariance: the 10x-count table holds EXACT copies of every
  base series under offset ids, so the forecast for id and id+c*1e6
  must agree bit-for-bit (checked for SES across all 10 copies).
- partitioning-invariance: the long-series fold rerun from a
  differently-partitioned input must be bit-identical.

Cluster posture: AQE on, shuffle 32. Run from the repo root:
``python tools/soak10x_r10.py`` (needs tools/gen10x.py output).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from anofox_forecast_spark.operators.forecast import ts_forecast_by  # noqa: E402
from anofox_forecast_spark.session import get_spark  # noqa: E402
from anofox_forecast_spark.sources import lineitem_panel  # noqa: E402

spark = get_spark(app_name="anofox-soak10x-r10", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

MODELS = [
    ("SES", {"alpha": 0.3}),
    ("CrostonClassic", {}),
    ("CrostonSBA", {}),
    ("TSB", {}),
    ("Holt", {"alpha": 0.4, "beta": 0.1}),
    ("SeasonalES", {"alpha": 0.3, "seasonal_period": 7}),
]


def long_panel(base):
    """~10x series LENGTH: 9 extra time-shifted copies of each series
    appended after its real range (ds + c*2000 days keeps copies
    disjoint and ordered; values repeat, which is irrelevant to the
    state-size bound under test)."""
    return base.crossJoin(spark.range(10).withColumnRenamed("id", "__c")) \
               .select("id",
                       F.expr("ds + make_interval(0,0,0, __c * 2000)")
                        .alias("ds"),
                       "y")


def run_suite(label, panel):
    print(f"== {label}", flush=True)
    out = {}
    for model, params in MODELS:
        t0 = time.time()
        df = ts_forecast_by(panel, "id", "ds", "y", model, 28, "1d",
                            dict(params))
        df.write.format("noop").mode("overwrite").save()
        n = df.count()
        el = round(time.time() - t0, 1)
        out[model + str(sorted(params))[:9]] = (el, n)
        print(f"  {model}{params}: {el} s, {n} rows", flush=True)
    return out


base = lineitem_panel(spark, "/root/testdata/sf0.1")
big = lineitem_panel(spark, "/tmp/scale10x-sf1.0")
longp = long_panel(base)

results = {
    "sf0.1": run_suite("sf0.1 (1,000 series x ~533)", base),
    "10x-count": run_suite("10x series count (10,000 x ~533)", big),
    "10x-length": run_suite("10x series length (1,000 x ~5,330)", longp),
}

# --- invariance pin 1: exact-copy series forecast identically (SES over
# the 10x-count table; every copy id maps back to its base id) ---
fc = ts_forecast_by(big, "id", "ds", "y", "SES", 28, "1d", {"alpha": 0.3})
mism = (fc.withColumn("base_id", F.expr("id % 1000000"))
          .groupBy("base_id", "forecast_step")
          .agg(F.countDistinct("yhat").alias("ny"),
               F.countDistinct("yhat_lower").alias("nl"),
               F.countDistinct("yhat_upper").alias("nu"))
          .filter("ny > 1 OR nl > 1 OR nu > 1").count())
print(f"\ncopy-invariance (SES, 10 copies x all series x 28 steps): "
      f"{mism} mismatching (expect 0)", flush=True)

# --- invariance pin 2: partitioning-invariance on the long-series fold ---
a = ts_forecast_by(longp, "id", "ds", "y", "SES", 28, "1d", {"alpha": 0.3})
b = ts_forecast_by(longp.repartition(7), "id", "ds", "y", "SES", 28, "1d",
                   {"alpha": 0.3})
diff = a.exceptAll(b).count() + b.exceptAll(a).count()
print(f"partitioning-invariance (long-series SES): {diff} differing rows "
      f"(expect 0)", flush=True)

print("\n| model | sf0.1 (s) | 10x count (s) | 10x length (s) | "
      "rows sf0.1 -> 10xc -> 10xl |")
print("|---|---|---|---|---|")
for name in results["sf0.1"]:
    a_, na = results["sf0.1"][name]
    b_, nb = results["10x-count"][name]
    c_, nc = results["10x-length"][name]
    print(f"| {name} | {a_} | {b_} | {c_} | {na} -> {nb} -> {nc} |")

ok = mism == 0 and diff == 0
print("\nSOAK-" + ("PASS" if ok else "FAIL"))
