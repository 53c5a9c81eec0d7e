"""Source readers and panel derivations over the driver testdata.

The engine's universal input shape is the long-format panel
``(id, ds, y)`` (SURVEY.md §1.1). These helpers load the TPC-H-ish
parquet tables and derive deterministic panels from them, matching the
derivations documented in FIXTURES.md ("Driver testdata mapping").

All readers are plain ``spark.read.parquet`` — predicate pushdown and
column pruning reach the scan for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: Column-metadata key carrying a producer's no-NaN witness. A FLOAT
#: column tagged with this (truthfully — make it true BY CONSTRUCTION,
#: e.g. ``coalesce(nanvl(x, NULL), 0.0)`` which maps any NaN to 0.0
#: before the tag is attached) lets ``interpolate_nulls_df`` keep its
#: non-nullable short-circuit under the forecast path's
#: NaN-is-missing semantics: non-nullable rules out NULL, the witness
#: rules out NaN, so no row can need repair and the two in-partition
#: sorts + seven window columns of the null-repair pass are skipped
#: (the r11 clean-panel plan win, kept compatible with the r12
#: non-nullable-NaN correctness fix). Columns without the witness take
#: the safe path.
NO_NAN_METADATA = "anofox_no_nan"

# Opt-in panel cache (bench.py): the headline queries all re-derive the same
# scan+groupBy panel; persisting it once removes the repeated input stage.
# Off by default — the correctness driver hands us fresh sessions and must
# never see a DataFrame bound to an older one.
_CACHE: dict[tuple, DataFrame] = {}
_CACHE_ENABLED = False


def enable_source_cache(enabled: bool = True) -> None:
    global _CACHE_ENABLED
    _CACHE_ENABLED = enabled
    if not enabled:
        for df in _CACHE.values():
            try:
                df.unpersist()
            except Exception:
                pass
        _CACHE.clear()


def _cached(key: tuple, build, spread: bool = False,
            partition_on: str | None = None):
    if not _CACHE_ENABLED:
        return build()
    if key not in _CACHE:
        from pyspark import StorageLevel
        df = build()
        if partition_on is not None:
            # persist hash-partitioned on the series key: the cached scan
            # then already satisfies every downstream window / groupBy
            # ClusteredDistribution on that key, so repeated per-series
            # queries run shuffle-free off the cache — the in-memory
            # analogue of bucketing the panel table at 100 TB
            df = df.repartition(partition_on)
        elif spread:
            # one small parquet file scans as ONE partition; when persisting
            # for repeated reuse, spread it across the executors first (at
            # real scale many input files provide this parallelism natively)
            df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
        _CACHE[key] = df.persist(StorageLevel.MEMORY_AND_DISK)
    return _CACHE[key]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}")
    # The events table stores TIMESTAMP(NANOS), which vanilla Spark sessions
    # refuse to read (PARQUET_TYPE_ILLEGAL). nanosAsLong is a runtime-settable
    # SQL conf, so set it here rather than relying on the session factory —
    # callers hand us arbitrary sessions (e.g. the correctness driver's).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if name in ("documents", "embeddings"):
        # small dimension-like tables reread by every LLM-pipeline query
        return _cached(
            (name, sf_dir),
            lambda: spark.read.parquet(f"{sf_dir}/{name}.parquet"),
            spread=True)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def lineitem_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Many-series daily panel: (id=l_suppkey, ds=day(l_shipdate), y=sum qty).

    The aggregate's exchange is keyed on hash(id) ALONE (r13, guide §2.4
    "two operations keyed the same way can share one exchange"):
    HashPartitioning(id) satisfies the (id, ds) grouping's clustered
    distribution, and every downstream per-series stage groups/windows
    by id — at cluster scale (where the partition floor does not insert
    an explicit repartition) the id-keyed fold aggregates run with NO
    second exchange, and at bench scale the aggregation work moves off
    the narrow file-scan stage onto the full shuffle width (measured
    -33% on the SQL-path forecast keys). Value identity does NOT rest on
    float luck: l_quantity is integer-valued (TPC-H quantities 1..50),
    so every per-group sum is exact in ANY accumulation order — the same
    property the DuckDB-oracle hash match has always relied on. The
    orders panel keeps the default keying (o_totalprice is fractional;
    its sum order is observable at the last ulp)."""
    def build():
        li = load_table(spark, sf_dir, "lineitem")
        return (
            li.select(
                F.col("l_suppkey").alias("id"),
                F.date_trunc("day", F.col("l_shipdate")).alias("ds"),
                F.col("l_quantity"),
            )
            .repartition(F.col("id"))
            .groupBy("id", "ds")
            # sum over a non-empty group is never NULL; the coalesce is a
            # no-op at runtime but marks y non-nullable in the schema, and
            # the nanvl step maps a (never-occurring) NaN sum to NULL ->
            # 0.0, making the attached no-NaN witness true BY CONSTRUCTION
            # — together they let interpolate_nulls_df skip its
            # null-repair window passes entirely under BOTH missing-value
            # semantics (see NO_NAN_METADATA)
            .agg(F.coalesce(F.nanvl(F.sum("l_quantity"),
                                    F.lit(None).cast("double")),
                            F.lit(0.0))
                  .alias("y", metadata={NO_NAN_METADATA: True}))
        )
    return _cached(("lineitem_panel", sf_dir), build, partition_on="id")


def orders_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse intermittent-like panel: (o_custkey, day(o_orderdate), sum price)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.col("o_custkey").alias("id"),
            F.date_trunc("day", F.col("o_orderdate")).alias("ds"),
            F.col("o_totalprice"),
        )
        .groupBy("id", "ds")
        .agg(F.sum("o_totalprice").alias("y"))
    )


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table with ``ts`` as a true microsecond timestamp.

    The parquet stores TIMESTAMP(NANOS) (read as long via nanosAsLong);
    the conversion uses integer ``div 1000`` — exact, and identical to
    DuckDB's nanos->micros truncation. (``events_panel``'s float ``/1000``
    is fine for its day-truncated use but can be off by ~256 ns at 2^60
    magnitudes, which matters for as-of joins and session gaps.)"""
    from pyspark.sql import types as T
    e = load_table(spark, sf_dir, "events")
    if isinstance(e.schema["ts"].dataType, T.LongType):
        e = e.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return e


def events_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Irregular panel: (user_id, day(ts), count(*)).

    The events table stores TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as a long that we
    convert to a microsecond timestamp here.
    """
    from pyspark.sql import types as T
    e = load_table(spark, sf_dir, "events")
    ts = F.col("ts")
    if isinstance(e.schema["ts"].dataType, T.LongType):
        ts = F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    return (
        e.select(F.col("user_id").alias("id"), F.date_trunc("day", ts).alias("ds"))
        # hash(id)-keyed exchange shared with the per-series stages (see
        # lineitem_panel); counts are exact integers, order-free
        .repartition(F.col("id"))
        .groupBy("id", "ds")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )


# DuckDB-SQL equivalents of the panel derivations, for oracle queries.
LINEITEM_PANEL_SQL = (
    "SELECT l_suppkey AS id, date_trunc('day', l_shipdate) AS ds, "
    "SUM(l_quantity) AS y FROM lineitem GROUP BY 1, 2"
)
ORDERS_PANEL_SQL = (
    "SELECT o_custkey AS id, date_trunc('day', o_orderdate) AS ds, "
    "SUM(o_totalprice) AS y FROM orders GROUP BY 1, 2"
)
EVENTS_PANEL_SQL = (
    "SELECT user_id AS id, date_trunc('day', ts) AS ds, "
    "CAST(COUNT(*) AS DOUBLE) AS y FROM events GROUP BY 1, 2"
)
