"""Batched grouped-map execution.

``groupBy(key).applyInPandas`` crosses the JVM↔Python boundary once per
GROUP; with millions of small series the per-crossing overhead (Arrow
framing, worker dispatch, pandas construction) dominates the actual math.
This helper provides the same per-group semantics at one crossing per Arrow
BATCH: ``repartition(keys) + sortWithinPartitions(keys, order) +
mapInPandas`` with carry-buffer stitching for groups that span adjacent
batches (the sort guarantees each group is contiguous within its partition).

Used by every per-series UDF operator (forecast, stats, features, detect,
cv-forecast). Results are byte-identical to the grouped-map formulation —
same rows per group, same shuffle — only the batching changes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def shuffle_partitions(df: DataFrame) -> int:
    """``spark.sql.shuffle.partitions`` as an int, 0 when unreadable
    (e.g. ``"auto"`` under some AQE / Spark Connect setups). The single
    home for this parse — ``partition_floor`` and the forecast fold
    aggregates both gate on it, and the unreadable-conf handling must
    not drift between them (r11 advice)."""
    try:
        return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return 0


def partition_floor(df: DataFrame) -> int:
    """Partition count for a CPU-bound per-series stage: the shuffle conf
    floored at the cluster's core count. Users (and the bench) tune
    ``spark.sql.shuffle.partitions`` DOWN for small relational shuffles,
    which starves per-series Python/fold stages (r9: forecast_auto_ets
    ran ~240 s of numpy on 8 of 32 cores). Returns 0 when neither source
    is readable (e.g. ``"auto"`` shuffle conf on a Spark Connect session,
    where ``sparkContext`` is unavailable) — callers treat 0 as "leave
    the plan alone"."""
    shuffle = shuffle_partitions(df)
    try:
        cores = df.sparkSession.sparkContext.defaultParallelism
    except Exception:  # noqa: BLE001 — Spark Connect has no sparkContext
        cores = 0
    return max(shuffle, cores)


def batched_grouped_map(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    schema: T.StructType,
    one_group: Callable[[tuple, pd.DataFrame], pd.DataFrame | None],
) -> DataFrame:
    """Apply ``one_group(key_tuple, sorted_pdf)`` to every distinct
    ``key_cols`` group of ``df``; ``None`` skips the group (error
    isolation). Rows inside each group arrive sorted by ``order_col``.

    ``one_group`` may return either a ``pd.DataFrame`` or — the cheap
    columnar form (r13) — a tuple of per-column sequences in ``schema``
    field order. With the tuple form ONE pandas DataFrame is assembled
    per Arrow batch instead of one per series, which removes the
    dominant per-series overhead of the Python path (a 14-row DataFrame
    construction costs ~0.3 ms — 3x a whole SES fit after the C-twin
    work). Row content is identical either way: the legacy path
    ``pd.concat``-ed the same per-series pieces in the same order."""
    keys = list(key_cols)
    names = [f.name for f in schema.fields]

    def assemble(parts: list[tuple]) -> pd.DataFrame:
        cols = {}
        for i, nm in enumerate(names):
            pieces = [p[i] for p in parts]
            if all(isinstance(x, np.ndarray) for x in pieces):
                cols[nm] = pieces[0] if len(pieces) == 1 \
                    else np.concatenate(pieces)
            else:
                flat = []
                for x in pieces:
                    flat.extend(x)
                cols[nm] = flat
        return pd.DataFrame(cols)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                carry = None
                continue
            # hold back the trailing run — it may continue in the next batch
            kvals = [pdf[k].to_numpy() for k in keys]
            last = tuple(kv[-1] for kv in kvals)
            boundary = len(pdf)
            while boundary > 0 and all(
                    kv[boundary - 1] == lv for kv, lv in zip(kvals, last)):
                boundary -= 1
            carry = pdf.iloc[boundary:]
            done = pdf.iloc[:boundary]
            if len(done):
                out = []
                tup = []
                for kt, g in done.groupby(keys, sort=False):
                    kt = kt if isinstance(kt, tuple) else (kt,)
                    r = one_group(kt, g)
                    if r is None:
                        continue
                    if isinstance(r, tuple):
                        tup.append(r)
                    elif len(r):
                        out.append(r)
                if tup:
                    # skip all-empty assemblies (e.g. every group returned
                    # zero-length columns at h=0) — the legacy DataFrame
                    # path's len(r) guard never yielded empties, and an
                    # empty object-dtype frame would lean on Arrow's
                    # null-array coercion against the typed schema
                    adf = assemble(tup)
                    if len(adf):
                        yield adf
                if out:
                    yield pd.concat(out, ignore_index=True)
        if carry is not None and len(carry):
            kt = tuple(carry[k].iloc[0] for k in keys)
            r = one_group(kt, carry)
            if isinstance(r, tuple):
                adf = assemble([r])
                if len(adf):
                    yield adf
            elif r is not None and len(r):
                yield r

    # CPU-bound Python stage: floor the partition count at the cluster's
    # core count (see partition_floor). Results are partitioning-
    # invariant (pinned by tests); this only widens the Arrow-batch
    # fan-out.
    n_parts = partition_floor(df)
    parts = (df.repartition(n_parts, *keys) if n_parts
             else df.repartition(*keys)) \
        .sortWithinPartitions(*keys, order_col)
    return parts.mapInPandas(fn, schema)
