"""ANN quality evidence (round-4 VERDICT item 7): recall@k for the IVF and
LSH approximate paths against the exact brute-force cosine top-k, on seeded
clustered data (the workload shape IVF/LSH serve — near-duplicate /
neighborhood structure, not uniform noise)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

K = 10
D = 16
N_CLUSTERS = 8
PER_CLUSTER = 30


def _clustered_vectors(seed=123, spread=0.08):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((N_CLUSTERS, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(N_CLUSTERS * PER_CLUSTER):
        c = centers[i % N_CLUSTERS]
        v = c + spread * rng.standard_normal(D)
        rows.append((i, [float(x) for x in v]))
    return centers, rows


def _exact_topk(rows, q, k):
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype=float)
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    cos = V @ qn
    order = np.lexsort((ids, -cos))
    return set(ids[order[:k]].tolist())


def test_ivf_recall_at_k(spark):
    from anofox_forecast_spark.operators.similarity import cosine_topk_ivf
    centers, rows = _clustered_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    rng = np.random.default_rng(7)
    recalls = []
    for ci in range(4):
        q = centers[ci] + 0.05 * rng.standard_normal(D)
        truth = _exact_topk(rows, q, K)
        got = {r["vec_id"] for r in
               cosine_topk_ivf(df, "vec_id", "embedding",
                               [float(x) for x in q], K,
                               n_clusters=N_CLUSTERS, n_probe=4).collect()}
        recalls.append(len(got & truth) / K)
    assert np.mean(recalls) >= 0.9, recalls


def test_knn_join_lsh_recall_at_k(spark):
    from anofox_forecast_spark.operators.similarity import knn_join_lsh
    centers, rows = _clustered_vectors()
    rng = np.random.default_rng(9)
    queries = [(1000 + i,
                [float(x) for x in centers[i % N_CLUSTERS]
                 + 0.05 * rng.standard_normal(D)])
               for i in range(8)]
    left = spark.createDataFrame(queries, "qid long, embedding array<double>")
    right = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = knn_join_lsh(left, right, "qid", "vec_id", "embedding",
                       k=3, n_planes=6, n_tables=4)
    got = {}
    for r in out.collect():
        got.setdefault(r["qid"], set()).add(r["vec_id"])
    recalls = []
    for qid, q in queries:
        truth = _exact_topk(rows, np.array(q), 3)
        recalls.append(len(got.get(qid, set()) & truth) / 3)
    assert np.mean(recalls) >= 0.9, recalls


def test_pq_recall_at_k(spark):
    """PQ ADC shortlist (top-3k) must recover the exact top-k on clustered
    data — the shortlist-then-rerank pattern PQ serves in production."""
    from anofox_forecast_spark.operators.similarity import cosine_topk_pq
    centers, rows = _clustered_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    rng = np.random.default_rng(11)
    recalls = []
    for ci in range(4):
        q = centers[ci] + 0.05 * rng.standard_normal(D)
        truth = _exact_topk(rows, q, K)
        got = {r["vec_id"] for r in
               cosine_topk_pq(df, "vec_id", "embedding",
                              [float(x) for x in q], k=3 * K,
                              m=4, n_codes=16).collect()}
        recalls.append(len(truth & got) / K)
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_pq_codes_are_compact_and_reusable(spark):
    """pq_build emits m small codes per row and stored codebooks encode
    new rows without relearning (incremental ingest, like IVF)."""
    from anofox_forecast_spark.operators.similarity import pq_build
    _, rows = _clustered_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    enc, books = pq_build(df, "vec_id", "embedding", m=4, n_codes=8)
    assert len(books) == 4 and len(books[0]) == 8 and len(books[0][0]) == D // 4
    first = enc.select("__pq").first()[0]
    assert len(first) == 4 and all(0 <= c < 8 for c in first)
    # stored-codebook re-encode: identical codes, no relearn
    enc2, _ = pq_build(df, "vec_id", "embedding", codebooks=books)
    a = {r["vec_id"]: r["__pq"] for r in enc.select("vec_id", "__pq").collect()}
    b = {r["vec_id"]: r["__pq"] for r in enc2.select("vec_id", "__pq").collect()}
    assert a == b


def test_ivf_pq_recall_at_k(spark):
    """The combined index (cell pruning x code compression) still recovers
    the exact top-k via the top-3k ADC shortlist on clustered data."""
    from anofox_forecast_spark.operators.similarity import (
        ivf_pq_build,
        ivf_pq_search,
    )
    centers, rows = _clustered_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    indexed, C, books = ivf_pq_build(df, "vec_id", "embedding",
                                     n_clusters=N_CLUSTERS, m=4, n_codes=16)
    indexed = indexed.cache()
    rng = np.random.default_rng(13)
    recalls = []
    for ci in range(4):
        q = centers[ci] + 0.05 * rng.standard_normal(D)
        truth = _exact_topk(rows, q, K)
        got = {r["vec_id"] for r in
               ivf_pq_search(indexed, C, books, "vec_id",
                             [float(x) for x in q], k=3 * K,
                             n_probe=4).collect()}
        recalls.append(len(truth & got) / K)
    assert sum(recalls) / len(recalls) >= 0.9, recalls
