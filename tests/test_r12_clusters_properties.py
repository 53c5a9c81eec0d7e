"""Generative property test for dup_clusters (pointer-doubling hash-min
label propagation) vs a union-find replay on random graphs — path
chains, stars, cycles, self-loops, and disjoint blobs all arise from the
generator; the replay is classic DSU, so agreement proves the transitive
closure, not just the pairwise step. Cluster id must be the component
minimum, size the component cardinality, and exactly one canonical node
(the minimum) per component."""

from __future__ import annotations

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from anofox_forecast_spark.operators.dedup import dup_clusters

SLOW = settings(max_examples=8, deadline=None,
                suppress_health_check=list(HealthCheck))

_edges = st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                  min_size=1, max_size=40)

# a long path exercises pointer doubling's O(log diameter) claim; the
# operator's max_iter guard must not fire on a 30-node chain
_CHAIN = [(i, i + 1) for i in range(30)]
_STAR = [(0, i) for i in range(1, 12)]
_CYCLE = [(i, (i + 1) % 9) for i in range(9)] + [(20, 20)]


def _dsu(edges):
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, set] = {}
    for n in parent:
        comps.setdefault(find(n), set()).add(n)
    return {min(ns): ns for ns in comps.values()}


@SLOW
@example(edges=_CHAIN)
@example(edges=_STAR)
@example(edges=_CYCLE)
@given(edges=_edges)
def test_dup_clusters_matches_union_find(spark, edges):
    df = spark.createDataFrame([(int(a), int(b)) for a, b in edges],
                               "id_a bigint, id_b bigint")
    got = {r["id"]: r for r in dup_clusters(df).collect()}
    comps = _dsu(edges)
    assert set(got) == {n for ns in comps.values() for n in ns}
    for root, ns in comps.items():
        for n in ns:
            r = got[n]
            assert r["cluster_id"] == root, f"node {n}"
            assert r["cluster_size"] == len(ns)
            assert r["is_canonical"] == (n == root)
