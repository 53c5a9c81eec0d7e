"""Property tests for the r9b sketch toolkit: the Spark expressions vs
pure-Python replays of the IDENTICAL md5 algorithms (any expression slip
is a mismatch, not an accuracy question), plus the sketches' defining
guarantees over randomized key sets — Bloom never false-negative,
Count-Min never underestimates, bottom-k selection invariant under
arbitrary batch splits."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(max_examples=6, deadline=None,
                suppress_health_check=list(HealthCheck))

keys_strategy = st.lists(
    st.text(alphabet="abcxyz019", min_size=1, max_size=8),
    min_size=1, max_size=40)


def _bloom_bits_ref(keys, m, k, seed):
    bits = set()
    for key in keys:
        for i in range(1, k + 1):
            h = hashlib.md5(f"{seed}:{i}:{key}".encode()).hexdigest()
            bits.add(int(h[:15], 16) % m)
    return bits


@given(keys=keys_strategy)
@SLOW
def test_bloom_registers_match_python_replay(spark, keys):
    from anofox_forecast_spark.operators.stats import bloom_registers
    df = spark.createDataFrame([(x,) for x in keys], "key string")
    got = set()
    for r in bloom_registers(df, "key", m_bits=256, k=3,
                             seed="hp").collect():
        w, b = int(r["bloom_word"]), int(r["bloom_bits"])
        got |= {w * 32 + i for i in range(32) if b >> i & 1}
    assert got == _bloom_bits_ref(set(keys), 256, 3, "hp")


@given(keys=keys_strategy, probes=keys_strategy)
@SLOW
def test_bloom_probe_never_false_negative(spark, keys, probes):
    from anofox_forecast_spark.operators.stats import (bloom_contains,
                                                       bloom_registers)
    df = spark.createDataFrame([(x,) for x in keys], "key string")
    regs = bloom_registers(df, "key", m_bits=128, k=2, seed="hp")
    pr = spark.createDataFrame([(x,) for x in set(keys) | set(probes)],
                               "key string")
    got = {r["key"]: r["bloom_maybe"]
           for r in bloom_contains(pr, regs, "key", m_bits=128, k=2,
                                   seed="hp").collect()}
    for x in keys:
        assert got[x] is True          # members always probe True
    ref = _bloom_bits_ref(set(keys), 128, 2, "hp")
    for x in set(probes) - set(keys):  # non-members: exactly the bit math
        want = all(
            int(hashlib.md5(f"hp:{i}:{x}".encode()).hexdigest()[:15], 16)
            % 128 in ref for i in (1, 2))
        assert got[x] == want


@given(keys=st.lists(st.sampled_from("abcdef"), min_size=1, max_size=60))
@SLOW
def test_cm_estimate_bounds_and_replay(spark, keys):
    from anofox_forecast_spark.operators.stats import (cm_estimate,
                                                       cm_registers)
    from collections import Counter
    df = spark.createDataFrame([(x,) for x in keys], "key string")
    regs = cm_registers(df, "key", width=4, depth=2, seed="hp")
    probe = spark.createDataFrame([(x,) for x in set(keys)], "key string")
    got = {r["key"]: r["cm_est"]
           for r in cm_estimate(probe, regs, "key", width=4, depth=2,
                                seed="hp").collect()}
    exact = Counter(keys)
    cells: dict = {}
    for x in keys:
        for j in (1, 2):
            c = (j, int(hashlib.md5(
                f"hp:{j}:{x}".encode()).hexdigest()[:15], 16) % 4)
            cells[c] = cells.get(c, 0) + 1
    for x in exact:
        want = min(cells[(j, int(hashlib.md5(
            f"hp:{j}:{x}".encode()).hexdigest()[:15], 16) % 4)]
            for j in (1, 2))
        assert got[x] == want >= exact[x]


@given(vals=st.lists(st.integers(0, 10**6), min_size=1, max_size=50,
                     unique=True),
       cut=st.integers(0, 49))
@SLOW
def test_bottomk_split_invariance(spark, vals, cut):
    from anofox_forecast_spark.operators.stats import bottomk_sample
    rows = [(f"k{v}", float(v)) for v in vals]
    df = spark.createDataFrame(rows, "key string, v double")
    k = 8
    direct = {r["key"] for r in
              bottomk_sample(df, "key", [], k, "hp").collect()}
    cut = min(cut, len(rows))
    schema = "key string, v double"
    b1 = spark.createDataFrame(rows[:cut], schema)
    b2 = spark.createDataFrame(rows[cut:], schema)
    pre = (bottomk_sample(b1, "key", [], k, "hp").select("key", "v")
           .unionByName(bottomk_sample(b2, "key", [], k, "hp")
                        .select("key", "v")))
    merged = {r["key"] for r in
              bottomk_sample(pre, "key", [], k, "hp").collect()}
    assert merged == direct
