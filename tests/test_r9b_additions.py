"""Round-9 second-wave additions: PII redaction and the engine-portable
sketch toolkit (Bloom membership, Count-Min frequency, bottom-k sampling).

Value parity vs DuckDB is covered by the driver keys; these tests pin
semantics on handcrafted inputs where the expected answer is derivable by
hand or by an independent in-memory replay (Python ``re`` / dict math is a
third engine alongside Spark's Java regex and DuckDB's RE2)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from anofox_forecast_spark.operators import text as TX
from conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------------------
# pii_redact
# ---------------------------------------------------------------------------

def test_pii_redact_handcrafted(spark):
    df = _docs(spark, [
        (1, "mail me at jo.doe+x@corp.example.org today"),
        (2, "server 192.168.1.254 then 10.0.0.1 up"),
        (3, "call 555-867-5309 or 555.123.4567 now"),
        (4, "clean text with no identifiers at all"),
        (5, ""),
        (6, "mixed a@b.co on 8.8.8.8 tel 800-555-0199"),
    ])
    out = {r["doc_id"]: r for r in TX.pii_redact(df, "text").collect()}
    assert (out[1]["n_emails"], out[1]["n_ipv4"], out[1]["n_phones"]) == (1, 0, 0)
    assert out[1]["text_redacted"] == "mail me at <EMAIL> today"
    assert (out[2]["n_emails"], out[2]["n_ipv4"], out[2]["n_phones"]) == (0, 2, 0)
    assert out[2]["text_redacted"] == "server <IP> then <IP> up"
    assert (out[3]["n_emails"], out[3]["n_ipv4"], out[3]["n_phones"]) == (0, 0, 2)
    assert out[3]["text_redacted"] == "call <PHONE> or <PHONE> now"
    assert out[4]["n_pii"] == 0 and out[4]["text_redacted"] == out[4]["text"]
    assert out[5]["n_pii"] == 0 and out[5]["text_redacted"] == ""
    assert (out[6]["n_emails"], out[6]["n_ipv4"], out[6]["n_phones"]) == (1, 1, 1)
    assert out[6]["text_redacted"] == "mixed <EMAIL> on <IP> tel <PHONE>"


def test_pii_counts_are_independent_per_kind(spark):
    # kinds count independently on the original text: an IP-literal
    # "mailbox" is NOT an email (the TLD must be alphabetic) but its IP
    # still counts and is redacted; an alphabetic-domain email that
    # CONTAINS digits-and-dots stays a pure email
    df = _docs(spark, [(1, "ping root@10.1.2.3 asap"),
                       (2, "see a1.2b@ex.co ok")])
    out = {r["doc_id"]: r for r in TX.pii_redact(df, "text").collect()}
    assert (out[1]["n_emails"], out[1]["n_ipv4"]) == (0, 1)
    assert out[1]["text_redacted"] == "ping root@<IP> asap"
    assert (out[2]["n_emails"], out[2]["n_ipv4"]) == (1, 0)
    assert out[2]["text_redacted"] == "see <EMAIL> ok"


def test_pii_redact_python_re_replay(spark):
    """Third-engine replay: Python `re` over the sf0.001 documents with the
    same planted contact line as the driver key."""
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))
    aug = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.col("text")).otherwise(F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@mail"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".com from 10."), (F.col("doc_id") % 250).cast("string"),
            F.lit(".0."), (F.col("doc_id") % 200).cast("string"),
            F.lit(" tel 555-867-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        )).alias("text"))
    got = TX.pii_redact(aug, "text").collect()
    pats = [(k, re.compile(p), t) for k, p, t in TX.PII_PATTERNS]
    for r in got:
        txt = r["text"]
        exp_counts = {k: len(rx.findall(txt)) for k, rx, _ in pats}
        red = txt
        for _, rx, tok in pats:
            red = rx.sub(tok, red)
        assert r["n_emails"] == exp_counts["email"]
        assert r["n_ipv4"] == exp_counts["ipv4"]
        assert r["n_phones"] == exp_counts["phone"]
        assert r["n_pii"] == sum(exp_counts.values())
        assert r["text_redacted"] == red


# ---------------------------------------------------------------------------
# Bloom filter sketch
# ---------------------------------------------------------------------------

def _keys(spark, ids):
    return spark.createDataFrame([(i, str(i)) for i in ids],
                                 "id bigint, key string")


def test_bloom_no_false_negatives(spark):
    from anofox_forecast_spark.operators.stats import (bloom_contains,
                                                       bloom_registers)
    members = _keys(spark, range(0, 200, 3))
    regs = bloom_registers(members, "key", m_bits=512, k=3, seed="t")
    probed = bloom_contains(members, regs, "key", m_bits=512, k=3, seed="t")
    assert probed.filter(~F.col("bloom_maybe")).count() == 0


def test_bloom_merge_batch_invariant_and_idempotent(spark):
    from anofox_forecast_spark.operators.stats import (bloom_merge_registers,
                                                       bloom_registers)
    all_keys = _keys(spark, range(100))
    b1 = _keys(spark, range(0, 60))          # overlapping batches on
    b2 = _keys(spark, range(40, 100))        # purpose: OR is idempotent
    whole = bloom_registers(all_keys, "key", m_bits=256, k=2, seed="t")
    merged = bloom_merge_registers(
        bloom_registers(b1, "key", m_bits=256, k=2, seed="t"),
        bloom_registers(b2, "key", m_bits=256, k=2, seed="t"))
    w = {(r["bloom_word"], r["bloom_bits"]) for r in whole.collect()}
    m = {(r["bloom_word"], r["bloom_bits"]) for r in merged.collect()}
    assert w == m
    again = bloom_merge_registers(merged, merged)
    assert {(r["bloom_word"], r["bloom_bits"]) for r in again.collect()} == w


def test_bloom_null_key_probes_null(spark):
    from anofox_forecast_spark.operators.stats import (bloom_contains,
                                                       bloom_registers)
    df = spark.createDataFrame([(1, "a"), (2, None)], "id bigint, key string")
    regs = bloom_registers(df, "key", m_bits=64, k=2, seed="t")
    out = {r["id"]: r["bloom_maybe"]
           for r in bloom_contains(df, regs, "key", m_bits=64, k=2,
                                   seed="t").collect()}
    assert out[1] is True and out[2] is None


def test_bloom_stats_estimates(spark):
    from anofox_forecast_spark.operators.stats import (bloom_registers,
                                                       bloom_stats)
    n = 120
    regs = bloom_registers(_keys(spark, range(n)), "key",
                           m_bits=2048, k=4, seed="t")
    st = bloom_stats(regs, m_bits=2048, k=4).collect()[0]
    assert 0 < st["fill_ratio"] < 1
    assert abs(st["est_n_keys"] - n) / n < 0.2
    assert 0 <= st["fp_rate_est"] < 0.05


def test_bloom_validation(spark):
    from anofox_forecast_spark.operators.stats import (bloom_contains,
                                                       bloom_registers)
    df = _keys(spark, range(4))
    with pytest.raises(ValueError):
        bloom_registers(df, "key", m_bits=100, k=2)   # not a mult. of 32
    with pytest.raises(ValueError):
        bloom_registers(df, "key", m_bits=256, k=0)
    with pytest.raises(ValueError):
        bloom_contains(df, df, "key", m_bits=256, k=17)


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

def test_cm_never_underestimates_and_exact_replay(spark):
    from anofox_forecast_spark.operators.stats import (cm_estimate,
                                                       cm_registers)
    import hashlib
    rows = [(i, str(i % 13)) for i in range(400)]  # 13 keys, skewed counts
    df = spark.createDataFrame(rows, "id bigint, key string")
    W, D = 8, 3
    regs = cm_registers(df, "key", width=W, depth=D, seed="t")
    exact = df.groupBy("key").agg(F.count(F.lit(1)).alias("n_exact"))
    est = {r["key"]: (r["cm_est"], r["n_exact"])
           for r in cm_estimate(exact, regs, "key", width=W, depth=D,
                                seed="t").collect()}

    # independent dict replay of the sketch
    def col(j, k):
        h = hashlib.md5(f"t:{j}:{k}".encode()).hexdigest()
        return int(h[:15], 16) % W
    cells: dict = {}
    for _, k in rows:
        for j in range(1, D + 1):
            cells[(j, col(j, k))] = cells.get((j, col(j, k)), 0) + 1
    for k in {r[1] for r in rows}:
        want = min(cells.get((j, col(j, k)), 0) for j in range(1, D + 1))
        assert est[k][0] == want
        assert est[k][0] >= est[k][1]          # never underestimates


def test_cm_unseen_key_estimates_from_cells(spark):
    from anofox_forecast_spark.operators.stats import (cm_estimate,
                                                       cm_registers)
    df = spark.createDataFrame([(1, "a")], "id bigint, key string")
    regs = cm_registers(df, "key", width=64, depth=4, seed="t")
    probe = spark.createDataFrame([("zzz-unseen",)], "key string")
    got = cm_estimate(probe, regs, "key", width=64, depth=4,
                      seed="t").collect()[0]["cm_est"]
    assert got in (0, 1)                       # 0 unless all 4 cells collide


def test_cm_merge_disjoint_batches(spark):
    from anofox_forecast_spark.operators.stats import (cm_merge_registers,
                                                       cm_registers)
    a = spark.createDataFrame([(i, str(i % 5)) for i in range(100)],
                              "id bigint, key string")
    b = spark.createDataFrame([(i, str(i % 5)) for i in range(100, 250)],
                              "id bigint, key string")
    both = a.unionByName(b)
    whole = {(r["cm_row"], r["cm_col"]): r["cm_count"]
             for r in cm_registers(both, "key", width=16, depth=2,
                                   seed="t").collect()}
    merged = {(r["cm_row"], r["cm_col"]): r["cm_count"]
              for r in cm_merge_registers(
                  cm_registers(a, "key", width=16, depth=2, seed="t"),
                  cm_registers(b, "key", width=16, depth=2, seed="t"))
              .collect()}
    assert whole == merged


def test_cm_weighted_counts(spark):
    from anofox_forecast_spark.operators.stats import (cm_estimate,
                                                       cm_registers)
    df = spark.createDataFrame([("a", 10), ("a", 5), ("b", 2)],
                               "key string, w int")
    regs = cm_registers(df, "key", width=256, depth=4, seed="t",
                        weight_col="w")
    probe = spark.createDataFrame([("a",), ("b",)], "key string")
    got = {r["key"]: r["cm_est"]
           for r in cm_estimate(probe, regs, "key", width=256, depth=4,
                                seed="t").collect()}
    assert got["a"] >= 15 and got["b"] >= 2


def test_cm_validation(spark):
    from anofox_forecast_spark.operators.stats import cm_registers
    df = spark.createDataFrame([("a",)], "key string")
    with pytest.raises(ValueError):
        cm_registers(df, "key", width=1, depth=3)
    with pytest.raises(ValueError):
        cm_registers(df, "key", width=8, depth=0)


# ---------------------------------------------------------------------------
# Bottom-k (KMV) sample + sampled quantiles
# ---------------------------------------------------------------------------

def _vals(spark, n, g="g"):
    return spark.createDataFrame(
        [(g, f"{g}:{i}", float(i)) for i in range(n)],
        "grp string, key string, v double")


def test_bottomk_merge_equals_whole(spark):
    """min-k of a union == min-k over the batches' min-k's (the sketch
    merge property), and the selection is partitioning-invariant."""
    from anofox_forecast_spark.operators.stats import bottomk_sample
    whole = _vals(spark, 500)
    b1 = whole.filter(F.col("v") < 200)
    b2 = whole.filter(F.col("v") >= 200)
    k = 32
    direct = {r["key"] for r in
              bottomk_sample(whole, "key", ["grp"], k, "t").collect()}
    pre = bottomk_sample(b1, "key", ["grp"], k, "t") \
        .select("grp", "key", "v").unionByName(
            bottomk_sample(b2, "key", ["grp"], k, "t")
            .select("grp", "key", "v"))
    merged = {r["key"] for r in
              bottomk_sample(pre, "key", ["grp"], k, "t").collect()}
    assert direct == merged and len(direct) == k
    reparted = {r["key"] for r in
                bottomk_sample(whole.repartition(13), "key", ["grp"], k,
                               "t").collect()}
    assert reparted == direct


def test_sampled_quantiles_tracks_exact(spark):
    from anofox_forecast_spark.operators.stats import (group_quantiles,
                                                       sampled_quantiles)
    df = _vals(spark, 5000)
    approx = sampled_quantiles(df, "key", "v", ["grp"], k=256,
                               seed="t").collect()[0]
    exact = group_quantiles(df, ["grp"], "v").collect()[0]
    for q in ("q_0_25", "q_0_5", "q_0_75"):
        # sqrt(q(1-q)/k) ~ 0.03 quantile-space sd; 5 sd on a 0..5000 range
        assert abs(approx[q] - exact[q]) < 5000 * 0.16, q
    assert approx["n"] == 256


def test_sampled_quantiles_small_group_is_exact(spark):
    from anofox_forecast_spark.operators.stats import (group_quantiles,
                                                       sampled_quantiles)
    df = _vals(spark, 40)
    approx = sampled_quantiles(df, "key", "v", ["grp"], k=64,
                               seed="t").collect()[0]
    exact = group_quantiles(df, ["grp"], "v").collect()[0]
    assert approx["n"] == 40
    for q in ("q_0_25", "q_0_5", "q_0_75", "q_0_95"):
        assert approx[q] == exact[q]


def test_bottomk_validation(spark):
    from anofox_forecast_spark.operators.stats import bottomk_sample
    with pytest.raises(ValueError):
        bottomk_sample(_vals(spark, 5), "key", ["grp"], k=0)


def test_pii_redacted_text_has_no_remaining_matches(spark):
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", F.concat(
                F.col("text"), F.lit(" x@y.io 1.2.3.4 555-123-4567"))
                .alias("text")))
    red = TX.pii_redact(docs, "text")
    for _, pat, _ in TX.PII_PATTERNS:
        n = red.agg(F.sum(F.regexp_count("text_redacted", F.lit(pat)))) \
               .collect()[0][0]
        assert n == 0


# ---------------------------------------------------------------------------
# Streaming Bloom registers
# ---------------------------------------------------------------------------

def test_stream_bloom_registers_match_batch_across_batches(spark, tmp_path):
    """TWO micro-batches of a REAL stream (maxFilesPerTrigger=1) OR-fold
    into the batch sketch over the union — idempotence observed through
    the streaming state store (the batches overlap on purpose). Also
    pins bounded state: never more than m_bits/32 register rows."""
    from anofox_forecast_spark import streaming as ST
    from anofox_forecast_spark.operators.stats import (
        bloom_contains, bloom_merge_registers, bloom_registers)

    src = str(tmp_path / "src")
    b1 = spark.createDataFrame([(f"k{i}",) for i in range(80)],
                               "key string")
    b2 = spark.createDataFrame([(f"k{i}",) for i in range(40, 120)],
                               "key string")
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(b1.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    regs = ST.stream_bloom_registers(stream, "key", m_bits=512, k=3,
                                     seed="s9")
    q = (regs.writeStream.format("memory").queryName("bloom_stream_t")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = bloom_merge_registers(spark.table("bloom_stream_t"))

    whole = bloom_registers(b1.unionByName(b2), "key", m_bits=512, k=3,
                            seed="s9")
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, whole.collect()))
    assert a == b and 0 < len(a) <= 512 // 32

    probed = bloom_contains(b2, got, "key", m_bits=512, k=3, seed="s9")
    assert probed.filter(~F.col("bloom_maybe")).count() == 0


# ---------------------------------------------------------------------------
# Bloom-gated n-gram decontamination
# ---------------------------------------------------------------------------

def test_decontaminate_bloom_upper_bounds_exact(spark):
    """Bloom membership has no false negatives, so n_matched and the
    contaminated flag are SUPERSETS of the exact operator's — pinned on
    the real sf0.001 corpus at a deliberately tight geometry."""
    from anofox_forecast_spark.operators.pipeline import (
        decontaminate_ngrams, decontaminate_ngrams_bloom)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    exact = {r["doc_id"]: r for r in decontaminate_ngrams(
        docs, bench, "doc_id", "text", n=3, threshold=0.08).collect()}
    bloom = {r["doc_id"]: r for r in decontaminate_ngrams_bloom(
        docs, bench, "doc_id", "text", n=3, threshold=0.08,
        m_bits=4096, k=3).collect()}
    assert set(exact) == set(bloom)
    inflated = 0
    for i in exact:
        assert bloom[i]["n_ngrams"] == exact[i]["n_ngrams"]
        assert bloom[i]["n_matched"] >= exact[i]["n_matched"], i
        inflated += bloom[i]["n_matched"] > exact[i]["n_matched"]
        if exact[i]["contaminated"]:
            assert bloom[i]["contaminated"], i
    assert inflated > 0          # the tight geometry really produces FPs


def test_decontaminate_bloom_wide_filter_matches_exact(spark):
    """At a generous geometry (m >> bench grams) the FP rate collapses
    and the Bloom variant returns the exact answer on this corpus."""
    from anofox_forecast_spark.operators.pipeline import (
        decontaminate_ngrams, decontaminate_ngrams_bloom)
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F.col("doc_id") < 120))
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    cols = ["doc_id", "n_ngrams", "n_matched", "contamination_frac",
            "contaminated"]
    exact = sorted(map(tuple, decontaminate_ngrams(
        docs, bench, "doc_id", "text", n=3,
        threshold=0.08).select(cols).collect()))
    bloom = sorted(map(tuple, decontaminate_ngrams_bloom(
        docs, bench, "doc_id", "text", n=3, threshold=0.08,
        m_bits=262144, k=6).select(cols).collect()))
    assert exact == bloom


def test_decontaminate_bloom_empty_docs(spark):
    from anofox_forecast_spark.operators.pipeline import (
        decontaminate_ngrams_bloom)
    docs = spark.createDataFrame(
        [(1, "too short"), (2, "alpha beta gamma delta")],
        "doc_id bigint, text string")
    bench = docs.filter("doc_id = 2")
    out = {r["doc_id"]: r for r in decontaminate_ngrams_bloom(
        docs, bench, "doc_id", "text", n=3, m_bits=1024,
        k=2).collect()}
    assert out[1]["n_ngrams"] == 0 and out[1]["n_matched"] == 0
    assert not out[1]["contaminated"]
    assert out[2]["n_matched"] == out[2]["n_ngrams"] > 0


# ---------------------------------------------------------------------------
# Streaming bottom-k sample
# ---------------------------------------------------------------------------

def test_stream_bottomk_matches_batch_across_batches(spark, tmp_path):
    """TWO micro-batches of a REAL stream: the re-ranked union of the
    per-trigger emissions equals the batch bottom-k over everything
    ingested (min-k prefix-monotonicity observed through the state
    store), and per-group state never exceeds k rows."""
    from anofox_forecast_spark import streaming as ST
    from anofox_forecast_spark.operators.stats import bottomk_sample

    src = str(tmp_path / "src")
    rows1 = [("g", f"k{i}", float(i)) for i in range(150)]
    rows2 = [("g", f"k{i}", float(i)) for i in range(150, 400)]
    schema = "grp string, key string, v double"
    b1 = spark.createDataFrame(rows1, schema)
    b2 = spark.createDataFrame(rows2, schema)
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(b1.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    k = 16
    samp = ST.stream_bottomk_sample(stream, "key", "v", "grp", k=k,
                                    seed="s9")
    q = (samp.writeStream.format("memory").queryName("bk_stream_t")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)
    emitted = spark.table("bk_stream_t").distinct()

    final = {(r["key"], r["v"]) for r in bottomk_sample(
        emitted.select("grp", "key", "v"), "key", ["grp"], k,
        "s9").collect()}
    whole = {(r["key"], r["v"]) for r in bottomk_sample(
        b1.unionByName(b2), "key", ["grp"], k, "s9").collect()}
    assert final == whole and len(final) == k
    # the LAST emission (any emission) is never larger than k per group
    per_emission = emitted.groupBy("grp").count().collect()
    assert all(r["count"] <= 2 * k for r in per_emission)  # 2 triggers


def test_bloom_contains_grouped_isolation(spark):
    """Per-group filters: membership in group A's sketch must not leak
    into group B's verdicts; rows of groups with NO registers probe
    False; NULL keys probe NULL."""
    from anofox_forecast_spark.operators.stats import (bloom_contains,
                                                       bloom_registers)
    members = spark.createDataFrame(
        [("A", f"a{i}") for i in range(30)]
        + [("B", f"b{i}") for i in range(30)], "grp string, key string")
    regs = bloom_registers(members, "key", ["grp"], m_bits=1024, k=3,
                           seed="t")
    probes = spark.createDataFrame(
        [("A", "a5"), ("B", "b5"), ("B", "a5"), ("C", "a5"),
         ("A", None)], "grp string, key string")
    got = {(r["grp"], r["key"]): r["bloom_maybe"]
           for r in bloom_contains(probes, regs, "key", m_bits=1024,
                                   k=3, seed="t",
                                   group_cols=["grp"]).collect()}
    assert got[("A", "a5")] is True and got[("B", "b5")] is True
    assert got[("C", "a5")] is False          # no registers for C
    assert got[("A", None)] is None
    # cross-group: not a member of B's sketch (tiny FP chance at this
    # geometry is deterministic — pin the actual verdict via replay)
    import hashlib
    bits_b = set()
    for i in range(1, 4):
        for j in range(30):
            h = hashlib.md5(f"t:{i}:b{j}".encode()).hexdigest()
            bits_b.add(int(h[:15], 16) % 1024)
    want = all(int(hashlib.md5(f"t:{i}:a5".encode()).hexdigest()[:15], 16)
               % 1024 in bits_b for i in range(1, 4))
    assert got[("B", "a5")] == want


def test_bloom_contains_grouped_matches_ungrouped_single_group(spark):
    from anofox_forecast_spark.operators.stats import (bloom_contains,
                                                       bloom_registers)
    df = spark.createDataFrame([("g", str(i)) for i in range(50)],
                               "grp string, key string")
    probes = spark.createDataFrame(
        [("g", str(i)) for i in range(0, 100, 7)], "grp string, key string")
    rg = bloom_registers(df, "key", ["grp"], m_bits=256, k=2, seed="t")
    ru = bloom_registers(df, "key", m_bits=256, k=2, seed="t")
    a = {r["key"]: r["bloom_maybe"] for r in bloom_contains(
        probes, rg, "key", m_bits=256, k=2, seed="t",
        group_cols=["grp"]).collect()}
    b = {r["key"]: r["bloom_maybe"] for r in bloom_contains(
        probes, ru, "key", m_bits=256, k=2, seed="t").collect()}
    assert a == b


def test_stream_cm_registers_match_batch_across_batches(spark, tmp_path):
    """TWO micro-batches of a REAL stream: per-cell MAX over the
    update-mode emissions (cells are monotone running totals) equals
    the batch Count-Min sketch over the union, and estimates agree."""
    from anofox_forecast_spark import streaming as ST
    from anofox_forecast_spark.operators.stats import (
        cm_collapse_emissions, cm_estimate, cm_registers)

    src = str(tmp_path / "src")
    rows1 = [(f"k{i % 7}",) for i in range(200)]
    rows2 = [(f"k{i % 5}",) for i in range(150)]
    b1 = spark.createDataFrame(rows1, "key string")
    b2 = spark.createDataFrame(rows2, "key string")
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(b1.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    regs = ST.stream_cm_registers(stream, "key", width=8, depth=2,
                                  seed="s9")
    q = (regs.writeStream.format("memory").queryName("cm_stream_t")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = cm_collapse_emissions(spark.table("cm_stream_t"))

    whole = cm_registers(b1.unionByName(b2), "key", width=8, depth=2,
                         seed="s9")
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, whole.collect()))
    assert a == b and 0 < len(a) <= 16      # depth * width bound

    probe = spark.createDataFrame([(f"k{i}",) for i in range(7)],
                                  "key string")
    ea = sorted(map(tuple, cm_estimate(probe, got, "key", width=8,
                                       depth=2, seed="s9").collect()))
    eb = sorted(map(tuple, cm_estimate(probe, whole, "key", width=8,
                                       depth=2, seed="s9").collect()))
    assert ea == eb


def test_driver_window_is_first_fifty():
    """The grading driver checks the FIRST 50 queries() entries: the
    window must stay exactly 50, duplicate-free, and lead the dict."""
    import __spark_entry__ as e
    q = e.queries()
    assert len(e._WINDOW) == 50 == len(set(e._WINDOW))
    assert list(q)[:50] == e._WINDOW


# ---------------------------------------------------------------------------
# Salted join
# ---------------------------------------------------------------------------

def test_salted_join_equals_plain_join(spark):
    from anofox_forecast_spark.operators.stats import salted_join
    left = spark.createDataFrame(
        [(i, "hot" if i % 3 else f"k{i}") for i in range(300)],
        "id bigint, key string")
    right = spark.createDataFrame(
        [("hot", 1.0), ("k3", 2.0), ("k9", 3.0), ("unmatched", 9.0)],
        "key string, v double")
    for how in ("inner", "left"):
        a = sorted(map(tuple, salted_join(left, right, ["key"], how,
                                          salt_buckets=5)
                       .select("id", "key", "v").collect()))
        b = sorted(map(tuple, left.join(right, on=["key"], how=how)
                       .select("id", "key", "v").collect()),
                   key=lambda t: (t[0], t[1], t[2] is None, t[2]))
        a = sorted(a, key=lambda t: (t[0], t[1], t[2] is None, t[2]))
        assert a == b, how


def test_salted_join_null_keys_never_match(spark):
    from anofox_forecast_spark.operators.stats import salted_join
    left = spark.createDataFrame([(1, None), (2, "a")],
                                 "id bigint, key string")
    right = spark.createDataFrame([("a", 1.0)], "key string, v double")
    out = {r["id"]: r["v"] for r in salted_join(
        left, right, ["key"], "left", 3).collect()}
    assert out == {1: None, 2: 1.0}


def test_salted_join_validation(spark):
    from anofox_forecast_spark.operators.stats import salted_join
    df = spark.createDataFrame([(1, "a")], "id bigint, key string")
    with pytest.raises(ValueError):
        salted_join(df, df, ["key"], "right", 4)
    with pytest.raises(ValueError):
        salted_join(df, df, ["key"], "inner", 1)
    with pytest.raises(ValueError):
        salted_join(df, df, [], "inner", 4)
    bad = df.withColumnRenamed("id", "__salt")
    with pytest.raises(ValueError):
        salted_join(bad, df, ["key"], "inner", 4)


def test_salted_join_plan_salts_the_exchange(spark):
    """The physical claim: the join's shuffle keys include the salt, so
    a hot key spreads over salt_buckets reducers."""
    from anofox_forecast_spark import plans as P
    from anofox_forecast_spark.operators.stats import salted_join
    left = spark.createDataFrame([(1, "a")], "id bigint, key string")
    right = spark.createDataFrame([("a", 1.0)], "key string, v double")
    plan = P.physical_plan(
        salted_join(left, right, ["key"], "inner", 4))
    import re
    ex = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("__salt" in e and "key" in e for e in ex), plan


def test_probes_reject_grouped_or_mismatched_registers(spark):
    """Silent-corruption guards: an ungrouped probe must refuse a
    GROUPED register table (it would mix the groups), and a literal
    probe must refuse registers built at a different geometry."""
    from anofox_forecast_spark.operators.stats import (
        bloom_contains, bloom_registers, cm_estimate, cm_registers)
    df = spark.createDataFrame([("g", "a")], "grp string, key string")
    bregs = bloom_registers(df, "key", ["grp"], m_bits=64, k=2, seed="t")
    with pytest.raises(ValueError, match="group columns"):
        bloom_contains(df, bregs, "key", m_bits=64, k=2, seed="t")
    big = bloom_registers(df, "key", m_bits=1024, k=2, seed="t")
    with pytest.raises(ValueError, match="geometry"):
        bloom_contains(df, big, "key", m_bits=32, k=2, seed="t")
    cregs = cm_registers(df, "key", ["grp"], width=8, depth=2, seed="t")
    with pytest.raises(ValueError, match="group columns"):
        cm_estimate(df.select("key"), cregs, "key", width=8, depth=2,
                    seed="t")


# ---------------------------------------------------------------------------
# Overlapping chunking
# ---------------------------------------------------------------------------

def test_chunk_text_handcrafted(spark):
    from anofox_forecast_spark.operators.pipeline import chunk_text
    df = _docs(spark, [
        (1, "a b c d e f g h i j"),   # 10 tokens
        (2, "x y"),                   # one short chunk
        (3, ""),                      # no chunks
    ])
    out = chunk_text(df, "doc_id", "text", window_tokens=4,
                     overlap_tokens=1)
    got = sorted((r["doc_id"], r["chunk_index"], r["chunk_start"],
                  r["n_chunk_tokens"], r["chunk_text"])
                 for r in out.collect())
    assert got == [
        (1, 0, 1, 4, "a b c d"),
        (1, 1, 4, 4, "d e f g"),
        (1, 2, 7, 4, "g h i j"),
        (2, 0, 1, 2, "x y"),
    ]


def test_chunk_text_covers_every_token_once_per_overlap(spark):
    """Reassembling chunks (dropping each chunk's first `overlap` tokens
    after the first chunk) reconstructs the document exactly."""
    from anofox_forecast_spark.operators.pipeline import chunk_text
    import re as _re
    texts = ["one two three four five six seven eight nine ten eleven",
             "alpha beta", "solo", ""]
    df = _docs(spark, list(enumerate(texts)))
    w, o = 5, 2
    out = chunk_text(df, "doc_id", "text", w, o)
    by_doc: dict = {}
    for r in sorted(out.collect(),
                    key=lambda r: (r["doc_id"], r["chunk_index"])):
        toks = r["chunk_text"].split(" ") if r["chunk_text"] else []
        cur = by_doc.setdefault(r["doc_id"], [])
        cur.extend(toks if r["chunk_index"] == 0 else toks[o:])
    for i, t in enumerate(texts):
        want = _re.split(r"\s+", t.lower().strip()) if t.strip() else []
        assert by_doc.get(i, []) == want, i


def test_chunk_text_validation(spark):
    from anofox_forecast_spark.operators.pipeline import chunk_text
    df = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        chunk_text(df, "doc_id", "text", window_tokens=0)
    with pytest.raises(ValueError):
        chunk_text(df, "doc_id", "text", window_tokens=4,
                   overlap_tokens=4)


def test_r9b_ops_invariant_under_repartitioning(spark):
    """The determinism claim every contract key rests on: identical
    results for any input partitioning (1, 7, and 32 partitions)."""
    from anofox_forecast_spark.operators.pipeline import chunk_text
    from anofox_forecast_spark.operators.stats import (
        bloom_registers, cm_registers, salted_join, sampled_quantiles)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text", "lang",
                F.col("doc_id").cast("string").alias("key"))

    def snap(fn):
        outs = []
        for parts in (1, 7, 32):
            d = docs.repartition(parts)
            outs.append(sorted(map(tuple, fn(d).collect())))
        assert outs[0] == outs[1] == outs[2]
        assert len(outs[0]) > 0

    snap(lambda d: bloom_registers(d, "key", ["lang"], m_bits=256, k=2,
                                   seed="t"))
    snap(lambda d: cm_registers(d, "key", width=16, depth=2, seed="t"))
    snap(lambda d: sampled_quantiles(d.withColumn(
        "v", F.length("text").cast("double")), "key", "v", ["lang"],
        k=16, seed="t"))
    snap(lambda d: chunk_text(d, "doc_id", "text", 16, 4))
    dim = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    snap(lambda d: salted_join(d.select("doc_id", "lang"), dim,
                               ["lang"], "inner", 4))
