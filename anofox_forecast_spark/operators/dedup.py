"""Deduplication operators for large-scale training-data pipelines.

Beyond-parity surface (BASELINE.json north star). Five families:

- **exact** — hash-groupBy on a normalized fingerprint. One shuffle on the
  md5 key; survivor = min id per group.
- **n-gram Jaccard** — character-shingle sets, shingle-inverted-index join,
  Jaccard from co-occurrence counts. All Spark SQL.
- **MinHash + LSH** — k permutation-free min-hashes (xxhash64 with per-hash
  salt), banded into LSH buckets; candidate pairs verified with true Jaccard.
  The classic shingle→minhash→band→bucket-join pipeline; shuffles only on
  band keys (small) and candidate pairs.
- **SimHash** — 64-bit weighted-bit-vote fingerprint; candidates share one of
  four 16-bit chunks (guarantees recall for hamming distance ≤ 3 by pigeonhole
  over 4 chunks); verified with bit_count(xor) ≤ max_hamming.
- **embedding cosine** — near-dup via normalized-vector dot product; LSH
  random-hyperplane bucketing as the scale path (see similarity.py).

At 100 TB the bucket-join pattern is the only viable shape: no operator here
ever materializes the full pairwise cross product; candidates are generated
by co-grouping on short keys and verified pairwise within buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import normalize_text


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one row (min id) per normalized-text fingerprint.
    Output: input columns + ``fingerprint`` + ``dup_count``."""
    from pyspark.sql import Window
    fp = F.md5(normalize_text(F.col(text_col)))
    w = Window.partitionBy("fingerprint")
    wo = Window.partitionBy("fingerprint").orderBy(id_col)
    return (df.withColumn("fingerprint", fp)
              .withColumn("dup_count", F.count(F.lit(1)).over(w))
              .withColumn("__rn", F.row_number().over(wo))
              .filter(F.col("__rn") == 1).drop("__rn"))


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Duplicate-group report: (fingerprint, dup_count, keep_id) for groups
    with more than one member."""
    fp = F.md5(normalize_text(F.col(text_col)))
    return (df.withColumn("fingerprint", fp)
              .groupBy("fingerprint")
              .agg(F.count(F.lit(1)).alias("dup_count"),
                   F.min(id_col).alias("keep_id"))
              .filter(F.col("dup_count") > 1))


# ---------------------------------------------------------------------------
# Character shingles
# ---------------------------------------------------------------------------

def shingles(text: Column, n: int = 3) -> Column:
    """Distinct character n-grams of the normalized text (array<string>)."""
    norm = normalize_text(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1))),
            lambda i: norm.substr(i, F.lit(n))))


def _shingle_df(df: DataFrame, id_col: str, text_col: str, n: int):
    return df.select(F.col(id_col).alias("__id"),
                     shingles(F.col(text_col), n).alias("__sh"))


# ---------------------------------------------------------------------------
# n-gram Jaccard pairs
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str, n: int = 3,
                        threshold: float = 0.8,
                        max_doc_freq: int | None = 10_000) -> DataFrame:
    """All pairs (id_a < id_b) with character-n-gram Jaccard ≥ threshold.
    Output: (id_a, id_b, jaccard).

    Inverted-index join on shingles: |A∩B| from co-occurrence counts,
    |A∪B| = |A|+|B|−|A∩B|. Shuffles on shingle then on the pair key —
    never a cross product.

    ``max_doc_freq`` caps posting-list length: a shingle present in more than
    that many documents is dropped from the index BEFORE the self-join (a
    posting list of length L expands to ~L²/2 candidate pairs, so one
    corpus-wide shingle would make the join quadratic in the corpus). Union
    sizes stay exact, so capped pairs can only *under*-estimate Jaccard —
    bounded recall loss, the standard stop-shingle tradeoff. Pass ``None``
    to disable (exact, small data only).
    """
    sh = _shingle_df(df, id_col, text_col, n)
    sizes = sh.select(F.col("__id"), F.size("__sh").alias("__sz"))
    inv = sh.select("__id", F.explode("__sh").alias("__s"))
    if max_doc_freq is not None:
        keep = (inv.groupBy("__s")
                   .agg(F.count(F.lit(1)).alias("__df"))
                   .filter(F.col("__df") <= int(max_doc_freq))
                   .select("__s"))
        # same join key as the self-join below → Catalyst reuses the
        # shuffle-on-__s partitioning; no extra wide stage
        inv = inv.join(keep, "__s")
    a = inv.select(F.col("__id").alias("id_a"), "__s")
    b = inv.select(F.col("__id").alias("id_b"), "__s")
    pairs = (a.join(b, "__s").filter(F.col("id_a") < F.col("id_b"))
              .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("__common")))
    sz_a = sizes.select(F.col("__id").alias("id_a"), F.col("__sz").alias("__sza"))
    sz_b = sizes.select(F.col("__id").alias("id_b"), F.col("__sz").alias("__szb"))
    out = (pairs.join(sz_a, "id_a").join(sz_b, "id_b")
           .withColumn("jaccard",
                       F.col("__common").cast("double")
                       / (F.col("__sza") + F.col("__szb") - F.col("__common")))
           .filter(F.col("jaccard") >= float(threshold))
           .select("id_a", "id_b", "jaccard"))
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(sh: Column, num_hashes: int = 64) -> Column:
    """array<bigint> of per-salt minimum xxhash64 over the shingle set."""
    sigs = [
        F.array_min(F.transform(sh, lambda s, i=i: F.xxhash64(s, F.lit(i))))
        for i in range(num_hashes)
    ]
    return F.array(*sigs)


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      num_hashes: int = 64, bands: int = 16, shingle_n: int = 3,
                      threshold: float = 0.7) -> DataFrame:
    """Near-dup pairs via MinHash-LSH: (id_a, id_b, est_jaccard, jaccard).

    ``est_jaccard`` = fraction of equal signature components;
    ``jaccard`` = exact verification on the shingle sets of candidates only.
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    sh = _shingle_df(df, id_col, text_col, shingle_n)
    sig = sh.withColumn("__sig", minhash_signature(F.col("__sh"), num_hashes))
    # band keys: hash of each signature slice
    band_rows = sig.select(
        "__id", "__sig", "__sh",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.xxhash64(F.concat_ws(",", *[
                         F.element_at(F.col("__sig"), b * r + j + 1).cast("string")
                         for j in range(r)])).alias("key"))
            for b in range(bands)])).alias("__b"))
    band_rows = band_rows.select("__id", "__sig", "__sh",
                                 F.col("__b.band").alias("__band"),
                                 F.col("__b.key").alias("__key"))
    left = band_rows.select(F.col("__id").alias("id_a"),
                            F.col("__sig").alias("__sig_a"),
                            F.col("__sh").alias("__sh_a"), "__band", "__key")
    right = band_rows.select(F.col("__id").alias("id_b"),
                             F.col("__sig").alias("__sig_b"),
                             F.col("__sh").alias("__sh_b"), "__band", "__key")
    cands = (left.join(right, ["__band", "__key"])
             .filter(F.col("id_a") < F.col("id_b"))
             .dropDuplicates(["id_a", "id_b"]))
    est = (F.size(F.filter(F.zip_with(F.col("__sig_a"), F.col("__sig_b"),
                                      lambda x, y: (x == y).cast("int")),
                           lambda v: v == 1)).cast("double") / num_hashes)
    inter = F.size(F.array_intersect(F.col("__sh_a"), F.col("__sh_b")))
    union = (F.size(F.col("__sh_a")) + F.size(F.col("__sh_b")) - inter)
    out = (cands.withColumn("est_jaccard", est)
           .withColumn("jaccard", inter.cast("double") / union)
           .filter(F.col("jaccard") >= float(threshold))
           .select("id_a", "id_b", "est_jaccard", "jaccard"))
    return out


def minhash_lsh_dedup(df: DataFrame, id_col: str, text_col: str,
                      **kwargs) -> DataFrame:
    """Drop near-duplicates: for every verified pair keep the smaller id.
    Connected components are approximated by one pruning round (pair→drop
    larger id), which removes every doc that duplicates a kept doc."""
    pairs = minhash_lsh_pairs(df, id_col, text_col, **kwargs)
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drops, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(text: Column, shingle_n: int = 3) -> Column:
    """64-bit SimHash (bigint) from character shingles: per-bit weighted vote
    over xxhash64(shingle) bits."""
    norm = normalize_text(text)
    sh = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(norm) - (shingle_n - 1), F.lit(1))),
            lambda i: norm.substr(i, F.lit(shingle_n))))
    hashes = F.transform(sh, lambda s: F.xxhash64(s))

    def _vote(bv: int):
        return F.aggregate(
            hashes, F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(bv)) != 0, 1)
                                  .otherwise(-1))

    bits = []
    for b in range(64):
        bitval = (1 << b) if b < 63 else -(2 ** 63)  # bit 63 is the sign bit
        bits.append(F.when(_vote(bitval) > 0, F.lit(bitval).cast("long"))
                     .otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def simhash_pairs(df: DataFrame, id_col: str, text_col: str,
                  max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share one of four 16-bit chunks
    (pigeonhole ⇒ full recall at hamming ≤ 3); verified with
    bit_count(a XOR b) ≤ max_hamming. Output (id_a, id_b, hamming)."""
    base = df.select(F.col(id_col).alias("__id"),
                     simhash(F.col(text_col)).alias("__sh"))
    chunks = base.select(
        "__id", "__sh",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.shiftrightunsigned(F.col("__sh"), c * 16)
                      .bitwiseAND(F.lit(0xFFFF)).alias("key"))
            for c in range(4)])).alias("__c"))
    chunks = chunks.select("__id", "__sh", F.col("__c.chunk").alias("__chunk"),
                           F.col("__c.key").alias("__key"))
    left = chunks.select(F.col("__id").alias("id_a"),
                         F.col("__sh").alias("__sa"), "__chunk", "__key")
    right = chunks.select(F.col("__id").alias("id_b"),
                          F.col("__sh").alias("__sb"), "__chunk", "__key")
    cands = (left.join(right, ["__chunk", "__key"])
             .filter(F.col("id_a") < F.col("id_b"))
             .dropDuplicates(["id_a", "id_b"]))
    hamming = F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb")))
    return (cands.withColumn("hamming", hamming)
            .filter(F.col("hamming") <= int(max_hamming))
            .select("id_a", "id_b", "hamming"))


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_cosine_pairs(df: DataFrame, id_col: str, vec_col: str,
                           threshold: float = 0.95,
                           n_planes: int = 12) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold.

    Scale path: random-hyperplane LSH — sign-bit signature over ``n_planes``
    deterministic pseudo-random hyperplanes (seeded per plane from the
    dimension index via a hash — no RNG state needed on executors), bucket
    join on the signature, exact cosine verification within buckets.
    """
    dim_probe = df.select(F.size(F.col(vec_col)).alias("d")).first()
    d = int(dim_probe["d"])
    import numpy as np
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((n_planes, d))
    norm = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0),
                              lambda a, x: a + x.cast("double") * x.cast("double")))
    unit = F.transform(F.col(vec_col), lambda x: x.cast("double") / norm)
    base = df.select(F.col(id_col).alias("__id"), unit.alias("__v")) \
             .filter(norm > 0)
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(float(planes[p, j])) for j in range(d)])
        dot = F.aggregate(F.zip_with(F.col("__v"), plane, lambda a, b: a * b),
                          F.lit(0.0), lambda a, x: a + x)
        sig = sig.bitwiseOR(F.when(dot > 0, F.lit(2 ** p).cast("long"))
                             .otherwise(F.lit(0).cast("long")))
    bucketed = base.withColumn("__sig", sig)
    left = bucketed.select(F.col("__id").alias("id_a"),
                           F.col("__v").alias("__va"), "__sig")
    right = bucketed.select(F.col("__id").alias("id_b"),
                            F.col("__v").alias("__vb"), "__sig")
    cos = F.aggregate(F.zip_with(F.col("__va"), F.col("__vb"), lambda a, b: a * b),
                      F.lit(0.0), lambda a, x: a + x)
    return (left.join(right, "__sig").filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", cos)
            .filter(F.col("cosine") >= float(threshold))
            .select("id_a", "id_b", "cosine"))


def embedding_cosine_pairs_exact(df: DataFrame, id_col: str, vec_col: str,
                                 threshold: float = 0.95) -> DataFrame:
    """Brute-force verification baseline (for correctness oracles and small
    tables): full self-join. O(n²) — do not use at scale."""
    norm = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0),
                              lambda a, x: a + x.cast("double") * x.cast("double")))
    unit = F.transform(F.col(vec_col), lambda x: x.cast("double") / norm)
    base = df.select(F.col(id_col).alias("__id"), unit.alias("__v")).filter(norm > 0)
    left = base.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"))
    right = base.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"))
    cos = F.aggregate(F.zip_with(F.col("__va"), F.col("__vb"), lambda a, b: a * b),
                      F.lit(0.0), lambda a, x: a + x)
    return (left.crossJoin(right).filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine", cos)
            .filter(F.col("cosine") >= float(threshold))
            .select("id_a", "id_b", "cosine"))
