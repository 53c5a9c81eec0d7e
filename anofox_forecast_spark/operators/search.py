"""Keyword search over document tables: BM25 scoring and top-k retrieval.

Beyond-parity surface (BASELINE.json north star): the lexical-retrieval
counterpart of ``similarity.py``'s embedding ANN — a training-data pipeline
needs both (keyword audits of a 100 TB corpus: "find the documents about X",
contamination spot-checks, targeted sampling).

Scale design: the query has a handful of terms, so per-term term frequencies
are computed as narrow JVM array expressions fused into the scan — no
explode, no inverted-index shuffle. Corpus statistics (N, avg document
length, per-term document frequencies) reduce to ONE single-row aggregate
that is broadcast back, and top-k is a ``TakeOrderedAndProject`` (per
partition heap + driver merge), not a full sort shuffle. Net: one pass over
the corpus, zero wide shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pipeline import _words


def bm25_score(df: DataFrame, id_col: str, text_col: str,
               query_terms: list[str], k1: float = 1.2,
               b: float = 0.75) -> DataFrame:
    """BM25 score of every document against ``query_terms`` (Robertson &
    Zaragoza 2009; the Lucene ``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf,
    which is non-negative). Output: (<id>, score) for ALL documents —
    compose with a filter or use :func:`bm25_topk` for retrieval.

    Tokenization is the pipeline family's lowercased whitespace split
    (``pipeline._words``), so BM25 agrees with ``token_count`` /
    ``gopher_stats`` about what a word is.
    """
    terms = [str(t).lower() for t in query_terms]
    if not terms:
        raise ValueError("query_terms must be non-empty")
    # token array projected ONCE (r13 CSE fix): the per-term tf filters
    # below each referenced the split expression, re-running it once per
    # TERM per row
    ws = F.col("__ws")

    def tf_of(term):
        # a one-arg closure: a two-arg lambda would make F.filter pass the
        # array index as the second argument
        return F.size(F.filter(ws, lambda w: w == F.lit(term)))

    base = (df.select(F.col(id_col), _words(F.col(text_col)).alias("__ws"))
              .select(
                  F.col(id_col),
                  F.size(ws).alias("__dl"),
                  *[tf_of(t).alias(f"__tf{i}") for i, t in enumerate(terms)]))
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__dl").alias("__sumdl"),
        *[F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
          for i in range(len(terms))])
    scored = base.join(F.broadcast(stats))
    n = F.col("__n").cast("double")
    avgdl = F.col("__sumdl").cast("double") / n
    # all-empty corpus edge (r12 property-suite find): avgdl == 0 made
    # the length norm divide by zero under ANSI mode. Every dl is 0 too,
    # so the norm's limit is 0 — and every tf is 0, so the score is 0
    # regardless; the guard is value-identical whenever any doc has words.
    norm = F.when(F.col("__sumdl") > 0,
                  F.col("__dl").cast("double") / avgdl).otherwise(F.lit(0.0))
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"__tf{i}").cast("double")
        dfreq = F.col(f"__df{i}").cast("double")
        idf = F.log(F.lit(1.0) + (n - dfreq + 0.5) / (dfreq + 0.5))
        # tf == 0 always means zero contribution, but the denominator
        # tf + k1*(1-b+b*norm) can ALSO be 0 then (b=1 with a
        # zero-length doc, or the all-empty corpus above) — 0/0 is NULL
        # under default Spark and an error under ANSI. Guarding the
        # whole term on tf > 0 covers every zero-denominator case at
        # once: tf > 0 implies the denominator >= tf > 0.
        score = score + F.when(
            tf > 0,
            idf * (tf * (k1 + 1.0)
                   / (tf + k1 * (1.0 - b + b * norm)))).otherwise(F.lit(0.0))
    return scored.select(F.col(id_col), score.alias("score"))


def bm25_topk(df: DataFrame, id_col: str, text_col: str,
              query_terms: list[str], k: int = 10, k1: float = 1.2,
              b: float = 0.75) -> DataFrame:
    """Top-k documents by BM25 — ties break to the lower id. The orderBy +
    limit compiles to ``TakeOrderedAndProject`` (no full-sort shuffle)."""
    return (bm25_score(df, id_col, text_col, query_terms, k1, b)
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(int(k)))


def top_terms(df: DataFrame, group_col: str, text_col: str,
              k: int = 10) -> DataFrame:
    """Heavy-hitter terms per group (corpus vocabulary audit: "what are the
    top words per source / language?"). Output:
    (<group>, term, term_count, rank), rank 1..k per group, ties to the
    lexicographically smaller term.

    Scale shape: one explode + one count-only groupBy on (group, term) —
    high-cardinality keys, map-side combine — then a per-group top-k window
    over the (group, term)-aggregated counts (rows = vocabulary size per
    group, not corpus size)."""
    from pyspark.sql import Window
    from .pipeline import _words
    cnt = (df.select(F.col(group_col),
                     F.explode(_words(F.col(text_col))).alias("term"))
             .groupBy(group_col, "term")
             .agg(F.count(F.lit(1)).alias("term_count")))
    w = Window.partitionBy(group_col).orderBy(F.col("term_count").desc(),
                                              F.col("term"))
    return (cnt.withColumn("rank", F.row_number().over(w))
               .filter(F.col("rank") <= int(k)))


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str,
                    k: int = 5) -> DataFrame:
    """Per-document keyword extraction: the ``k`` highest tf-idf terms of
    each document. tf = in-document term count; idf = the smoothed
    ``ln((1 + N) / (1 + df)) + 1`` (sklearn's convention, always positive).
    Output: (<id>, term, tf, tfidf, rank), ties to the smaller term.

    Scale shape: one explode + (id, term) count, one (term) document-
    frequency count (count-only shuffles, never text payloads), a broadcast
    single-row N, and a per-document top-k window."""
    from pyspark.sql import Window
    from .pipeline import _words
    toks = df.select(F.col(id_col),
                     F.explode(_words(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (tf.groupBy("term")
               .agg(F.count(F.lit(1)).alias("__df")))
    n = df.agg(F.count(F.lit(1)).alias("__n"))
    idf = (F.log((F.lit(1.0) + F.col("__n").cast("double"))
                 / (F.lit(1.0) + F.col("__df").cast("double")))
           + F.lit(1.0))
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(),
                                           F.col("term"))
    return (tf.join(dfreq, "term").join(F.broadcast(n))
              .withColumn("tfidf", F.col("tf").cast("double") * idf)
              .withColumn("rank", F.row_number().over(w))
              .filter(F.col("rank") <= int(k))
              .select(id_col, "term", "tf", "tfidf", "rank"))
