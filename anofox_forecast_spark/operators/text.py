"""Text-analysis operators for large-scale training-data pipelines.

Beyond-parity surface (BASELINE.json north star): language ID, quality
scoring, token counting, and document fingerprinting over a `documents`-style
table — all pure Spark SQL expressions (regexp/length/array functions), so
the whole pipeline stays JVM-side and scales linearly with no shuffle.

Designed for 100 TB: every operator is a narrow map (no aggregation), so it
pipelines with the parquet scan; column pruning keeps the scan at the text
column plus requested passthroughs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_RE = r"\w+"
# BPE-ish pre-tokenizer: word pieces OR single non-space punctuation
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[^\w\s]"

# tiny built-in stopword profiles for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "with", "as", "his", "on", "be", "at", "by", "had", "not", "are"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht",
           "ein", "eine", "als", "auch", "auf", "aus", "bei", "nach", "wird"],
    "fr": ["le", "la", "les", "de", "et", "est", "en", "que", "une", "dans",
           "pour", "qui", "sur", "pas", "plus", "par", "avec", "sont"],
    "es": ["el", "la", "los", "las", "de", "y", "es", "en", "que", "una",
           "para", "con", "por", "del", "se", "no", "su", "como"],
    "it": ["il", "la", "di", "e", "che", "in", "un", "una", "per", "con",
           "del", "si", "non", "sono", "come", "anche", "alla", "più"],
}
LANG_PRIORITY = ["en", "de", "fr", "es", "it"]


def _words(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------

def token_count(text: Column, method: str = "whitespace") -> Column:
    """Token count column. 'whitespace' splits on runs of whitespace;
    'bpe' counts BPE-ish pre-tokens (letter runs, digit runs, punctuation)."""
    if method == "whitespace":
        return F.when(F.length(F.trim(text)) == 0, F.lit(0)) \
                .otherwise(F.size(F.split(F.trim(text), r"\s+")))
    if method == "bpe":
        return F.regexp_count(text, F.lit(BPE_RE))
    raise ValueError(f"unknown token method {method!r}")


def text_token_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Adds n_tokens_ws and n_tokens_bpe columns."""
    t = F.col(text_col)
    return (df.withColumn("n_tokens_ws", token_count(t, "whitespace"))
              .withColumn("n_tokens_bpe", token_count(t, "bpe")))


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

def text_quality(df: DataFrame, text_col: str) -> DataFrame:
    """Length / punctuation / stopword / word-length heuristics composed into
    ``quality_score`` ∈ [0,1]. All JVM-side expressions.

    The count subexpressions are projected ONCE and every ratio/score
    reads the bound columns (r13 CSE fix): composing the score straight
    from the builder expressions re-inlined ``split(trim(text))`` ~12x
    and each regexp count 3-4x into the single output Project —
    codegen's subexpression elimination does not recover it (measured
    2.5x on the bench key). CollapseProject keeps the two Projects
    separate because the aliases are non-cheap and multiply referenced.
    Ratio/score formulas are unchanged — same ops on the same values."""
    t = F.col(text_col)
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    pre = df.withColumn(
        "__tq_nc", F.length(t)).withColumn(
        "__tq_nw", token_count(t, "whitespace")).withColumn(
        "__tq_np", F.regexp_count(t, F.lit(PUNCT_RE))).withColumn(
        "__tq_na", F.regexp_count(t, F.lit(r"[A-Za-z]"))).withColumn(
        "__tq_ns", F.size(F.array_intersect(F.array_distinct(_words(t)),
                                            en_stop)))
    n_chars = F.col("__tq_nc")
    n_words = F.col("__tq_nw")
    n_punct = F.col("__tq_np")
    n_alpha = F.col("__tq_na")
    n_stop = F.col("__tq_ns")
    mean_word_len = F.when(n_words > 0, n_chars.cast("double") / n_words) \
                     .otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars) \
                   .otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, n_alpha.cast("double") / n_chars) \
                   .otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop.cast("double")
                        / F.least(n_words, F.lit(20)).cast("double")) \
                  .otherwise(F.lit(0.0))
    length_score = F.least(n_words.cast("double") / 100.0, F.lit(1.0))
    punct_score = F.when(punct_ratio <= 0.2, 1.0).otherwise(
        F.greatest(F.lit(0.0), 1.0 - (punct_ratio - 0.2) * 4.0))
    word_len_score = F.when((mean_word_len >= 3.0) & (mean_word_len <= 10.0), 1.0) \
                      .otherwise(F.lit(0.5))
    score = (0.3 * length_score + 0.2 * punct_score + 0.2 * alpha_ratio
             + 0.15 * F.least(stop_ratio * 4.0, F.lit(1.0))
             + 0.15 * word_len_score)
    return (pre.withColumn("n_chars_text", n_chars)
               .withColumn("n_words", n_words)
               .withColumn("punct_ratio", punct_ratio)
               .withColumn("alpha_ratio", alpha_ratio)
               .withColumn("stopword_ratio", stop_ratio)
               .withColumn("mean_word_len", mean_word_len)
               .withColumn("quality_score", score)
               .drop("__tq_nc", "__tq_nw", "__tq_np", "__tq_na", "__tq_ns"))


# ---------------------------------------------------------------------------
# Language identification (stopword-overlap heuristic)
# ---------------------------------------------------------------------------

def language_id(df: DataFrame, text_col: str) -> DataFrame:
    """Adds ``lang_pred`` + per-language overlap scores. Deterministic
    tie-break by LANG_PRIORITY order."""
    # the distinct-words array is projected ONCE (r13 CSE fix): inlining
    # it into each score column re-ran split(lower(trim(text))) once per
    # language per row
    out = df.withColumn("__li_words",
                        F.array_distinct(_words(F.col(text_col))))
    words = F.col("__li_words")
    for lang in LANG_PRIORITY:
        arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        out = out.withColumn(f"score_{lang}", F.size(F.array_intersect(words, arr)))
    best = F.lit("unknown")
    best_score = F.lit(0)
    # reverse order so earlier languages win ties
    for lang in reversed(LANG_PRIORITY):
        s = F.col(f"score_{lang}")
        cond = s >= best_score
        best = F.when((s > 0) & cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return out.withColumn("lang_pred", best).drop("__li_words")


# ---------------------------------------------------------------------------
# Fingerprinting
# ---------------------------------------------------------------------------

def normalize_text(text: Column) -> Column:
    """Lowercase + collapse whitespace + trim — the canonical form for
    exact-dup fingerprints."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def text_fingerprint(df: DataFrame, text_col: str) -> DataFrame:
    """Adds ``fingerprint`` = md5 of the normalized text (engine-portable,
    exact-dup key) and ``fingerprint64`` = xxhash64 (cheap 64-bit variant for
    shuffle keys)."""
    # normalized text projected once (r13 CSE fix) — the two hash columns
    # would otherwise each re-run the regexp_replace normalize per row
    pre = df.withColumn("__fp_norm", normalize_text(F.col(text_col)))
    return (pre.withColumn("fingerprint", F.md5(F.col("__fp_norm")))
               .withColumn("fingerprint64", F.xxhash64(F.col("__fp_norm")))
               .drop("__fp_norm"))


def text_analysis(df: DataFrame, text_col: str) -> DataFrame:
    """Full pipeline: tokens + quality + language + fingerprint."""
    return text_fingerprint(
        language_id(text_quality(text_token_counts(df, text_col), text_col),
                    text_col), text_col)


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: Engine-portable PII patterns (valid and equivalent under Java regex and
#: RE2 — no backreferences, no lookaround), ordered as applied.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def pii_redact(df: DataFrame, text_col: str,
               out_col: str = "text_redacted") -> DataFrame:
    """Regex PII scrubbing — the standard pre-training redaction pass
    (emails, IPv4 addresses, NANP-style phone numbers) as pure Catalyst
    ``regexp_count``/``regexp_replace`` expressions: a narrow map that
    pipelines with the parquet scan, zero shuffle, linear at 100 TB.

    Output: input + ``n_emails``, ``n_ipv4``, ``n_phones`` (match counts
    on the ORIGINAL text — kinds count independently, so an email whose
    domain is an IP literal counts under both), ``n_pii`` (their sum),
    and ``out_col`` = the text with matches replaced by ``<EMAIL>`` /
    ``<IP>`` / ``<PHONE>``, applied in that fixed order (replacement is
    sequential, so a match consumed by an earlier kind is not re-matched
    by a later one — deterministic and engine-replayable).

    The patterns avoid every Java-vs-RE2 divergence (no backreferences,
    no lookaround, no possessive quantifiers), so a DuckDB
    ``regexp_replace(..., 'g')`` replay is bit-identical.
    """
    t = F.col(text_col)
    counts = {f"n_{kind}s" if kind != "ipv4" else "n_ipv4":
              F.regexp_count(t, F.lit(pat)).cast("int")
              for kind, pat, _ in PII_PATTERNS}
    red = t
    for _, pat, token in PII_PATTERNS:
        red = F.regexp_replace(red, pat, token)
    # r13 CSE fix: n_pii sums the BOUND count columns — summing the count
    # expressions re-ran every PII regex scan a second time per row
    pre = df.withColumns(counts)
    total = None
    for name in counts:
        c = F.col(name)
        total = c if total is None else total + c
    return pre.withColumns({"n_pii": total.cast("int"), out_col: red})


def text_entropy(df: DataFrame, text_col: str) -> DataFrame:
    """Character- and word-level Shannon entropy (nats) per document —
    the classic gibberish/boilerplate signal a quality gate composes
    with :func:`text_quality`: natural prose sits around 2.8-4.2 nats of
    character entropy; base64/hex blobs run higher with a flat
    distribution, repeated boilerplate collapses toward 0. Output: input
    + ``char_entropy``, ``word_entropy``, ``n_distinct_chars``,
    ``n_distinct_words``.

    Pure JVM array expressions, zero shuffle: the frequency of each
    DISTINCT symbol is a filter-count over the symbol array (cost
    distinct x length per doc — bounded by document size, the same L^2
    bound as gopher_stats' line self-counts), and the entropy fold runs
    over the SORTED distinct symbols so the float summation order is
    deterministic and engine-replayable. The one libm call (ln) rides
    the contract's 6-decimal pin.
    """
    t = F.col(text_col)
    empty = F.array().cast("array<string>")
    # guard: sequence(1, 0) is DESCENDING [1, 0] in Spark, and the
    # module's bare split gives [''] for blank text — both must be []
    chars = F.when(F.length(t) > 0,
                   F.transform(F.sequence(F.lit(1), F.length(t)),
                               lambda i: t.substr(i, F.lit(1))))              .otherwise(empty)
    words = F.when(F.length(F.trim(t)) > 0, _words(t)).otherwise(empty)

    def entropy(arr):
        # r13: run-length fold over the SORTED array instead of a
        # filter-count per distinct symbol — O(n log n) vs O(distinct x n).
        # Value-identical to the old form: each distinct symbol's term
        # (c/n)*ln(c/n) is added once, in sorted-symbol order (the sort
        # groups equal symbols into runs, and runs flush in that same
        # order), with the same integer count, cast and division, so the
        # float accumulation sequence is bit-for-bit the old one.
        n = F.size(arr).cast("double")

        def term(c):
            cd = c.cast("double")
            return (cd / n) * F.log(cd / n)

        def step(st, x):
            return (F.when(x == st["p"],
                           F.struct(st["s"].alias("s"), st["p"].alias("p"),
                                    (st["c"] + F.lit(1).cast("bigint"))
                                     .alias("c")))
                     .otherwise(F.struct(
                         F.when(st["c"] > 0, st["s"] + term(st["c"]))
                          .otherwise(st["s"]).alias("s"),
                         x.alias("p"),
                         F.lit(1).cast("bigint").alias("c"))))

        folded = F.aggregate(
            F.array_sort(arr),
            F.struct(F.lit(0.0).alias("s"),
                     F.lit(None).cast("string").alias("p"),
                     F.lit(0).cast("bigint").alias("c")),
            step,
            lambda st: F.when(st["c"] > 0, st["s"] + term(st["c"]))
                        .otherwise(st["s"]))
        # + 0.0 normalizes the -0.0 a negated zero-sum produces
        return F.when(F.size(arr) > 0, -folded + F.lit(0.0)) \
                .otherwise(F.lit(0.0))

    # symbol arrays projected ONCE before the folds (r13 CSE fix): an
    # expression referenced inside a higher-order-function lambda is
    # re-evaluated per array element, so the per-character transform ran
    # twice per DISTINCT symbol (O(distinct x length x length) substrs);
    # bound columns make each filter pass a plain array scan
    return (df.withColumn("__chars", chars)
              .withColumn("__words", words)
              .withColumn("char_entropy", entropy(F.col("__chars")))
              .withColumn("word_entropy", entropy(F.col("__words")))
              .withColumn("n_distinct_chars",
                          F.size(F.array_distinct(F.col("__chars")))
                           .cast("bigint"))
              .withColumn("n_distinct_words",
                          F.size(F.array_distinct(F.col("__words")))
                           .cast("bigint"))
              .drop("__chars", "__words"))
