"""Repetition-based quality filtering and PII redaction for
training-corpus curation.

Both are pure Catalyst — repetition metrics ride ONE exploded-gram
shuffle keyed on the doc id (map-side-combinable counts, no join back
to the text), and PII redaction is a fixed chain of JVM ``regexp_*``
calls — so each survives a 100 TB corpus the same way any groupBy /
projection does.

Reference parity note: the reference (go-parsesyslog) has no corpus
operators; these extend the graft's training-pipeline surface per the
build brief (SURVEY.md §2 Table B "beyond-reference ops"), in the
Gopher (Rae et al. 2021, §A1.1) / C4 spirit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_2gram_max: float = 0.20,
    dup_word_max: float = 0.70,
) -> DataFrame:
    """Gopher-style repetition metrics per document, computed from ONE
    exploded (id, n, gram) pass:

    * ``n_words``            — whitespace token count
    * ``dup_word_frac``      — 1 − distinct words / total words
    * ``dup_2gram_frac``     — 1 − distinct word-2-grams / total 2-grams
    * ``top_2gram_frac``     — share of the single most frequent 2-gram
    * ``repetitive``         — the Gopher-style reject flag

    Scale shape (r6): every metric is ROW-LOCAL — a doc's word/2-gram
    multiset statistics depend on nothing outside the doc — so the
    whole computation is array expressions inside one projection: ZERO
    exchanges, linear at any corpus size.  (The r5 formulation exploded
    every gram and shuffled (id, n, gram) rows — one full corpus-sized
    exchange whose map-side combine still serialized every distinct
    gram; guide §2.4 'remove shuffles outright'.)  Distinct counts come
    from ``array_distinct``; the top-2-gram multiplicity is the longest
    equal run of the SORTED bigram array, folded with one ``aggregate``
    pass.  Fractions are the same exact integer ratios cast to double,
    so the DuckDB oracle replays them bit-for-bit.
    """
    t = F.trim(F.col(text_col))
    words = F.split(t, r"\s+")
    n_bi = F.greatest(F.size(words) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(words, F.lit(1), n_bi),
        F.slice(words, F.lit(2), n_bi),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    # longest equal run in the sorted bigram array == the max 2-gram
    # multiplicity the exploded groupBy used to compute
    is_run = lambda acc, x: acc["prev"].isNotNull() & (x == acc["prev"])  # noqa: E731
    top_run = F.aggregate(
        F.array_sort(bigrams),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(is_run(acc, x), acc["run"] + 1)
            .otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc["best"],
                F.when(is_run(acc, x), acc["run"] + 1)
                .otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    agg = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.size(words).cast("long").alias("n_words"),
        F.size(F.array_distinct(words)).cast("long")
        .alias("n_distinct_words"),
        F.size(bigrams).cast("long").alias("n_2grams"),
        F.size(F.array_distinct(bigrams)).cast("long")
        .alias("n_distinct_2grams"),
        top_run.alias("top_2gram_cnt"),
    )
    dup_word = 1.0 - F.col("n_distinct_words") / F.col("n_words")
    dup_2g = F.when(
        F.col("n_2grams") > 0,
        1.0 - F.col("n_distinct_2grams") / F.col("n_2grams"),
    ).otherwise(F.lit(0.0))
    top_2g = F.when(
        F.col("n_2grams") > 0, F.col("top_2gram_cnt") / F.col("n_2grams")
    ).otherwise(F.lit(0.0))
    return agg.select(
        id_col,
        "n_words",
        F.round(dup_word, 5).alias("dup_word_frac"),
        F.round(dup_2g, 5).alias("dup_2gram_frac"),
        F.round(top_2g, 5).alias("top_2gram_frac"),
        ((top_2g > top_2gram_max) | (dup_word > dup_word_max)).alias(
            "repetitive"
        ),
    )


# PII patterns — RE2/Java-common subset (no lookaround, no
# backreferences) so the Spark expressions and the DuckDB oracle
# compile the SAME regex.  Order matters: emails are redacted before
# the dotted/dashed digit patterns so an address's local part can't be
# re-matched, and SSN (3-2-4) before phone (3-3-4).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)

# Cheap NECESSARY-substring guard per class: a row that lacks the
# guard character cannot match the pattern (every email has '@', the
# dashed digit shapes have '-', IPv4 has '.'), so the expensive
# java.util.regex pass is skipped for it — semantics-preserving by
# construction, and on real text the overwhelming majority of rows
# skip most classes (guide §1.2 step 2: make the per-row work cheap).
_PII_GUARD = {"email": "@", "ssn": "-", "phone": "-", "ip": "."}


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Redact emails / SSNs / phone numbers / IPv4 addresses, counting
    each class as it is removed (counts are taken on the text state at
    that point in the chain, so the sequence is the spec).

    Adds ``n_<class>`` long columns and ``out_col`` with the redacted
    text.  Pure ``regexp_count`` / ``regexp_replace`` chain — whole-
    stage codegen, zero Python, no shuffle.
    """
    cur = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        g = cur.contains(_PII_GUARD[name])
        # guarded count: rows without the necessary char count 0 (NULL
        # text stays NULL, exactly as regexp_count(NULL) did)
        counts.append(
            F.when(g, F.regexp_count(cur, F.lit(pat)))
            .when(cur.isNotNull(), F.lit(0))
            .cast("long").alias(f"n_{name}")
        )
        cur = F.when(g, F.regexp_replace(cur, pat, token)).otherwise(cur)
    return df.select("*", *counts, cur.alias(out_col))


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "norm_text",
) -> DataFrame:
    """Canonical text normalization for dedup keys and training text:
    Unicode NFC → lowercase → control chars to spaces → whitespace
    collapsed → trimmed.

    Scale shape: everything except NFC is Catalyst (``lower`` +
    two JVM ``regexp_replace``); NFC itself needs Python's
    ``unicodedata``, so only rows that actually CONTAIN non-ASCII are
    routed through the Arrow-batched pandas UDF — on a mostly-ASCII
    corpus the UDF sees a sliver of the data and the hot path stays
    inside whole-stage codegen.  For pure-ASCII rows NFC is the
    identity, so the fast path is semantics-preserving, not a
    shortcut.
    """
    import unicodedata

    # lambda form: the module-level `from __future__ import annotations`
    # stringifies type hints, which pandas_udf inference rejects
    _nfc = F.pandas_udf(
        lambda s: s.map(
            lambda x: None if x is None else unicodedata.normalize("NFC", x)
        ),
        "string",
    )

    col = F.col(text_col)
    nfc = F.when(col.rlike(r"[^\x00-\x7F]"), _nfc(col)).otherwise(col)
    no_ctl = F.regexp_replace(F.lower(nfc), r"[\x00-\x1F\x7F]", " ")
    return df.withColumn(
        out_col, F.trim(F.regexp_replace(no_ctl, r"\s+", " "))
    )


def corpus_length_profile(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group corpus length distribution: doc count, mean, and
    interpolated p50/p90/p99 of character length and whitespace token
    count — the profile a curation pipeline reads before setting
    length-filter thresholds.

    Exact (not sketched) quantiles ON PURPOSE: Spark's ``percentile``
    aggregates a value→count map per group, which is bounded by the
    number of DISTINCT lengths (a few thousand values however large the
    corpus), so the exact form scales here and stays engine-replayable
    — interpolation is ``lo + (hi-lo)*frac`` on integer inputs, the
    same IEEE ops DuckDB's ``quantile_cont`` performs.  The mean is an
    exact integer sum with one final IEEE division.  One
    map-side-combinable shuffle on the group key.
    """
    t = F.trim(F.col(text_col))
    lens = df.select(
        F.col(group_col),
        F.length(text_col).cast("long").alias("_chars"),
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("long")
        .alias("_toks"),
    )

    def pcts(c: str, tag: str):
        p = F.percentile(F.col(c), F.lit([0.5, 0.9, 0.99]))
        return [
            F.round(p[0], 4).alias(f"p50_{tag}"),
            F.round(p[1], 4).alias(f"p90_{tag}"),
            F.round(p[2], 4).alias(f"p99_{tag}"),
        ]

    return lens.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.sum("_chars") / F.count(F.lit(1)), 4).alias("mean_chars"),
        *pcts("_chars", "chars"),
        *pcts("_toks", "toks"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by a tf-idf score —
    the per-doc keyword surface of a curation pipeline (topic tagging,
    filter explanations, near-dup triage).

    Score = (tf / doc_len) * (N / df): linear inverse document
    frequency rather than the textbook ln(N/df) ON PURPOSE — the
    linear form is monotone in df exactly like the log form (so the
    top-k set for a given doc differs only around idf ties) and it is
    pure IEEE +,*,/ arithmetic, which means the DuckDB oracle replays
    the ranking bit-for-bit with zero float tolerance.  Ties break on
    the term string ascending.

    Scale shape: one explode over the corpus; tf is a map-side-
    combinable groupBy(doc, term); doc lengths ride a window over the
    doc key (same partitioning as tf, no extra shuffle of the corpus);
    document frequency is a groupBy(term) on the already-collapsed
    (doc, term) pairs; N is a 1-row broadcast.  No driver-side loops,
    no Python.
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    tf = (
        df.select(F.col(id_col), F.explode(words).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    doc_w = Window.partitionBy(id_col)
    tf = tf.withColumn("doc_len", F.sum("tf").over(doc_w))
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    n_docs = df.select(
        F.countDistinct(id_col).cast("double").alias("n_docs")
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("tf") / F.col("doc_len"))
            * (F.col("n_docs") / F.col("doc_freq")),
        )
    )
    rank_w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            F.col("rank").cast("long").alias("rank"),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("doc_freq").cast("long").alias("doc_freq"),
            F.round("score", 6).alias("score"),
        )
    )
