"""Repetition filtering, PII redaction (operators/quality.py) and the
int8-quantized ANN path (operators/similarity.py).  Driver-gate parity
lives in __spark_entry__ (repetition_filter / pii_redaction /
ann_quantized_topk oracles); these tests pin semantics on constructed
cases the word-soup corpus can't produce."""

import math

import pyspark.sql.functions as F

from go_parsesyslog_spark.operators.quality import (
    redact_pii,
    repetition_stats,
)
from go_parsesyslog_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_quantized,
    quantize_int8,
)


def _rep(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return repetition_stats(df).collect()[0]


def test_repetition_degenerate_doc(spark):
    # "a a a a": 4 words 1 distinct; 3 bigrams all "a a"
    r = _rep(spark, "a a a a")
    assert r["n_words"] == 4
    assert r["dup_word_frac"] == 0.75
    assert r["dup_2gram_frac"] == round(1 - 1 / 3, 5)
    assert r["top_2gram_frac"] == 1.0
    assert r["repetitive"]


def test_repetition_clean_doc(spark):
    r = _rep(spark, "every word in this sentence is unique today")
    assert r["n_words"] == 8
    assert r["dup_word_frac"] == 0.0
    assert r["dup_2gram_frac"] == 0.0
    assert r["top_2gram_frac"] == round(1 / 7, 5)
    assert not r["repetitive"]


def test_repetition_single_word(spark):
    # one word → zero bigrams → 2-gram fractions defined as 0
    r = _rep(spark, "solo")
    assert r["n_words"] == 1
    assert r["dup_2gram_frac"] == 0.0
    assert r["top_2gram_frac"] == 0.0
    assert not r["repetitive"]


def test_repetition_top_gram_threshold(spark):
    # "x y" appears 3/9 bigrams = 0.333 > 0.20 → repetitive even
    # though word dup is moderate
    r = _rep(spark, "x y a x y b x y c d")
    assert r["top_2gram_frac"] == round(3 / 9, 5)
    assert r["repetitive"]


def test_redact_pii_all_classes(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.org ssn 123-45-6789 "
             "tel 555-123-4567 host 192.168.0.1 done")],
        "doc_id long, text string",
    )
    r = redact_pii(df).collect()[0]
    assert (r["n_email"], r["n_ssn"], r["n_phone"], r["n_ip"]) == (1, 1, 1, 1)
    assert r["redacted"] == "mail <EMAIL> ssn <SSN> tel <PHONE> host <IP> done"


def test_redact_pii_order_ssn_before_phone(spark):
    # 3-2-4 must be taken by the SSN pattern, 3-3-4 by phone; neither
    # pattern may nibble the other's digits
    df = spark.createDataFrame(
        [(1, "a 111-22-3333 b 444-555-6666 c")],
        "doc_id long, text string",
    )
    r = redact_pii(df).collect()[0]
    assert r["n_ssn"] == 1 and r["n_phone"] == 1
    assert r["redacted"] == "a <SSN> b <PHONE> c"


def test_redact_pii_clean_text(spark):
    df = spark.createDataFrame(
        [(1, "no personal data here at all")], "doc_id long, text string"
    )
    r = redact_pii(df).collect()[0]
    assert (r["n_email"], r["n_ssn"], r["n_phone"], r["n_ip"]) == (0, 0, 0, 0)
    assert r["redacted"] == "no personal data here at all"


def test_quantize_int8_range_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(0, [0.5, -1.0, 0.25, 1.0]), (1, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    # max|v| elements hit exactly ±127; everything in [-127, 127]
    assert out[0]["qvec"] == [63, -127, 31, 127]
    assert all(-127 <= q <= 127 for q in out[0]["qvec"])
    # zero vector → zeros via the 1e-30 guard, no NaN/inf
    assert out[1]["qvec"] == [0, 0, 0, 0]
    assert math.isfinite(out[1]["qscale"])


def test_quantized_topk_matches_exact_on_separated_corpus(spark):
    # well-separated directions: quantization noise (< 1/127) cannot
    # reorder neighbors, so the quantized top-k must equal the exact one
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.5, 0.5, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = [r["neighbor_id"] for r in
             cosine_topk_bruteforce(emb, q, k=3).orderBy("rank").collect()]
    quant = cosine_topk_quantized(emb, q, k=3).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in quant] == exact == [1, 4, 2]
    # integer dot products are exact: vec1's max component quantizes
    # to exactly 127 (x == max|v| → q = floor(127.0) per-vector scale)
    assert quant[0]["qdot"] == 127 * 127


# ------------------------------------------------- text normalization


def test_normalize_text_nfc_and_case(spark):
    from go_parsesyslog_spark.operators.quality import normalize_text

    # "Cafe" + combining acute (NFD) must normalize to the precomposed
    # NFC form, lowercased; ASCII row must take the fast path untouched
    nfd = "Café  DU  Monde"
    rows = [(1, nfd), (2, "Plain  ASCII\tText")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["norm_text"]
           for r in normalize_text(df).collect()}
    assert out[1] == "café du monde"
    assert out[2] == "plain ascii text"


def test_normalize_text_control_chars_and_null(spark):
    from go_parsesyslog_spark.operators.quality import normalize_text

    rows = [(1, "a\x00b\x1fc\x7fd"), (2, "  x  "), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["norm_text"]
           for r in normalize_text(df).collect()}
    assert out[1] == "a b c d"
    assert out[2] == "x"
    assert out[3] is None


# ------------------------------------------------ length distribution


def test_corpus_length_profile_exact_quantiles(spark):
    from go_parsesyslog_spark.operators.quality import (
        corpus_length_profile,
    )

    # lengths 10..19 in one group: p50 of [10..19] interpolates to
    # 14.5; p90 to 18.1; p99 to 18.91; mean 14.5 exactly
    rows = [(i, "web", "x" * (10 + i)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    r = corpus_length_profile(df).collect()[0]
    assert r["n_docs"] == 10
    assert r["mean_chars"] == 14.5
    assert r["p50_chars"] == 14.5
    assert r["p90_chars"] == 18.1
    assert r["p99_chars"] == 18.91
    # "x"*n is a single token in every doc
    assert r["p50_toks"] == 1.0 and r["p99_toks"] == 1.0


def test_corpus_length_profile_empty_text_tokens(spark):
    from go_parsesyslog_spark.operators.quality import (
        corpus_length_profile,
    )

    rows = [(1, "a", ""), (2, "a", "one two three")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    r = corpus_length_profile(df).collect()[0]
    # empty text counts 0 tokens (not the split('')==[''] artifact)
    assert r["p50_toks"] == 1.5  # interpolated between 0 and 3
