"""Deterministic sketches (operators/sketches.py), exact-substring
duplication (operators/dedup.substring_dup_stats) and tf-idf top terms
(operators/quality.tfidf_top_terms).  Driver-gate parity lives in
__spark_entry__ (hll_distinct / kmv_source_jaccard /
substring_dup_stats / tfidf_top_terms oracles); these tests pin the
estimator math and edge semantics on constructed corpora."""

import math

import pyspark.sql.functions as F

from go_parsesyslog_spark.operators.dedup import substring_dup_stats
from go_parsesyslog_spark.operators.quality import tfidf_top_terms
from go_parsesyslog_spark.operators.sketches import (
    bloom_bits,
    bloom_probe,
    cms_heavy_hitters,
    cms_sketch,
    hll_distinct,
    kmv_pairwise_jaccard,
    kmv_signatures,
)


def _vals(spark, grp_to_vals):
    rows = [(g, v) for g, vs in grp_to_vals.items() for v in vs]
    return spark.createDataFrame(rows, "grp string, val string")


# ---------------------------------------------------------------- HLL


def test_hll_register_invariants(spark):
    df = _vals(spark, {"a": [f"v{i}" for i in range(50)]})
    r = hll_distinct(df, ["grp"], "val").collect()[0]
    assert r["n_registers_hit"] + r["n_registers_zero"] == 256
    assert 0 < r["n_registers_hit"] <= 50


def test_hll_small_cardinality_linear_branch(spark):
    # 40 distinct values over 256 registers: linear counting, which for
    # n << m is accurate to a few percent
    df = _vals(spark, {"a": [f"x{i}" for i in range(40)] * 3})
    r = hll_distinct(df, ["grp"], "val").collect()[0]
    assert abs(r["approx_distinct"] - 40) <= 5


def test_hll_large_cardinality_raw_branch(spark):
    # 5000 distinct >> 2.5*m: the raw HLL estimator, stderr ~= 1.04 /
    # sqrt(256) = 6.5%; allow 4 sigma
    df = _vals(spark, {"a": [f"k{i}" for i in range(5000)]})
    r = hll_distinct(df, ["grp"], "val").collect()[0]
    assert r["n_registers_zero"] == 0 or r["approx_distinct"] > 640
    assert abs(r["approx_distinct"] - 5000) / 5000 < 0.26


def test_hll_duplicates_dont_move_the_estimate(spark):
    once = _vals(spark, {"a": [f"d{i}" for i in range(300)]})
    thrice = _vals(spark, {"a": [f"d{i}" for i in range(300)] * 3})
    e1 = hll_distinct(once, ["grp"], "val").collect()[0]["approx_distinct"]
    e3 = hll_distinct(thrice, ["grp"], "val").collect()[0]["approx_distinct"]
    assert e1 == e3


def test_hll_partitioning_invariant(spark):
    # the register sum is an exact dyadic-rational fold, so the result
    # is bit-identical under any partitioning / aggregation order
    df = _vals(spark, {"a": [f"p{i}" for i in range(1000)]})
    e1 = hll_distinct(df.coalesce(1), ["grp"], "val").collect()[0]
    e8 = hll_distinct(df.repartition(8), ["grp"], "val").collect()[0]
    assert e1["approx_distinct"] == e8["approx_distinct"]


def test_hll_multi_group(spark):
    df = _vals(
        spark,
        {"a": [f"g{i}" for i in range(20)], "b": [f"g{i}" for i in range(200)]},
    )
    out = {
        r["grp"]: r["approx_distinct"]
        for r in hll_distinct(df, ["grp"], "val").collect()
    }
    assert abs(out["a"] - 20) <= 4
    assert abs(out["b"] - 200) / 200 < 0.2


# ---------------------------------------------------------------- KMV


def test_kmv_signature_shape(spark):
    df = _vals(spark, {"a": [f"s{i}" for i in range(100)]})
    sig = kmv_signatures(df, "grp", "val", k=16).collect()[0]["kmv_sig"]
    assert len(sig) == 16
    assert sig == sorted(sig)
    assert len(set(sig)) == 16


def test_kmv_exact_when_k_covers_union(spark):
    # A = {0..99}, B = {50..149}: J = 50/150; k=256 >= |union| makes
    # the bottom-k estimator EXACT
    df = _vals(
        spark,
        {
            "A": [f"e{i}" for i in range(100)],
            "B": [f"e{i}" for i in range(50, 150)],
        },
    )
    r = kmv_pairwise_jaccard(df, "grp", "val", k=256).collect()[0]
    assert (r["group_a"], r["group_b"]) == ("A", "B")
    assert r["k_used"] == 150
    assert r["n_common"] == 50
    assert r["jaccard_est"] == round(50 / 150, 5)


def test_kmv_estimate_under_subsampling(spark):
    # k=64 < |union|=150: still an unbiased estimate of 1/3; the
    # hypergeometric 4-sigma band at k=64 is ~0.24
    df = _vals(
        spark,
        {
            "A": [f"e{i}" for i in range(100)],
            "B": [f"e{i}" for i in range(50, 150)],
        },
    )
    r = kmv_pairwise_jaccard(df, "grp", "val", k=64).collect()[0]
    assert r["k_used"] == 64
    assert abs(r["jaccard_est"] - 1 / 3) < 0.25


def test_kmv_disjoint_and_identical(spark):
    df = _vals(
        spark,
        {
            "A": ["x1", "x2", "x3"],
            "B": ["y1", "y2"],
            "C": ["x1", "x2", "x3"],
        },
    )
    out = {
        (r["group_a"], r["group_b"]): r["jaccard_est"]
        for r in kmv_pairwise_jaccard(df, "grp", "val", k=8).collect()
    }
    assert out[("A", "B")] == 0.0
    assert out[("A", "C")] == 1.0


# --------------------------------------------- substring duplication


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_substring_self_repeat_all_dup(spark):
    # 100 identical chars: every 40-char window is identical
    out = substring_dup_stats(
        _docs(spark, [(1, "a" * 100)]), window=40, stride=10
    ).collect()[0]
    assert out["n_windows"] == 7  # positions 1,11,...,61
    assert out["n_dup_windows"] == 7
    assert out["dup_frac"] == 1.0


def test_substring_cross_doc_dup(spark):
    shared = "The quick brown fox jumps over the lazy dog now."  # 48ch
    a = shared + " unique tail alpha " + "q" * 30
    b = "different head beta " + shared
    rows = [(1, a), (2, b), (3, "z" * 39), (4, "m n o p " * 20)]
    out = {
        r["doc_id"]: r
        for r in substring_dup_stats(
            _docs(spark, rows), window=40, stride=10
        ).collect()
    }
    # doc 3 is shorter than the window: zero windows, frac 0
    assert out[3]["n_windows"] == 0 and out[3]["dup_frac"] == 0.0
    # docs 1 and 2 each contain the shared sentence at stride-aligned
    # offsets only if alignment matches; doc 1 window at pos 1 is
    # shared[0:40], doc 2 has it at pos 21 (1-based) -> pos 21 IS on
    # the stride grid (1, 11, 21, ...), so both emit that window
    assert out[1]["n_dup_windows"] >= 1
    assert out[2]["n_dup_windows"] >= 1
    # the periodic doc 4 ("m n o p " * 20, period 8 divides stride 10x4
    # -> every window at stride 40 apart repeats) has internal dups
    assert out[4]["n_dup_windows"] > 0
    assert all(r["n_windows"] >= r["n_dup_windows"] for r in out.values())


def test_substring_unique_doc_no_dup(spark):
    import string

    # aperiodic text with no repeated 40-gram
    txt = " ".join(f"{w}{i}" for i, w in enumerate(string.ascii_lowercase))
    out = substring_dup_stats(
        _docs(spark, [(1, txt)]), window=40, stride=10
    ).collect()[0]
    assert out["n_windows"] > 0
    assert out["n_dup_windows"] == 0
    assert out["dup_frac"] == 0.0


# --------------------------------------------------------------- CMS


def test_cms_sketch_mass_conservation(spark):
    # each of the depth rows holds every element once: per-row counter
    # sum == stream length
    df = _vals(spark, {"a": [f"t{i % 7}" for i in range(100)]})
    rows = cms_sketch(df, "val", depth=4, width=32).collect()
    per_row = {}
    for r in rows:
        per_row[r["row"]] = per_row.get(r["row"], 0) + r["cnt"]
    assert per_row == {0: 100, 1: 100, 2: 100, 3: 100}


def test_cms_never_undercounts_and_exact_when_wide(spark):
    freqs = {"alpha": 50, "beta": 30, "gamma": 5, "delta": 1}
    vals = [w for w, n in freqs.items() for _ in range(n)]
    df = _vals(spark, {"a": vals})
    out = cms_heavy_hitters(df, "val", k=10, depth=4, width=4096).collect()
    got = {r["val"]: r for r in out}
    # wide sketch, 4 elements: no collisions -> estimates exact
    for w, n in freqs.items():
        assert got[w]["cms_est"] == n
        assert got[w]["overcount"] == 0
    assert [r["val"] for r in sorted(out, key=lambda r: r["rank"])][:2] == [
        "alpha",
        "beta",
    ]


def test_cms_overcount_is_one_sided(spark):
    # width 4 with 40 distinct elements: collisions guaranteed, but CMS
    # must never undercount
    df = _vals(spark, {"a": [f"c{i % 40}" for i in range(400)]})
    out = cms_heavy_hitters(df, "val", k=40, depth=2, width=4).collect()
    assert len(out) == 40
    assert all(r["cms_est"] >= r["exact_cnt"] for r in out)
    assert any(r["overcount"] > 0 for r in out)


def test_cms_partitioning_invariant(spark):
    df = _vals(spark, {"a": [f"w{i % 13}" for i in range(260)]})
    a = cms_heavy_hitters(df.coalesce(1), "val", k=5, width=64).collect()
    b = cms_heavy_hitters(df.repartition(8), "val", k=5, width=64).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ------------------------------------------------------------- Bloom


def test_bloom_no_false_negatives(spark):
    members = _vals(spark, {"a": [f"m{i}" for i in range(200)]})
    bits = bloom_bits(members, "val", m=1024, k=5)
    probes = spark.createDataFrame(
        [(i, f"m{i}") for i in range(200)], "id long, val string"
    )
    out = bloom_probe(probes, bits, "val", m=1024, k=5).collect()
    assert len(out) == 200
    assert all(r["bloom_hit"] for r in out)


def test_bloom_rejects_most_non_members(spark):
    # m=4096, k=5, |S|=100 -> fill ~0.115, FP rate ~2e-5: all 500
    # non-members must miss (any hit here would be a >1% tail event)
    members = _vals(spark, {"a": [f"m{i}" for i in range(100)]})
    bits = bloom_bits(members, "val", m=4096, k=5)
    probes = spark.createDataFrame(
        [(i, f"other{i}") for i in range(500)], "id long, val string"
    )
    out = bloom_probe(probes, bits, "val", m=4096, k=5).collect()
    hits = sum(1 for r in out if r["bloom_hit"])
    assert hits == 0


def test_bloom_tiny_filter_has_false_positives(spark):
    # m=16, k=2 saturates with 50 members: probing disjoint elements
    # MUST produce false positives (the documented trade), proving the
    # probe really is a bit test and not a hidden exact join
    members = _vals(spark, {"a": [f"m{i}" for i in range(50)]})
    bits = bloom_bits(members, "val", m=16, k=2)
    probes = spark.createDataFrame(
        [(i, f"z{i}") for i in range(100)], "id long, val string"
    )
    out = bloom_probe(probes, bits, "val", m=16, k=2).collect()
    assert sum(1 for r in out if r["bloom_hit"]) > 50


def test_bloom_bits_bounded(spark):
    members = _vals(spark, {"a": [f"m{i}" for i in range(10000)]})
    bits = bloom_bits(members, "val", m=256, k=5).collect()
    assert len(bits) <= 256
    assert all(0 <= r["bit"] < 256 for r in bits)


# ------------------------------------------------------------- tfidf


def test_tfidf_planted_term_ranks_first(spark):
    rows = [
        (1, "common words everywhere zebra zebra zebra"),
        (2, "common words everywhere filler filler"),
        (3, "common words everywhere padding padding"),
    ]
    out = tfidf_top_terms(_docs(spark, rows), k=1).collect()
    top = {r["doc_id"]: r for r in out}
    assert top[1]["term"] == "zebra"
    assert top[1]["rank"] == 1
    assert top[1]["tf"] == 3 and top[1]["doc_freq"] == 1
    # score = (3/6) * (3/1) = 1.5
    assert top[1]["score"] == 1.5


def test_tfidf_tie_breaks_on_term(spark):
    # two terms with identical tf and df in the same doc: rank by term
    rows = [(1, "bb aa"), (2, "cc dd")]
    out = [
        r
        for r in tfidf_top_terms(_docs(spark, rows), k=2).collect()
        if r["doc_id"] == 1
    ]
    out.sort(key=lambda r: r["rank"])
    assert [r["term"] for r in out] == ["aa", "bb"]


def test_tfidf_k_bound(spark):
    rows = [(1, "one two three four five six")]
    out = tfidf_top_terms(_docs(spark, rows), k=3).collect()
    assert len(out) == 3
    assert sorted(r["rank"] for r in out) == [1, 2, 3]
