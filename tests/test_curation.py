"""Curation operators: decontamination, shard packing, stratified
sampling (operators/curation.py).  Driver-gate parity lives in
__spark_entry__ (decontaminate / pack_shards / stratified_sample
oracles); these tests pin semantics and the scale-shape claims."""

import pyspark.sql.functions as F
import pytest

from go_parsesyslog_spark.operators.curation import (
    decontaminate,
    pack_shards,
    stratified_sample,
)


def test_decontaminate_flags_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the secret benchmark answer is forty-two exactly")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # contains a 13-char substring of the benchmark verbatim
            (1, "leaked: the secret benchmark answer is hidden here"),
            (2, "completely unrelated training text with no overlap"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_contaminated_grams"]
           for r in decontaminate(docs, bench).collect()}
    assert 1 in out and out[1] > 0
    assert 2 not in out


def test_decontaminate_short_docs(spark):
    """Docs shorter than n fall back to the whole-string 'gram' on both
    engines — a short doc is flagged only on exact containment-as-gram
    equality, never errors."""
    bench = spark.createDataFrame([(0, "tiny")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "tiny"), (2, "other")], "doc_id long, text string"
    )
    out = {r["doc_id"] for r in decontaminate(docs, bench).collect()}
    assert out == {1}


@pytest.mark.parametrize("bucket_width", [1, 3, 10, 10**9])
def test_pack_shards_equals_global_window(spark, bucket_width):
    """The distributed two-phase prefix sum must equal the single-window
    formulation for ANY bucket width (incl. width 1 = one bucket per
    doc and 10^9 = everything in one bucket)."""
    rows = [(i * 7 % 97, 10 + (i * 13) % 50) for i in range(60)]
    # ids sparse + unordered input; dedupe ids
    seen, data = set(), []
    for i, t in rows:
        if i not in seen:
            seen.add(i)
            data.append((i, t))
    df = spark.createDataFrame(data, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: r["shard_idx"]
        for r in pack_shards(
            df, shard_capacity=100, bucket_width=bucket_width
        ).collect()
    }
    run = 0
    expected = {}
    for i, t in sorted(data):
        expected[i] = run // 100
        run += t
    assert got == expected


def test_pack_shards_window_is_partitioned(spark):
    """Scale shape: the per-doc cumulative window must be partitioned by
    the id bucket — a global ORDER BY window (single partition over the
    whole corpus) is exactly what this operator exists to avoid."""
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit(5).alias("n_tokens")
    )
    out = pack_shards(df, shard_capacity=50, bucket_width=100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only unpartitioned window allowed is over the tiny per-bucket
    # offsets frame (10 rows here); the doc-level window (the one
    # ordered by doc_id) must carry _bkt in its partition spec
    doc_windows = [
        ln for ln in plan.splitlines()
        if "Window" in ln and "doc_id" in ln
    ]
    assert doc_windows, plan
    assert all("windowspecdefinition(_bkt" in ln for ln in doc_windows), plan


def test_stratified_sample_rates_and_determinism(spark):
    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("source"),
    )
    kept = stratified_sample(
        df, {"a": 1.0, "b": 0.0}, strata_col="source", id_col="doc_id"
    )
    per = {r["source"]: r["n"] for r in
           kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per.get("a") == 5_000 and "b" not in per

    half = stratified_sample(
        df, {"a": 0.5, "b": 0.5}, strata_col="source", id_col="doc_id"
    )
    n = half.count()
    assert 4_500 <= n <= 5_500  # md5 buckets ≈ uniform
    # deterministic: same call → identical kept set
    s1 = {r["doc_id"] for r in half.collect()}
    s2 = {r["doc_id"] for r in half.collect()}
    assert s1 == s2


def test_stratified_sample_no_shuffle(spark):
    """Pure projection + filter — no exchange in the plan, so the rate
    filter pushes into the scan pipeline at any scale."""
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("a").alias("source")
    )
    out = stratified_sample(df, {"a": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_upsample_sources_copy_counts(spark):
    from go_parsesyslog_spark.operators.curation import upsample_sources

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "a")
        .when(F.col("id") % 3 == 1, "b")
        .otherwise("c").alias("source"),
    )
    out = upsample_sources(df, {"a": 2.5, "b": 0.0, "c": 1.0})
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # a: 334 docs x ~2.5; b dropped entirely; c exactly 1x
    assert per.get("b") is None
    assert per["c"] == 333
    assert 334 * 2 <= per["a"] <= 334 * 3
    # copy_idx is dense 0..k-1 per doc
    mx = out.filter(F.col("source") == "a").groupBy("doc_id").agg(
        F.count("*").alias("k"), F.max("copy_idx").alias("m")).collect()
    assert all(r["m"] == r["k"] - 1 for r in mx)
    # deterministic across invocations
    assert out.count() == upsample_sources(
        df, {"a": 2.5, "b": 0.0, "c": 1.0}).count()


def test_upsample_negative_factor_rejected(spark):
    from go_parsesyslog_spark.operators.curation import upsample_sources

    df = spark.range(1).select(F.col("id").alias("doc_id"),
                               F.lit("a").alias("source"))
    try:
        upsample_sources(df, {"a": -1.0})
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_deterministic_shuffle_is_permutation(spark):
    from go_parsesyslog_spark.operators.curation import deterministic_shuffle

    df = spark.range(5000).select(F.col("id").alias("doc_id"))
    out = deterministic_shuffle(df, n_shards=8).collect()
    assert len(out) == 5000
    # (shard, pos) pairs are unique and dense per shard
    pairs = {(r["shard_idx"], r["pos_in_shard"]) for r in out}
    assert len(pairs) == 5000
    from collections import Counter
    sizes = Counter(r["shard_idx"] for r in out)
    assert set(sizes) == set(range(8))
    for s, n in sizes.items():
        assert {p for sh, p in pairs if sh == s} == set(range(n))
    # same input -> identical permutation
    again = {(r["doc_id"], r["shard_idx"], r["pos_in_shard"])
             for r in deterministic_shuffle(df, n_shards=8).collect()}
    assert again == {(r["doc_id"], r["shard_idx"], r["pos_in_shard"])
                     for r in out}


def test_upsample_is_narrow(spark):
    from go_parsesyslog_spark.operators.curation import upsample_sources

    df = spark.range(100).select(F.col("id").alias("doc_id"),
                                 F.lit("a").alias("source"))
    plan = upsample_sources(df, {"a": 2.5})._jdf.queryExecution()\
        .executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_contrastive_negatives_semantics(spark):
    from go_parsesyslog_spark.operators.curation import (
        contrastive_negatives,
    )

    df = spark.createDataFrame(
        [
            (1, 10, "pos"), (1, 11, "neg"), (1, 12, "neg"), (1, 13, "neg"),
            (2, 20, "neg"),                      # no positive -> excluded
            (3, 30, "pos"),                      # positives never sampled
        ],
        "grp long, id long, label string",
    )
    out = contrastive_negatives(df, "grp", "label", "pos", 2, "id")
    rows = {(r["grp"], r["neg_id"]) for r in out.collect()}
    assert all(g == 1 for g, _ in rows)          # only grp 1 qualifies
    assert len(rows) == 2                        # k-capped
    assert (1, 10) not in rows                   # the positive itself
    # deterministic: same draw across a second run
    again = {(r["grp"], r["neg_id"]) for r in
             contrastive_negatives(df, "grp", "label", "pos", 2,
                                   "id").collect()}
    assert again == rows


def test_contrastive_negatives_one_exchange(spark):
    from go_parsesyslog_spark.operators.curation import (
        contrastive_negatives,
    )

    df = spark.createDataFrame(
        [(1, 10, "pos"), (1, 11, "neg")], "grp long, id long, label string"
    )
    plan = contrastive_negatives(df, "grp", "label", "pos", 1, "id")\
        ._jdf.queryExecution().executedPlan().toString()
    # presence flag + ranking share the group partitioning
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_contrastive_negatives_group_limit_pushdown(spark):
    from go_parsesyslog_spark.operators.curation import (
        contrastive_negatives,
    )

    df = spark.createDataFrame(
        [(1, 10, "pos"), (1, 11, "neg")], "grp long, id long, label string"
    )
    plan = contrastive_negatives(df, "grp", "label", "pos", 2, "id")\
        ._jdf.queryExecution().executedPlan().toString()
    # rank-limit pushdown truncates each group to k before the window
    assert "WindowGroupLimit" in plan, plan
