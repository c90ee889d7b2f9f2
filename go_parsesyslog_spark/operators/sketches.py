"""Distributed cardinality / similarity sketches.

Both sketches here are built from engine-agnostic md5 arithmetic (the
`train_val_split` / `stratified_sample` trick) instead of Spark's
built-in `approx_count_distinct`: the built-in's HLL++ register layout
is implementation-private, so no external oracle can replay it.  These
are bit-replayable in DuckDB — the APPROXIMATION itself is graded by
the driver gate, not just the plumbing (same contract as
`ann_ivf_reduced_probe` / `cosine_topk_quantized`).

Scale shape: an HLL sketch is a (group, 256-register) max-aggregate —
map-side combinable, constant state per group; a KMV signature is the
k smallest element hashes per group — a partial top-k per partition
before the shuffle.  Both reduce an arbitrarily large corpus to
KB-sized per-group state, which is the whole point at 100 TB.

Reference parity note: the reference (go-parsesyslog) has no sketch
operators; these extend the graft's training-pipeline surface
(SURVEY.md §2 "beyond-reference ops") per Flajolet et al. 2007 (HLL)
and Bar-Yossef et al. 2002 (KMV / k-minimum-values).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _md5_long(col, start: int, length: int):
    """First `length` hex chars of md5 (from 1-based `start`) as a
    non-negative long — identical in DuckDB as
    ``('0x' || substr(md5(x), start, length))::BIGINT``."""
    return F.conv(
        F.substring(F.md5(col), start, length), 16, 10
    ).cast("long")


def hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Deterministic HyperLogLog distinct-count per group (m = 256
    registers, p = 8).

    Register index = first 2 md5 hex chars (0..255); the next 8 hex
    chars form a 32-bit word w whose leading-zero rank gives the
    register value rho = 33 - bitlength(w) (33 for w == 0).  The
    estimator is the standard alpha_m * m^2 / sum(2^-M[j]) with
    linear-counting fallback when the raw estimate <= 2.5 m and empty
    registers remain (Flajolet et al. 2007).

    Every arithmetic step is engine-identical: md5 prefixes, integer
    bit lengths via the binary-string length, 2^-rho as the exactly
    rounded division 1.0 / (1 << rho) (a dyadic rational — exact in
    IEEE double, so the register sum matches DuckDB bit-for-bit), and
    the estimator itself is IEEE +,*,/ apart from ln() in the
    linear-counting branch (rounded to 2 decimals on output).

    Two map-side-combinable shuffles, both keyed on the group: the
    (group, register) max, then the 256-row-per-group fold.  Register
    state is constant per group, so skewed groups cost the same as
    uniform ones.
    """
    m = 256
    gcols = [F.col(c) for c in group_cols]
    h = F.col(value_col).cast("string")
    reg = _md5_long(h, 1, 2)
    w = _md5_long(h, 3, 8)
    # bitlength via bin(): length(bin(w)) == floor(log2 w) + 1 for
    # w > 0; DuckDB's bin() agrees.  rho in [1, 33].
    rho = F.when(w > 0, F.lit(33) - F.length(F.bin(w))).otherwise(F.lit(33))
    regs = (
        df.select(*gcols, reg.alias("_reg"), rho.alias("_rho"))
        .groupBy(*group_cols, "_reg")
        .agg(F.max("_rho").alias("_mrho"))
    )
    # 1.0 / (1 << rho): exact dyadic per-register term (SQL shiftleft —
    # the Python F.shiftleft only takes a literal shift amount)
    inv = F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), _mrho)")
    agg = regs.groupBy(*group_cols).agg(
        F.sum(inv).alias("_sum_hit"),
        F.count(F.lit(1)).alias("_n_hit"),
    )
    # absent registers hold M[j] = 0 → contribute 2^-0 = 1 each
    sum_inv = F.col("_sum_hit") + (F.lit(m) - F.col("_n_hit"))
    v_zero = (F.lit(m) - F.col("_n_hit")).cast("long")
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = F.lit(alpha * m * m) / sum_inv
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.col("_n_hit").cast("long").alias("n_registers_hit"),
        v_zero.alias("n_registers_zero"),
        F.round(est, 2).alias(out_col),
    )


def kmv_signatures(
    df: DataFrame,
    group_col: str,
    elem_col: str,
    k: int = 64,
) -> DataFrame:
    """K-minimum-values signature per group: the k smallest distinct
    md5-derived 60-bit element hashes, as a sorted array.

    The distinct + per-group bottom-k is a rank window over the
    deduplicated (group, hash) pairs — Spark runs the dedup map-side-
    combined and the rank as a partial sort per group; signature state
    is k longs per group regardless of group size.
    """
    h = _md5_long(F.col(elem_col).cast("string"), 1, 15)
    pairs = df.select(F.col(group_col), h.alias("_h")).distinct()
    wnd = Window.partitionBy(group_col).orderBy("_h")
    return (
        pairs.withColumn("_rk", F.row_number().over(wnd))
        .filter(F.col("_rk") <= k)
        .groupBy(group_col)
        .agg(F.sort_array(F.collect_list("_h")).alias("kmv_sig"))
    )


def kmv_pairwise_jaccard(
    df: DataFrame,
    group_col: str,
    elem_col: str,
    k: int = 64,
) -> DataFrame:
    """Pairwise Jaccard estimates between every pair of groups from
    their KMV signatures (Bar-Yossef et al. 2002): with T = the k
    smallest hashes of sig(A) ∪ sig(B), J(A, B) ≈ |T ∩ A ∩ B| / |T|.

    The estimator is exact integer set arithmetic over the two k-long
    arrays, so DuckDB replays it precisely (the division is one IEEE
    op).  Signatures are KB-sized; the pair comparison is a broadcast
    self-join over groups — quadratic in the number of GROUPS (the
    operator's semantics: a similarity matrix over sources/domains),
    constant in corpus size.  Output keyed ``group_a < group_b``.
    """
    sig = kmv_signatures(df, group_col, elem_col, k)
    a = sig.select(
        F.col(group_col).alias("group_a"), F.col("kmv_sig").alias("_sa")
    )
    b = sig.select(
        F.col(group_col).alias("group_b"), F.col("kmv_sig").alias("_sb")
    )
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    union_k = F.slice(
        F.array_sort(F.array_union(F.col("_sa"), F.col("_sb"))), 1, k
    )
    both = F.array_intersect(F.col("_sa"), F.col("_sb"))
    n_common = F.size(F.array_intersect(union_k, both))
    k_used = F.size(union_k)
    return pairs.select(
        "group_a",
        "group_b",
        n_common.cast("long").alias("n_common"),
        k_used.cast("long").alias("k_used"),
        F.round(n_common / k_used, 5).alias("jaccard_est"),
    )
