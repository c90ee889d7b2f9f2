"""Scale stress evidence for the grouping-analytics family
(operators/grouping.py) and the one-pass profiler/checker
(operators/checks.py): the Expand-based plans at tens of millions of
rows, with exact-count asserts, including the hot-key profile the
rollup shuffle must survive.

* ``hierarchy_rollup`` — 24M rows over a (type x day) hierarchy where
  ONE type owns ~50% of the corpus (the hot-sink profile): every level
  of the rollup is asserted arithmetically (leaf counts, per-type
  subtotals, the 24M grand total).  The Expand triples the rows before
  the partial aggregate; map-side combine must collapse them to the
  tiny level key space BEFORE the exchange — wall time is the
  evidence.
* ``pivot_wide`` — same corpus reshaped to one wide row per key with
  per-type conditional counts; row count and two spot cells asserted.
* ``check_constraints`` / ``profile_table`` — five row-local
  constraints + a uniqueness + per-column profile over the same 24M
  rows; violation counts and distinct counts asserted exactly
  (arithmetic corpus => closed-form answers).

Checks are hard asserts, not just timings.  Writes one JSON line; run:
    python tools/stress_grouping.py [n_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000

    from pyspark.sql import functions as F

    from go_parsesyslog_spark.operators.checks import (
        check_constraints,
        profile_table,
    )
    from go_parsesyslog_spark.operators.grouping import (
        hierarchy_rollup,
        pivot_wide,
    )
    from go_parsesyslog_spark.session import get_spark

    spark = get_spark(app_name="gps_stress_grouping")
    out: dict = {"n_rows": n}

    # hot-key corpus: id%2==0 -> type 't0' (half the corpus); the rest
    # spread over t1..t7; day = id % 30.  All counts closed-form.
    df = (
        spark.range(n)
        .select(
            F.col("id"),
            F.when(F.col("id") % 2 == 0, F.lit("t0"))
            .otherwise(F.concat(F.lit("t"),
                                (F.col("id") % 7 + 1).cast("string")))
            .alias("typ"),
            (F.col("id") % 30).cast("long").alias("day"),
        )
    )

    # JVM/codegen warmup outside every timed window (the first action
    # otherwise pays session startup and poisons the smallest timing)
    df.count()

    # ---- rollup under the hot sink ------------------------------------
    t0 = time.time()
    levels = {
        (r["typ"], r["day"], r["grouping_id"]): r["n"]
        for r in hierarchy_rollup(
            df, ["typ", "day"], {"n": F.count(F.lit(1)).cast("long")}
        ).collect()
    }
    dt = time.time() - t0
    out["rollup_sec"] = round(dt, 2)
    out["rollup_rows_per_sec"] = int(n / dt)
    assert levels[("ALL", "ALL", 3)] == n
    assert levels[("t0", "ALL", 1)] == n // 2
    # odd ids with id%7==0 -> t1: the odd multiples of 7 below n
    n_t1 = len(range(7, n, 14))
    assert levels[("t1", "ALL", 1)] == n_t1, (levels[("t1", "ALL", 1)], n_t1)
    # leaf: t0 on day 0 = ids divisible by 2 and ≡0 (mod 30) -> lcm 2,30
    assert levels[("t0", "0", 0)] == len(range(0, n, 30))
    # level counts: parity locks each type to half the days (t0 is
    # even ids -> even days; t1..t7 odd ids -> odd days): 8 x 15
    # leaves, 8 subtotals, 1 grand total
    assert sum(1 for k in levels if k[2] == 1) == 8
    assert sum(1 for k in levels if k[2] == 0) == 8 * 15

    # ---- pivot to wide ---------------------------------------------------
    t0 = time.time()
    wide = pivot_wide(
        df, "day", "typ", [f"t{i}" for i in range(8)],
        prefix="n_",
    ).collect()
    dt = time.time() - t0
    out["pivot_sec"] = round(dt, 2)
    out["pivot_rows_per_sec"] = int(n / dt)
    assert len(wide) == 30
    cells = {r["day"]: r for r in wide}
    assert cells[0]["n_t0"] == len(range(0, n, 30))
    assert cells[7]["n_t1"] == len(range(7, n, 210))  # odd, %7==0, day 7

    # ---- constraints + profile ------------------------------------------
    t0 = time.time()
    checks = {
        r["constraint"]: r["violations"]
        for r in check_constraints(df, [
            {"name": "typ_nn", "kind": "not_null", "col": "typ"},
            {"name": "day_range", "kind": "in_range", "col": "day",
             "lo": 0, "hi": 29},
            {"name": "typ_domain", "kind": "matches", "col": "typ",
             "regex": "^t[0-7]$"},
            {"name": "day_cap", "kind": "in_range", "col": "day",
             "lo": 0, "hi": 14},
            {"name": "id_unique", "kind": "unique", "col": "id"},
        ]).collect()
    }
    dt = time.time() - t0
    out["checks_sec"] = round(dt, 2)
    out["checks_rows_per_sec"] = int(n / dt)
    assert checks["typ_nn"] == 0
    assert checks["day_range"] == 0
    assert checks["typ_domain"] == 0
    assert checks["id_unique"] == 0
    # days 15..29 violate the cap: exactly half the corpus
    assert checks["day_cap"] == sum(
        len(range(d, n, 30)) for d in range(15, 30)
    )

    t0 = time.time()
    prof = {
        r["column"]: (r["n_null"], r["n_distinct"])
        for r in profile_table(df, ["typ", "day"]).collect()
    }
    dt = time.time() - t0
    out["profile_sec"] = round(dt, 2)
    out["profile_rows_per_sec"] = int(n / dt)
    assert prof["typ"] == (0, 8)
    assert prof["day"] == (0, 30)

    out["all_asserts"] = "pass"
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
