"""A/B for the r14 q_dedup_fuzzy rewrite (position-tagged deletion
join) against the r13 untagged-variant plan — the verdict's #2 item
(57.2 s at sf10, the grid's largest row; hot-variant skew mitigation
was prose).

Control = the r13 registered body (untagged variant hash join ->
125M-candidate dropDuplicates -> levenshtein), reconstructed here
verbatim as the measurement baseline. Treatment = the registered
query. Both run min-of-reps to a noop sink, cache cleared per rep;
equality is checked by full-result count + per-branch counts (the
DuckDB O(n²) oracle cannot run at sf10 at all — sf0.1 verify covers
value-level equality, 262,500 rows).

Usage: python tools/fuzzy_ab.py docs/FUZZY_AB_r14.json sf10=/dev/shm/prs_sf10 [...]
Env: SPARK_GRAFT_AB_REPS (default 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def old_plan(spark, sf):
    """The r13 registered body (control)."""
    from pandas_reporter_spark.session import configure
    from pandas_reporter_spark.tables import load

    configure(spark)
    c = load(spark, sf, "customer").select("c_custkey", "c_name")
    variants = F.expr(
        "array_union(array(c_name), transform(sequence(1, length(c_name)),"
        " i -> concat(substring(c_name, 1, i-1), substring(c_name, i+1))))"
    )
    v = c.select(
        "c_custkey", "c_name", F.explode(variants).alias("variant")
    ).select("c_custkey", "c_name", F.xxhash64("variant").alias("vh"))
    a = v.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("name_a"),
        "vh",
    )
    b = v.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_name").alias("name_b"),
        "vh",
    )
    return (
        a.join(b, "vh")
        .filter(F.col("key_a") < F.col("key_b"))
        .drop("vh")
        .dropDuplicates(["key_a", "key_b", "name_a", "name_b"])
        .filter(F.levenshtein("name_a", "name_b") <= 1)
        .select(
            "key_a", "key_b", "name_a", "name_b",
            F.levenshtein("name_a", "name_b").alias("dist"),
        )
    )


def main():
    out_path = sys.argv[1]
    sf_dirs = dict(a.split("=", 1) for a in sys.argv[2:])
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "2"))
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")

    from pandas_reporter_spark.registry import QUERIES, load_all
    from pandas_reporter_spark.session import get_session

    load_all()
    spark = get_session("fuzzy_ab")
    res = {"reps": reps, "grid": {}}
    for label, sf_dir in sf_dirs.items():
        row = {}
        for tag, fn in (
            ("r13_untagged", lambda: old_plan(spark, sf_dir)),
            ("r14_postagged", lambda: QUERIES["q_dedup_fuzzy"](spark, sf_dir)),
        ):
            def run():
                fn().write.format("noop").mode("overwrite").save()

            run()
            best = 9e9
            for _ in range(reps):
                spark.catalog.clearCache()
                t0 = time.time()
                run()
                best = min(best, time.time() - t0)
            # order-insensitive content hash (ADVICE r14): bare counts
            # would pass a count-preserving pair swap between plans
            from pyspark.sql import functions as F

            df = fn()
            agg = df.select(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.xxhash64(*df.columns)).alias("h"),
            ).first()
            row[tag] = {
                "spark": round(best, 3),
                "rows": agg["n"],
                "hash": agg["h"],
            }
            print(label, tag, json.dumps(row[tag]), flush=True)
        assert row["r13_untagged"]["rows"] == row["r14_postagged"]["rows"]
        assert row["r13_untagged"]["hash"] == row["r14_postagged"]["hash"]
        res["grid"][label] = row

    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
