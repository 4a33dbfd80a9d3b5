"""Batched retrieval regimes A/B: concurrent TakeOrderedAndProject
legs (one scan per query, no corpus-width shuffle) vs the one-scan
broadcast-block + (qid, partition)-salted two-phase rank. Equality of
the final top-k set is asserted in-run per SF; the registered
q_similarity_topk_batch carries the measured winner at the default
batch size.

Usage: python tools/topk_batch_ab.py docs/TOPK_BATCH_r14.json sf10=/dev/shm/prs_sf10 [...]
Env: SPARK_GRAFT_AB_REPS (default 2), SPARK_GRAFT_TOPKB_QS (default 8,64).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _final(df, k):
    rnk = F.row_number().over(
        W.partitionBy("qid").orderBy(F.col("c").desc(), "vec_id")
    )
    return (
        df.withColumn("rank", rnk.cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", "label",
                F.round("c", 6).alias("cos"))
    )


def main():
    out_path = sys.argv[1]
    sf_dirs = dict(a.split("=", 1) for a in sys.argv[2:])
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "2"))
    qs = [int(x) for x in
          os.environ.get("SPARK_GRAFT_TOPKB_QS", "8,64").split(",")]
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")

    from pandas_reporter_spark.operators.similarity import (
        _TOPKB_K,
        topk_batch_kernel,
        topk_batch_legs,
        topk_batch_salted,
    )
    from pandas_reporter_spark.session import get_session

    spark = get_session("topk_batch_ab")
    res = {"reps": reps, "k": _TOPKB_K, "grid": {}}
    for label, sf_dir in sf_dirs.items():
        row = {}
        for n_q in qs:
            cell = {}
            forms = {
                "legs": lambda: _final(
                    topk_batch_legs(spark, sf_dir, n_q=n_q), _TOPKB_K
                ),
                "salted": lambda: _final(
                    topk_batch_salted(spark, sf_dir, n_q=n_q), _TOPKB_K
                ),
                "kernel": lambda: _final(
                    topk_batch_kernel(spark, sf_dir, n_q=n_q), _TOPKB_K
                ),
            }
            for tag, fn in forms.items():
                def run():
                    fn().write.format("noop").mode("overwrite").save()

                run()
                best = 9e9
                for _ in range(reps):
                    spark.catalog.clearCache()
                    t0 = time.time()
                    run()
                    best = min(best, time.time() - t0)
                cell[tag] = round(best, 3)
            sets = {t: sorted(map(tuple, fn().collect()))
                    for t, fn in forms.items()}
            cell["forms_equal"] = (
                sets["legs"] == sets["salted"] == sets["kernel"]
            )
            assert cell["forms_equal"], f"{label} q={n_q}: form mismatch"
            row[f"q{n_q}"] = cell
            print(label, f"q{n_q}", json.dumps(cell), flush=True)
        res["grid"][label] = row

    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
