"""Unified ANN grid (VERDICT r10 item 3): LSH / IVF / PQ-ADC on ONE
corpus, per SF — recall@10 against the exact brute-force cosine
baseline (q_similarity_topk), end-to-end seconds per method, and the
PQ encode stage's standalone throughput (rows/s over the n·M
subvector frame, the only n-proportional PQ stage).

Recall here is single-query (the registered shapes score the fixed
query vec_id=0) — a smoke-level fidelity number; the per-method
planted-neighbor recall pins live in tests/test_similarity.py.

Usage: python tools/ann_recall_grid.py out.json label=dir [...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out_path = sys.argv[1]
    sf_dirs = dict(a.split("=", 1) for a in sys.argv[2:])
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "2"))
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")

    from pandas_reporter_spark.operators import similarity as S
    from pandas_reporter_spark.registry import QUERIES, load_all
    from pandas_reporter_spark.session import get_session

    load_all()
    spark = get_session("ann_recall_grid")

    METHODS = [
        "q_similarity_topk",  # exact baseline
        "q_similarity_ann_lsh",
        "q_similarity_ivf",
        "q_similarity_pq_adc",
    ]

    def t_best(fn):
        fn().write.format("noop").mode("overwrite").save()
        best = 9e9
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    res = {"reps": reps, "sf_dirs": sf_dirs, "grid": {}}
    for label, sf_dir in sf_dirs.items():
        row = {}
        tops = {}
        for name in METHODS:
            fn = lambda name=name: QUERIES[name](spark, sf_dir)
            sec = t_best(fn)
            ids = [r[0] for r in fn().collect()]
            tops[name] = set(ids[:10])
            row[name] = {"sec": round(sec, 3), "top10": sorted(ids[:10])}
        exact = tops["q_similarity_topk"]
        for name in METHODS[1:]:
            row[name]["recall_at_10"] = round(
                len(tops[name] & exact) / max(1, len(exact)), 2
            )
        # PQ encode throughput, isolated: train once, then time ONLY
        # the kernel pass over the full n*M subvector frame
        sub, k_cells, train_n = S._pq_sub(spark, sf_dir)
        sub = sub.persist()
        n_sub = sub.count()
        cents = S._pq_train(spark, sub, k_cells, train_n).persist()
        cents.count()
        enc = lambda: S._pq_encode(spark, sub, cents)
        sec = t_best(enc)
        sub.unpersist()
        cents.unpersist()
        row["pq_encode"] = {
            "rows": n_sub,
            "sec": round(sec, 3),
            "rows_per_s": int(n_sub / sec),
            "k_cells": k_cells,
            "train_n": train_n,
        }
        res["grid"][label] = row
        print(label, json.dumps(row), flush=True)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
