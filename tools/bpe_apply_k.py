"""BPE apply at production merge-table sizes (VERDICT r13 item 6).

The registered q_text_bpe_apply segments the distinct-word dictionary
with a k-chained literal-replace expression — fine at k=8, impossible
at a production k≈30k (30k nested JVM expressions). This measures the
Arrow-kernel path (bpe_segment_nsub mode='kernel') across k, training
each merge table driver-side (bpe_learn_local — bit-identical to the
distributed trainer, pinned in tests), and the chain path at small k
for the crossover, running the FULL apply rollup (dictionary
segmentation + corpus count join-back) to a noop sink.

Usage: python tools/bpe_apply_k.py docs/BPE_APPLY_K_r14.json sf10=/dev/shm/prs_sf10
Env: SPARK_GRAFT_AB_REPS (default 2), SPARK_GRAFT_BPE_KS (default 8,64,256,1024).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def apply_rollup(spark, sf, merges, mode):
    """The q_text_bpe_apply dataflow with an explicit segmentation
    mode and a caller-supplied merge table."""
    from pandas_reporter_spark.operators.text import bpe_segment_nsub
    from pandas_reporter_spark.session import configure
    from pandas_reporter_spark.tables import load

    configure(spark)
    d = load(spark, sf, "documents")
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    wcnt = (
        d.select("source", F.explode(toks).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    seg = wcnt.select("w").distinct().select(
        "w", bpe_segment_nsub(merges, mode=mode).alias("n_sub")
    )
    return (
        wcnt.join(seg, "w")
        .groupBy("source")
        .agg(
            F.sum("c").alias("ws_tokens"),
            F.sum(F.col("c") * F.col("n_sub")).alias("bpe_tokens"),
        )
    )


def main():
    out_path = sys.argv[1]
    sf_dirs = dict(a.split("=", 1) for a in sys.argv[2:])
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "2"))
    ks = [
        int(k)
        for k in os.environ.get("SPARK_GRAFT_BPE_KS", "8,64,256,1024").split(",")
    ]
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")

    from pandas_reporter_spark.operators.text import (
        _BPE_CHAIN_MAX,
        bpe_learn_local,
    )
    from pandas_reporter_spark.session import get_session

    spark = get_session("bpe_apply_k")
    res = {"reps": reps, "grid": {}}
    for label, sf_dir in sf_dirs.items():
        row = {}
        t0 = time.time()
        merges_full = bpe_learn_local(spark, sf_dir, max(ks))
        row["train_local_kmax_s"] = round(time.time() - t0, 3)
        row["kmax_reached"] = len(merges_full)
        for k in ks:
            merges = merges_full[:k]
            modes = ["kernel"] + (["chain"] if k <= _BPE_CHAIN_MAX else [])
            cell = {}
            for mode in modes:
                def run():
                    apply_rollup(spark, sf_dir, merges, mode).write.format(
                        "noop"
                    ).mode("overwrite").save()

                run()
                best = 9e9
                for _ in range(reps):
                    spark.catalog.clearCache()
                    t0 = time.time()
                    run()
                    best = min(best, time.time() - t0)
                cell[mode] = round(best, 3)
            # equality across modes at chain-feasible k
            if len(modes) == 2:
                a = sorted(
                    map(tuple, apply_rollup(spark, sf_dir, merges, "kernel").collect())
                )
                b = sorted(
                    map(tuple, apply_rollup(spark, sf_dir, merges, "chain").collect())
                )
                cell["modes_equal"] = a == b
            row[f"k{k}"] = cell
            print(label, f"k{k}", json.dumps(cell), flush=True)
        res["grid"][label] = row

    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
