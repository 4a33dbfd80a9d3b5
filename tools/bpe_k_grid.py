"""BPE merge-loop k-grid (VERDICT r12 item 5).

The registered q_text_bpe_train runs k=8 merge rounds — correctness
grade. A production tokenizer is k≈30k, and the merge recurrence is
inherently serial (round r+1's pair counts depend on round r's
rewrite), so the engine question is WHERE the loop should run:

- Spark loop (_bpe_learn): one dictionary-scale job per round
  (pair-count aggregate + 1-row argmax collect). With the r13
  localCheckpoint cadence the per-round replay is bounded, but every
  round still pays the Spark job floor — wall ≈ k × floor, corpus
  size almost irrelevant.
- Driver loop (bpe_learn_local): ONE distributed pass compresses the
  corpus to the weighted word dictionary (Heaps: ~10⁷ rows at
  100 TB ≈ 400 MB — collectable), then the serial recurrence runs
  in-process. Bit-identical merges (pinned in tests).

This grid measures both at k ∈ {8, 64} across SFs and reports the
crossover — the measured basis for SCALING.md's production-path
claim. Also reports the r12→r13 effect of the checkpoint cadence on
the k=64 Spark loop (set SPARK_GRAFT_BPE_NOCKPT=1 to re-measure the
unbounded-replay baseline).

Usage: python tools/bpe_k_grid.py out.json label=dir [...]
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
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")

    from pandas_reporter_spark.operators import text as T
    from pandas_reporter_spark.registry import load_all
    from pandas_reporter_spark.session import get_session

    load_all()
    spark = get_session("bpe_k_grid")
    if os.environ.get("SPARK_GRAFT_BPE_NOCKPT", "").strip() == "1":
        T._BPE_CKPT_EVERY = 10**9  # disable: measure unbounded replay

    res = {"ckpt_every": T._BPE_CKPT_EVERY, "grid": {}}
    for label, sf_dir in sf_dirs.items():
        row = {}
        for k in (8, 64):
            t0 = time.time()
            m_spark = T._bpe_learn(spark, sf_dir, k)
            row[f"spark_k{k}"] = round(time.time() - t0, 3)
            t0 = time.time()
            m_local = T.bpe_learn_local(spark, sf_dir, k)
            row[f"local_k{k}"] = round(time.time() - t0, 3)
            row[f"equal_k{k}"] = m_spark == m_local
            row[f"rounds_k{k}"] = len(m_spark)
        res["grid"][label] = row
        print(label, json.dumps(row), flush=True)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
