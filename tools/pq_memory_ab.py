"""PQ-ADC memory/bytes-scanned measurement (VERDICT r11 item 2).

The r11 grid showed PQ losing end-to-end to both IVF and the exact
scan at every measured decade — because the registered shape pays
train+encode per query. PQ's raison d'être is the AT-REST story:
train+encode once at ingest (materialize_pq_index), then every query
scans M small ints per vector instead of 64 floats. This tool
measures that story instead of asserting it:

  per SF: n_vectors; bytes at rest (embeddings.parquet vs the codes
  dir vs the codebook) -> bytes/vec per tier; query seconds for the
  exact scan, IVF, PQ fresh (train+encode+score), and PQ riding the
  artifact; the one-time artifact build seconds.

Note on "outgrows memory": in Spark's execution model NO tier ever
holds the corpus in memory — exact top-k is a streaming
TakeOrdered over a scan — so the honest framing of PQ's memory claim
is bytes-scanned-per-query and index-bytes-at-rest, which is what
this measures (plus wall-clock, where the scan-bytes ratio shows up
directly at IO-bound scale).

Usage: python tools/pq_memory_ab.py out.json label=dir [...]
Env: SPARK_GRAFT_AB_REPS (default 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    if os.path.isfile(path):
        total = os.path.getsize(path)
    return total


def main():
    out_path = sys.argv[1]
    sf_dirs = dict(a.split("=", 1) for a in sys.argv[2:])
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "2"))
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")

    from pandas_reporter_spark.operators import similarity as S
    from pandas_reporter_spark.registry import QUERIES, load_all
    from pandas_reporter_spark.session import get_session
    from pandas_reporter_spark.tables import _session_key

    load_all()
    spark = get_session("pq_memory_ab")

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
    for label, sf in sf_dirs.items():
        key = (_session_key(spark), sf)
        S._PQ_ART.pop(key, None)
        row = {}
        emb = os.path.join(sf, "embeddings.parquet")
        row["n_vectors"] = (
            spark.read.parquet(emb).count() if os.path.exists(emb) else 0
        )
        row["embeddings_bytes"] = du(emb)

        S._IVF_ART.pop(key, None)
        for name in ("q_similarity_topk", "q_similarity_ivf"):
            row[name] = round(
                t_best(lambda n=name: QUERIES[n](spark, sf)), 3
            )

        # IVF's own at-rest tier (round 12): centroids + the corpus
        # partitioned by cell, probe = static partition pruning
        t0 = time.time()
        S.materialize_ivf_index(spark, sf)
        row["ivf_index_build_s"] = round(time.time() - t0, 3)
        if S.ivf_index(spark, sf) is not None:
            row["ivf_artifact"] = round(
                t_best(lambda: QUERIES["q_similarity_ivf"](spark, sf)), 3
            )
            try:
                src_tag = int(os.path.getmtime(emb))
            except OSError:
                src_tag = 0
            row["ivf_index_bytes"] = du(
                os.path.join(
                    "/dev/shm",
                    "prs_ivfindex_"
                    f"{os.path.basename(os.path.normpath(sf))}_{src_tag}",
                )
            )
        S._IVF_ART.pop(key, None)

        # fresh PQ: train+encode+score every time (the registered
        # shape when no artifact exists)
        row["pq_fresh"] = round(
            t_best(lambda: QUERIES["q_similarity_pq_adc"](spark, sf)), 3
        )

        # one-time artifact build, then the riding query path
        t0 = time.time()
        S.materialize_pq_index(spark, sf)
        row["pq_index_build_s"] = round(time.time() - t0, 3)
        art = S.pq_index(spark, sf)
        if art is None:
            row["pq_artifact"] = None
        else:
            row["pq_artifact"] = round(
                t_best(lambda: QUERIES["q_similarity_pq_adc"](spark, sf)),
                3,
            )
            try:
                src_tag = int(os.path.getmtime(emb))
            except OSError:
                src_tag = 0
            out = os.path.join(
                "/dev/shm",
                f"prs_pqindex_{os.path.basename(os.path.normpath(sf))}"
                f"_{src_tag}",
            )
            row["codes_bytes"] = du(os.path.join(out, "codes"))
            row["codebook_bytes"] = du(os.path.join(out, "codebook"))
            if row["n_vectors"]:
                row["raw_bytes_per_vec"] = round(
                    row["embeddings_bytes"] / row["n_vectors"], 1
                )
                row["code_bytes_per_vec"] = round(
                    row["codes_bytes"] / row["n_vectors"], 1
                )
                row["at_rest_ratio"] = round(
                    row["embeddings_bytes"] / max(1, row["codes_bytes"]), 1
                )
        S._PQ_ART.pop(key, None)
        res["grid"][label] = row
        print(label, json.dumps(row), flush=True)

    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
