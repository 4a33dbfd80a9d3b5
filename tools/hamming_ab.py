"""Hamming code-width A/B (VERDICT r12 item 6).

The r12 grid (docs/HAMMING_RECALL_r13.json) measured the 64-bit
raw-sign codes collapsing to recall@10 = 0.10 at sf100. Two candidate
explanations: (a) 64 bits under-resolves angles at 2M vectors → wider
SRP codes fix it; (b) the synthetic corpus is near-isotropic (rank-10
vs rank-1000 cosine margins inside noise) so ANY code width fails →
the synthesis is the cause and binary codes stay a planted-duplicate /
clustered-corpus tool.

This A/B decides: per SF it measures recall@10 + median exact-rank
percentile + seconds for the registered 64-bit raw-sign query and SRP
codes at 64/128/256 bits (`similarity.srp_hamming_topk`), then runs
the PLANTED-CLUSTER control — the same corpus with 20 deterministic
neighbors planted at cosine ≈ 0.95/0.90/0.80 around the query — where
a width that resolves real structure must recover the plant.

Usage: python tools/hamming_ab.py out.json label=dir [...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    out_path = sys.argv[1]
    sf_dirs = dict(a.split("=", 1) for a in sys.argv[2:])
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "2"))
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")

    import pyspark.sql.functions as F

    from pandas_reporter_spark.operators import similarity as S
    from pandas_reporter_spark.registry import QUERIES, load_all
    from pandas_reporter_spark.session import get_session
    from pandas_reporter_spark.tables import load

    load_all()
    spark = get_session("hamming_ab")

    def t_best(mk):
        mk().write.format("noop").mode("overwrite").save()
        best = 9e9
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.time()
            mk().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    def grade(sf_dir, tops, exact_ids):
        """recall@10 + median exact-rank percentile per method."""
        e = load(spark, sf_dir, "embeddings")
        n_corpus = e.count() - 1
        q = e.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv")
        )
        scored = (
            e.filter(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(q))
            .select("vec_id", S.cosine(F.col("embedding"), F.col("qv")).alias("c"))
            .persist()
        )
        out = {}
        for name, ids in tops.items():
            got = {
                r["vec_id"]: r["c"]
                for r in scored.filter(F.col("vec_id").isin(sorted(ids))).collect()
            }
            if got:
                counts = scored.agg(
                    *[
                        F.sum(
                            F.when(
                                (F.col("c") > got[i])
                                | ((F.col("c") == got[i]) & (F.col("vec_id") < i)),
                                1,
                            ).otherwise(0)
                        ).alias(f"r{i}")
                        for i in got
                    ]
                ).collect()[0]
                pct = sorted(v / n_corpus for v in counts)
                med = round(pct[len(pct) // 2], 4)
            else:
                med = None
            out[name] = {
                "recall_at_10": round(len(set(ids) & set(exact_ids)) / 10.0, 2),
                "median_exact_rank_pctile": med,
            }
        return out

    res = {"reps": reps, "sf_dirs": sf_dirs, "grid": {}, "planted": {}}
    for label, sf_dir in sf_dirs.items():
        row = {}
        exact_ids = [
            r[0] for r in QUERIES["q_similarity_topk"](spark, sf_dir).collect()
        ][:10]
        row["t_exact"] = t_best(
            lambda: QUERIES["q_similarity_topk"](spark, sf_dir)
        )
        tops = {}
        row["t_sign64"] = t_best(
            lambda: QUERIES["q_similarity_hamming"](spark, sf_dir)
        )
        tops["sign64"] = [
            r[0] for r in QUERIES["q_similarity_hamming"](spark, sf_dir).collect()
        ]
        for bits in (64, 128, 256):
            row[f"t_srp{bits}"] = t_best(
                lambda: S.srp_hamming_topk(spark, sf_dir, bits)
            )
            tops[f"srp{bits}"] = [
                r[0] for r in S.srp_hamming_topk(spark, sf_dir, bits).collect()
            ]
        row["methods"] = grade(sf_dir, tops, exact_ids)
        res["grid"][label] = row
        print(label, json.dumps(row), flush=True)

    # ---- planted-cluster control (smallest labeled dir): same corpus
    # + 20 neighbors of vec 0 at cosine ~0.95/0.90/0.80, planted ids
    # 10_000_000+. A code width that resolves real angular structure
    # must put the plant in its top-10.
    base_label, base_dir = sorted(sf_dirs.items())[0]
    import duckdb

    con = duckdb.connect()
    path = os.path.join(base_dir, "embeddings.parquet")
    glob = path if os.path.isfile(path) else os.path.join(path, "*.parquet")
    rows = con.execute(
        f"SELECT vec_id, embedding, label FROM read_parquet('{glob}')"
    ).fetchall()
    qv = np.array(next(e for v, e, _ in rows if v == 0), dtype=np.float64)
    qn = qv / np.linalg.norm(qv)
    rng = np.random.default_rng(13)
    planted = []
    for i, cos_t in enumerate([0.95] * 7 + [0.90] * 7 + [0.80] * 6):
        noise = rng.standard_normal(len(qv))
        noise -= noise.dot(qn) * qn
        noise /= np.linalg.norm(noise)
        v = cos_t * qn + np.sqrt(1 - cos_t**2) * noise
        planted.append((10_000_000 + i, [float(x) for x in v], -1))
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile

    tmp = tempfile.mkdtemp(prefix="prs_hamming_planted_")
    allr = rows + planted
    t = pa.table(
        {
            "vec_id": pa.array([r[0] for r in allr], pa.int64()),
            "embedding": pa.array(
                [list(map(float, r[1])) for r in allr], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in allr], pa.int32()),
        }
    )
    pq.write_table(t, os.path.join(tmp, "embeddings.parquet"))
    planted_ids = {p[0] for p in planted}
    ctrl = {"corpus": base_label, "n_planted": len(planted)}
    exact_ids = [
        r[0] for r in QUERIES["q_similarity_topk"](spark, tmp).collect()
    ][:10]
    ctrl["exact_top10_planted"] = len(set(exact_ids) & planted_ids)
    h64 = [
        r[0] for r in QUERIES["q_similarity_hamming"](spark, tmp).collect()
    ]
    ctrl["sign64_top10_planted"] = len(set(h64) & planted_ids)
    ctrl["sign64_recall_vs_exact"] = round(
        len(set(h64) & set(exact_ids)) / 10.0, 2
    )
    for bits in (64, 128, 256):
        ids = [r[0] for r in S.srp_hamming_topk(spark, tmp, bits).collect()]
        ctrl[f"srp{bits}_top10_planted"] = len(set(ids) & planted_ids)
        ctrl[f"srp{bits}_recall_vs_exact"] = round(
            len(set(ids) & set(exact_ids)) / 10.0, 2
        )
    res["planted"] = ctrl
    print("planted", json.dumps(ctrl), flush=True)

    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
