"""A/B the retrieval queries on the at-rest inverted token index.

Three arms per (query, SF), methodology as tools/bucketed_ab.py
(min-of-N, cache cleared, AQE off, noop sink):
  fresh    — tokenize-from-text plan (no artifacts)
  tf_art   — shared (doc, token, tf) tokenize artifact (tmpfs parquet)
  tokidx   — at-rest inverted index: bucket-pruned postings + doclen
             sidecar + 1-row stats (materialize_token_index)
plus the index build time (the ingest-amortized cost) and the DuckDB
oracle as the external yardstick.

Usage: python tools/tokenidx_ab.py out.json label=dir [label=dir ...]
Env: SPARK_GRAFT_AB_QUERIES (default q_text_bm25,q_search_hybrid_rrf),
SPARK_GRAFT_AB_REPS (default 2), SPARK_GRAFT_AB_DUCK_REPS (default 1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main():
    out_path = sys.argv[1]
    sf_dirs = dict(a.split("=", 1) for a in sys.argv[2:])
    queries = os.environ.get(
        "SPARK_GRAFT_AB_QUERIES", "q_text_bm25,q_search_hybrid_rrf"
    ).split(",")
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "2"))
    duck_reps = int(os.environ.get("SPARK_GRAFT_AB_DUCK_REPS", "1"))
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")

    from pandas_reporter_spark.operators import text as T
    from pandas_reporter_spark.registry import ORACLES, QUERIES, load_all
    from pandas_reporter_spark.session import get_session
    from pandas_reporter_spark.tables import _session_key

    load_all()
    spark = get_session("tokenidx_ab")

    def t_spark(name, sf_dir):
        run = lambda: QUERIES[name](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        run()
        best = 9e9
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        return round(best, 3)

    res = {"queries": {}, "sf_dirs": sf_dirs, "reps": reps}
    for label, sf_dir in sf_dirs.items():
        key = (_session_key(spark), sf_dir)
        # arm 1: fresh (no artifacts)
        T._TF_ART.pop(key, None)
        T._TOKIDX_ART.pop(key, None)
        for name in queries:
            row = res["queries"].setdefault(name, {})
            row[f"fresh_{label}"] = t_spark(name, sf_dir)
            print(name, label, "fresh", row[f"fresh_{label}"], flush=True)
        # arm 2: shared tokenize artifact
        t0 = time.time()
        T.materialize_doc_tokens(spark, sf_dir)
        res[f"tf_art_build_{label}"] = round(time.time() - t0, 3)
        if T.doc_token_tf(spark, sf_dir) is not None:
            for name in queries:
                row = res["queries"][name]
                row[f"tf_art_{label}"] = t_spark(name, sf_dir)
                print(
                    name, label, "tf_art", row[f"tf_art_{label}"], flush=True
                )
        T._TF_ART.pop(key, None)
        # arm 3: at-rest inverted index
        t0 = time.time()
        T.materialize_token_index(spark, sf_dir)
        res[f"tokidx_build_{label}"] = round(time.time() - t0, 3)
        assert T.token_index(spark, sf_dir) is not None
        for name in queries:
            row = res["queries"][name]
            row[f"tokidx_{label}"] = t_spark(name, sf_dir)
            print(name, label, "tokidx", row[f"tokidx_{label}"], flush=True)
        T._TOKIDX_ART.pop(key, None)
        # external yardstick
        con = duckdb.connect()
        con.execute(f"SET threads TO {os.cpu_count() or 8}")
        for t in TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            glob = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')"
            )
        for name in queries:
            row = res["queries"][name]
            sql = ORACLES[name]
            con.execute(sql).fetchall()
            best = 9e9
            for _ in range(duck_reps):
                t0 = time.time()
                con.execute(sql).fetchall()
                best = min(best, time.time() - t0)
            row[f"duck_{label}"] = round(best, 3)
            print(name, label, "duck", row[f"duck_{label}"], flush=True)
        con.close()
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
