"""A/B the TPC-H join family on the co-bucketed at-rest layout.

Methodology matches SCALING.md's round-10 table: per query and SF,
time the STOCK layout (min-of-N, cache cleared, AQE off), then flip
`tables.use_bucketed_layout` for the session and time the BUCKETED
arm on the identical plans (`load` redirects transparently), plus the
DuckDB oracle on the same tree. Stock runs first because the redirect
is session-sticky by design.

Usage: python tools/bucketed_ab.py out.json label=dir [label=dir ...]
Env: SPARK_GRAFT_AB_QUERIES (default q_tpch_q3,q_tpch_q5,q_tpch_q18),
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
        "SPARK_GRAFT_AB_QUERIES", "q_tpch_q3,q_tpch_q5,q_tpch_q18"
    ).split(",")
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "2"))
    duck_reps = int(os.environ.get("SPARK_GRAFT_AB_DUCK_REPS", "1"))
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")

    from pandas_reporter_spark.registry import ORACLES, QUERIES, load_all
    from pandas_reporter_spark.session import get_session
    from pandas_reporter_spark.tables import use_bucketed_layout

    load_all()
    spark = get_session("bucketed_ab")

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
        for name in queries:
            row = res["queries"].setdefault(name, {})
            row[f"stock_{label}"] = t_spark(name, sf_dir)
            print(name, label, "stock", row[f"stock_{label}"], flush=True)
        t0 = time.time()
        assert use_bucketed_layout(spark, sf_dir)
        build = round(time.time() - t0, 3)
        res[f"bucketed_build_{label}"] = build
        print("bucketed build", label, build, flush=True)
        for name in queries:
            row = res["queries"][name]
            row[f"bucketed_{label}"] = t_spark(name, sf_dir)
            print(name, label, "bucketed", row[f"bucketed_{label}"], flush=True)
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
