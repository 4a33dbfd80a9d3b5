"""Round-11 A/B for the TPC-H Q3/Q5 pre-aggregation-below-the-join
rewrites (VERDICT r10 item 2), on both layouts, plus the conf levers
the verdict asked to try (AQE on at scale; wider shuffle), vs DuckDB.

Arms per query, one session, cache cleared, min-of-N:
  stock_r10 / stock_r11 -> build at-rest bucketed layout ->
  bucketed_r10 / bucketed_r11 / bucketed_r11_aqe / bucketed_r11_wide
  -> duck (fresh connection, min-of-N after warm).

Usage: python tools/tpch_preagg_ab.py out.json sf_dir [q3,q5,q18]
Env: SPARK_GRAFT_AB_REPS (default 2).
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
    sf_dir = sys.argv[2]
    names = (sys.argv[3] if len(sys.argv) > 3 else "q3,q5,q18").split(",")
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "2"))
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")

    from pandas_reporter_spark.operators import relational as R
    from pandas_reporter_spark.registry import ORACLES, QUERIES, load_all
    from pandas_reporter_spark.session import get_session
    from pandas_reporter_spark.tables import use_bucketed_layout

    load_all()
    spark = get_session("tpch_preagg_ab")

    shapes = {
        "q3": {"r11": QUERIES["q_tpch_q3"], "r10": R._q_tpch_q3_r10},
        "q5": {"r11": QUERIES["q_tpch_q5"], "r10": R._q_tpch_q5_r10},
        "q18": {"r11": QUERIES["q_tpch_q18"]},
    }

    def t_best(fn, aqe=False, wide=None):
        def run():
            if aqe:
                spark.conf.set("spark.sql.adaptive.enabled", "true")
            if wide:
                spark.conf.set("spark.sql.shuffle.partitions", str(wide))
            try:
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            finally:
                if aqe:
                    spark.conf.set("spark.sql.adaptive.enabled", "false")
                if wide:
                    spark.conf.set("spark.sql.shuffle.partitions", "32")

        run()
        best = 9e9
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        return round(best, 3)

    bucketed_only = os.environ.get("SPARK_GRAFT_AB_PHASE") == "bucketed_only"
    res = {"sf_dir": sf_dir, "reps": reps, "queries": {}}
    if not bucketed_only:
        for q in names:
            row = res["queries"].setdefault(q, {})
            for shape, fn in shapes[q].items():
                row[f"stock_{shape}"] = t_best(fn)
                print(q, "stock", shape, row[f"stock_{shape}"], flush=True)
    t0 = time.time()
    assert use_bucketed_layout(spark, sf_dir)
    res["bucketed_build_s"] = round(time.time() - t0, 3)
    print("bucketed build", res["bucketed_build_s"], flush=True)
    # Pressure gap (r10 methodology find): the first post-build reps
    # run under peak tmpfs+heap pressure and can measure 3x slow;
    # settle before timing.
    time.sleep(int(os.environ.get("SPARK_GRAFT_AB_SETTLE", "30")))
    for q in names:
        res["queries"].setdefault(q, {})
    for q in names:
        row = res["queries"][q]
        for shape, fn in shapes[q].items():
            row[f"bucketed_{shape}"] = t_best(fn)
            print(q, "bucketed", shape, row[f"bucketed_{shape}"], flush=True)
        fn = shapes[q]["r11"]
        row["bucketed_r11_aqe"] = t_best(fn, aqe=True)
        print(q, "bucketed r11+aqe", row["bucketed_r11_aqe"], flush=True)
        row["bucketed_r11_wide128"] = t_best(fn, wide=128)
        print(q, "bucketed r11+wide", row["bucketed_r11_wide128"], flush=True)
    if not bucketed_only:
        con = duckdb.connect()
        con.execute(f"SET threads TO {os.cpu_count() or 8}")
        for t in TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}/*.parquet')"
                if os.path.isdir(p)
                else f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')"
            )
        for q in names:
            sql = ORACLES[f"q_tpch_{q}"]
            con.execute(sql).fetchall()
            best = 9e9
            for _ in range(reps):
                t0 = time.time()
                con.execute(sql).fetchall()
                best = min(best, time.time() - t0)
            res["queries"][q]["duck"] = round(best, 3)
            print(q, "duck", res["queries"][q]["duck"], flush=True)
        con.close()
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
