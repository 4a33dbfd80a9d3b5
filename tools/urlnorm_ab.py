"""Same-session A/B for the r11 URL-canonicalizer fusion (VERDICT r10
item 5): the registered q_text_url_normalize (fused string-intrinsic
body) vs the identical plan on the r10 all-regex body vs the DuckDB
oracle, per SF dir. Also cross-checks the two Spark arms'
order-insensitive value hash so the speedup can't come from a
semantics change.

Usage: python tools/urlnorm_ab.py out.json label=dir [label=dir ...]
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
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")

    from pyspark.sql import functions as F

    from pandas_reporter_spark.operators.text import (
        _canonicalize_url_regex,
        canonicalize_url,
    )
    from pandas_reporter_spark.registry import ORACLES, QUERIES, load_all
    from pandas_reporter_spark.session import configure, get_session
    from pandas_reporter_spark.tables import load

    load_all()
    spark = get_session("urlnorm_ab")

    def arm(sf_dir, canon_fn):
        configure(spark)
        d = load(spark, sf_dir, "documents")
        url = F.concat(
            F.lit("HTTPS://WWW."),
            F.upper("source"),
            F.lit(".Example.COM:443/Docs/"),
            (F.col("doc_id") % 40).cast("string"),
            F.lit("?utm_source=feed&ref="),
            (F.col("doc_id") % 3).cast("string"),
            F.lit("&id="),
            (F.col("doc_id") % 20).cast("string"),
            F.lit("#section"),
            (F.col("doc_id") % 5).cast("string"),
        )
        raw = d.select("doc_id", url.alias("url"))
        canon = raw.select(
            "doc_id", canon_fn("url").alias("canon_url")
        )
        return canon.groupBy("canon_url").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("rep_doc_id"),
        )

    def t_best(df_fn):
        df_fn().write.format("noop").mode("overwrite").save()  # warm
        best = 9e9
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.time()
            df_fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    def value_fp(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64("canon_url", "n_docs", "rep_doc_id")
            ).alias("fp"),
        ).collect()[0]
        return int(row.n), int(row.fp)

    res = {"reps": reps, "sf_dirs": sf_dirs, "arms": {}}
    for label, sf_dir in sf_dirs.items():
        fused = t_best(lambda: QUERIES["q_text_url_normalize"](spark, sf_dir))
        regex = t_best(lambda: arm(sf_dir, _canonicalize_url_regex))
        fp_fused = value_fp(arm(sf_dir, canonicalize_url))
        fp_regex = value_fp(arm(sf_dir, _canonicalize_url_regex))
        con = duckdb.connect()
        con.execute(f"SET threads TO {os.cpu_count() or 8}")
        for t in TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}/*.parquet')"
                if os.path.isdir(p)
                else f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')"
            )
        sql = ORACLES["q_text_url_normalize"]
        con.execute(sql).fetchall()  # warm
        t0 = time.time()
        con.execute(sql).fetchall()
        duck = round(time.time() - t0, 3)
        con.close()
        res["arms"][label] = {
            "spark_fused": fused,
            "spark_regex_r10": regex,
            "duck": duck,
            "arms_value_match": fp_fused == fp_regex,
            "n_groups": fp_fused[0],
        }
        print(label, json.dumps(res["arms"][label]), flush=True)
        assert fp_fused == fp_regex, "fused arm changed the result set!"
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
