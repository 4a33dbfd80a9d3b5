"""Driver-registered queries for the source/sink layer (S3, S7, S12).

These make the source adapters visible to the correctness gate:
- q_source_cr_pivot: CR-JSON pivot over the committed offline fixture
- q_source_csv_roundtrip: parquet → CSV → scan back → aggregate (S7)
- q_sink_parquet: aggregate → parquet sink → read back (S12); the
  oracle runs the same aggregate on the original table, so the sink
  round-trip itself is what's being hash-checked.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F

from pandas_reporter_spark.registry import query
from pandas_reporter_spark.session import configure
from pandas_reporter_spark.sources.crjson import cr_bulk_frame, cr_frame
from pandas_reporter_spark.sources.varrep import (
    get_varrep_dataframe,
    moe_from_replicates,
    varrep_frame,
)
from pandas_reporter_spark.tables import dsum, load

_FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@query("q_source_cr_pivot")  # rows-only: input is the committed fixture,
# not a driver table, so no oracle view exists for it
def q_source_cr_pivot(spark, sf):
    """S3: CR-JSON → wide frame on the offline fixture (3 geos × 6 vars
    → 3 rows × 14 cols, margins interleaved)."""
    configure(spark)
    with open(os.path.join(_FIXTURES, "cr_b99001.json")) as f:
        data = json.load(f)
    cf = cr_frame(spark, data, "B99001")
    return cf.df


@query("q_source_cr_bulk")  # rows-only: fixture-dir input, no driver table
def q_source_cr_bulk(spark, sf):
    """S3 scale path: `spark.read.json` over a cache dir of ≥2 CR-JSON
    responses → explode + wide map-extract projection (5 geos × 14
    cols). Frame-equality with the per-file driver pivots is pinned in
    tests/test_sources.py."""
    configure(spark)
    cf = cr_bulk_frame(
        spark,
        [
            os.path.join(_FIXTURES, "cr_b99001.json"),
            os.path.join(_FIXTURES, "cr_b99001_part2.json"),
        ],
        "B99001",
    )
    return cf.df.orderBy("geoid")


@query(
    "q_source_csv_roundtrip",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0 AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_source_csv_roundtrip(spark, sf):
    """S7: CSV scan. lineitem → CSV → read back with explicit schema →
    aggregate; hash-matching the oracle on the parquet original proves
    the CSV writer/scanner round-trips values exactly."""
    configure(spark)
    li = load(spark, sf, "lineitem").select(
        "l_returnflag", "l_quantity"
    )
    out = os.path.join(tempfile.gettempdir(), "prs_csv_roundtrip")
    li.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.csv(out, header=True, schema="l_returnflag string, l_quantity double")
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"), dsum("l_quantity").alias("sum_qty")
    )


@query(
    "q_varrep_moe",
    oracle="""
    -- replicate i = est + ((i*o_orderkey) % 7 - 3): integer offsets, so
    -- every squared diff is exact; sum order mirrors Spark's left-to-right
    SELECT o_orderkey,
           round(1.645 * sqrt(4.0/80.0 * list_aggregate(
             list_transform(range(1, 81),
                            i -> CAST((i * o_orderkey) % 7 - 3 AS DOUBLE) ^ 2),
             'sum')), 6) AS moe_rep
    FROM orders
    """,
)
def q_varrep_moe(spark, sf):
    """S11 on driver tables: MOE from 80 synthesized replicates.

    Replicates are deterministic offsets of o_totalprice; the registered
    check pins the successive-difference formula end-to-end
    (1.645·sqrt((4/80)·Σ(repᵢ−est)²)) as an 80-term codegen'd
    expression — no shuffle, scan-speed at any scale.
    """
    configure(spark)
    o = load(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    reps = [
        (
            F.col("o_totalprice")
            + ((F.lit(i) * F.col("o_orderkey")) % 7 - 3).cast("double")
        )
        for i in range(1, 81)
    ]
    return o.select(
        "o_orderkey",
        F.round(moe_from_replicates(F.col("o_totalprice"), reps), 6).alias(
            "moe_rep"
        ),
    )


@query("q_varrep_source")  # rows-only: input is the committed fixture,
# not a driver table, so no oracle view exists for it
def q_varrep_source(spark, sf):
    """S11 source half: VRT long-format CSV ingest -> replicate MOE.

    Reads the committed mini-fixture in the public
    TBLID,GEOID,ORDER,TITLE,ESTIMATE,MOE,SE,CV,VAR_REP1..80 layout
    (reference test_basic.py:221-225 semantics), computes MOE_REP from
    the 80 replicates, and returns rows where the recomputed margin
    agrees with the published MOE — the round-trip check that the
    ingest + formula pipeline is self-consistent.
    """
    configure(spark)
    df = varrep_frame(get_varrep_dataframe(spark))
    return df.select(
        "TBLID",
        "GEOID",
        "ORDER",
        "ESTIMATE",
        "MOE",
        F.round("MOE_REP", 2).alias("MOE_REP"),
        (F.abs(F.round("MOE_REP", 2) - F.col("MOE")) < 0.01).alias("moe_agrees"),
    )


@query(
    "q_sink_parquet",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0 AS sum_price
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def q_sink_parquet(spark, sf):
    """S12: parquet sink. Aggregate → write parquet → read back. The
    read-back frame must hash-match the oracle's direct aggregate —
    i.e. the sink loses nothing. Snappy parquet, one file per shuffle
    partition (at scale: partitionBy on a stable key for pruning)."""
    configure(spark)
    li = load(spark, sf, "lineitem")
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_extendedprice").alias("sum_price")
    )
    out = os.path.join(tempfile.gettempdir(), "prs_sink_parquet")
    agg.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)

@query("q_census_workflow")  # rows-only: input is the committed fixture
def q_census_workflow(spark, sf):
    """The reference's core workflow end-to-end on the CR fixture:
    pivot -> margin-carrying select -> sum_m derived measure -> RSS
    grouped margins (censusreporter.py ingest + test_basic.py:90-207
    semantics, all through the CensusFrame layer)."""
    configure(spark)
    with open(os.path.join(_FIXTURES, "cr_b99001.json")) as f:
        data = json.load(f)
    cf = cr_frame(spark, data, "B99001")
    sel = cf[["geoid", "B99001002", "B99001005"]]  # margin-carry expands
    est, moe = sel.sum_m("B99001002", "B99001005")
    with_total = sel.with_measure("total_sex", est, moe)
    grouped = with_total.group_sum("geoid")
    return grouped.df



@query(
    "q_source_schema_merge",
    oracle="""
    -- batch 1 (even doc_ids) predates the quality column; batch 2
    -- (odd) carries quality = n_chars/1000. The merged read must see
    -- batch-1 quality as NULL — exactly what this UNION models.
    WITH merged AS (
      SELECT doc_id, source, CAST(NULL AS DOUBLE) AS quality
      FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, source, round(n_chars / 1000.0, 3) AS quality
      FROM documents WHERE doc_id % 2 = 1
    )
    SELECT source, COUNT(*) AS n,
           CAST(COUNT(quality) AS BIGINT) AS n_scored,
           round(CAST(SUM(CAST(floor(quality * 1000.0 + 0.5) AS BIGINT))
                 AS DOUBLE) / 1000.0, 3) AS sum_quality
    FROM merged GROUP BY source
    """,
)
def q_source_schema_merge(spark, sf):
    """Schema evolution on a parquet lake: an old batch written WITHOUT
    the `quality` column and a new batch WITH it, read as one table
    via mergeSchema — old rows surface NULL for the added column.

    The 100 TB reality: columns get added mid-corpus and you cannot
    rewrite history. Parquet + `mergeSchema=true` reconciles footer
    schemas at planning time (on a lake, the table format pins the
    merged schema in metadata instead, making the read free); readers
    see one evolved schema and NULL-fill the old files. The oracle
    models exactly that contract with a UNION, so the hash check pins
    the NULL-fill semantics, not just row counts.
    """
    configure(spark)
    d = load(spark, sf, "documents")
    root = tempfile.mkdtemp(prefix="prs_schema_merge_")
    d.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "source"
    ).write.mode("overwrite").parquet(os.path.join(root, "batch1"))
    d.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id",
        "source",
        F.round(F.col("n_chars") / 1000.0, 3).alias("quality"),
    ).write.mode("overwrite").parquet(os.path.join(root, "batch2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "batch1"), os.path.join(root, "batch2")
    )
    return merged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("quality").alias("n_scored"),
        F.round(dsum("quality", scale=3), 3).alias("sum_quality"),
    )
