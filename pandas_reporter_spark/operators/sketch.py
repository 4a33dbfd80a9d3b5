"""Mergeable-sketch operators (Apache DataSketches HLL via Spark SQL).

The 100 TB cardinality story: exact COUNT(DISTINCT) over a high-card
column shuffles every distinct value; an HLL sketch is a fixed ~KB
state that partial-aggregates map-side and MERGES associatively, so
re-aggregation (per-type → global, daily → monthly) never rescans the
data. Spark 3.5+ exposes the DataSketches HLL family as built-ins
(hll_sketch_agg / hll_union_agg / hll_sketch_estimate) — JVM-side,
codegen-compatible, no UDF.

Estimates are algorithm-defined (DataSketches HLL_8), so no DuckDB
oracle can value-match: registered rows-only, with the estimate-vs-
exact tolerance pinned in tests/test_sketch.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_reporter_spark.registry import query
from pandas_reporter_spark.session import configure
from pandas_reporter_spark.tables import load


@query("q_sketch_hll")  # rows-only: estimates are sketch-algorithm-defined
def q_sketch_hll(spark, sf):
    """Approx distinct users per event_type + a merged grand total.

    ONE scan builds the per-type sketches (groupBy with map-side
    partial agg — the shuffle carries n_types fixed-size sketch
    states, not user ids); the '__all__' row then re-aggregates the
    per-type sketches with hll_union_agg WITHOUT touching the events
    table again — the mergeability that makes sketches the 100 TB
    answer to rollup hierarchies. Exact distinct on the same scan
    would shuffle every (event_type, user_id) pair.

    tests/test_sketch.py pins estimate-vs-exact relative error ≤ 2%
    (HLL_8 lgK=12 standard error ≈ 1.04/√2¹² ≈ 1.6%).
    """
    configure(spark)
    ev = load(spark, sf, "events")
    sketches = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    per_type = sketches.select(
        "event_type", F.hll_sketch_estimate("sk").alias("approx_users")
    )
    merged = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    ).select(F.lit("__all__").alias("event_type"), "approx_users")
    return per_type.unionAll(merged)


@query("q_sketch_quantile")  # rows-only: estimates are sketch-defined
def q_sketch_quantile(spark, sf):
    """Approximate quantiles of l_extendedprice per l_returnflag via
    Spark's one-pass quantile summary (approx_percentile, the
    Greenwald-Khanna-style mergeable summary), with accuracy dialed by
    the third argument (10000 -> max rank error 1/10000).

    The quantile half of the sketch family (q_sketch_hll is the
    cardinality half): exact percentiles (q_agg_percentile) sort
    within groups — at 100 TB an approx summary partial-aggregates
    map-side and merges associatively, one scan, bounded state, no
    within-group sort. tests/test_sketch.py pins estimate-vs-exact
    rank error.
    """
    configure(spark)
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)),
            F.lit(10000),
        ).alias("approx_pcts")
    ).select(
        "l_returnflag",
        F.col("approx_pcts")[0].alias("p50"),
        F.col("approx_pcts")[1].alias("p90"),
        F.col("approx_pcts")[2].alias("p99"),
    )
