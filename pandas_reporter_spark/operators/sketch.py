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


@query(
    "q_sketch_heavy_hitters",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ), t AS (
      SELECT token FROM tok WHERE token <> ''
    ), tot AS (SELECT COUNT(*) AS n FROM t)
    SELECT token, COUNT(*) AS cnt
    FROM t GROUP BY token
    HAVING COUNT(*) > (SELECT n FROM tot) / 256.0
    """,
)
def q_sketch_heavy_hitters(spark, sf):
    """Exact heavy hitters (tokens with frequency > n/256) via the
    candidate-generation + verification pattern — the heavy-hitter half
    of the sketch family (HLL = cardinality, GK = quantiles, MG =
    frequency).

    Pass 1 runs a mergeable Misra-Gries summary PER PARTITION inside
    mapInPandas (vectorized value_counts per Arrow batch, merged into a
    capacity-1024 counter set with the standard subtract-the-
    (cap+1)-th-largest prune). The pigeonhole guarantee: any token with
    global frequency > n/256 exceeds n_p/256 in at least one partition,
    and a capacity-1024 MG never evicts a token with partition
    frequency > n_p/1025 — so the candidate set PROVABLY contains every
    true heavy hitter (while being ≤ 1024 × #partitions rows, i.e.
    KBs). Pass 2 exactly recounts ONLY the candidates (broadcast semi
    join, map-side-combinable count) and applies the true threshold
    from an in-plan 1-row total — so the result is EXACT and the
    DuckDB oracle is the plain HAVING query. At 100 TB the full
    groupBy(token) the oracle runs shuffles the whole token stream;
    this shape shuffles bounded candidate counters + the count of a
    broadcast-filtered slice.

    Reference parity: none (driver-mandated sketch surface, SURVEY
    §2.3).
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import

    configure(spark)
    d = load(spark, sf, "documents")
    tok = d.select(
        F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")

    cap = 1024

    def mg_partition(batches):
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf["token"].value_counts()
            counters = counters.add(vc, fill_value=0).astype("int64")
            if len(counters) > cap:
                # prune: subtract the (cap+1)-th largest counter from
                # all, drop non-positive — the mergeable-MG step whose
                # total decrement is bounded by n_p/cap
                dec = counters.nlargest(cap + 1).iloc[-1]
                counters = counters[counters > dec] - dec
        yield pd.DataFrame({"token": counters.index.astype(str)})

    candidates = (
        tok.mapInPandas(mg_partition, "token string").distinct()
    )
    total = tok.agg(F.count("*").alias("n_total"))
    return (
        tok.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") > F.col("n_total") / 256.0)
        .select("token", "cnt")
    )
