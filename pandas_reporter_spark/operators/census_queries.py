"""Driver-verified queries for the census-semantics layer (SURVEY §2.1).

The driver tables carry no margin pairs, so each query first derives a
margin-paired frame from lineitem exactly as FIXTURES.md §5 prescribes:
    a = l_extendedprice, a_m90 = l_extendedprice * 0.1
    b = l_quantity,      b_m90 = l_quantity * 0.2
keeping every MOE formula DuckDB-expressible (plain arithmetic + sqrt).

Per-row outputs are raw doubles — IEEE +,*,/ and sqrt are identical
across engines — EXCEPT where a formula squares a value (m*m written
out, never pow; SURVEY §4.4). Grouped sums use exact integer-unit longs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_reporter_spark.frame import CensusFrame
from pandas_reporter_spark.functions import moe
from pandas_reporter_spark.registry import query
from pandas_reporter_spark.session import configure
from pandas_reporter_spark.tables import load, oracle_davg, oracle_dsum

#: Oracle twin of CensusFrame._rss_sum: exact long sums of ⌊m²⌋ and the
#: fraction in 1e-8 units, recombined once (split for overflow headroom
#: — see the _rss_sum docstring).
_ORACLE_RSS = (
    "(CAST(SUM(CAST(floor({m} * {m}) AS BIGINT)) AS DOUBLE)"
    " + CAST(SUM(CAST(floor(({m} * {m} - floor({m} * {m})) * 100000000.0"
    " + 0.5) AS BIGINT)) AS DOUBLE) / 100000000.0)"
)

# The margin-pair derivation, shared by every query in this module.
_PAIR_SQL = """
    SELECT CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS geoid,
           l_returnflag AS grp,
           l_extendedprice AS a, l_extendedprice * 0.1 AS a_m90,
           l_quantity AS b, l_quantity * 0.2 AS b_m90
    FROM lineitem
"""


def margin_frame(spark, sf):
    li = load(spark, sf, "lineitem")
    return li.select(
        F.concat_ws("-", "l_orderkey", "l_linenumber").alias("geoid"),
        F.col("l_returnflag").alias("grp"),
        F.col("l_extendedprice").alias("a"),
        (F.col("l_extendedprice") * 0.1).alias("a_m90"),
        F.col("l_quantity").alias("b"),
        (F.col("l_quantity") * 0.2).alias("b_m90"),
    )


@query(
    "q_sum_m",
    oracle=f"""
    SELECT geoid,
           a + b AS s,
           sqrt(a_m90 * a_m90 + b_m90 * b_m90) AS s_m90
    FROM ({_PAIR_SQL})
    """,
)
def q_sum_m(spark, sf):
    """M1: margin-propagating sum, MOE = root-sum-of-squares
    (reference test_basic.py:105-107, handbook Table 1)."""
    configure(spark)
    est, m = moe.sum_m("a", "a_m90", "b", "b_m90")
    return margin_frame(spark, sf).select(
        "geoid", est.alias("s"), m.alias("s_m90")
    )


@query(
    "q_ratio_moe",
    oracle=f"""
    SELECT geoid,
           b / a AS r,
           sqrt(b_m90 * b_m90 + (b / a) * (b / a) * (a_m90 * a_m90)) / a AS r_m90
    FROM ({_PAIR_SQL})
    """,
)
def q_ratio_moe(spark, sf):
    """M2: ratio MOE (test_basic.py:115-118, handbook Table 3)."""
    configure(spark)
    est, m = moe.ratio("b", "b_m90", "a", "a_m90")
    return margin_frame(spark, sf).select("geoid", est.alias("r"), m.alias("r_m90"))


@query(
    "q_proportion_moe",
    oracle=f"""
    SELECT geoid,
           b / a AS p,
           CASE WHEN b_m90 * b_m90 - (b / a) * (b / a) * (a_m90 * a_m90) < 0
                THEN sqrt(b_m90 * b_m90 + (b / a) * (b / a) * (a_m90 * a_m90)) / a
                ELSE sqrt(b_m90 * b_m90 - (b / a) * (b / a) * (a_m90 * a_m90)) / a
           END AS p_m90
    FROM ({_PAIR_SQL})
    """,
)
def q_proportion_moe(spark, sf):
    """M3: proportion MOE with the negative-radicand fallback to the
    ratio formula (test_basic.py:109-113,120-133; ACS handbook rule).
    The guard is also what keeps sqrt() off negative inputs in both
    engines (DuckDB errors, Spark NaNs — SURVEY §4.4)."""
    configure(spark)
    est, m = moe.proportion("b", "b_m90", "a", "a_m90")
    return margin_frame(spark, sf).select("geoid", est.alias("p"), m.alias("p_m90"))


@query(
    "q_product_moe",
    oracle=f"""
    SELECT geoid,
           a * b AS pr,
           sqrt(a * a * (b_m90 * b_m90) + b * b * (a_m90 * a_m90)) AS pr_m90
    FROM ({_PAIR_SQL})
    """,
)
def q_product_moe(spark, sf):
    """M4: product MOE (test_basic.py:165-173, handbook Table 4)."""
    configure(spark)
    est, m = moe.product("a", "a_m90", "b", "b_m90")
    return margin_frame(spark, sf).select("geoid", est.alias("pr"), m.alias("pr_m90"))


@query(
    "q_rse",
    oracle=f"""
    SELECT geoid,
           a_m90 / 1.645 / a * 100 AS a_rse
    FROM ({_PAIR_SQL})
    """,
)
def q_rse(spark, sf):
    """M5: relative standard error, z = exactly 1.645
    (test_basic.py:97-101; 1.6449 fails the reference's own pin)."""
    configure(spark)
    return margin_frame(spark, sf).select(
        "geoid", moe.rse("a", "a_m90").alias("a_rse")
    )


@query(
    "q_project_margin_carry",
    oracle=f"""
    SELECT geoid, a, a_m90, b, b_m90 FROM ({_PAIR_SQL})
    """,
)
def q_project_margin_carry(spark, sf):
    """R1: selecting ['geoid','a','b'] through the CensusFrame wrapper
    silently expands to est-then-margin pairs (test_basic.py:176-195).
    The expansion happens driver-side BEFORE the plan, so Catalyst still
    prunes the parquet scan to exactly these five columns."""
    configure(spark)
    cf = CensusFrame(margin_frame(spark, sf))
    return cf.select(["geoid", "a", "b"]).df


@query(
    "q_groupby_rss",
    oracle=f"""
    SELECT grp,
           {oracle_dsum('a')} AS a_sum,
           sqrt({_ORACLE_RSS.format(m='a_m90')}) AS a_m90_sum_rs,
           {oracle_dsum('b')} AS b_sum,
           sqrt({_ORACLE_RSS.format(m='b_m90')}) AS b_m90_sum_rs
    FROM ({_PAIR_SQL}) GROUP BY grp
    """,
)
def q_groupby_rss(spark, sf):
    """R2: grouped sum with root-sum-of-squares margins
    (test_basic.py:197-206, executed ipynb:1047-1056). One shuffle with
    map-side partial aggregation; integer-cents long accumulators keep
    the result partition-count independent on the codegen path."""
    configure(spark)
    cf = CensusFrame(margin_frame(spark, sf).select("grp", "a", "a_m90", "b", "b_m90"))
    return cf.group_sum("grp").df


@query(
    "q_groupby_mean",
    oracle=f"""
    SELECT grp,
           {oracle_davg('a')} AS a_mean,
           sqrt({_ORACLE_RSS.format(m='a_m90')}) / COUNT(a_m90) AS a_m90_mean_rs,
           {oracle_davg('b')} AS b_mean,
           sqrt({_ORACLE_RSS.format(m='b_m90')}) / COUNT(b_m90) AS b_m90_mean_rs
    FROM ({_PAIR_SQL}) GROUP BY grp
    """,
)
def q_groupby_mean(spark, sf):
    """R3: grouped mean; margin-of-mean = RSS/n — semantics we define
    (the reference leaves it unpinned, test_basic.py:203-204)."""
    configure(spark)
    cf = CensusFrame(margin_frame(spark, sf).select("grp", "a", "a_m90", "b", "b_m90"))
    return cf.group_mean("grp").df
