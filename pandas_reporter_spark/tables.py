"""Driver-table loaders + oracle-exactness helpers.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet each under
/root/testdata/sf{0.001,0.01,0.1}/.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions worth broadcasting in joins (≤ a few thousand rows at
# any SF that fits a dimension role; at 100 TB these remain < the 64 MB
# broadcast threshold).
BROADCAST_DIMS = {"region", "nation", "supplier"}

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def load(spark: SparkSession, sf: str, name: str) -> DataFrame:
    """Parquet scan of one driver table (vectorized reader, pushdown-able).

    Some driver snapshots write events.parquet `ts` as TIMESTAMP(NANOS),
    which Spark's parquet reader rejects (PARQUET_TYPE_ILLEGAL); others
    write plain TIMESTAMP(MICROS). Handle both: read with the legacy
    nanosAsLong conf (a no-op for µs files) and, only when `ts` surfaces
    as a raw long, truncate ns→µs (the data is µs-granular — probed zero
    sub-µs components — so this is lossless and matches DuckDB, which
    surfaces the same column as a plain µs TIMESTAMP).
    """
    path = os.path.join(sf, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        return df
    return spark.read.parquet(path)


def dsum(col, scale: int = 2) -> Column:
    """Order-independent, oracle-exact sum of a double column.

    sum(double) is accumulation-order dependent (Spark partial aggs vs
    DuckDB's scan order produce last-ulp differences that break value
    hashing). Each value is quantized to an INTEGER number of
    10^-scale units — floor(x·10^scale + 0.5) cast to BIGINT — summed
    as a long, and divided back once. Long sums are exact and
    commutative, so the result is partition-count independent, and the
    aggregate stays on the codegen'd long path (the previous
    DECIMAL(18,s) accumulator was bit-stable too but ran the
    object-path decimal aggregate — 90× slower on q_groupby_rss at
    sf0.1; floor beats round() ~1.5× because round routes every value
    through BigDecimal while floor is one double instruction).

    Cross-engine exactness: x·10^s + 0.5 and floor are IEEE-identical
    single double ops in Spark and DuckDB — verified bit-identical
    over every driver double column at scales 2/4/6. (The quantizer is
    round-half-toward-+inf; exact .5 ties cannot occur for data on a
    10^-scale grid, where x·10^s lands within 1 ulp of an integer.)
    Headroom: Σ|x|·10^scale must stay < 2^63 (~9.2e18) — at extreme
    corpus scale drop `scale`, which only changes the (documented)
    quantization, not the stability guarantee.

    Oracle: CAST(SUM(CAST(floor(x*1eS + 0.5) AS BIGINT)) AS DOUBLE) / 1eS.
    """
    c = F.col(col) if isinstance(col, str) else col
    f = float(10**scale)
    return F.sum(
        F.floor(c * F.lit(f) + F.lit(0.5)).cast("bigint")
    ).cast("double") / F.lit(f)


def davg(col, scale: int = 4) -> Column:
    """Oracle-exact mean: exact long-units sum / count, divided in double.

    Oracle: (CAST(SUM(CAST(floor(x*1eS + 0.5) AS BIGINT)) AS DOUBLE) / 1eS) / COUNT(x).
    """
    c = F.col(col) if isinstance(col, str) else col
    f = float(10**scale)
    return (
        F.sum(F.floor(c * F.lit(f) + F.lit(0.5)).cast("bigint")).cast("double")
        / F.lit(f)
    ) / F.count(c)


def oracle_dsum(expr: str, scale: int = 2) -> str:
    f = float(10**scale)
    return f"CAST(SUM(CAST(floor(({expr}) * {f} + 0.5) AS BIGINT)) AS DOUBLE) / {f}"


def oracle_davg(expr: str, scale: int = 4) -> str:
    f = float(10**scale)
    return (
        f"(CAST(SUM(CAST(floor(({expr}) * {f} + 0.5) AS BIGINT)) AS DOUBLE) / {f})"
        f" / COUNT({expr})"
    )
