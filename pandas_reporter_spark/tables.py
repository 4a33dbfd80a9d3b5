"""Driver-table loaders + oracle-exactness helpers.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet each under
/root/testdata/sf{0.001,0.01,0.1}/.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

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

    events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's parquet
    reader rejects (PARQUET_TYPE_ILLEGAL). Read it as a raw long via the
    legacy conf and truncate ns→µs (the data is µs-granular — probed zero
    sub-µs components — so this is lossless and matches DuckDB, which
    surfaces the same column as a plain µs TIMESTAMP).
    """
    path = os.path.join(sf, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return spark.read.parquet(path)


def dsum(col, scale: int = 2) -> Column:
    """Order-independent, oracle-exact sum of a double column.

    sum(double) is accumulation-order dependent (Spark partial aggs vs
    DuckDB's scan order produce last-ulp differences that break value
    hashing). Casting each value to DECIMAL(18,scale) first makes the
    sum exact and identical in both engines; the result is cast back to
    double. Oracle side: CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col, scale: int = 4) -> Column:
    """Oracle-exact mean: exact decimal sum / count, divided in double.

    Oracle side: CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)


def oracle_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def oracle_davg(expr: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT({expr})"
