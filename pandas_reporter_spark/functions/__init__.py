"""Column-expression function packs.

The reference's derived-measure math (MOE propagation) compiles to plain
Spark Column expressions — JVM-side, whole-stage-codegen'd, never UDFs.
"""

from pandas_reporter_spark.functions.moe import (
    Z90,
    moe_of_mean,
    moe_of_sum,
    product,
    proportion,
    ratio,
    rse,
    sum_m,
)

__all__ = [
    "Z90",
    "sum_m",
    "ratio",
    "proportion",
    "product",
    "rse",
    "moe_of_sum",
    "moe_of_mean",
]
