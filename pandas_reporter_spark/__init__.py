"""pandas_reporter_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of CivicKnowledge/pandas-reporter.

Built from scratch on the PySpark DataFrame/SQL API (Catalyst-optimized,
lazy, distributed); the reference (`/root/reference/`, pandasreporter
v0.1.0) defines WHAT to compute — margin-of-error (MOE) statistical
derived measures, margin-paired wide tables, census sources — while the
HOW is idiomatic Spark (see SURVEY.md §1.4 for the model mapping).

Public surface:
    get_session()                  — configured local SparkSession
    configure(spark)               — apply engine configs to an existing session
    CensusFrame                    — metadata-aware wrapper (margin-carry, lookup, views)
    functions.moe                  — sum_m / ratio / proportion / product / rse Column builders
    sources.*                      — censusreporter / censusapi / varrep / csv adapters
    registry.QUERIES / ORACLES     — driver-verified query inventory (SURVEY §2)
"""

from pandas_reporter_spark.session import configure, get_session
from pandas_reporter_spark.frame import CensusFrame
from pandas_reporter_spark.registry import ORACLES, QUERIES

__version__ = "0.1.0"

__all__ = [
    "configure",
    "get_session",
    "CensusFrame",
    "QUERIES",
    "ORACLES",
    "__version__",
]
