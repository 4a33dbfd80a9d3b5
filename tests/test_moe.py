"""ACS Handbook golden pins for the MOE derived measures (M1-M5).

Each case is the reference's own fixture CSV (FIXTURES.md §1, from
reference/test/test_basic.py:135-173) written to disk and read back
through spark.read.csv — so this doubles as the CSV-scan (S7) path
test. Golden values are the handbook's published numbers, as pinned
by the reference.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_reporter_spark.functions import moe

CSVS = {
    "agg": "a,a_m90,b,b_m90,c,c_m90\n52354,3303,19464,2011,17190,1854\n",
    "prop": "a,a_m90,b,b_m90\n4634,989,31713,601\n",
    "ratio": "a,a_m90,b,b_m90\n4634,989,6440,1328\n",
    "product": "a,a_m90,b,b_m90\n50624,2423,0.134,0.027\n",
}


@pytest.fixture(scope="module")
def frames(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("handbook")
    out = {}
    for name, body in CSVS.items():
        p = root / f"{name}.csv"
        p.write_text(body)
        out[name] = spark.read.csv(str(p), header=True, inferSchema=True)
    return out


def one(df, est, m):
    row = df.select(est.alias("e"), m.alias("m")).collect()[0]
    return row["e"], row["m"]


def test_sum_handbook_table1(frames):
    """sum_m(a,b,c) -> 89008 ± 4288.50 (test_basic.py:144-145)."""
    est, m = moe.sum_m("a", "b", "c")
    e, mm = one(frames["agg"], est, m)
    assert e == 89008
    assert round(mm, 2) == 4288.50


def test_proportion_handbook_table2(frames):
    """proportion(a,b) -> 0.1461 ± 0.0311 (test_basic.py:152-153)."""
    est, m = moe.proportion("a", "a_m90", "b", "b_m90")
    e, mm = one(frames["prop"], est, m)
    assert round(e, 4) == 0.1461
    assert round(mm, 4) == 0.0311


def test_ratio_handbook_table3(frames):
    """ratio(a,b) -> 0.719565 ± 0.213545 (test_basic.py:162-163)."""
    est, m = moe.ratio("a", "a_m90", "b", "b_m90")
    e, mm = one(frames["ratio"], est, m)
    assert round(e, 6) == 0.719565
    assert round(mm, 6) == 0.213545


def test_product_handbook_table4(frames):
    """product(a,b) -> 6784 ± 1405 (test_basic.py:172-173)."""
    est, m = moe.product("a", "a_m90", "b", "b_m90")
    e, mm = one(frames["product"], est, m)
    assert round(e) == 6784
    assert round(mm) == 1405


def test_rse_z_is_exactly_1645(spark):
    """The reference pins Z90 = exactly 1.645 (test_basic.py:101)."""
    assert moe.Z90 == 1.645
    df = spark.createDataFrame([{"e": 100.0, "m": 16.45}])
    (v,) = df.select(moe.rse(F.col("e"), F.col("m")).alias("r")).collect()[0]
    assert round(v, 10) == 10.0


def test_rse_zero_estimate_is_null(spark):
    """div-by-zero -> NULL under ANSI-off (SURVEY §4.4 policy; pandas
    shows inf — documented divergence)."""
    df = spark.createDataFrame([{"e": 0.0, "m": 5.0}])
    (v,) = df.select(moe.rse(F.col("e"), F.col("m")).alias("r")).collect()[0]
    assert v is None
