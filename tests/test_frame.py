"""CensusFrame behavior pins on the reference's make_df fixture.

Covers the engine-API surface no driver query can reach (M6, R1, R4,
R5, R6): margin-carrying projection, lookup by position/index/suffix,
.m90/.value accessors, renamed views, grouped sum/mean margins, the
make_df golden means, and the inverted-proportion fallback
(FIXTURES.md §2; reference test_basic.py:90-207).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pandas_reporter_spark.frame import CensusFrame
from tests.conftest import make_df, meta_for_make_df


@pytest.fixture(scope="module")
def cf(spark):
    return CensusFrame(make_df(spark), schema_meta=meta_for_make_df())


def mean_of(df, col):
    return df.agg(F.avg(col)).collect()[0][0]


def test_sum_m_mean_pin(cf):
    """mean(s1_m90) = 14.3481 (test_basic.py:102)."""
    est, m = cf.sum_m("col0", "col1")
    out = cf.with_measure("s1", est, m)
    assert round(mean_of(out.df, "s1_m90"), 4) == 14.3481


def test_add_rse_mean_pin(cf):
    """mean(s1_rse) = 52.8621, constant per row (test_basic.py:101)."""
    est, m = cf.sum_m("col0", "col1")
    out = cf.with_measure("s1", est, m).add_rse("s1")
    vals = [r["s1_rse"] for r in out.df.select("s1_rse").collect()]
    assert all(round(v, 4) == 52.8621 for v in vals)


def test_ratio_mean_pin(cf):
    """mean(ratio(col0,col1)) = 0.5 exactly (test_basic.py:103)."""
    est, m = cf.ratio("col0", "col1")
    out = cf.with_measure("r", est, m)
    assert mean_of(out.df, "r") == 0.5


def test_sum_m_elementwise(cf):
    """s1_m90 = sqrt(col0_m90² + col1_m90²) per row (test_basic.py:105-107)."""
    est, m = cf.sum_m("col0", "col1")
    rows = cf.with_measure("s1", est, m).df.collect()
    for r in rows:
        want = math.sqrt(r["col0_m90"] ** 2 + r["col1_m90"] ** 2)
        assert abs(r["s1_m90"] - want) < 1e-12


def test_proportion_moe_elementwise(cf):
    """moe = sqrt(mₙ² − p²·m_d²)/d when radicand ≥ 0 (test_basic.py:109-113)."""
    est, m = cf.proportion("col0", "col1")
    rows = cf.with_measure("p", est, m).df.collect()
    for r in rows:
        p = r["col0"] / r["col1"]
        rad = r["col0_m90"] ** 2 - p * p * r["col1_m90"] ** 2
        assert rad >= 0  # this orientation is a true proportion
        assert abs(r["p_m90"] - math.sqrt(rad) / r["col1"]) < 1e-12


def test_ratio_moe_elementwise(cf):
    """moe = sqrt(mₙ² + r²·m_d²)/d per row (test_basic.py:115-118)."""
    est, m = cf.ratio("col0", "col1")
    rows = cf.with_measure("r", est, m).df.collect()
    for r in rows:
        rr = r["col0"] / r["col1"]
        want = math.sqrt(r["col0_m90"] ** 2 + rr * rr * r["col1_m90"] ** 2) / r["col1"]
        assert abs(r["r_m90"] - want) < 1e-12


def test_inverted_proportion_falls_back_to_ratio(cf):
    """proportion(col1,col0): all 10 radicands negative; must not raise
    or produce NaN — ratio-formula fallback (test_basic.py:120-133)."""
    est, m = cf.proportion("col1", "col0")
    rows = cf.with_measure("p", est, m).df.collect()
    _, ratio_m = cf.ratio("col1", "col0")
    ratio_rows = cf.with_measure("rm", F.lit(0.0), ratio_m).df.collect()
    for r, rr in zip(rows, ratio_rows):
        assert not math.isnan(r["p_m90"])
        assert abs(r["p_m90"] - rr["rm_m90"]) < 1e-12


def test_margin_carry_projection(cf):
    """df[['geoid','col0','col1']] pulls margins est-then-margin
    (pinned column list, test_basic.py:186)."""
    out = cf[["geoid", "col0", "col1"]]
    assert out.df.columns == ["geoid", "col0", "col0_m90", "col1", "col1_m90"]


def test_lookup_by_position_and_index(cf):
    assert cf.lookup(2).name == "col0"
    assert cf.lookup("003").name == "col0_m90"


def test_suffix_indexing(cf):
    """df['<suffix>'] resolves a unique estimate-column suffix
    (ipynb:256 idiom, adapted to make_df names)."""
    assert cf["ol3"].name == "col3"


def test_m90_value_accessors(cf):
    """series.m90 / series.value round-trip (test_basic.py:27-28)."""
    s = cf.col0
    assert s.m90.name == "col0_m90"
    assert s.m90.value.name == "col0"
    assert cf.col0_m90.value.name == "col0"


def test_attribute_access_and_sum(cf):
    """df.col0 attribute + eager scalar sum (test parity idiom)."""
    assert cf.col0.sum() == sum(float(i) for i in range(1, 11))


def test_renamed_views(cf):
    coded = cf.coded_columns
    titled = cf.titled_columns
    ct = cf.ct_columns
    assert "col0" in coded.df.columns
    assert "Column 0" in titled.df.columns
    assert "col0 Column 0" in ct.df.columns


def test_group_sum_rss_margins(cf):
    """groupby('group').sum(): margins root-sum-squared (ipynb:1047-1056)."""
    out = cf.group_sum("group").df
    rows = {r["group"]: r for r in out.collect()}
    src = {r["geoid"]: r for r in cf.df.collect()}
    for g, r in rows.items():
        members = [s for s in src.values() if s["group"] == g]
        want_est = sum(s["col0"] for s in members)
        want_m = math.sqrt(sum(s["col0_m90"] ** 2 for s in members))
        assert abs(r["col0_sum"] - want_est) < 1e-9
        assert abs(r["col0_m90_sum_rs"] - want_m) < 1e-6


def test_quantizer_headroom_guard():
    """Overflow guard for the integer-unit quantizer (tables.dsum /
    CensusFrame._rss_sum): Spark's non-ANSI double→long cast SATURATES
    silently on overflow while DuckDB errors, so Σ|x|·10^scale must stay
    far below 2^63 for every column routed through a quantized sum.
    This pins the actual driver data at the verify SF with a 2× safety
    factor; re-run against any new corpus before raising a scale.
    """
    import duckdb

    sf = "/root/testdata/sf0.01"
    # (table, value expression, quantizer scale) for every quantized sum
    # in the engine: dsum(scale=2) on prices/quantities/event values,
    # davg(scale=4), and the m² micro-unit RSS over the derived margins
    # (m = 0.2·l_quantity is the larger relative margin pair).
    # (table, value expression, quantizer scale): dsum(scale=2) /
    # davg(scale=4) columns guard at their scale; _rss_sum's split
    # integer sum is scale 0 over m² (its 1e-8 fraction sum is bounded
    # by 1e8·n rows independent of data). This very guard caught the
    # single-sum micro-unit RSS saturating 2^63 at sf0.1 — keep it.
    cases = [
        ("lineitem", "l_extendedprice", 4),
        ("lineitem", "l_quantity", 4),
        ("orders", "o_totalprice", 4),
        ("events", "value", 4),
        ("lineitem", "(l_extendedprice * 0.1) * (l_extendedprice * 0.1)", 0),
        ("embeddings", "64.0", 0),  # norm² upper bound, unit-ish vecs
    ]
    con = duckdb.connect()
    for table, expr, scale in cases:
        n, mx = con.execute(
            f"SELECT COUNT(*), MAX(ABS({expr})) "
            f"FROM read_parquet('{sf}/{table}.parquet')"
        ).fetchone()
        assert n > 0
        # the fraction sums add ≤ 1e8 units/row on a separate long
        assert n * 1e8 < 2**62, (table, "frac-sum", n)
        assert n * mx * 10**scale < 2**62, (table, expr, scale, n, mx)


def test_group_mean_margins(cf):
    """groupby(k).mean(): est = avg, MOE = sqrt(Σ m²)/n (engine-defined
    R3 semantics; reference leaves it unpinned, test_basic.py:203-204)."""
    out = cf.group_mean("group").df
    rows = {r["group"]: r for r in out.collect()}
    src = {r["geoid"]: r for r in cf.df.collect()}
    for g, r in rows.items():
        members = [s for s in src.values() if s["group"] == g]
        n = len(members)
        want_est = sum(s["col0"] for s in members) / n
        want_m = math.sqrt(sum(s["col0_m90"] ** 2 for s in members)) / n
        assert abs(r["col0_mean"] - want_est) < 1e-9
        assert abs(r["col0_m90_mean_rs"] - want_m) < 1e-6


def test_head_and_iloc_slices(cf):
    """head/iloc compile to limit/offset plan nodes (display idioms,
    reference ipynb:656 `df.iloc[:3].T`); bounds and guards pinned."""
    assert cf.head(2).df.count() == 2
    assert cf.iloc[:3].df.count() == 3
    assert cf.iloc[1:3].df.count() == 2
    assert cf.iloc[2:2].df.count() == 0
    assert cf.iloc[:].df.count() == cf.df.count()
    # metadata survives the wrap
    assert cf.iloc[:2].meta_for("col0").get("code") == cf.meta_for("col0").get("code")
    with pytest.raises(TypeError):
        cf.iloc[0]
    with pytest.raises(ValueError):
        cf.iloc[::2]
    with pytest.raises(ValueError):
        cf.iloc[-1:]


def test_transpose_display(cf):
    """`df.iloc[:3].T`: columns become rows of a `column` col plus one
    string col per original row; oversize frames refused."""
    sliced = cf.df.orderBy("geoid").limit(3)
    t = CensusFrame(sliced, schema_meta=meta_for_make_df()).T
    assert t.df.columns == ["column", "0", "1", "2"]
    trows = {r["column"]: r for r in t.df.collect()}
    assert set(trows) == set(sliced.columns)
    src = sliced.collect()
    assert trows["geoid"]["0"] == str(src[0]["geoid"])
    assert trows["col0"]["2"] == str(src[2]["col0"])
    big = CensusFrame(cf.df.sparkSession.range(101).toDF("id"))
    with pytest.raises(ValueError):
        big.T


def test_columns_shape_to_pandas(cf):
    assert cf.columns == cf.df.columns
    n_rows, n_cols = cf.shape
    assert n_rows == cf.df.count() and n_cols == len(cf.df.columns)
    pdf = cf.head(3).to_pandas()
    assert list(pdf.columns) == cf.df.columns and len(pdf) == 3
