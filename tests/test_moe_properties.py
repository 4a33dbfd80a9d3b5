"""Property-based pins for the MOE algebra (hypothesis).

The handbook fixtures pin four specific values; these pin the algebra
itself on arbitrary inputs against an independent numpy evaluation —
same formulas, different execution engine.
"""

from __future__ import annotations

import math

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from pandas_reporter_spark.functions import moe  # noqa: E402

finite = st.floats(
    min_value=0.1, max_value=1e6, allow_nan=False, allow_infinity=False
)

row = st.tuples(finite, finite, finite, finite)  # n, n_moe, d, d_moe

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def eval_pair(spark, rows, pair):
    df = spark.createDataFrame(
        [{"n": a, "nm": b, "d": c, "dm": e} for a, b, c, e in rows]
    )
    est, m = pair
    return df.select(est.alias("e"), m.alias("m")).collect()


@given(rows=st.lists(row, min_size=1, max_size=5))
@SET
def test_ratio_matches_numpy(spark, rows):
    out = eval_pair(spark, rows, moe.ratio("n", "nm", "d", "dm"))
    for (n, nm, d, dm), r in zip(rows, out):
        want_e = n / d
        want_m = math.sqrt(nm * nm + want_e * want_e * dm * dm) / d
        assert math.isclose(r["e"], want_e, rel_tol=1e-12)
        assert math.isclose(r["m"], want_m, rel_tol=1e-12)


@given(rows=st.lists(row, min_size=1, max_size=5))
@SET
def test_proportion_never_nan_and_falls_back(spark, rows):
    """For ANY inputs the proportion MOE is finite (the negative-
    radicand fallback is total) and equals the piecewise formula."""
    out = eval_pair(spark, rows, moe.proportion("n", "nm", "d", "dm"))
    for (n, nm, d, dm), r in zip(rows, out):
        p = n / d
        # association mirrors moe.py's (p*p)*(dm*dm) grouping exactly —
        # left-to-right p*p*dm*dm differs by ~1ulp and flips the
        # radicand's sign at the rad==0 boundary
        rad = nm * nm - (p * p) * (dm * dm)
        if rad >= 0:
            want = math.sqrt(rad) / d
        else:
            want = math.sqrt(nm * nm + (p * p) * (dm * dm)) / d
        assert not math.isnan(r["m"])
        assert math.isclose(r["m"], want, rel_tol=1e-12)


@given(rows=st.lists(row, min_size=1, max_size=5))
@SET
def test_product_is_symmetric(spark, rows):
    ab = eval_pair(spark, rows, moe.product("n", "nm", "d", "dm"))
    ba = eval_pair(spark, rows, moe.product("d", "dm", "n", "nm"))
    for x, y in zip(ab, ba):
        assert math.isclose(x["e"], y["e"], rel_tol=1e-12)
        assert math.isclose(x["m"], y["m"], rel_tol=1e-12)


@given(vals=st.lists(st.tuples(finite, finite), min_size=2, max_size=6))
@SET
def test_sum_m_is_rss_and_permutation_invariant(spark, vals):
    cols = {}
    for i, (e, m) in enumerate(vals):
        cols[f"c{i}"] = e
        cols[f"c{i}_m90"] = m
    df = spark.createDataFrame([cols])
    names = [f"c{i}" for i in range(len(vals))]
    est, m = moe.sum_m(*names)
    est_r, m_r = moe.sum_m(*reversed(names))
    r = df.select(
        est.alias("e"), m.alias("m"), est_r.alias("er"), m_r.alias("mr")
    ).collect()[0]
    want_m = math.sqrt(sum(mm * mm for _, mm in vals))
    assert math.isclose(r["m"], want_m, rel_tol=1e-12)
    assert math.isclose(r["m"], r["mr"], rel_tol=1e-12)
    assert math.isclose(r["e"], r["er"], rel_tol=1e-12)
