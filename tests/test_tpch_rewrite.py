"""The r11 pre-aggregation-below-the-join rewrites of TPC-H Q3/Q5
(VERDICT r10 item 2) must be RESULT-IDENTICAL to the retained r10
shapes — the rewrite is a physical-plan change, not a semantics
change. Checked value-for-value at two SFs (the sorted collected rows,
not a hash, so a divergence prints the first differing row)."""

from __future__ import annotations

import pytest


def _rows(df):
    return sorted(
        [tuple(r) for r in df.collect()],
        key=lambda t: tuple(str(x) for x in t),
    )


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
@pytest.mark.parametrize("pair", ["q3", "q5"])
def test_rewrite_matches_r10_shape(spark, sf, pair):
    from pandas_reporter_spark.operators import relational as R

    new, old = {
        "q3": (R.q_tpch_q3, R._q_tpch_q3_r10),
        "q5": (R.q_tpch_q5, R._q_tpch_q5_r10),
    }[pair]
    got, want = _rows(new(spark, sf)), _rows(old(spark, sf))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == w, f"{pair}@{sf}: {g} != {w}"
