"""ACS margin-of-error propagation as Spark Column expressions.

Implements the statistical derived-measure operators of the reference
(recovered contracts: /root/reference/test/test_basic.py:90-173, the
ACS General Handbook formulas cited there). Every function returns an
``(estimate, moe)`` Column pair — the Spark analog of the reference's
two-series return (`odf['r'], odf['r_m90'] = df.ratio(...)`).

All expressions are pure Column arithmetic: Catalyst folds them into
whole-stage codegen; no Python executes per row. Squares are written
``x * x`` (not ``pow``) so Spark and the DuckDB oracle produce
bit-identical doubles (libm pow is not correctly rounded; IEEE multiply
and sqrt are).

Formulas (ACS General Handbook; verified against the reference's pinned
constants in tests/test_moe.py):
    sum:        est = Σ xᵢ,   moe = sqrt(Σ mᵢ²)                 (test_basic.py:105-107)
    ratio:      est = n/d,    moe = sqrt(mₙ² + r²·m_d²) / d      (test_basic.py:115-118)
    proportion: est = n/d,    moe = sqrt(mₙ² − p²·m_d²) / d,
                falling back to the ratio formula when the radicand is
                negative (test_basic.py:120-133 forbids warnings; also
                sidesteps DuckDB's sqrt(-x) error — SURVEY §4.4)
    product:    est = a·b,    moe = sqrt(a²·m_b² + b²·m_a²)      (test_basic.py:165-173)
    rse:        moe / Z90 / est · 100, Z90 = exactly 1.645       (test_basic.py:97-101)
"""

from __future__ import annotations

from functools import reduce
from typing import Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 90%-confidence z-score. The reference pins this to exactly 1.645
#: (1.6449 fails its own test constant — test_basic.py:101).
Z90 = 1.645

ColPair = Tuple[Column, Column]


def _c(x) -> Column:
    """Resolve to a Column and force double arithmetic: integer-typed
    estimate columns (CSV inferSchema) overflow int32/int64 in the
    squared terms (50624² > 2³¹ — caught by the handbook product pin)."""
    c = F.col(x) if isinstance(x, str) else x
    return c.cast("double")


def moe_of_sum(*moes) -> Column:
    """Root-sum-of-squares of the addends' margins."""
    ms = [_c(m) for m in moes]
    return F.sqrt(reduce(lambda a, b: a + b, [m * m for m in ms]))


def moe_of_mean(*moes) -> Column:
    """MOE of the mean of the addends: sqrt(Σ m²)/n — the R3 semantics
    the engine defines (the reference leaves grouped-mean margins
    unpinned, test_basic.py:203-204)."""
    return moe_of_sum(*moes) / len(moes)


def sum_m(*pairs) -> ColPair:
    """Margin-propagating sum. `pairs` alternates (est, moe, est, moe, …)
    or is a flat list of estimate names with the `_m90` convention."""
    if all(isinstance(p, str) for p in pairs) and not any(
        str(p).endswith("_m90") for p in pairs
    ):
        ests = [_c(p) for p in pairs]
        moes = [_c(f"{p}_m90") for p in pairs]
    else:
        cols = [_c(p) for p in pairs]
        ests, moes = cols[0::2], cols[1::2]
    est = reduce(lambda a, b: a + b, ests)
    return est, moe_of_sum(*moes)


def ratio(n, n_moe, d, d_moe) -> ColPair:
    """Ratio of two measures whose numerator is NOT a subset of the
    denominator (handbook Table 3)."""
    n, n_moe, d, d_moe = _c(n), _c(n_moe), _c(d), _c(d_moe)
    r = n / d
    moe = F.sqrt(n_moe * n_moe + r * r * (d_moe * d_moe)) / d
    return r, moe


def proportion(n, n_moe, d, d_moe) -> ColPair:
    """Proportion (numerator ⊆ denominator, handbook Table 2).

    The radicand mₙ² − p²·m_d² can go negative when the 'proportion' is
    inverted (reference test pins all-10-negative) — the handbook
    prescribes the ratio formula then. Guarding with `when` also keeps
    sqrt() off negative inputs (DuckDB errors, Spark yields NaN).
    """
    n, n_moe, d, d_moe = _c(n), _c(n_moe), _c(d), _c(d_moe)
    p = n / d
    rad = n_moe * n_moe - p * p * (d_moe * d_moe)
    _, ratio_moe = ratio(n, n_moe, d, d_moe)
    moe = F.when(rad < 0, ratio_moe).otherwise(F.sqrt(rad) / d)
    return p, moe


def product(a, a_moe, b, b_moe) -> ColPair:
    """Product of two measures (handbook Table 4)."""
    a, a_moe, b, b_moe = _c(a), _c(a_moe), _c(b), _c(b_moe)
    est = a * b
    moe = F.sqrt(a * a * (b_moe * b_moe) + b * b * (a_moe * a_moe))
    return est, moe


def rse(est, moe) -> Column:
    """Relative standard error, %: moe/1.645/est·100. Division by a zero
    estimate yields NULL under ANSI-off (oracle-consistent; the pandas
    reference shows `inf` — documented divergence, SURVEY §4.4)."""
    return _c(moe) / Z90 / _c(est) * 100
